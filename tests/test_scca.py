import numpy as np
import pytest

from flashpca_tpu.models.scca import scca, soft_thresh, norm_thresh
from flashpca_tpu.ops import standardize


def test_soft_thresh():
    a = np.array([3.0, -2.0, 0.5, -0.1])
    np.testing.assert_allclose(soft_thresh(a, 1.0), [2.0, -1.0, 0.0, 0.0])


def test_norm_thresh_unit_norm():
    x = np.array([3.0, 4.0, 0.1])
    y = norm_thresh(x.copy(), 0.1)
    np.testing.assert_allclose(np.linalg.norm(y), 1.0)


@pytest.fixture(scope="module")
def xy():
    rng = np.random.default_rng(2042)
    n, p, k = 120, 60, 8
    X = rng.binomial(2, 0.3, size=(n, p)).astype(np.float64)
    Y = rng.normal(size=(n, k))
    Y[:, 0] += 0.4 * X[:, :3].sum(axis=1)
    return X, Y


def test_self_scca_recovers_eigenvalues(xy, rng):
    """SCCA of X with itself at tiny penalties ~ SVD of X'X/(n-1):
    d must match the top eigenvalues of crossprod(X)/(n-1)
    (flashpcaR test_scca.R:32-49)."""
    X, _ = xy
    n = X.shape[0]
    ndim = 3
    Xs, _, _ = standardize(X, "binom2")
    V0 = rng.normal(size=(X.shape[1], ndim))
    res = scca(X, X, 1e-9, 1e-9, ndim=ndim, stand_x="binom2",
               stand_y="binom2", divisor="n1", maxiter=2000, tol=1e-10,
               V0=V0)
    assert res.converged
    ev = np.linalg.eigvalsh(Xs.T @ Xs / (n - 1))[::-1][:ndim]
    np.testing.assert_allclose(np.sort(res.d)[::-1], ev, rtol=1e-4)


def test_scca_matrix_vs_plink(small_plink, rng):
    root, geno = small_plink
    n = geno.shape[0]
    Y = rng.normal(size=(n, 4))
    V0 = rng.normal(size=(4, 2))
    res_pl = scca(root, Y, 1e-3, 1e-3, ndim=2, maxiter=1000, tol=1e-8, V0=V0)
    # The matrix path standardizes via the batch path; build a matrix with
    # streaming semantics to compare exactly
    from flashpca_tpu.io import PlinkDataset
    from flashpca_tpu.ops.genotypes import dense_standardized_np
    ds = PlinkDataset.open(root)
    mean, sd = ds.snp_stats("binom2")
    W = dense_standardized_np(ds.read_codes(), mean, sd)
    res_mx = scca(W.T, Y, 1e-3, 1e-3, ndim=2, maxiter=1000, tol=1e-8,
                  V0=V0, stand_x="none")
    # stand_x="none" only mean-imputes missing values (no centering/
    # scaling, ops/standardize.py matching util.cpp:52-56); W has no NaN,
    # so both paths see the identical matrix.
    np.testing.assert_allclose(res_pl.d, res_mx.d, rtol=1e-6)
    np.testing.assert_allclose(res_pl.U, res_mx.U, atol=1e-7)
    np.testing.assert_allclose(res_pl.V, res_mx.V, atol=1e-7)


def test_scca_divisor_relation(xy, rng):
    """d_n1 == d_none / (n-1) (flashpcaR test_scca.R:114-155)."""
    X, Y = xy
    V0 = rng.normal(size=(Y.shape[1], 2))
    r_none = scca(X, Y, 1e-6, 1e-6, ndim=2, divisor="none",
                  maxiter=2000, tol=1e-9, V0=V0)
    r_n1 = scca(X, Y, 1e-6, 1e-6, ndim=2, divisor="n1",
                maxiter=2000, tol=1e-9, V0=V0)
    assert r_none.converged and r_n1.converged
    np.testing.assert_allclose(r_n1.d, r_none.d / (X.shape[0] - 1), rtol=1e-4)


def test_scca_v0_determinism(xy):
    X, Y = xy
    r1 = scca(X, Y, 1e-3, 1e-3, ndim=2, seed=7, maxiter=500, tol=1e-7)
    r2 = scca(X, Y, 1e-3, 1e-3, ndim=2, seed=7, maxiter=500, tol=1e-7)
    np.testing.assert_array_equal(r1.d, r2.d)
    np.testing.assert_array_equal(r1.V0, r2.V0)


def test_scca_sparsity_increases_with_penalty(xy):
    X, Y = xy
    V0 = np.random.default_rng(3).normal(size=(Y.shape[1], 1))
    lo = scca(X, Y, 1e-6, 1e-6, ndim=1, maxiter=1000, tol=1e-8, V0=V0)
    hi = scca(X, Y, 0.15, 1e-6, ndim=1, maxiter=1000, tol=1e-8, V0=V0)
    assert np.count_nonzero(hi.U) < np.count_nonzero(lo.U)


def test_scca_too_large_penalty_aborts(xy):
    X, Y = xy
    res = scca(X, Y, 10.0, 10.0, ndim=2, maxiter=100, tol=1e-6)
    assert not res.converged


def test_scca_px_py(xy, rng):
    X, Y = xy
    V0 = rng.normal(size=(Y.shape[1], 2))
    res = scca(X, Y, 1e-4, 1e-4, ndim=2, maxiter=1000, tol=1e-8, V0=V0)
    Xs, _, _ = standardize(X, "binom2")
    Ys, _, _ = standardize(Y, "sd")
    np.testing.assert_allclose(res.Px, Xs @ res.U, atol=1e-7)
    np.testing.assert_allclose(res.Py, Ys @ res.V, atol=1e-7)


def test_cv_scca_recovers_signal(rng):
    """cv.scca sanity mirroring the R example (scca.R:386-399): Y built
    from X through a coefficient matrix; CV correlations should be high
    at small penalties and the best pair should be found."""
    from flashpca_tpu.models.scca import cv_scca

    n, p, k = 120, 30, 3
    X = rng.standard_normal((n, p))
    B = rng.standard_normal((p, k))
    Y = X @ B + 0.5 * rng.standard_normal((n, k))
    res = cv_scca(X, Y, lambda1=[1e-6, 1e-2], lambda2=[1e-6, 1e-2],
                  ndim=2, nfolds=3, seed=7,
                  stand_x="sd", stand_y="sd", maxiter=200, tol=1e-4)
    assert res.corr.shape == (2, 2, 2)
    assert np.isfinite(res.best_corr)
    assert res.best_corr > 0.8
    assert res.best_lambda1 in (1e-6, 1e-2)
    assert res.converged.shape == (3, 2, 2)
    assert (res.nzero_x >= 0).all()


def test_scca_auto_init_deterministic(rng):
    from flashpca_tpu.models.scca import scca

    n, p, k = 80, 25, 3
    X = rng.standard_normal((n, p))
    Y = X[:, :k] + 0.1 * rng.standard_normal((n, k))
    r1 = scca(X, Y, 1e-3, 1e-3, ndim=2, stand_x="sd", auto_init=True,
              seed=3, maxiter=300, tol=1e-6)
    r2 = scca(X, Y, 1e-3, 1e-3, ndim=2, stand_x="sd", auto_init=True,
              seed=3, maxiter=300, tol=1e-6)
    np.testing.assert_array_equal(r1.d, r2.d)
    np.testing.assert_array_equal(r1.U, r2.U)


def test_plot_helpers(rng, tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    from flashpca_tpu.models.scca import cv_scca
    from flashpca_tpu.plots import plot_cv_scca, plot2d_cv_scca, plot_pcs
    from flashpca_tpu.models.pca import pca

    n, p, k = 60, 20, 2
    X = rng.standard_normal((n, p))
    Y = X[:, :k] + 0.5 * rng.standard_normal((n, k))
    cv = cv_scca(X, Y, lambda1=[1e-6, 1e-3], lambda2=[1e-6],
                 ndim=1, nfolds=2, seed=2, stand_x="sd", stand_y="sd",
                 maxiter=100, tol=1e-3)
    ax = plot_cv_scca(cv, dim=1)
    assert ax is not None
    ax = plot2d_cv_scca(cv, dim=1)
    assert ax is not None
    res = pca(X, 3, stand="sd", tol=1e-8)
    ax = plot_pcs(res, labels=(np.arange(n) % 3))
    assert ax is not None


def test_subset_samples_roundtrip(small_plink, tmp_path):
    """subset_samples (the plink --keep/--remove analog) must preserve
    codes exactly, including missing genotypes and fam rows."""
    from flashpca_tpu.io.plink import PlinkDataset, subset_samples

    root, geno = small_plink
    ds = PlinkDataset.open(root)
    rng = np.random.default_rng(6)
    idx = np.sort(rng.choice(ds.n_samples, size=40, replace=False))
    out = subset_samples(ds, idx, str(tmp_path / "sub"), block_size=10)
    ds2 = PlinkDataset.open(out)
    assert ds2.n_samples == 40 and ds2.n_snps == ds.n_snps
    np.testing.assert_array_equal(ds2.read_codes(),
                                  ds.read_codes()[:, idx])
    assert ds2.fam_ids == [ds.fam_ids[i] for i in idx]
    assert list(ds2.snp_ids) == list(ds.snp_ids)


def test_split_scca_pipeline(small_plink, tmp_path):
    """End-to-end scca.sh-equivalent pipeline: split, grid, test-set
    projection with train statistics, penalty selection."""
    from flashpca_tpu.models.scca_split import split_scca

    root, geno = small_plink
    rng = np.random.default_rng(7)
    n = geno.shape[0]
    Y = rng.normal(size=(n, 3))
    Y[:, 0] += 0.8 * np.nan_to_num(geno[:, :4]).sum(axis=1)

    res = split_scca(root, Y, lambda1=[1e-3, 5e-2], lambda2=[1e-4],
                     ndim=2, prop_train=0.7, seed=3,
                     workdir=str(tmp_path), maxiter=500, tol=1e-6)
    assert res.corr_test.shape == (2, 2, 1)
    assert res.converged.all()
    # the training fileset really is a subset
    assert len(res.train_idx) + len(res.test_idx) == n
    # signal phenotype: best test correlation should be clearly positive
    assert res.best_corr > 0.3
    assert res.best_lambda1 in (1e-3, 5e-2)


def test_split_scca_plots(small_plink, tmp_path, rng):
    import matplotlib

    matplotlib.use("Agg")
    from flashpca_tpu.models.scca_split import split_scca
    from flashpca_tpu.plots import plot_split_scca, plot_split_scca_sparsity

    root, geno = small_plink
    Y = rng.normal(size=(geno.shape[0], 2))
    res = split_scca(root, Y, lambda1=[1e-3, 1e-2], lambda2=[1e-4],
                     ndim=2, prop_train=0.7, seed=5,
                     workdir=str(tmp_path), maxiter=300, tol=1e-5)
    ax = plot_split_scca(res)
    assert ax.get_xlabel()
    ax2 = plot_split_scca_sparsity(res)
    assert ax2.get_ylabel()


def test_scca_accepts_prebuilt_operator(small_plink, rng):
    import jax.numpy as jnp
    from flashpca_tpu.io.plink import PlinkDataset
    from flashpca_tpu.ops.operator import PackedOperator

    root, geno = small_plink
    ds = PlinkDataset.open(root)
    mean, sd = ds.snp_stats("binom2")
    op = PackedOperator(ds.read_packed(), mean, sd, ds.n_samples,
                        dtype=jnp.float64)
    Y = rng.normal(size=(ds.n_samples, 3))
    V0 = rng.normal(size=(3, 2))
    res_op = scca(op, Y, 1e-3, 1e-3, ndim=2, maxiter=800, tol=1e-9, V0=V0)
    res_ds = scca(root, Y, 1e-3, 1e-3, ndim=2, maxiter=800, tol=1e-9, V0=V0)
    np.testing.assert_allclose(res_op.d, res_ds.d, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(res_op.U, res_ds.U, rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("engine", ["device", "host"])
def test_scca_dim_checkpoint_resume(xy, rng, tmp_path, engine):
    """state_out persists after EVERY completed dimension; resuming from
    an early snapshot skips the finished dims and reproduces the
    uninterrupted run exactly (sequential deflation = the completed
    columns plus V0 are the full state)."""
    import sys

    # flashpca_tpu.models.__init__ rebinds the attribute `scca` to the
    # FUNCTION, shadowing the submodule on `import ... as` -- go through
    # sys.modules for the module object
    scca_mod = sys.modules["flashpca_tpu.models.scca"]
    from flashpca_tpu.models.scca import load_scca_state, save_scca_state

    X, Y = xy
    V0 = rng.normal(size=(Y.shape[1], 3))
    kw = dict(ndim=3, maxiter=2000, tol=1e-9, V0=V0, engine=engine)
    state = str(tmp_path / f"scca_{engine}.npz")

    # capture every successive checkpoint (simulates reading the file
    # at the moment a process died)
    snaps = []
    orig = save_scca_state

    def spy(path, U, V, d, next_dim, V0_, l1, l2, **ident):
        snaps.append(int(next_dim))
        orig(str(tmp_path / f"snap{next_dim}_{engine}.npz"),
             U, V, d, next_dim, V0_, l1, l2, **ident)
        return orig(path, U, V, d, next_dim, V0_, l1, l2, **ident)

    scca_mod.save_scca_state, saved = spy, scca_mod.save_scca_state
    try:
        full = scca(X, Y, 2e-3, 1e-3, state_out=state, **kw)
    finally:
        scca_mod.save_scca_state = saved
    assert full.converged
    assert snaps == [1, 2, 3]
    st = load_scca_state(state)
    assert int(st["next_dim"]) == 3

    # resume from the snapshot written after dim 0 only
    resumed = scca(X, Y, 2e-3, 1e-3,
                   state_in=str(tmp_path / f"snap1_{engine}.npz"), **kw)
    assert resumed.converged
    np.testing.assert_allclose(resumed.d, full.d, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(resumed.U, full.U, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(resumed.V, full.V, rtol=1e-9, atol=1e-11)

    # resuming a COMPLETE state recomputes nothing and returns the run
    done = scca(X, Y, 2e-3, 1e-3, state_in=state, **kw)
    np.testing.assert_allclose(done.d, full.d, rtol=1e-12)

    # guardrails: different penalties / different explicit V0 refuse
    with pytest.raises(ValueError, match="different penalties"):
        scca(X, Y, 5e-3, 1e-3, state_in=state, **kw)
    kw_bad = dict(kw, V0=rng.normal(size=(Y.shape[1], 3)))
    with pytest.raises(ValueError, match="V0 differs"):
        scca(X, Y, 2e-3, 1e-3, state_in=state, **kw_bad)
    # ...and so does the rest of the problem identity (review r4):
    # dims already deflated under another divisor/standardization
    # cannot be composed with new ones
    with pytest.raises(ValueError, match="divisor"):
        scca(X, Y, 2e-3, 1e-3, state_in=state, divisor="none", **kw)
    with pytest.raises(ValueError, match="stand_y"):
        scca(X, Y, 2e-3, 1e-3, state_in=state, stand_y="center", **kw)
    # a pre-0.4.1 state (no identity keys) still resumes
    import numpy as _np
    with _np.load(state) as z:
        legacy = {kk: z[kk] for kk in z.files
                  if kk not in ("divisor", "stand_x", "stand_y")}
    legacy_path = str(tmp_path / f"legacy_{engine}.npz")
    _np.savez(legacy_path, **legacy)
    legacy_done = scca(X, Y, 2e-3, 1e-3, state_in=legacy_path, **kw)
    np.testing.assert_allclose(legacy_done.d, full.d, rtol=1e-12)


def test_cli_scca_state_flags(small_plink, tmp_path, monkeypatch, rng):
    from flashpca_tpu.cli import main
    from flashpca_tpu.models.scca import load_scca_state

    root, geno = small_plink
    n = geno.shape[0]
    pheno_path = str(tmp_path / "pheno.txt")
    Y = rng.normal(size=(n, 3))
    with open(pheno_path, "w") as fh:
        for i in range(n):
            fh.write(f"F{i} I{i} " + " ".join(f"{v:.6f}" for v in Y[i])
                     + "\n")
    monkeypatch.chdir(tmp_path)
    state = str(tmp_path / "scca_state.npz")
    rc = main(["--scca", "--bfile", root, "--pheno", pheno_path,
               "--ndim", "2", "--outstate", state, "--notime"])
    assert rc == 0
    assert int(load_scca_state(state)["next_dim"]) == 2
    rc = main(["--scca", "--bfile", root, "--pheno", pheno_path,
               "--ndim", "2", "--instate", state, "--notime"])
    assert rc == 0


def test_grid_pipelines_reject_state_kwargs(xy, small_plink, rng):
    from flashpca_tpu.models.scca import cv_scca
    from flashpca_tpu.models.scca_split import split_scca

    X, Y = xy
    with pytest.raises(ValueError, match="penalty grid"):
        cv_scca(X, Y, [1e-3], [1e-3], ndim=2, nfolds=3,
                state_out="grid.npz")
    root, geno = small_plink
    with pytest.raises(ValueError, match="penalty grid"):
        split_scca(root, rng.normal(size=(geno.shape[0], 3)),
                   [1e-3], [1e-3], ndim=2, state_in="grid.npz")
