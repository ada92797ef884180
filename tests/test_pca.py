import numpy as np
import pytest

from flashpca_tpu.models.pca import pca, flashpca
from flashpca_tpu.io import PlinkDataset
from flashpca_tpu.ops import standardize, dense_standardized_np


def _sign_align(ref, est):
    s = np.sign(np.sum(ref * est, axis=0))
    s[s == 0] = 1.0
    return est * s


def _dense_pca_oracle(X_std, ndim, div):
    """Independent oracle: full eigendecomposition of X X^T / div."""
    G = X_std @ X_std.T
    w, Q = np.linalg.eigh(G)
    w = w[::-1][:ndim] / div
    Q = Q[:, ::-1][:, :ndim]
    return w, Q


@pytest.fixture(scope="module")
def geno():
    rng = np.random.default_rng(1042)
    n, p = 150, 500
    maf = rng.uniform(0.05, 0.5, size=p)
    X = rng.binomial(2, maf[None, :], size=(n, p)).astype(np.float64)
    X[rng.uniform(size=X.shape) < 0.02] = np.nan
    return X


@pytest.mark.parametrize("divisor", ["p", "n1", "none"])
def test_pca_matrix_matches_eigh(geno, divisor):
    n, p = geno.shape
    ndim = 6
    res = pca(geno, ndim, divisor=divisor, tol=1e-9)
    X_std, _, _ = standardize(geno, "binom2")
    div = {"p": p, "n1": n - 1, "none": 1.0}[divisor]
    w, Q = _dense_pca_oracle(X_std, ndim, div)
    np.testing.assert_allclose(res.values, w, rtol=1e-8)
    U = _sign_align(Q, res.vectors)
    np.testing.assert_allclose(U, Q, atol=1e-6)
    # pve and trace
    np.testing.assert_allclose(res.trace, (X_std ** 2).sum() / div, rtol=1e-10)
    np.testing.assert_allclose(res.pve, w / res.trace, rtol=1e-8)
    # projection = U * sqrt(d)
    np.testing.assert_allclose(
        _sign_align(Q * np.sqrt(w), res.projection), Q * np.sqrt(w), atol=1e-6
    )


def test_pca_loadings(geno):
    n, p = geno.shape
    res = pca(geno, 4, do_loadings=True, tol=1e-9)
    X_std, _, _ = standardize(geno, "binom2")
    V_ref = X_std.T @ res.vectors / np.sqrt(res.values)[None, :] / np.sqrt(p)
    np.testing.assert_allclose(res.loadings, V_ref, atol=1e-8)
    # loadings satisfy X V = U D (i.e. Px = X V / sqrt(div))
    np.testing.assert_allclose(
        X_std @ res.loadings / np.sqrt(p), res.projection, atol=1e-6
    )


def test_pca_plink_matches_matrix_path(small_plink):
    root, geno_nan = small_plink
    res_pl = pca(root, 4, tol=1e-10)
    ds = PlinkDataset.open(root)
    mean, sd = ds.snp_stats("binom2")
    W = dense_standardized_np(ds.read_codes(), mean, sd)
    w, Q = _dense_pca_oracle(W.T, 4, ds.n_snps)
    np.testing.assert_allclose(res_pl.values, w, rtol=1e-8)
    U = _sign_align(Q, res_pl.vectors)
    np.testing.assert_allclose(U, Q, atol=1e-6)
    np.testing.assert_allclose(res_pl.center, mean)
    np.testing.assert_allclose(res_pl.scale, sd)


def test_pca_plink_batch_mode(small_plink):
    root, _ = small_plink
    res_online = pca(root, 3, tol=1e-10)
    res_batch = pca(root, 3, tol=1e-10, batch=True)
    np.testing.assert_allclose(res_batch.values, res_online.values, rtol=1e-7)


def test_pca_geno_check():
    X = np.arange(100, dtype=np.float64).reshape(10, 10)
    with pytest.raises(ValueError, match="values other than"):
        pca(X, 2)
    # works with stand="sd"
    res = pca(X + np.random.default_rng(1).normal(size=(10, 10)), 2, stand="sd")
    assert res.values.shape == (2,)


def test_pca_ndim_cap(geno):
    with pytest.raises(ValueError, match="only .* allowed"):
        pca(geno, 80)


def test_flashpca_alias(geno):
    res = flashpca(geno, 3, tol=1e-6)
    assert res.values.shape == (3,)


def test_pca_sharded_matches(small_plink):
    import jax
    from jax.sharding import Mesh

    root, _ = small_plink
    mesh = Mesh(np.array(jax.devices()[:8]), ("snps",))
    r1 = pca(root, 3, tol=1e-10)
    r2 = pca(root, 3, tol=1e-10, mesh=mesh, block_size=4)
    np.testing.assert_allclose(r2.values, r1.values, rtol=1e-9)
    U = _sign_align(r1.vectors, r2.vectors)
    np.testing.assert_allclose(U, r1.vectors, atol=1e-7)


def test_pca_accepts_prebuilt_operator(small_plink):
    """pca() on a prebuilt operator (device-generated data path) ==
    pca() on the fileset; device_results keeps outputs on device."""
    import jax
    import jax.numpy as jnp
    from flashpca_tpu.io.plink import PlinkDataset
    from flashpca_tpu.ops.operator import PackedOperator

    root, _ = small_plink
    ds = PlinkDataset.open(root)
    mean, sd = ds.snp_stats("binom2")
    op = PackedOperator(ds.read_packed(), mean, sd, ds.n_samples,
                        dtype=jnp.float64)
    res_op = pca(op, 3, tol=1e-9, do_loadings=True, device_results=True)
    res_ds = pca(root, 3, tol=1e-9, do_loadings=True)
    assert isinstance(res_op.vectors, jax.Array)
    assert isinstance(res_op.projection, jax.Array)
    assert isinstance(res_op.loadings, jax.Array)
    np.testing.assert_allclose(res_op.values, res_ds.values, rtol=1e-9)
    np.testing.assert_allclose(res_op.pve, res_ds.pve, rtol=1e-9)
    np.testing.assert_allclose(np.abs(np.asarray(res_op.vectors)),
                               np.abs(res_ds.vectors), atol=1e-7)
    np.testing.assert_allclose(np.abs(np.asarray(res_op.loadings)),
                               np.abs(res_ds.loadings), atol=1e-7)
    np.testing.assert_allclose(res_op.center, res_ds.center, atol=0)



def test_pca_panel_width_invariance(small_plink):
    """The solver panel width is a performance knob only: results must
    match across panel sizes (different Krylov schedules, same
    eigenpairs)."""
    from flashpca_tpu.models.pca import pca

    root, _ = small_plink
    res8 = pca(root, 3, tol=1e-10, panel=8)
    res16 = pca(root, 3, tol=1e-10)           # default panel=16
    res4 = pca(root, 3, tol=1e-10, panel=4)
    np.testing.assert_allclose(res8.values, res16.values, rtol=1e-8)
    np.testing.assert_allclose(res4.values, res16.values, rtol=1e-8)
    np.testing.assert_allclose(np.abs(res8.vectors), np.abs(res16.vectors),
                               atol=1e-6)
    np.testing.assert_allclose(np.abs(res4.vectors), np.abs(res16.vectors),
                               atol=1e-6)


def test_pca_user_ncv_keeps_block_solver(small_plink):
    """A user-pinned ncv that was viable at nev=ndim must stay on the
    block solver after the internal buffer-pair inflation: the buffer
    shrinks to fit (review r3), it must not silently drop the solve to
    scalar Lanczos (~16x the data passes on a decode-bound operator)."""
    from flashpca_tpu.models.pca import _clamp_buffer, pca

    # unit: buffer shrinks to keep nev + panel <= PANEL-ROUNDED ncv
    # (eigsh_block floor-rounds a user ncv to a multiple of the panel;
    # clamping against the raw value still tripped the fallback)
    assert _clamp_buffer(8, 20, None, 16) == 8
    assert _clamp_buffer(8, 20, 40, 16) == 0      # 40 rounds to 32
    assert _clamp_buffer(8, 20, 100, 16) == 8     # 100 rounds to 96
    assert _clamp_buffer(8, 20, 30, 16) == 0      # no room at all
    assert _clamp_buffer(8, 14, 46, 16) == 2      # 46 rounds to 32
    assert _clamp_buffer(8, 20, 96, 16) == 8      # exact multiple

    # end-to-end: pinned ncv still converges to the oracle
    root, X = small_plink
    res = pca(root, 3, tol=1e-8, panel=4, ncv=10)  # buffer fits 3
    res_ref = pca(root, 3, tol=1e-8)
    np.testing.assert_allclose(res.values, res_ref.values, rtol=1e-6)


def test_gate_convergence_reports_buffers():
    """Requested pairs govern success; a lagging buffer pair logs and
    continues, and a REAL failure's message carries the residual that
    failed, not max over [:ndim] (review r3)."""
    from flashpca_tpu.models.pca import _gate_convergence
    from flashpca_tpu.solvers.lanczos import EigshResult

    def mk(mask, resid):
        return EigshResult(
            eigenvalues=np.zeros(len(mask)), eigenvectors=None,
            n_restarts=7, n_ops=10, converged=False,
            residuals=np.asarray(resid), conv_mask=np.asarray(mask))

    # buffers lag, requested pairs fine -> continue (returns True)
    assert _gate_convergence(
        mk([True, True, False], [1e-9, 1e-9, 3e-2]), ndim=2, tol=1e-6)

    # a requested pair failed -> raise, message names the 3e-2 residual
    with pytest.raises(RuntimeError) as err:
        _gate_convergence(
            mk([True, False, True], [1e-9, 3e-2, 1e-9]), ndim=2,
            tol=1e-6)
    assert "3.000e-02" in str(err.value)
    assert "buffer=1" in str(err.value)

    # converged result passes through untouched
    r = mk([True], [1e-9])
    r.converged = True
    assert _gate_convergence(r, ndim=1, tol=1e-6)


def test_clamp_auto_ncv_keeps_block_solver_viable():
    """The ff basis inflation must not kick a small operator to scalar
    Lanczos: the auto ncv clamps to whole panels inside the viability
    guard and the buffer shrinks with it (review r4)."""
    from flashpca_tpu.models.pca import _clamp_auto_ncv

    # op_dim=64, panel=16: viable max basis is 32 columns
    ncv, extra, nev = _clamp_auto_ncv(100, 10, 8, 16, 64)
    assert ncv == 32 and extra == 6 and nev == 16
    assert nev + 16 <= ncv and ncv + 32 <= 64
    # big problem: rule untouched
    ncv, extra, nev = _clamp_auto_ncv(100, 20, 8, 16, 501_760)
    assert (ncv, extra, nev) == (100, 8, 28)
