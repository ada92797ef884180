"""PLINK-path k-fold cv_scca: packed end-to-end, parity vs matrix CV.

Reference analog: scca.R:410-557 (k-fold CV) + scca.sh's plink-subset
workflow.  The genotypes stay 2-bit packed through the whole CV
(VERDICT r2 next-step #4)."""

import numpy as np
import pytest

from flashpca_tpu.io.plink import write_bed
from flashpca_tpu.models.scca import cv_scca


@pytest.fixture(scope="module")
def complete_plink(tmp_path_factory):
    """No-missing fileset: the matrix path drops NaN test rows while
    the packed raw-dosage projector zeroes them, so parity is asserted
    on complete data (the divergence is documented in _cv_scca_plink)."""
    rng = np.random.default_rng(11)
    n, p = 80, 30
    maf = rng.uniform(0.1, 0.5, size=p)
    geno = rng.binomial(2, maf[None, :], size=(n, p)).astype(np.float64)
    root = str(tmp_path_factory.mktemp("cvplink") / "toy")
    write_bed(root, geno)
    return root, geno


def test_cv_scca_plink_matches_matrix(complete_plink, rng):
    root, X = complete_plink
    n = X.shape[0]
    Y = rng.normal(size=(n, 3))
    l1 = np.array([1e-4, 1e-3])
    l2 = np.array([1e-4, 1e-3])
    kw = dict(ndim=2, nfolds=3, opt_dim=1, seed=5, tol=1e-9)

    res_m = cv_scca(X, Y, l1, l2, **kw)
    res_p = cv_scca(root, Y, l1, l2, **kw)

    # identical folds (same seed/rng order), identical winner, and the
    # pooled correlations agree to solver precision
    np.testing.assert_array_equal(res_m.folds, res_p.folds)
    assert res_p.best_lambda1 == res_m.best_lambda1
    assert res_p.best_lambda2 == res_m.best_lambda2
    np.testing.assert_allclose(res_p.corr, res_m.corr,
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(res_p.nzero_x, res_m.nzero_x)
    np.testing.assert_allclose(res_p.nzero_y, res_m.nzero_y)
    assert res_p.converged.all()


def test_cv_scca_plink_streaming(complete_plink, rng):
    """streaming=True is honored on the PLINK path (bounded device
    memory; host-engine sequential fallback)."""
    root, X = complete_plink
    n = X.shape[0]
    Y = rng.normal(size=(n, 2))
    res = cv_scca(root, Y, np.array([1e-4]), np.array([1e-4]),
                  ndim=2, nfolds=2, seed=3, streaming=True,
                  memory_mb=1, tol=1e-8)
    assert res.corr.shape == (2, 1, 1)
    assert np.isfinite(res.best_corr)


def test_cv_scca_plink_explicit_folds(complete_plink, rng):
    root, X = complete_plink
    n = X.shape[0]
    Y = rng.normal(size=(n, 2))
    folds = np.arange(n) % 2
    res = cv_scca(root, Y, np.array([1e-4]), np.array([1e-3]),
                  ndim=2, folds=folds, seed=3, tol=1e-8)
    assert res.nfolds == 2
    np.testing.assert_array_equal(res.folds, folds)


def test_cv_scca_plink_empty_fold(complete_plink, rng):
    """An unused fold label must not abort the CV: the matrix path
    tolerates an empty test fold (xpred[test] is a no-op); the packed
    path must train-and-skip rather than crash in subset_samples
    (review r3)."""
    root, X = complete_plink
    n = X.shape[0]
    Y = rng.normal(size=(n, 2))
    folds = (np.arange(n) % 2) * 2          # labels {0, 2}: fold 1 empty
    kw = dict(ndim=2, opt_dim=1, seed=7, tol=1e-8)
    res_p = cv_scca(root, Y, np.array([1e-4]), np.array([1e-3]),
                    folds=folds, **kw)
    res_m = cv_scca(X, Y, np.array([1e-4]), np.array([1e-3]),
                    folds=folds, **kw)
    assert res_p.nfolds == 3
    np.testing.assert_allclose(res_p.corr, res_m.corr,
                               rtol=1e-6, atol=1e-8)


def test_cv_scca_plink_cleans_scratch(complete_plink, rng, monkeypatch,
                                      tmp_path):
    """Default (workdir=None) runs must not leak fold filesets --
    nfolds x dataset-size of temp files otherwise (review r3)."""
    import os

    root, X = complete_plink
    n = X.shape[0]
    Y = rng.normal(size=(n, 2))

    import tempfile

    made = []
    real_mkdtemp = tempfile.mkdtemp

    def spy_mkdtemp(*a, **k):
        k.setdefault("dir", str(tmp_path))
        d = real_mkdtemp(*a, **k)
        made.append(d)
        return d

    monkeypatch.setattr(tempfile, "mkdtemp", spy_mkdtemp)
    cv_scca(root, Y, np.array([1e-4]), np.array([1e-3]),
            ndim=1, nfolds=2, seed=3, tol=1e-8)
    assert made, "PLINK CV should have allocated a scratch dir"
    for d in made:
        assert not os.path.exists(d), f"scratch dir leaked: {d}"


def test_cv_scca_plink_explicit_workdir_kept(complete_plink, rng,
                                             tmp_path):
    """An explicit workdir keeps the fold filesets for inspection."""
    import os

    root, X = complete_plink
    n = X.shape[0]
    Y = rng.normal(size=(n, 2))
    wd = str(tmp_path / "folds")
    cv_scca(root, Y, np.array([1e-4]), np.array([1e-3]),
            ndim=1, nfolds=2, seed=3, tol=1e-8, workdir=wd)
    kept = [f for f in os.listdir(wd) if f.endswith(".bed")]
    assert len(kept) == 4                   # 2 folds x (train, test)


def test_cv_scca_plink_streaming_matches_resident(complete_plink, rng):
    """streaming=True CV rides the batched grid engine too (the
    host-driven twin shares each staged pass across cells) and matches
    the resident CV on the same folds."""
    root, X = complete_plink
    n = X.shape[0]
    Y = rng.normal(size=(n, 2))
    folds = np.arange(n) % 3
    kw = dict(ndim=2, folds=folds, seed=5, tol=1e-9)
    l1 = np.array([1e-4, 1e-3])
    l2 = np.array([1e-4])
    res_r = cv_scca(root, Y, l1, l2, **kw)
    res_s = cv_scca(root, Y, l1, l2, streaming=True, memory_mb=1, **kw)
    np.testing.assert_allclose(res_s.corr, res_r.corr,
                               rtol=1e-6, atol=1e-8)
    assert res_s.best_lambda1 == res_r.best_lambda1
    assert res_s.best_lambda2 == res_r.best_lambda2
    np.testing.assert_allclose(res_s.nzero_x, res_r.nzero_x)


def test_cv_scca_plink_mesh_matches(complete_plink, rng):
    """The PLINK CV composes with a SNP-sharded mesh: the per-fold
    repacked training operators shard over the mesh and the CV matches
    the single-device run on the same folds."""
    import jax
    from jax.sharding import Mesh

    root, X = complete_plink
    n = X.shape[0]
    Y = rng.normal(size=(n, 2))
    folds = np.arange(n) % 3
    kw = dict(ndim=2, folds=folds, seed=5, tol=1e-9)
    l1 = np.array([1e-4, 1e-3])
    l2 = np.array([1e-4])
    res_1 = cv_scca(root, Y, l1, l2, **kw)
    mesh = Mesh(np.array(jax.devices("cpu")[:4]), ("snps",))
    res_m = cv_scca(root, Y, l1, l2, mesh=mesh, **kw)
    np.testing.assert_allclose(res_m.corr, res_1.corr,
                               rtol=1e-6, atol=1e-8)
    assert res_m.best_lambda1 == res_1.best_lambda1
    assert res_m.best_lambda2 == res_1.best_lambda2
    np.testing.assert_allclose(res_m.nzero_x, res_1.nzero_x)
