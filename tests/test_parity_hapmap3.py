"""Golden parity on the bundled HapMap3 data -- the reference's own
acceptance contract (HapMap3/test_pca.R:121-246): sign-invariant RMSE
< 1e-6 on eigenvalues/eigenvectors/PCs/loadings/PVE vs an independent
dense decomposition, k=10, tol=1e-6.

The oracle here is numpy.linalg.eigh in float64 on the exactly-
standardized matrix (equivalent to the R svd()/RSpectra oracle).
"""

import numpy as np
import pytest

from tests.conftest import HM3_AVAILABLE, HM3_ROOT

pytestmark = pytest.mark.skipif(not HM3_AVAILABLE, reason="HapMap3 data missing")

NDIM = 10
RMSE_TOL = 1e-6


def _rmse_sign_invariant(a, b):
    """min(mean((a-b)^2), mean((a+b)^2)) per column, like the R harness
    (HapMap3/test_pca.R:156-160)."""
    out = []
    for j in range(a.shape[1]):
        out.append(min(np.mean((a[:, j] - b[:, j]) ** 2),
                       np.mean((a[:, j] + b[:, j]) ** 2)))
    return np.sqrt(np.asarray(out))


@pytest.fixture(scope="module")
def hm3_oracle():
    from flashpca_tpu.io import PlinkDataset
    from flashpca_tpu.ops import dense_standardized_np

    ds = PlinkDataset.open(HM3_ROOT)
    mean, sd = ds.snp_stats("binom2")
    W = dense_standardized_np(ds.read_codes(), mean, sd)  # (p, N)
    X = W.T
    G = X @ X.T / ds.n_snps
    w, Q = np.linalg.eigh(G)
    w = w[::-1][:NDIM]
    Q = Q[:, ::-1][:, :NDIM]
    return ds, X, w, Q


@pytest.fixture(scope="module")
def hm3_result():
    from flashpca_tpu.models.pca import pca

    return pca(HM3_ROOT, NDIM, tol=1e-8, do_loadings=True)


def test_eigenvalues(hm3_oracle, hm3_result):
    _, _, w, _ = hm3_oracle
    rmse = np.sqrt(np.mean((hm3_result.values - w) ** 2))
    assert rmse < RMSE_TOL, f"eigenvalue RMSE {rmse}"


def test_eigenvectors(hm3_oracle, hm3_result):
    _, _, _, Q = hm3_oracle
    rmse = _rmse_sign_invariant(Q, hm3_result.vectors)
    assert (rmse < RMSE_TOL).all(), f"eigenvector RMSE {rmse}"


def test_pcs(hm3_oracle, hm3_result):
    _, _, w, Q = hm3_oracle
    pcs_ref = Q * np.sqrt(w)[None, :]
    rmse = _rmse_sign_invariant(pcs_ref, hm3_result.projection)
    assert (rmse < RMSE_TOL).all(), f"PC RMSE {rmse}"


def test_pve(hm3_oracle, hm3_result):
    ds, X, w, _ = hm3_oracle
    trace = (X ** 2).sum() / ds.n_snps
    pve_ref = w / trace
    rmse = np.sqrt(np.mean((hm3_result.pve - pve_ref) ** 2))
    assert rmse < RMSE_TOL


def test_loadings(hm3_oracle, hm3_result):
    ds, X, w, Q = hm3_oracle
    p = ds.n_snps
    V_ref = X.T @ Q / np.sqrt(w)[None, :] / np.sqrt(p)
    rmse = _rmse_sign_invariant(V_ref, hm3_result.loadings)
    assert (rmse < RMSE_TOL).all(), f"loading RMSE {rmse}"


def test_meansd_roundtrip(hm3_oracle, hm3_result):
    ds, _, _, _ = hm3_oracle
    mean, sd = ds.snp_stats("binom2")
    np.testing.assert_array_equal(hm3_result.center, mean)
    np.testing.assert_array_equal(hm3_result.scale, sd)
