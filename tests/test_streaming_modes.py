"""Streaming-operator coverage for every analysis mode.

The reference runs every mode against the disk-streaming operator
(SCCA randompca.cpp:387-528, UCCA :578-625, check :663-703, project
:790-820); here each model must produce identical results with the
host-streaming `StreamingPackedOperator` (bounded device memory) and
the HBM-resident `PackedOperator`.
"""

import numpy as np
import pytest

from flashpca_tpu.io.plink import PlinkDataset
from flashpca_tpu.models.check import check
from flashpca_tpu.models.pca import pca
from flashpca_tpu.models.project import project
from flashpca_tpu.models.scca import scca
from flashpca_tpu.models.ucca import ucca


@pytest.fixture(scope="module")
def pheno(small_plink):
    root, geno = small_plink
    rng = np.random.default_rng(17)
    n = geno.shape[0]
    Y = rng.normal(size=(n, 4))
    Y[:, 0] += 0.5 * np.nan_to_num(geno[:, :3]).sum(axis=1)
    return Y


def test_scca_streaming_matches_resident(small_plink, pheno):
    root, _ = small_plink
    rng = np.random.default_rng(2)
    V0 = rng.normal(size=(pheno.shape[1], 2))
    kw = dict(ndim=2, maxiter=1000, tol=1e-9, V0=V0)
    res_r = scca(root, pheno, 1e-3, 1e-3, streaming=False, **kw)
    res_s = scca(root, pheno, 1e-3, 1e-3, streaming=True, memory_mb=1, **kw)
    assert res_s.converged == res_r.converged
    np.testing.assert_allclose(res_s.d, res_r.d, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(res_s.U, res_r.U, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(res_s.V, res_r.V, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(res_s.Px, res_r.Px, rtol=1e-7, atol=1e-9)


def test_scca_host_engine_matches_device(small_plink, pheno):
    """engine='host' (the streaming twin) == engine='device' on the
    same resident operator (VERDICT r1: host engine was untested)."""
    root, _ = small_plink
    rng = np.random.default_rng(3)
    V0 = rng.normal(size=(pheno.shape[1], 2))
    kw = dict(ndim=2, maxiter=1000, tol=1e-9, V0=V0, streaming=False)
    res_d = scca(root, pheno, 2e-3, 1e-3, engine="device", **kw)
    res_h = scca(root, pheno, 2e-3, 1e-3, engine="host", **kw)
    assert res_h.converged == res_d.converged
    np.testing.assert_allclose(res_h.d, res_d.d, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(res_h.U, res_d.U, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(res_h.V, res_d.V, rtol=1e-6, atol=1e-8)


def test_scca_device_engine_on_streaming_raises(small_plink, pheno):
    root, _ = small_plink
    with pytest.raises(ValueError, match="engine"):
        scca(root, pheno, 1e-3, 1e-3, ndim=2, streaming=True,
             engine="device")


def test_ucca_streaming_matches_resident(small_plink, pheno):
    root, _ = small_plink
    res_r = ucca(root, pheno, streaming=False)
    res_s = ucca(root, pheno, streaming=True, memory_mb=1)
    np.testing.assert_allclose(res_s.result, res_r.result,
                               rtol=1e-9, atol=1e-12)


def test_check_streaming_matches_resident(small_plink):
    root, _ = small_plink
    res = pca(root, 3, tol=1e-9)
    chk_r = check(root, res.vectors, res.values, streaming=False)
    chk_s = check(root, res.vectors, res.values, streaming=True,
                  memory_mb=1)
    np.testing.assert_allclose(chk_s.err, chk_r.err, rtol=1e-8, atol=1e-14)
    np.testing.assert_allclose(chk_s.mse, chk_r.mse, rtol=1e-8, atol=1e-16)
    assert chk_s.mse < 1e-10  # good decomposition stays good


def test_project_streaming_matches_resident(small_plink):
    root, _ = small_plink
    res = pca(root, 3, tol=1e-9, do_loadings=True)
    ms = np.column_stack([res.center, res.scale])
    pr_r = project(root, res.loadings, meansd=ms, streaming=False)
    pr_s = project(root, res.loadings, meansd=ms, streaming=True,
                   memory_mb=1)
    np.testing.assert_allclose(pr_s.projection, pr_r.projection,
                               rtol=1e-9, atol=1e-12)
    # self-projection still equals the PCs
    np.testing.assert_allclose(pr_s.projection, res.projection,
                               rtol=1e-6, atol=1e-8)


def test_streaming_block_loop_exercised(small_plink, pheno):
    """memory_mb=1 must actually split the toy data into >1 block."""
    from flashpca_tpu.ops.operator import StreamingPackedOperator

    root, _ = small_plink
    ds = PlinkDataset.open(root)
    mean, sd = ds.snp_stats("binom2")
    op = StreamingPackedOperator(ds, mean, sd, ds.n_samples, block_snps=8)
    assert op.n_blocks > 1
