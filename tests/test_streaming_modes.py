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


class TestBlockResidency:
    """Device-side block cache (the general form of the reference's
    single-block residency optimization, svdwide.cpp:32-40)."""

    def _op(self, small_plink, cache_mb, block_snps=16):
        from flashpca_tpu.io.plink import PlinkDataset
        from flashpca_tpu.ops.operator import StreamingPackedOperator

        root, _ = small_plink
        ds = PlinkDataset.open(root)
        mean, sd = ds.snp_stats("binom2")
        return StreamingPackedOperator(
            ds, mean, sd, ds.n_samples, block_snps=block_snps,
            cache_mb=cache_mb)

    def test_full_cache_stages_once(self, small_plink, rng):
        import numpy as np

        op = self._op(small_plink, cache_mb=64)   # covers everything
        ref = self._op(small_plink, cache_mb=0)
        assert op.n_blocks > 1
        x = rng.normal(size=(op.n_samples, 2))
        y1 = np.asarray(op.perform_op(x))
        assert op.staged_host_blocks == op.n_blocks
        y2 = np.asarray(op.perform_op(x))
        # second product: served entirely from the device cache
        assert op.staged_host_blocks == op.n_blocks
        yr = np.asarray(ref.perform_op(x))
        np.testing.assert_allclose(y1, yr, rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(y2, yr, rtol=1e-12, atol=1e-12)

    def test_partial_cache_parity_and_counts(self, small_plink, rng):
        import numpy as np

        op = self._op(small_plink, cache_mb=0)
        op1 = self._op(small_plink, cache_mb=1)
        # toy blocks are far below MB granularity: pin exactly one
        # block directly to exercise the partial-cache mechanics
        op1._n_cached = 1
        assert 0 < op1._resolve_cache_blocks() < op1.n_blocks
        x = rng.normal(size=(op.n_samples, 3))
        ya = np.asarray(op1.perform_op(x))
        yb = np.asarray(op1.perform_op(x))
        np.testing.assert_allclose(
            yb, np.asarray(op.perform_op(x)), rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(ya, yb, rtol=1e-12, atol=1e-12)
        # later passes stage only the non-pinned remainder
        n_pin = op1._resolve_cache_blocks()
        assert op1.staged_host_blocks == (
            op1.n_blocks + (op1.n_blocks - n_pin))

    def test_memory_mb_disables_auto_cache(self, small_plink):
        from flashpca_tpu.io.plink import PlinkDataset
        from flashpca_tpu.ops.operator import StreamingPackedOperator

        root, _ = small_plink
        ds = PlinkDataset.open(root)
        mean, sd = ds.snp_stats("binom2")
        op = StreamingPackedOperator(
            ds, mean, sd, ds.n_samples, memory_mb=1, cache_mb="auto")
        assert op._resolve_cache_blocks() == 0

    def test_cache_with_sumsq_and_crossprod(self, small_plink, rng):
        import numpy as np

        op = self._op(small_plink, cache_mb=64)
        ref = self._op(small_plink, cache_mb=0)
        np.testing.assert_allclose(op.snp_sumsq, ref.snp_sumsq,
                                   rtol=1e-12)
        x = rng.normal(size=(op.n_samples, 2))
        np.testing.assert_allclose(
            np.asarray(op.crossprod(x)), np.asarray(ref.crossprod(x)),
            rtol=1e-12, atol=1e-12)


class TestStagingStats:
    """stats()/reset_stats() observability + the prefetch thread
    (VERDICT r4 items 2-3: per-phase staging timings must make a
    collapsed streaming pass attributable)."""

    def _op(self, small_plink, **kw):
        from flashpca_tpu.io.plink import PlinkDataset
        from flashpca_tpu.ops.operator import StreamingPackedOperator

        root, _ = small_plink
        ds = PlinkDataset.open(root)
        mean, sd = ds.snp_stats("binom2")
        kw.setdefault("cache_mb", 0)
        return StreamingPackedOperator(
            ds, mean, sd, ds.n_samples, block_snps=16, **kw)

    def test_stats_counts_staged_bytes(self, small_plink, rng):
        op = self._op(small_plink)
        x = rng.normal(size=(op.n_samples, 2))
        op.perform_op(x)
        s = op.stats()
        assert s["nops"] == 1
        assert s["staged_host_blocks"] == op.n_blocks
        # one full pass stages exactly the packed matrix (no cache)
        assert s["staged_bytes"] == s["packed_bytes"]
        assert s["fill_s"] >= 0.0 and s["put_s"] >= 0.0
        assert s["n_cached"] == 0
        op.reset_stats()
        s2 = op.stats()
        assert s2["nops"] == 0 and s2["staged_bytes"] == 0
        assert s2["fill_s"] == 0.0

    def test_prefetch_matches_sync_staging(self, small_plink, rng):
        op_p = self._op(small_plink, prefetch=True)
        op_s = self._op(small_plink, prefetch=False)
        assert op_p.n_blocks > 1
        x = rng.normal(size=(op_p.n_samples, 3))
        yp = np.asarray(op_p.perform_op(x))
        ys = np.asarray(op_s.perform_op(x))
        np.testing.assert_allclose(yp, ys, rtol=1e-12, atol=1e-12)
        zp = np.asarray(op_p.crossprod(x))
        zs = np.asarray(op_s.crossprod(x))
        np.testing.assert_allclose(zp, zs, rtol=1e-12, atol=1e-12)
        s = op_p.stats()
        assert s["prefetch"] is True
        assert s["staged_host_blocks"] == 2 * op_p.n_blocks
        assert s["staged_bytes"] == 2 * s["packed_bytes"]

    def test_prefetch_with_partial_cache(self, small_plink, rng):
        op = self._op(small_plink, prefetch=True, cache_mb=1)
        op._n_cached = 1  # pin exactly one block (toy blocks < 1 MB)
        ref = self._op(small_plink)
        x = rng.normal(size=(op.n_samples, 2))
        y1 = np.asarray(op.perform_op(x))
        y2 = np.asarray(op.perform_op(x))
        yr = np.asarray(ref.perform_op(x))
        np.testing.assert_allclose(y1, yr, rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(y2, yr, rtol=1e-12, atol=1e-12)
        # pass 2 stages only the non-pinned remainder
        assert op.staged_host_blocks == 2 * op.n_blocks - 1

    def test_tall_streaming_stats(self, small_plink, rng):
        from flashpca_tpu.io.plink import PlinkDataset
        from flashpca_tpu.ops.operator import TallStreamingOperator

        root, _ = small_plink
        ds = PlinkDataset.open(root)
        mean, sd = ds.snp_stats("binom2")
        op = TallStreamingOperator(ds, mean, sd, ds.n_samples,
                                   block_bytes=4, cache_mb=0)
        v = rng.normal(size=(op.n_snps, 2))
        op.gram_permuted(op.permute(v))
        s = op.stats()
        assert s["nops"] == 1
        assert s["staged_host_blocks"] == op.n_blocks
        assert s["staged_bytes"] == s["packed_bytes"]
        op.reset_stats()
        assert op.stats()["staged_bytes"] == 0

    def test_close_releases_prefetch_pool(self, small_plink, rng):
        op = self._op(small_plink, prefetch=True)
        x = rng.normal(size=(op.n_samples, 2))
        y1 = np.asarray(op.perform_op(x))
        assert op._prefetch_pool is not None
        op.close()
        assert op._prefetch_pool is None
        op.close()   # idempotent
        # the operator still works after close (pool re-created lazily)
        y2 = np.asarray(op.perform_op(x))
        np.testing.assert_allclose(y1, y2, rtol=1e-12, atol=1e-12)

    def test_sync_every_backpressure_matches(self, small_plink, rng,
                                             monkeypatch):
        """FLASHPCA_STREAM_SYNC_EVERY bounds the staging backlog with
        periodic forced syncs; results must be identical."""
        monkeypatch.setenv("FLASHPCA_STREAM_SYNC_EVERY", "2")
        op_s = self._op(small_plink)
        monkeypatch.delenv("FLASHPCA_STREAM_SYNC_EVERY")
        op_r = self._op(small_plink)
        x = rng.normal(size=(op_s.n_samples, 2))
        monkeypatch.setenv("FLASHPCA_STREAM_SYNC_EVERY", "2")
        ys = np.asarray(op_s.perform_op(x))
        monkeypatch.delenv("FLASHPCA_STREAM_SYNC_EVERY")
        yr = np.asarray(op_r.perform_op(x))
        np.testing.assert_allclose(ys, yr, rtol=1e-12, atol=1e-12)
        assert op_s.stats()["sync_s"] >= 0.0
