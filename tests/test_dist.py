"""Distributed shard planning and per-shard loading on the virtual
8-device CPU mesh: products must be invariant to how the file is
sharded, and each shard's byte range must tile the file exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from flashpca_tpu.io.plink import PlinkDataset
from flashpca_tpu.ops.operator import PackedOperator
from flashpca_tpu.parallel import (
    load_sharded_packed,
    plan_row_shards,
    shard_byte_ranges,
    sharded_operator,
)


def test_byte_ranges_tile_file(small_plink):
    root, _ = small_plink
    ds = PlinkDataset.open(root)
    plan = PackedOperator.plan_layout(ds.n_snps, ds.nbytes_per_snp,
                                      nshards=4, dtype=jnp.float64)
    ranges = shard_byte_ranges(ds, plan["p_pad"], 4)
    assert ranges[0][0] == 3  # after magic bytes
    covered = sum(hi - lo for lo, hi in ranges)
    assert covered == ds.n_snps * ds.nbytes_per_snp
    for (a, b), (c, d) in zip(ranges, ranges[1:]):
        assert b == c  # contiguous


@pytest.mark.parametrize("nsh", [1, 2, 8])
def test_sharded_operator_matches_local(small_plink, nsh):
    root, _ = small_plink
    ds = PlinkDataset.open(root)
    mean, sd = ds.snp_stats("binom2")
    mesh = Mesh(np.array(jax.devices("cpu")[:nsh]), ("snps",))

    op_d = sharded_operator(ds, mesh, dtype=jnp.float64)
    op_l = PackedOperator(ds.read_packed(), mean, sd, ds.n_samples,
                          dtype=jnp.float64)

    rng = np.random.default_rng(2)
    x = rng.standard_normal((ds.n_samples, 3))
    np.testing.assert_allclose(
        np.asarray(op_d.perform_op(x)), np.asarray(op_l.perform_op(x)),
        rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(op_d.crossprod(x)), np.asarray(op_l.crossprod(x)),
        rtol=1e-10, atol=1e-10)
    v = rng.standard_normal((ds.n_snps, 2))
    np.testing.assert_allclose(
        np.asarray(op_d.prod(v)), np.asarray(op_l.prod(v)),
        rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(op_d.trace, op_l.trace, rtol=1e-12)


def test_plan_row_shards_even():
    rows = plan_row_shards(1024, 8)
    assert len(rows) == 8
    assert rows[0] == (0, 128) and rows[-1] == (896, 1024)


def test_end_to_end_sharded_pca(small_plink):
    """Full PCA through a sharded operator equals the local-path PCA."""
    from flashpca_tpu.models.pca import _pca_operator
    from flashpca_tpu.models.pca import pca

    root, _ = small_plink
    ds = PlinkDataset.open(root)
    mean, sd = ds.snp_stats("binom2")
    mesh = Mesh(np.array(jax.devices("cpu")[:4]), ("snps",))
    op = sharded_operator(ds, mesh, dtype=jnp.float64)
    res_d = _pca_operator(op, 3, "p", 500, 1e-9, 1, True,
                          jnp.float64, None, mean, sd)
    res_l = pca(root, 3, tol=1e-9, do_loadings=True)
    np.testing.assert_allclose(res_d.values, res_l.values, rtol=1e-9)
    for j in range(3):
        c = abs(np.dot(res_d.vectors[:, j], res_l.vectors[:, j]))
        assert c > 1 - 1e-9


def test_tall_sharded_operator_matches_local(small_plink):
    """tall_sharded_operator (per-host byte-window loader) equals a
    locally-built TallPackedOperator on the same mesh: identical
    padded layout, gram, prod, and analytic trace."""
    from flashpca_tpu.ops.operator import TallPackedOperator
    from flashpca_tpu.parallel.dist import tall_sharded_operator

    root, _ = small_plink
    ds = PlinkDataset.open(root)
    mean, sd = ds.snp_stats("binom2")
    mesh = Mesh(np.array(jax.devices("cpu")[:4]), ("samples",))
    op_d = tall_sharded_operator(ds, mesh, dtype=jnp.float64)
    op_l = TallPackedOperator(ds.read_packed(), mean, sd, ds.n_samples,
                              mesh=mesh, dtype=jnp.float64)
    assert (op_d.p_pad, op_d.nbytes_pad) == (op_l.p_pad, op_l.nbytes_pad)
    np.testing.assert_array_equal(np.asarray(op_d.packed),
                                  np.asarray(op_l.packed))
    rng = np.random.default_rng(2)
    v = jnp.asarray(rng.standard_normal((ds.n_snps, 2)), jnp.float64)
    np.testing.assert_allclose(
        np.asarray(op_d.gram_permuted(op_d.permute(v))),
        np.asarray(op_l.gram_permuted(op_l.permute(v))),
        rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(op_d.prod(v)), np.asarray(op_l.prod(v)),
        rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(op_d.trace, op_l.trace, rtol=1e-12)


def test_plan_byte_shards_even():
    from flashpca_tpu.parallel.dist import plan_byte_shards

    cols = plan_byte_shards(512, 4)
    assert cols == [(0, 128), (128, 256), (256, 384), (384, 512)]


# ---------------------------------------------------------------------------
# Collective audit (VERDICT r4 item 6): the CLAUDE.md structural rules
# -- one psum per sharded gram/prod pass, collective-free sharded-output
# crossprod, and O(ncv^2)-scalars-in-one-transfer solver cycles -- as
# enforced regressions rather than conventions.
# ---------------------------------------------------------------------------

def _psum_count(fn, *args):
    """Count psum equations in the (nested) jaxpr of fn(*args)."""
    import re

    s = str(jax.make_jaxpr(fn)(*args))
    return len(re.findall(r"\bpsum\b", s))


def test_sharded_products_collective_audit(small_plink, rng):
    """One gram pass = exactly ONE psum (payload: the (N, b) iterate);
    crossprod is sharded-output with NO collective; prod = one psum
    (SURVEY.md section 2.4's design table, svdwide.cpp:136-150)."""
    root, _ = small_plink
    ds = PlinkDataset.open(root)
    mesh = Mesh(np.array(jax.devices("cpu")[:8]), ("snps",))
    op = sharded_operator(ds, mesh, dtype=jnp.float64)

    xp = op.permute(jnp.asarray(rng.standard_normal((ds.n_samples, 3))))
    gram, ops_ = op.gram_pure()
    cross, mv, pops = op.products_pure()
    v = jnp.zeros((op.p_pad, 3), op.dtype)

    assert _psum_count(gram, xp, *ops_) == 1
    assert _psum_count(cross, xp, *pops) == 0
    assert _psum_count(mv, v, *pops) == 1


def test_solver_cycle_fetch_is_one_small_transfer(monkeypatch):
    """Each restart cycle fetches exactly ONE device array, of
    O(ncv^2) scalars -- never an O(n) vector (CLAUDE.md rule 2: the
    per-fetch floor over the remote tunnel is ~0.1 s, so per-cycle
    traffic must stay tiny and single-shot)."""
    import flashpca_tpu.solvers.block_lanczos as bl
    from flashpca_tpu.ops.operator import PackedOperator
    from flashpca_tpu.solvers.block_lanczos import eigsh_block

    rng_ = np.random.default_rng(5)
    n, p = 12_000, 200
    nbytes = (n + 3) // 4
    packed = rng_.integers(0, 256, size=(p, nbytes), dtype=np.uint8)
    maf = rng_.uniform(0.1, 0.5, p)
    op = PackedOperator(packed, 2 * maf, np.sqrt(2 * maf * (1 - maf)),
                        n, dtype=jnp.float64)

    fetched: list[int] = []
    real_asarray = np.asarray

    def spy(a, *args, **kw):
        if isinstance(a, jax.Array):
            fetched.append(int(a.size))
        return real_asarray(a, *args, **kw)

    monkeypatch.setattr(bl.np, "asarray", spy)
    nev, b, ncv = 4, 4, 32
    mv, ops_ = op.gram_pure()
    res = eigsh_block(mv, op.op_dim, nev, block=b, ncv=ncv,
                      maxiter=50, tol=1e-9, dtype=op.dtype, seed=1,
                      operands=ops_)
    monkeypatch.undo()

    assert res.n_restarts >= 1
    # one transfer per cycle, none larger than the stacked
    # (nsteps, ncv+2b, b) panel -- and far smaller than any O(n) vector
    assert len(fetched) == res.n_restarts
    per_cycle_cap = (ncv // b) * (ncv + 2 * b) * b
    assert max(fetched) <= per_cycle_cap
    assert max(fetched) < n // 2


def test_pca_shard_count_invariance(small_plink):
    """End-to-end pca() must agree across 1/2/4/8-device meshes at f64
    round-off (psum order differs per count, so the bar is amplified
    round-off, not bit-equality; the dryrun holds the f32 twin)."""
    from flashpca_tpu.models.pca import pca

    root, _ = small_plink
    results = []
    for m in (1, 2, 4, 8):
        mesh = Mesh(np.array(jax.devices("cpu")[:m]), ("snps",))
        results.append(pca(root, 2, tol=1e-10, maxiter=200, mesh=mesh))
    d0, U0 = results[0].values, results[0].vectors
    for r in results[1:]:
        np.testing.assert_allclose(r.values, d0, rtol=1e-9)
        corr = np.abs(np.sum(r.vectors * U0, axis=0))
        assert np.all(corr > 1 - 1e-9), corr
