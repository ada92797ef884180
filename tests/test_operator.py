import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flashpca_tpu.io import PlinkDataset
from flashpca_tpu.ops import (
    PackedOperator,
    DenseOperator,
    dense_standardized_np,
    permute_samples,
    unpermute_samples,
)


@pytest.fixture(scope="module")
def packed_setup(small_plink):
    root, geno = small_plink
    ds = PlinkDataset.open(root)
    mean, sd = ds.snp_stats("binom2")
    codes = ds.read_codes()
    W = dense_standardized_np(codes, mean, sd)  # (p, N) oracle
    return ds, mean, sd, W


def test_permutation_roundtrip():
    n, nbytes = 61, 16
    x = jnp.arange(n, dtype=jnp.float64)
    xp = permute_samples(x, nbytes)
    assert xp.shape == (64,)
    back = unpermute_samples(xp, n)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
    # matrix case
    xm = jnp.arange(n * 3, dtype=jnp.float64).reshape(n, 3)
    back_m = unpermute_samples(permute_samples(xm, nbytes), n)
    np.testing.assert_array_equal(np.asarray(back_m), np.asarray(xm))


@pytest.mark.parametrize("block_size", [5, 37, 64])
def test_packed_products_match_dense(packed_setup, block_size, rng):
    ds, mean, sd, W = packed_setup
    op = PackedOperator(
        ds.read_packed(), mean, sd, ds.n_samples,
        block_size=block_size, dtype=jnp.float64,
    )
    n, p = ds.n_samples, ds.n_snps
    X = W.T  # (N, p)

    x = rng.normal(size=n)
    np.testing.assert_allclose(np.asarray(op.perform_op(x)), X @ (X.T @ x), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(op.crossprod(x)), X.T @ x, rtol=1e-10)

    v = rng.normal(size=p)
    np.testing.assert_allclose(np.asarray(op.prod(v)), X @ v, rtol=1e-10)

    # matrix variants.  atol covers near-zero entries whose f64
    # accumulation order differs between the blocked scan and the
    # dense oracle (rel err up to ~1e-9 observed on eps-scale values
    # at some session-rng states; values here are O(100))
    Xk = rng.normal(size=(n, 3))
    np.testing.assert_allclose(
        np.asarray(op.perform_op(Xk)), X @ (X.T @ Xk),
        rtol=1e-10, atol=1e-11,
    )
    Vk = rng.normal(size=(p, 2))
    np.testing.assert_allclose(np.asarray(op.prod(Vk)), X @ Vk, rtol=1e-10)

    # trace and per-SNP sum of squares
    np.testing.assert_allclose(op.trace, (X ** 2).sum(), rtol=1e-10)
    np.testing.assert_allclose(op.snp_sumsq, (W ** 2).sum(axis=1), rtol=1e-10)


def test_constant_column_zeroed(packed_setup):
    ds, mean, sd, W = packed_setup
    # column 5 of the fixture is constant 0 -> sd == 0 -> zeroed
    assert sd[5] <= 1e-9
    assert np.all(W[5] == 0.0)
    op = PackedOperator(ds.read_packed(), mean, sd, ds.n_samples, dtype=jnp.float64)
    v = np.zeros(ds.n_snps)
    v[5] = 1.0
    np.testing.assert_array_equal(np.asarray(op.prod(v)), 0.0)


def test_dense_operator_matches(packed_setup, rng):
    ds, mean, sd, W = packed_setup
    X = W.T
    op = DenseOperator(X, dtype=jnp.float64)
    x = rng.normal(size=ds.n_samples)
    np.testing.assert_allclose(np.asarray(op.perform_op(x)), X @ (X.T @ x), rtol=1e-10)


def test_sharded_operator_matches_single(packed_setup, rng):
    from jax.sharding import Mesh

    ds, mean, sd, W = packed_setup
    devices = np.array(jax.devices()[:4])
    mesh = Mesh(devices, ("snps",))
    op1 = PackedOperator(ds.read_packed(), mean, sd, ds.n_samples,
                         block_size=7, dtype=jnp.float64)
    opm = PackedOperator(ds.read_packed(), mean, sd, ds.n_samples,
                         block_size=7, dtype=jnp.float64, mesh=mesh)
    x = rng.normal(size=ds.n_samples)
    np.testing.assert_allclose(
        np.asarray(opm.perform_op(x)), np.asarray(op1.perform_op(x)), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(opm.crossprod(x)), np.asarray(op1.crossprod(x)), rtol=1e-10
    )
    v = rng.normal(size=ds.n_snps)
    np.testing.assert_allclose(
        np.asarray(opm.prod(v)), np.asarray(op1.prod(v)), rtol=1e-10
    )
    np.testing.assert_allclose(opm.trace, op1.trace, rtol=1e-10)


def test_plan_layout_one_block_rounds_up():
    """Regression: when one block covers the whole shard the planner
    must round the block UP to a whole tile, not down -- rounding down
    doubled p_pad with an entire extra block of padding."""
    import jax.numpy as jnp
    from flashpca_tpu.kernels.packed_matvec import TILE_P
    from flashpca_tpu.ops.operator import PackedOperator

    plan = PackedOperator.plan_layout(14389, 240, dtype=jnp.float32,
                                      nshards=1, use_pallas=True)
    assert plan["p_pad"] == -(-14389 // TILE_P) * TILE_P
    assert plan["p_pad"] % TILE_P == 0
    assert plan["block_size"] == plan["p_pad"]
    # multi-shard: every shard a whole number of blocks and tiles
    plan4 = PackedOperator.plan_layout(14389, 240, dtype=jnp.float32,
                                       nshards=4, use_pallas=True)
    assert plan4["p_pad"] % (plan4["block_size"] * 4) == 0
    assert plan4["block_size"] % TILE_P == 0


def test_streaming_operator_matches_resident(small_plink):
    """StreamingPackedOperator (host-resident packed, blockwise device
    staging) must reproduce the HBM-resident operator exactly."""
    import jax.numpy as jnp
    from flashpca_tpu.io.plink import PlinkDataset
    from flashpca_tpu.ops.operator import PackedOperator, StreamingPackedOperator

    root, _ = small_plink
    ds = PlinkDataset.open(root)
    mean, sd = ds.snp_stats("binom2")
    rng = np.random.default_rng(3)

    op_r = PackedOperator(ds.read_packed(), mean, sd, ds.n_samples,
                          dtype=jnp.float64)
    op_s = StreamingPackedOperator(ds, mean, sd, ds.n_samples,
                                   block_snps=16, dtype=jnp.float64)
    assert op_s.n_blocks > 1  # actually exercises the block loop

    x = rng.standard_normal((ds.n_samples, 3))
    np.testing.assert_allclose(np.asarray(op_s.perform_op(x)),
                               np.asarray(op_r.perform_op(x)),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(op_s.crossprod(x)),
                               np.asarray(op_r.crossprod(x)),
                               rtol=1e-10, atol=1e-10)
    v = rng.standard_normal((ds.n_snps, 2))
    np.testing.assert_allclose(np.asarray(op_s.prod(v)),
                               np.asarray(op_r.prod(v)),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(op_s.trace, op_r.trace, rtol=1e-12)


def test_streaming_pca_matches_resident(small_plink):
    from flashpca_tpu.models.pca import pca

    root, _ = small_plink
    r_res = pca(root, 3, tol=1e-9, streaming=False)
    r_str = pca(root, 3, tol=1e-9, streaming=True, memory_mb=1)
    np.testing.assert_allclose(r_str.values, r_res.values, rtol=1e-8)
    for j in range(3):
        c = abs(np.dot(r_str.vectors[:, j], r_res.vectors[:, j]))
        assert c > 1 - 1e-8


def test_streaming_with_mesh_matches(small_plink):
    """Streaming x mesh: host-staged blocks SNP-sharded over devices
    (the beyond-aggregate-HBM path) must match the unsharded result."""
    from jax.sharding import Mesh
    from flashpca_tpu.io.plink import PlinkDataset
    from flashpca_tpu.models.pca import pca
    from flashpca_tpu.ops.operator import StreamingPackedOperator

    root, _ = small_plink
    ds = PlinkDataset.open(root)
    mean, sd = ds.snp_stats("binom2")
    mesh = Mesh(np.array(jax.devices("cpu")[:4]), ("snps",))
    rng = np.random.default_rng(12)
    op_m = StreamingPackedOperator(ds, mean, sd, ds.n_samples,
                                   block_snps=8, mesh=mesh,
                                   dtype=jnp.float64)
    op_1 = StreamingPackedOperator(ds, mean, sd, ds.n_samples,
                                   block_snps=8, dtype=jnp.float64)
    assert op_m.n_blocks > 1
    x = rng.standard_normal((ds.n_samples, 3))
    v = rng.standard_normal((ds.n_snps, 2))
    np.testing.assert_allclose(np.asarray(op_m.perform_op(x)),
                               np.asarray(op_1.perform_op(x)),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(op_m.crossprod(x)),
                               np.asarray(op_1.crossprod(x)),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(op_m.prod(v)),
                               np.asarray(op_1.prod(v)),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(op_m.trace, op_1.trace, rtol=1e-12)

    # end-to-end sharded streaming pca
    r_m = pca(root, 3, tol=1e-9, streaming=True, memory_mb=1, mesh=mesh)
    r_1 = pca(root, 3, tol=1e-9, streaming=False)
    np.testing.assert_allclose(r_m.values, r_1.values, rtol=1e-8)


def test_streaming_small_problem_shrinks_panel(tmp_path):
    """A streaming (fused=False) solve on a problem too small for the
    default panel must shrink the panel instead of falling back to the
    jitted scalar solver (which would trace the non-traceable streaming
    matvec and embed its host blocks as constants -- ADVICE r1)."""
    from flashpca_tpu.io.plink import write_bed
    from flashpca_tpu.models.pca import pca

    rng = np.random.default_rng(9)
    n, p = 21, 30  # n small enough that block=8 is infeasible
    geno = rng.binomial(
        2, rng.uniform(0.2, 0.5, p)[None, :], size=(n, p)).astype(np.float64)
    root = str(tmp_path / "tiny")
    write_bed(root, geno)
    r_str = pca(root, 3, tol=1e-9, streaming=True, memory_mb=1)
    r_res = pca(root, 3, tol=1e-9, streaming=False)
    np.testing.assert_allclose(r_str.values, r_res.values, rtol=1e-8)


@pytest.mark.parametrize("n", [60, 61, 62, 63])
def test_all_n_mod_4_paddings(tmp_path, n):
    """Every n % 4 residue through all operator kinds + the tall path:
    the 2-bit padding bits in the last byte must never leak into any
    product (wide/tall/streaming), whatever the residue."""
    from flashpca_tpu.io.plink import write_bed
    from flashpca_tpu.ops.operator import (StreamingPackedOperator,
                                           TallPackedOperator)

    rng = np.random.default_rng(100 + n)
    p = 23
    geno = rng.binomial(2, 0.3, size=(n, p)).astype(np.float64)
    geno[rng.uniform(size=(n, p)) < 0.07] = np.nan
    root = str(tmp_path / f"pad{n}")
    write_bed(root, geno)

    ds = PlinkDataset.open(root)
    assert ds.n_samples == n
    mean, sd = ds.snp_stats("binom2")
    X = dense_standardized_np(ds.read_codes(), mean, sd).T  # (n, p)

    x = rng.normal(size=(n, 2))
    v = rng.normal(size=(p, 2))

    wide = PackedOperator(ds.read_packed(), mean, sd, n, dtype=jnp.float64)
    stream = StreamingPackedOperator(ds, mean, sd, n, block_snps=7,
                                     dtype=jnp.float64)
    for op in (wide, stream):
        np.testing.assert_allclose(np.asarray(op.perform_op(x)),
                                   X @ (X.T @ x), rtol=1e-10, atol=1e-10)
        np.testing.assert_allclose(np.asarray(op.crossprod(x)),
                                   X.T @ x, rtol=1e-10, atol=1e-10)
        np.testing.assert_allclose(np.asarray(op.prod(v)),
                                   X @ v, rtol=1e-10, atol=1e-10)

    tall = TallPackedOperator(ds.read_packed(), mean, sd, n,
                              dtype=jnp.float64)
    u = tall.gram_permuted(tall.permute(jnp.asarray(v, jnp.float64)))
    np.testing.assert_allclose(np.asarray(tall.unpermute(u)),
                               X.T @ (X @ v), rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(tall.trace, (X ** 2).sum(), rtol=1e-10)


def test_budget_block_size_bounds_decoded_blocks():
    """sumsq/jnp-scan block sizes must stay within the 128 MiB decoded
    budget at biobank sample counts -- reusing the TILE_P-rounded
    kernel block size decoded multi-GB blocks and OOM'd the streaming/
    tall trace pass (review r2)."""
    from flashpca_tpu.ops.operator import budget_block_size

    # 1M samples: n4 = 4 * ceil(N/4); 128 MiB / (n4*4B) ~ 33 rows
    n4 = 1_003_520
    bs = budget_block_size(8560, n4)
    assert bs * n4 * 4 <= (128 << 20)
    assert 8560 % bs == 0
    # tiny problems: whole thing in one block
    assert budget_block_size(37, 64) == 37
    # cap respected
    assert budget_block_size(8192, 64, cap=1024) == 1024


def test_streaming_and_tall_sumsq_blocks_bounded(small_plink):
    """The wired-in sumsq block sizes honor the budget (and trace still
    matches the oracle)."""
    from flashpca_tpu.io.plink import PlinkDataset
    from flashpca_tpu.ops import dense_standardized_np
    from flashpca_tpu.ops.operator import (StreamingPackedOperator,
                                           TallPackedOperator)

    root, _ = small_plink
    ds = PlinkDataset.open(root)
    mean, sd = ds.snp_stats("binom2")
    X = dense_standardized_np(ds.read_codes(), mean, sd).T
    want = (X ** 2).sum()

    sop = StreamingPackedOperator(ds, mean, sd, ds.n_samples, block_snps=8,
                                  dtype=jnp.float64)
    np.testing.assert_allclose(sop.trace, want, rtol=1e-10)

    top = TallPackedOperator(ds.read_packed(), mean, sd, ds.n_samples,
                             dtype=jnp.float64)
    np.testing.assert_allclose(top.trace, want, rtol=1e-10)

    wide = PackedOperator(ds.read_packed(), mean, sd, ds.n_samples,
                          dtype=jnp.float64)
    np.testing.assert_allclose(wide.trace, want, rtol=1e-10)


def test_all_missing_snp_zeroed_everywhere(tmp_path):
    """An ALL-MISSING SNP must decode to a zeroed column on every path
    (jnp, Pallas interpret, streaming, tall, batch) -- NaN stats used
    to poison the Pallas factored-cubic coefficients (0 * NaN = NaN)
    and every downstream product.  The reference divides by zero on
    this input (data.cpp:262-291): a latent bug, not parity to keep."""
    from flashpca_tpu.io.plink import write_bed
    from flashpca_tpu.ops.operator import (StreamingPackedOperator,
                                           TallPackedOperator)
    from flashpca_tpu.ops.standardize import lookup_tables

    rng = np.random.default_rng(4)
    geno = rng.binomial(2, 0.3, size=(21, 9)).astype(np.float64)
    geno[:, 3] = np.nan
    root = str(tmp_path / "allmiss")
    write_bed(root, geno)
    ds = PlinkDataset.open(root)
    mean, sd = ds.snp_stats("binom2")
    assert np.isfinite(mean).all() and np.isfinite(sd).all()
    assert mean[3] == 0.0 and sd[3] == 0.0
    mf, invf = lookup_tables(mean, sd)
    assert np.isfinite(mf).all() and invf[3] == 0.0

    X = dense_standardized_np(ds.read_codes(), mean, sd).T
    assert np.all(X[:, 3] == 0.0)
    x = rng.standard_normal((21, 2))

    ops = [
        PackedOperator(ds.read_packed(), mean, sd, 21, dtype=jnp.float64),
        PackedOperator(ds.read_packed(), mean, sd, 21, dtype=jnp.float32,
                       use_pallas="interpret"),
        StreamingPackedOperator(ds, mean, sd, 21, block_snps=4,
                                dtype=jnp.float64),
    ]
    for op in ops:
        y = np.asarray(op.perform_op(jnp.asarray(x, op.dtype)))
        assert np.isfinite(y).all(), type(op).__name__
        z = np.asarray(op.crossprod(jnp.asarray(x, op.dtype)))
        assert np.isfinite(z).all() and np.all(z[3] == 0.0)

    tall = TallPackedOperator(ds.read_packed(), mean, sd, 21,
                              dtype=jnp.float64)
    assert np.isfinite(tall.trace)

    # batch path agrees (constant-0 imputation -> zeroed column)
    M = ds.read_matrix()
    assert np.isfinite(M).all() and np.all(M[:, 3] == 0.0)
