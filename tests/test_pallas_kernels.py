"""Pallas fused decode->matvec kernels vs the jnp decode oracle.

Runs in interpreter mode on CPU; the same kernels compile with Mosaic
on TPU.  Shapes satisfy the kernel layout contract: p_pad % 256 == 0,
nbytes_pad % 128 == 0.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from flashpca_tpu.kernels import packed_matvec as pk
from flashpca_tpu.ops.operator import (
    crossprod_p as jnp_crossprod,
    gram_matvec_p as jnp_gram,
    matvec_p as jnp_matvec,
)


@pytest.fixture(scope="module")
def fixture():
    rng = np.random.default_rng(3)
    p_pad, nbytes_pad = 512, 128
    packed = jnp.asarray(
        rng.integers(0, 256, size=(p_pad, nbytes_pad), dtype=np.uint8))
    mean = jnp.asarray(rng.uniform(0.1, 1.9, p_pad), dtype=jnp.float32)
    invsd = jnp.asarray(rng.uniform(0.5, 2.0, p_pad), dtype=jnp.float32)
    # zero a few rows like VAR_TOL-excluded SNPs / row padding
    invsd = invsd.at[-7:].set(0.0)
    return packed, mean, invsd, rng


@pytest.mark.parametrize("k", [1, 3, 8, 11])
def test_crossprod_matches_jnp(fixture, k):
    packed, mean, invsd, rng = fixture
    n4 = packed.shape[1] * 4
    x = jnp.asarray(rng.standard_normal((n4, k)), dtype=jnp.float32)
    ref = jnp_crossprod(packed, mean, invsd, x, block_size=packed.shape[0])
    got = pk.crossprod_p(packed, mean, invsd, x, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)


@pytest.mark.parametrize("k", [1, 5, 8])
def test_matvec_matches_jnp(fixture, k):
    packed, mean, invsd, rng = fixture
    p_pad = packed.shape[0]
    v = jnp.asarray(rng.standard_normal((p_pad, k)), dtype=jnp.float32)
    ref = jnp_matvec(packed, mean, invsd, v, block_size=p_pad)
    got = pk.matvec_p(packed, mean, invsd, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)


def test_gram_matches_jnp(fixture):
    packed, mean, invsd, rng = fixture
    n4 = packed.shape[1] * 4
    x = jnp.asarray(rng.standard_normal((n4, 2)), dtype=jnp.float32)
    ref = jnp_gram(packed, mean, invsd, x, block_size=256)
    got = pk.gram_matvec_p(packed, mean, invsd, x, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-3)


def test_packed_operator_pallas_path(small_plink):
    """PackedOperator with interpreted Pallas kernels == jnp path,
    including byte/row padding and the valid-sample mask."""
    from flashpca_tpu.io.plink import PlinkDataset
    from flashpca_tpu.ops.operator import PackedOperator

    root, geno = small_plink
    ds = PlinkDataset.open(root)
    mean, sd = ds.snp_stats("binom2")
    rng = np.random.default_rng(11)

    kw = dict(block_size=16, dtype=jnp.float32)
    op_ref = PackedOperator(ds.read_packed(), mean, sd, ds.n_samples,
                            use_pallas=False, **kw)
    op_pl = PackedOperator(ds.read_packed(), mean, sd, ds.n_samples,
                           use_pallas="interpret", **kw)

    x = rng.standard_normal((ds.n_samples, 3))
    np.testing.assert_allclose(
        np.asarray(op_pl.perform_op(x)), np.asarray(op_ref.perform_op(x)),
        rtol=2e-4, atol=4e-4)
    np.testing.assert_allclose(
        np.asarray(op_pl.crossprod(x)), np.asarray(op_ref.crossprod(x)),
        rtol=2e-4, atol=4e-4)
    v = rng.standard_normal((ds.n_snps, 2))
    np.testing.assert_allclose(
        np.asarray(op_pl.prod(v)), np.asarray(op_ref.prod(v)),
        rtol=2e-4, atol=4e-4)
    np.testing.assert_allclose(op_pl.trace, op_ref.trace, rtol=1e-5)


def test_missing_decodes_exactly_zero(fixture):
    """Code 1 (missing) must contribute EXACTLY zero, not f32-noise:
    the factored cubic (t-1)(b0 + t(b1 + t b2)) has a structural root
    at t=1 even with purely-f32 coefficients (ADVICE r1: on real TPUs
    jax_enable_x64 is off, so any float64 coefficient math silently
    runs in f32)."""
    p_pad, nbytes_pad = 512, 128
    rng = np.random.default_rng(5)
    # every genotype missing: all bytes 0b01010101
    packed = jnp.full((p_pad, nbytes_pad), 0x55, dtype=jnp.uint8)
    mean = jnp.asarray(rng.uniform(0.1, 1.9, p_pad), dtype=jnp.float32)
    invsd = jnp.asarray(rng.uniform(0.5, 2.0, p_pad), dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((nbytes_pad * 4, 3)),
                    dtype=jnp.float32)
    z = np.asarray(pk.crossprod_p(packed, mean, invsd, x, interpret=True))
    assert np.all(z == 0.0)
    v = jnp.asarray(rng.standard_normal((p_pad, 2)), dtype=jnp.float32)
    y = np.asarray(pk.matvec_p(packed, mean, invsd, v, interpret=True))
    assert np.all(y == 0.0)
