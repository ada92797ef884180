"""Analytic per-SNP moments and standardized sum of squares.

The reference accumulates trace(X X^T) during its first streamed
operator pass (svdwide.cpp:44-45).  Here the host stats pass yields raw
dosage moments (ngood, dsum, d2sum), from which (mean, sd) for any
method AND the exact per-SNP sum of squared standardized genotypes
follow analytically (ops/standardize.py sumsq_from_moments) -- so
trace/pve and UCCA's per-SNP variances cost NO decode pass at all.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from flashpca_tpu.io.plink import (PlinkDataset, snp_moments_from_codes,
                                   snp_stats_from_codes, write_bed)
from flashpca_tpu.ops.operator import (PackedOperator,
                                       StreamingPackedOperator,
                                       TallPackedOperator,
                                       build_packed_operator)
from flashpca_tpu.ops.standardize import VAR_TOL, sumsq_from_moments


def _messy_fileset(tmp_path, rng, n=23, p=13):
    """Genotypes with missing values, an all-missing SNP and a
    monomorphic SNP -- the stats edge cases."""
    geno = rng.binomial(2, 0.3, size=(n, p)).astype(np.float64)
    geno[rng.uniform(size=geno.shape) < 0.15] = np.nan
    geno[:, 3] = np.nan
    geno[:, 5] = 0.0
    root = str(tmp_path / "moments")
    write_bed(root, geno)
    return geno, PlinkDataset.open(root)


def _kernel_standardized(geno, mean, sd):
    """Dense oracle with the decode kernels' semantics: missing -> 0,
    sd <= VAR_TOL zeroes the whole column."""
    g = geno.T
    inv = np.where(sd > VAR_TOL, 1.0 / np.where(sd > VAR_TOL, sd, 1.0), 0.0)
    X = np.where(np.isnan(g), 0.0, g - mean[:, None]) * inv[:, None]
    return X  # (p, n)


@pytest.mark.parametrize("n", [20, 21, 22, 23])
def test_moments_match_dense_oracle(tmp_path, rng, n):
    geno, ds = _messy_fileset(tmp_path, rng, n=n)
    ngood, dsum, d2sum = ds.snp_moments()
    g = geno.T
    assert np.array_equal(ngood, (~np.isnan(g)).sum(axis=1))
    assert np.array_equal(dsum, np.nansum(g, axis=1))
    assert np.array_equal(d2sum, np.nansum(g * g, axis=1))
    # numpy fallback and (when built) the native LUT kernel agree
    m2 = snp_moments_from_codes(ds.read_codes())
    for a, b in zip((ngood, dsum, d2sum), m2):
        assert np.array_equal(a, b)


@pytest.mark.parametrize("method", ["binom", "binom2"])
def test_with_sumsq_stats_identical_and_sumsq_exact(tmp_path, rng, method):
    geno, ds = _messy_fileset(tmp_path, rng)
    mean, sd, sumsq = ds.snp_stats(method, with_sumsq=True)
    mean0, sd0 = ds.snp_stats(method)
    assert np.array_equal(mean, mean0)
    assert np.array_equal(sd, sd0)
    want = (_kernel_standardized(geno, mean, sd) ** 2).sum(axis=1)
    np.testing.assert_allclose(sumsq, want, rtol=1e-12, atol=1e-14)
    # blockwise moments (tiny blocks) reassemble identically
    ngood, dsum, d2sum = ds.snp_moments(block_size=4)
    np.testing.assert_array_equal(
        sumsq_from_moments(ngood, dsum, d2sum, mean, sd), sumsq)


def test_sumsq_with_preloaded_stats(tmp_path, rng):
    """sumsq_from_moments works for ANY (mean, sd) -- e.g. projection
    mode standardizes new data with the TRAINING stats."""
    geno, ds = _messy_fileset(tmp_path, rng)
    p = ds.n_snps
    mean = rng.uniform(0.2, 1.8, size=p)
    sd = rng.uniform(0.3, 1.0, size=p)
    sd[5] = 0.0   # zeroed column
    want = (_kernel_standardized(geno, mean, sd) ** 2).sum(axis=1)
    got = sumsq_from_moments(*ds.snp_moments(), mean, sd)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-14)


def test_operator_snp_sumsq_passthrough(tmp_path, rng):
    """Every packed operator accepts the precomputed vector; trace and
    snp_sumsq then match the device-decoded computation exactly."""
    geno, ds = _messy_fileset(tmp_path, rng)
    n = ds.n_samples
    mean, sd, sumsq = ds.snp_stats("binom2", with_sumsq=True)
    packed = ds.read_packed()

    pairs = [
        (PackedOperator(packed, mean, sd, n, dtype=jnp.float64),
         PackedOperator(packed, mean, sd, n, dtype=jnp.float64,
                        snp_sumsq=sumsq)),
        (StreamingPackedOperator(ds, mean, sd, n, block_snps=4,
                                 dtype=jnp.float64),
         StreamingPackedOperator(ds, mean, sd, n, block_snps=4,
                                 dtype=jnp.float64, snp_sumsq=sumsq)),
        (TallPackedOperator(packed, mean, sd, n, dtype=jnp.float64),
         TallPackedOperator(packed, mean, sd, n, dtype=jnp.float64,
                            snp_sumsq=sumsq)),
    ]
    for op_device, op_analytic in pairs:
        name = type(op_device).__name__
        np.testing.assert_allclose(op_analytic.snp_sumsq,
                                   op_device.snp_sumsq,
                                   rtol=1e-10, atol=1e-12, err_msg=name)
        np.testing.assert_allclose(op_analytic.trace, op_device.trace,
                                   rtol=1e-10, err_msg=name)

    with pytest.raises(ValueError, match="snp_sumsq"):
        PackedOperator(packed, mean, sd, n, dtype=jnp.float64,
                       snp_sumsq=sumsq[:-1])

    op = build_packed_operator(ds, mean, sd, dtype=jnp.float64,
                               snp_sumsq=sumsq)
    assert np.array_equal(op.snp_sumsq, sumsq)

    # an explicit block_size must reach the streaming operator's block
    # geometry, not be silently dropped (review r4)
    ops = build_packed_operator(ds, mean, sd, dtype=jnp.float64,
                                streaming=True, block_size=8,
                                snp_sumsq=sumsq)
    assert ops.block_snps == 8


def test_pca_trace_uses_analytic_sumsq(tmp_path, rng):
    """The PLINK pca() path gets trace without any sumsq decode pass;
    pve matches the dense-oracle computation."""
    from flashpca_tpu.models.pca import pca

    geno = rng.binomial(2, 0.4, size=(40, 30)).astype(np.float64)
    root = str(tmp_path / "tr")
    write_bed(root, geno)
    ds = PlinkDataset.open(root)
    res = pca(ds, 3, dtype=jnp.float64, tol=1e-9)
    mean, sd = ds.snp_stats("binom2")
    X = _kernel_standardized(geno, mean, sd).T   # (n, p)
    want_trace = (X ** 2).sum() / ds.n_snps
    np.testing.assert_allclose(res.trace, want_trace, rtol=1e-12)
    lam = np.linalg.eigvalsh(X @ X.T)[::-1][:3] / ds.n_snps
    np.testing.assert_allclose(res.pve, lam / want_trace, rtol=1e-8)


def test_cbed_moments_match_numpy(tmp_path, rng):
    from flashpca_tpu.io import cbed

    if not cbed.moments_available():
        pytest.skip("native bedio library not built")
    geno, ds = _messy_fileset(tmp_path, rng, n=22, p=17)
    packed = ds.read_packed()
    native = cbed.moments(packed, ds.n_samples)
    fallback = snp_moments_from_codes(ds.read_codes())
    for a, b in zip(native, fallback):
        assert np.array_equal(a, b)
    # padding bits in the last byte must not leak into the moments
    corrupted = packed.copy()
    rem = ds.n_samples % 4
    if rem:
        mask = np.uint8((0xFF << (2 * rem)) & 0xFF)
        corrupted[:, -1] |= mask
        native_c = cbed.moments(corrupted, ds.n_samples)
        for a, b in zip(native_c, native):
            assert np.array_equal(a, b)
