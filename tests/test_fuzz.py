"""Seeded randomized property tests: operators and solver vs oracles
across diverse shapes, block sizes, standardization methods, and
missingness (a compact always-on slice of the larger offline sweep;
60-trial sweeps run clean as one-off validation).
"""

import tempfile

import numpy as np
import pytest

import jax.numpy as jnp

from flashpca_tpu.io.plink import PlinkDataset, write_bed
from flashpca_tpu.ops import dense_standardized_np
from flashpca_tpu.ops.operator import (PackedOperator,
                                       StreamingPackedOperator,
                                       TallPackedOperator,
                                       TallStreamingOperator)


@pytest.mark.parametrize("trial", range(8))
def test_operator_products_random_shapes(trial):
    rng = np.random.default_rng(9000 + trial)
    n = int(rng.integers(5, 130))
    p = int(rng.integers(3, 90))
    method = ["binom", "binom2"][trial % 2]
    miss = float(rng.uniform(0, 0.4))
    maf = rng.uniform(0.02, 0.5, size=p)
    geno = rng.binomial(2, maf[None, :], size=(n, p)).astype(np.float64)
    geno[rng.uniform(size=(n, p)) < miss] = np.nan
    if trial % 3 == 0:
        geno[:, int(rng.integers(0, p))] = 1.0   # constant column
    root = tempfile.mkdtemp() + "/fz"
    write_bed(root, geno)
    ds = PlinkDataset.open(root)
    mean, sd, sumsq = ds.snp_stats(method, with_sumsq=True)
    X = dense_standardized_np(ds.read_codes(), mean, sd).T
    # analytic sum of squares == dense oracle on every random shape
    np.testing.assert_allclose(sumsq, (X ** 2).sum(axis=0),
                               rtol=1e-11, atol=1e-12)
    x = rng.standard_normal((n, 2))
    v = rng.standard_normal((p, 2))
    bs = int(rng.integers(1, p + 3))

    wide = PackedOperator(ds.read_packed(), mean, sd, n, block_size=bs,
                          dtype=jnp.float64)
    stream = StreamingPackedOperator(ds, mean, sd, n, block_snps=bs,
                                     dtype=jnp.float64)
    for op in (wide, stream):
        np.testing.assert_allclose(np.asarray(op.perform_op(x)),
                                   X @ (X.T @ x), rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(op.crossprod(x)),
                                   X.T @ x, rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(op.prod(v)),
                                   X @ v, rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(op.snp_sumsq, sumsq,
                                   rtol=1e-10, atol=1e-11)

    tall = TallPackedOperator(ds.read_packed(), mean, sd, n,
                              dtype=jnp.float64)
    u = tall.unpermute(tall.gram_permuted(tall.permute(
        jnp.asarray(v, jnp.float64))))
    np.testing.assert_allclose(np.asarray(u), X.T @ (X @ v),
                               rtol=1e-9, atol=1e-9)

    # tall STREAMING twin: every 4th trial pins the exact single-block
    # geometry (whole data staged once), the rest draw a random
    # byte-axis block size (ragged tails, multi-block accumulation);
    # the cache arm uses an explicit MB budget -- "auto" resolves to 0
    # cached blocks off-TPU, which would silently skip the cache path
    tstream = TallStreamingOperator(
        ds, mean, sd, n, dtype=jnp.float64,
        block_bytes=(ds.nbytes_per_snp if trial % 4 == 0
                     else int(rng.integers(1, ds.nbytes_per_snp + 3))),
        cache_mb=(64 if trial % 2 else 0))
    u2 = tstream.unpermute(tstream.gram_permuted(tstream.permute(
        jnp.asarray(v, jnp.float64))))
    np.testing.assert_allclose(np.asarray(u2), X.T @ (X @ v),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(tstream.crossprod(
        jnp.asarray(x, jnp.float64))), X.T @ x, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(tstream.prod(v)), X @ v,
                               rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("trial", range(4))
def test_block_solver_random_spectra(trial):
    """eigsh_block vs numpy eigh on random symmetric PSD matrices with
    varied spectral shapes (clustered / spread / near-deficient)."""
    from flashpca_tpu.solvers.block_lanczos import eigsh_block

    rng = np.random.default_rng(7100 + trial)
    n = int(rng.integers(60, 220))
    k = int(rng.integers(2, 7))
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    shapes = [
        np.linspace(100, 1, n),                        # linear
        np.geomspace(1e4, 1e-2, n),                    # spread
        np.concatenate([[50, 49.9, 49.8], np.linspace(10, 0.1, n - 3)]),
        np.concatenate([np.full(5, 30.0), np.geomspace(1, 1e-4, n - 5)]),
    ]
    d = np.sort(shapes[trial])[::-1]
    A = (Q * d[None, :]) @ Q.T
    Aj = jnp.asarray(A, jnp.float64)
    res = eigsh_block(lambda x: Aj @ x, n, k, tol=1e-10, maxiter=500,
                      dtype=jnp.float64, seed=trial)
    np.testing.assert_allclose(res.eigenvalues, d[:k], rtol=1e-8)
    U = np.asarray(res.eigenvectors)
    # residual check against the matrix itself (degenerate clusters make
    # per-vector comparison to Q ill-defined)
    R = A @ U - U * res.eigenvalues[None, :]
    assert np.linalg.norm(R, axis=0).max() < 1e-6 * d[0]


@pytest.mark.parametrize("trial", range(4))
def test_pca_end_to_end_random_shapes(trial):
    """pca(plink_root) vs the dense eigh oracle across random shapes,
    missingness, standardizations, and operator modes -- the whole
    PLINK -> stats -> operator -> block solver -> polish pipeline as
    one seeded property (the E2E twin of the operator fuzz above)."""
    from flashpca_tpu.models.pca import pca

    rng = np.random.default_rng(4200 + trial)
    n = int(rng.integers(40, 160))
    p = int(rng.integers(25, 120))
    k = int(rng.integers(2, 6))
    method = ["binom", "binom2"][trial % 2]
    maf = rng.uniform(0.05, 0.5, size=p)
    geno = rng.binomial(2, maf[None, :], size=(n, p)).astype(np.float64)
    geno[rng.uniform(size=(n, p)) < 0.1] = np.nan
    root = tempfile.mkdtemp() + "/fz_pca"
    write_bed(root, geno)

    res = pca(root, k, stand=method, tol=1e-9,
              streaming=bool(trial % 2), memory_mb=1 if trial % 2 else None)

    ds = PlinkDataset.open(root)
    mean, sd = ds.snp_stats(method)
    X = dense_standardized_np(ds.read_codes(), mean, sd).T   # (n, p)
    G = X @ X.T / p
    w, Q = np.linalg.eigh(G)
    w, Q = w[::-1][:k], Q[:, ::-1][:, :k]
    np.testing.assert_allclose(res.values, w, rtol=1e-7, atol=1e-10)
    s = np.sign(np.sum(Q * res.vectors, axis=0))
    s[s == 0] = 1.0
    np.testing.assert_allclose(res.vectors * s[None, :], Q, atol=1e-6)
    np.testing.assert_allclose(res.trace, (X ** 2).sum() / p, rtol=1e-9)
