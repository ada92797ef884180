"""Compensated (two-float) product path: f64-grade verification on f32.

The reference checks its decompositions in float64 end to end
(randompca.cpp:684-697, mse < 1e-8 per README.md:207).  These tests pin
the ff machinery against exact float64 oracles on CPU; the TPU gain
(removing ~1e3*eps MXU accumulation noise) is measured by bench.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

import flashpca_tpu as fp
from flashpca_tpu.io.plink import bytes_per_snp, pack_codes, snp_stats_from_codes
from flashpca_tpu.ops import dense_standardized_np
from flashpca_tpu.ops.compensated import (
    code_value_luts,
    decode_lut,
    matdot_ff,
    residual_sums_ff,
    ritz_ff,
    rowdot_ff,
    split_f64,
    sum_ff,
    twoprod,
    twosum,
)
from flashpca_tpu.ops.operator import (
    DenseOperator,
    PackedOperator,
    StreamingPackedOperator,
)


def _to64(pair):
    hi, lo = pair
    return np.asarray(hi, np.float64) + np.asarray(lo, np.float64)


@pytest.fixture()
def packed_problem(rng):
    """Random packed genotypes incl. missing codes and an all-missing
    SNP; returns (packed, mean, sd, X_f64, n)."""
    n, p = 1203, 517  # deliberately awkward sizes
    codes = rng.choice(
        np.arange(4, dtype=np.uint8), size=(p, n), p=[0.2, 0.05, 0.35, 0.4]
    )
    codes[7, :] = 1  # all-missing SNP: NaN stats -> zeroed column
    packed = pack_codes(codes, n)
    mean, sd = snp_stats_from_codes(codes, "binom2")
    X = dense_standardized_np(codes, mean, sd).T  # (n, p) float64
    return packed, mean, sd, X, n


def test_twosum_twoprod_exact_under_jit():
    a = jnp.float32(1e8)
    b = jnp.float32(3.14159)
    s, e = jax.jit(twosum)(a, b)
    # a + b is exactly representable as the (s, e) pair
    assert np.float64(float(s)) + np.float64(float(e)) == (
        np.float64(np.float32(1e8)) + np.float64(np.float32(3.14159))
    )
    x = jnp.float32(1.2345678)
    y = jnp.float32(9.8765432)
    prod, err = jax.jit(twoprod)(x, y)
    exact = np.float64(np.float32(1.2345678)) * np.float64(np.float32(9.8765432))
    assert np.float64(float(prod)) + np.float64(float(err)) == exact


def test_sum_ff_captures_cancellation():
    # 1e8 + pi - 1e8: a plain f32 chain loses pi's low bits; the ff
    # pair keeps them
    parts = jnp.asarray(np.array([1e8, 3.14159, -1e8], np.float32))[:, None]
    hi, lo = jax.jit(sum_ff)(parts)
    got = float(hi[0]) + float(lo[0])
    assert abs(got - np.float64(np.float32(3.14159))) < 1e-12


def test_matdot_rowdot_ff_vs_f64(rng):
    n = 30011  # prime: exercises the zero-padding path
    A = rng.standard_normal((n, 5)).astype(np.float32)
    B = rng.standard_normal((n, 3)).astype(np.float32)
    ref = A.astype(np.float64).T @ B.astype(np.float64)
    got = _to64(jax.jit(matdot_ff)(A, B))
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 2e-6
    ref2 = A.astype(np.float64).T @ B.astype(np.float64)
    got2 = _to64(jax.jit(rowdot_ff)(A.T, B))
    assert np.linalg.norm(got2 - ref2) / np.linalg.norm(ref2) < 2e-6


def test_code_value_luts_exact_split(packed_problem):
    packed, mean, sd, X, n = packed_problem
    lh, ll = code_value_luts(mean, sd)
    vals = lh.astype(np.float64) + ll.astype(np.float64)
    from flashpca_tpu.io.plink import CODE_TO_DOSAGE
    from flashpca_tpu.ops.standardize import _inv_sd

    inv = _inv_sd(np.asarray(sd, np.float64))
    m = np.where(inv > 0, np.asarray(mean, np.float64), 0.0)
    exact = (CODE_TO_DOSAGE[None, :] - m[:, None]) * inv[:, None]
    exact[:, 1] = 0.0
    # hi+lo reproduces the f64 value to ~2^-49 relative
    denom = np.maximum(np.abs(exact), 1.0)
    assert np.max(np.abs(vals - exact) / denom) < 1e-13
    # the all-missing SNP's whole row is zero
    assert np.all(vals[7] == 0.0)


def test_decode_lut_matches_dense(packed_problem):
    packed, mean, sd, X, n = packed_problem
    lh, ll = code_value_luts(mean, sd)
    W = _to64(
        (decode_lut(jnp.asarray(packed), jnp.asarray(lh)),
         decode_lut(jnp.asarray(packed), jnp.asarray(ll)))
    )
    # W is (p, n4) in permuted sample order; un-permute to compare
    from flashpca_tpu.io.plink import PACK_DENSITY

    nb = bytes_per_snp(n)
    Wn = W.reshape(-1, PACK_DENSITY, nb).transpose(0, 2, 1).reshape(
        W.shape[0], nb * PACK_DENSITY)[:, :n]
    assert np.max(np.abs(Wn - X.T)) < 1e-13


@pytest.mark.parametrize("kind", ["packed", "dense", "streaming", "mesh",
                                  "pallas", "streaming_pallas"])
def test_gram_ff_vs_f64_oracle(packed_problem, rng, kind):
    packed, mean, sd, X, n = packed_problem
    U = rng.standard_normal((n, 4)).astype(np.float32)
    if kind == "dense":
        Xf = X.astype(np.float32)
        op = DenseOperator(Xf, dtype=jnp.float32)
        ref = Xf.astype(np.float64) @ (Xf.astype(np.float64).T @ U)
    else:
        if kind == "packed":
            op = PackedOperator(packed, mean, sd, n, dtype=jnp.float32)
        elif kind == "streaming":
            op = StreamingPackedOperator(
                packed, mean, sd, n, block_snps=128, dtype=jnp.float32)
        elif kind == "pallas":
            # the fused compensated kernels, run interpreted on CPU
            op = PackedOperator(packed, mean, sd, n, dtype=jnp.float32,
                                use_pallas="interpret")
        elif kind == "streaming_pallas":
            op = StreamingPackedOperator(
                packed, mean, sd, n, block_snps=1024, dtype=jnp.float32,
                use_pallas="interpret")
        else:
            mesh = Mesh(np.array(jax.devices()[:4]), ("snps",))
            op = PackedOperator(packed, mean, sd, n, dtype=jnp.float32,
                                mesh=mesh)
        ref = X @ (X.T @ U.astype(np.float64))
    got = _to64(op.perform_op_ff(U))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 5e-6, rel
    # and the pair's hi part alone agrees with the plain product
    plain = np.asarray(op.perform_op(U), np.float64)
    assert np.linalg.norm(plain - ref) / np.linalg.norm(ref) < 5e-5


def test_ritz_and_residual_ff(packed_problem, rng):
    packed, mean, sd, X, n = packed_problem
    op = PackedOperator(packed, mean, sd, n, dtype=jnp.float32)
    U = np.linalg.qr(rng.standard_normal((n, 3)))[0].astype(np.float32)
    hi, lo = op.perform_op_ff(U)
    G = ritz_ff(jnp.asarray(U), hi, lo)
    ref_G = U.astype(np.float64).T @ (X @ (X.T @ U.astype(np.float64)))
    assert np.max(np.abs(G - ref_G)) / np.max(np.abs(ref_G)) < 1e-5

    dd = np.diag(ref_G).copy()
    err = residual_sums_ff(hi, lo, jnp.asarray(U), dd)
    Y = X @ (X.T @ U.astype(np.float64))
    ref_err = ((Y - U.astype(np.float64) * dd[None, :]) ** 2).sum(axis=0)
    # a random U is no eigenvector, so the residual is O(A): the ff
    # measurement tracks the f64 value to ~eps RELATIVE (the exactness
    # tests for near-cancelling residuals are the check() tests below)
    assert np.max(np.abs(err - ref_err)) / np.max(ref_err) < 5e-7


def test_split_f64_roundtrip():
    x = np.array([1.0 + 2.0 ** -40, -3.7e5, 0.0, 2e-8], np.float64)
    hi, lo = split_f64(x)
    assert np.max(np.abs(hi.astype(np.float64) + lo.astype(np.float64) - x)) \
        <= np.max(np.abs(x)) * 2.0 ** -48


def test_check_compensated_matches_f32_on_cpu(packed_problem):
    packed, mean, sd, X, n = packed_problem
    op = PackedOperator(packed, mean, sd, n, dtype=jnp.float32)
    res = fp.pca(op, 4, tol=1e-7)
    c_ff = fp.check(op, res.vectors, res.values)               # auto -> ff
    c_32 = fp.check(op, res.vectors, res.values, precision="f32")
    assert c_ff.mse < 1e-10
    # CPU matmuls accumulate tree-like, so both measurements sit at the
    # same floor; the ff path must not be WORSE
    assert c_ff.mse < 10 * max(c_32.mse, 1e-16)


def test_check_precision_kwarg_validation(packed_problem):
    packed, mean, sd, X, n = packed_problem
    op64 = PackedOperator(packed, mean, sd, n, dtype=jnp.float64)
    res = fp.pca(op64, 3, tol=1e-9)
    with pytest.raises(ValueError, match="compensated"):
        fp.check(op64, res.vectors, res.values, precision="compensated")
    with pytest.raises(ValueError, match="unknown precision"):
        fp.check(op64, res.vectors, res.values, precision="f16")


def test_pca_ff_polish_values_match_oracle(packed_problem):
    packed, mean, sd, X, n = packed_problem
    p = X.shape[1]
    op = PackedOperator(packed, mean, sd, n, dtype=jnp.float32)
    res = fp.pca(op, 6, tol=1e-7)
    lam = np.linalg.eigvalsh(X @ X.T / p)[::-1][:6]
    # eigenvalues from the ff final Rayleigh-Ritz: accuracy limited only
    # by the f32 rounding of X itself (~eps), not by accumulation noise
    assert np.max(np.abs(res.values - lam) / lam) < 3e-6


@pytest.mark.parametrize("meshed", [False, True])
def test_tall_gram_ff_vs_f64_oracle(packed_problem, rng, meshed):
    """Tall (X^T X) compensated gram through the interpreted Pallas
    kernels, single-device and sample(byte)-sharded."""
    from flashpca_tpu.ops.operator import TallPackedOperator

    packed, mean, sd, X, n = packed_problem
    mesh = (Mesh(np.array(jax.devices()[:2]), ("samples",))
            if meshed else None)
    op = TallPackedOperator(packed, mean, sd, n, dtype=jnp.float32,
                            use_pallas="interpret", mesh=mesh)
    assert op.supports_ff
    p = X.shape[1]
    V = rng.standard_normal((p, 3)).astype(np.float32)
    Vp = op.permute(jnp.asarray(V))
    hi, lo = op.gram_ff_permuted(Vp)
    got = _to64((hi[:p], lo[:p]))
    ref = X.T @ (X @ V.astype(np.float64))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 5e-6, rel


def test_tall_pca_ff_polish(packed_problem):
    """Tall-path pca() with the ff polish: eigenvalues match the f64
    oracle (same spectrum as the wide gram)."""
    from flashpca_tpu.ops.operator import TallPackedOperator

    packed, mean, sd, X, n = packed_problem
    p = X.shape[1]
    op = TallPackedOperator(packed, mean, sd, n, dtype=jnp.float32,
                            use_pallas="interpret")
    res = fp.pca(op, 4, tol=1e-6)
    lam = np.linalg.eigvalsh(X.T @ X / p)[::-1][:4]
    assert np.max(np.abs(res.values - lam) / lam) < 3e-6


def test_ritz_whitened_singular_metric():
    """The generalized Rayleigh-Ritz fallback must respect the metric M
    when scipy's Cholesky path fails: with a DUPLICATED basis column,
    plain eigh(H) would report 2*lambda and denormalized vectors; the
    M-whitened fallback recovers the true Rayleigh quotients (review
    r3).  (_ritz_whitened is tested directly: whether scipy's potrf
    trips on a float-singular M is roundoff luck.)"""
    from flashpca_tpu.solvers.block_lanczos import _ritz_whitened

    rng = np.random.default_rng(3)
    n, k = 40, 4
    A = rng.normal(size=(n, n))
    A = A @ A.T
    lam_true, Q = np.linalg.eigh(A)
    # basis: top-k eigenvectors with the LAST column duplicated
    B = np.concatenate([Q[:, -k:], Q[:, -1:]], axis=1)
    H = B.T @ A @ B
    M = B.T @ B                                  # singular (rank k)
    theta, S = _ritz_whitened(H, M)
    top = np.sort(theta)[::-1][:k]
    np.testing.assert_allclose(np.sort(top), lam_true[-k:], rtol=1e-10)
    # B @ S columns are unit-norm on the kept subspace (S^T M S = I)
    U = B @ S
    np.testing.assert_allclose(
        np.linalg.norm(U, axis=0), np.ones(S.shape[1]), rtol=1e-8)

    # the duplicated direction must NOT double its eigenvalue (the
    # plain-eigh(H) bug this fallback replaces): every theta is a
    # true Rayleigh quotient, bounded by lam_max
    assert theta.max() <= lam_true[-1] * (1 + 1e-10)


def test_pca_polish_knob(packed_problem):
    """polish="fast" (VERDICT r3 item 2) skips the buffer pairs and the
    compensated refinement: fewer data passes, f32-floor accuracy;
    polish="contract" (default) keeps the contract-grade result."""
    packed, mean, sd, X, n = packed_problem
    p = X.shape[1]
    op = PackedOperator(packed, mean, sd, n, dtype=jnp.float32)
    fast = fp.pca(op, 6, tol=1e-6, polish="fast")
    op2 = PackedOperator(packed, mean, sd, n, dtype=jnp.float32)
    contract = fp.pca(op2, 6, tol=1e-6)
    # the fast path solves nev=6 with no buffer pairs and drives the
    # solver to the full tol instead of 1e-4 -- on this small spectrum
    # that may COST passes, so compare accuracy, not n_ops (the ~2x
    # pass saving is a property of the biobank-scale basis rule,
    # measured in docs/PERFORMANCE.md)
    lam = np.linalg.eigvalsh(X @ X.T / p)[::-1][:6]
    assert np.max(np.abs(contract.values - lam) / lam) < 3e-6
    # fast floors at plain-f32 accumulation noise: looser but sound
    assert np.max(np.abs(fast.values - lam) / lam) < 1e-4
    # sign-aligned subspace agreement between the two modes
    C = np.abs(fast.vectors.T @ contract.vectors)
    assert np.min(np.diag(C)) > 1 - 1e-4

    with pytest.raises(ValueError, match="polish"):
        fp.pca(op, 4, polish="best")


def test_pca_polish_fast_tall(packed_problem):
    """The knob gates the tall path's ff refinement identically."""
    from flashpca_tpu.ops.operator import TallPackedOperator

    packed, mean, sd, X, n = packed_problem
    p = X.shape[1]
    op = TallPackedOperator(packed, mean, sd, n, dtype=jnp.float32,
                            use_pallas="interpret")
    res = fp.pca(op, 4, tol=1e-6, polish="fast")
    lam = np.linalg.eigvalsh(X.T @ X / p)[::-1][:4]
    assert np.max(np.abs(res.values - lam) / lam) < 1e-4


def test_twoprod_exact_in_f64_too():
    """The Dekker split constant is dtype-selected: the f32 constant on
    f64 inputs quietly broke the 'e exact' contract (review r4)."""
    from flashpca_tpu.ops.compensated import twoprod, twosum

    rng = np.random.default_rng(0)
    for dt in (jnp.float32, jnp.float64):
        a = jnp.asarray(rng.uniform(0.1, 1e3, 256), dt)
        b = jnp.asarray(rng.uniform(0.1, 1e3, 256), dt)
        p, e = twoprod(a, b)
        exact = (np.asarray(a, np.float64).astype(np.longdouble)
                 * np.asarray(b, np.float64).astype(np.longdouble))
        got = (np.asarray(p, np.float64).astype(np.longdouble)
               + np.asarray(e, np.float64).astype(np.longdouble))
        np.testing.assert_array_equal(np.asarray(got, np.float64),
                                      np.asarray(exact, np.float64))
        s, se = twosum(a, b)
        np.testing.assert_array_equal(
            np.asarray(s, np.float64) + np.asarray(se, np.float64),
            np.asarray(a, np.float64) + np.asarray(b, np.float64))
