"""Compensated (two-float) products for f64-grade verification on f32 TPUs.

The reference computes its accuracy check in float64 end to end
(randompca.cpp:684-697) and promises ``mse < 1e-8`` (README.md:207).  A
TPU has no fast f64, and a plain f32 gram product carries ~1e3*eps
relative noise from accumulating ~1e5-long contractions through the
MXU's f32 partial sums -- at d_max ~ 2e3 that noise alone is ~2e-8 mse,
above the contract, regardless of how good the eigenpairs actually are.

This module removes the measurement (and final-rotation) noise with
classic error-free transformations, vectorized for the VPU:

* ``twosum``  : Knuth branch-free TwoSum -- a + b as (sum, exact error).
* ``twoprod`` : Dekker split product -- a * b as (prod, exact error)
  without an FMA (TPU VPU has none exposed through XLA).
* genotype values enter as an EXACT two-float split of the float64
  standardized value: per SNP a (4,) lookup over the 2-bit code
  (the reference's ``scaled_geno_lookup``, data.cpp:316-320) split into
  f32 (hi, lo) pairs with hi + lo == f64 value to ~2^-49 relative.
* long contractions are chunked; chunk partials are ordinary f32
  HIGHEST matmuls (MXU) whose results are combined with TwoSum, so the
  accumulated error stays ~eps of the FINAL value instead of growing
  with the contraction length.

The hot solve path stays pure f32 (Pallas kernels); these routines run
ONCE per solve -- the final Rayleigh-Ritz rotation in polish_subspace
and the residual measurement in models.check.

Everything here is pure jnp (traced, shard_map-friendly); big operands
are passed as explicit arguments, never closures (CLAUDE.md rule 1).
"""

from __future__ import annotations

import os as _os

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..io.plink import CODE_TO_DOSAGE, PACK_DENSITY
from .standardize import _inv_sd

_HP = lax.Precision.HIGHEST

# Dekker split constants: 2^ceil(t/2) + 1 splits a t-bit significand
# into halves whose pairwise products are exact -- 2^12+1 for f32
# (t=24), 2^27+1 for f64 (t=53).  Using the f32 constant on f64 inputs
# would silently break the 'e exact' contract (review r4).
_SPLIT32 = np.float32(4097.0)
_SPLIT64 = np.float64(134217729.0)


# ---------------------------------------------------------------------------
# Error-free transformations (elementwise, array-valued)
# ---------------------------------------------------------------------------

def twosum(a, b):
    """Knuth TwoSum: s = fl(a+b), e exact with a + b == s + e.

    kernels/packed_matvec._twosum is the in-kernel copy and MUST stay
    identical (import would cycle; see the note there)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _split(a):
    const = _SPLIT64 if jnp.dtype(a.dtype) == jnp.dtype(jnp.float64) \
        else _SPLIT32
    c = a * jnp.asarray(const, a.dtype)
    hi = c - (c - a)
    return hi, a - hi


def twoprod(a, b):
    """Dekker TwoProd: p = fl(a*b), e exact with a * b == p + e."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def sum_ff(parts):
    """Compensated reduction of ``parts`` (C, ...) over axis 0:
    returns (hi, lo) with hi + lo ~= exact sum.  Pairwise TwoSum tree
    (log2(C) fully-vectorized levels -- a sequential C-step scan of
    tiny elementwise ops costs dispatch, not math, on TPU); each
    level's exact errors accumulate into lo with a plain add (they are
    eps-sized relative to the partials, so their own rounding is
    ~eps^2 of the result)."""
    err = jnp.zeros(parts.shape[1:], parts.dtype)
    if parts.shape[0] == 0:      # empty contraction sums to exact zero
        return err, err
    while parts.shape[0] > 1:
        c = parts.shape[0]
        if c % 2:
            parts = jnp.concatenate(
                [parts, jnp.zeros((1,) + parts.shape[1:], parts.dtype)])
        s, e = twosum(parts[0::2], parts[1::2])
        err = err + jnp.sum(e, axis=0)
        parts = s
    return parts[0], err


def split_f64(x):
    """Host split of float64 values into f32 (hi, lo) with
    hi + lo == x to ~2^-49 relative."""
    x = np.asarray(x, dtype=np.float64)
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


# read ONCE at import: these feed jitted programs, which bind the value
# at trace time anyway -- a mid-session env change would silently apply
# to some call shapes and not others (review r4)
_FF_CHUNK = int(_os.environ.get("FLASHPCA_FF_CHUNK", "2048"))


def default_chunk() -> int:
    """Contraction chunk length for the compensated matmuls.  Within a
    chunk the f32 partial accumulates uncompensated, so the chunk sets
    the error floor (~a few eps at 2048); across chunks TwoSum is
    exact.  FLASHPCA_FF_CHUNK is read once at import (set it before
    importing flashpca_tpu)."""
    return _FF_CHUNK


def _pad_axis(A, axis: int, mult: int):
    """Zero-pad ``axis`` to a multiple of ``mult`` (zeros are exact
    no-ops for every contraction here)."""
    pad = (-A.shape[axis]) % mult
    if not pad:
        return A
    widths = [(0, 0)] * A.ndim
    widths[axis] = (0, pad)
    return jnp.pad(A, widths)


# ---------------------------------------------------------------------------
# Chunk-compensated matmuls
# ---------------------------------------------------------------------------

def matdot_ff(A, B, *, chunk: int | None = None):
    """(hi, lo) of A^T B, contraction over the (long) leading axis
    split into ``chunk``-sized pieces whose f32 partials combine with
    TwoSum.  Any length: the axis is zero-padded to a chunk multiple."""
    chunk = chunk or default_chunk()
    A = _pad_axis(A, 0, chunk)
    B = _pad_axis(B, 0, chunk)
    n, ka = A.shape
    kb = B.shape[1]
    C = n // chunk
    Ar = A.reshape(C, chunk, ka)
    Br = B.reshape(C, chunk, kb)
    parts = jnp.einsum("cna,cnb->cab", Ar, Br, precision=_HP)
    return sum_ff(parts)


def rowdot_ff(W, X2, *, chunk: int | None = None):
    """(hi, lo) of W @ X2 for W (m, n), X2 (n, k): the contraction
    axis n is chunked (zero-padded to a chunk multiple), partials
    TwoSum-combined."""
    chunk = chunk or default_chunk()
    W = _pad_axis(W, 1, chunk)
    X2 = _pad_axis(X2, 0, chunk)
    m, n = W.shape
    k = X2.shape[1]
    C = n // chunk
    Wr = W.reshape(m, C, chunk)
    Xr = X2.reshape(C, chunk, k)
    parts = jnp.einsum("mcn,cnk->cmk", Wr, Xr, precision=_HP)
    return sum_ff(parts)


# ---------------------------------------------------------------------------
# Exact two-float genotype lookup tables
# ---------------------------------------------------------------------------

def code_value_luts(mean, sd, p_pad: int | None = None):
    """(p_pad, 4) f32 hi/lo tables of the EXACT float64 standardized
    value per 2-bit code: value[c] = (dosage_c - mean) / sd for
    non-missing codes, 0 for the NA code and for sd <= VAR_TOL columns
    (scaled_geno_lookup semantics, data.cpp:299-320).  Rows past the
    true SNP count are zero (inert padding)."""
    mean = np.asarray(mean, dtype=np.float64)
    sd = np.asarray(sd, dtype=np.float64)
    inv = _inv_sd(sd)
    mean = np.where(inv > 0.0, mean, 0.0)
    p = mean.shape[0]
    vals = (CODE_TO_DOSAGE[None, :] - mean[:, None]) * inv[:, None]
    vals[:, 1] = 0.0  # NA code
    if p_pad is None:
        p_pad = p
    out = np.zeros((p_pad, 4), dtype=np.float64)
    out[:p] = vals
    return split_f64(out)


def decode_lut(packed, lut, dtype=jnp.float32):
    """Packed (m, nbytes) uint8 -> (m, n4) floats in permuted sample
    order via an EXACT per-code lookup (no arithmetic on the table
    values, so eps-level lo tables survive the decode bit-for-bit)."""
    segs = []
    l0, l1, l2, l3 = (lut[:, c].astype(dtype)[:, None] for c in range(4))
    for s in range(PACK_DENSITY):
        c = (packed >> np.uint8(2 * s)) & np.uint8(3)
        v = jnp.where(c == 0, l0,
                      jnp.where(c == 1, l1,
                                jnp.where(c == 2, l2, l3)))
        segs.append(v)
    return jnp.concatenate(segs, axis=1)


# ---------------------------------------------------------------------------
# Compensated gram product (wide operator, permuted space)
# ---------------------------------------------------------------------------

def gram_ff_block(packed, lut_hi, lut_lo, xp, carry, *, chunk: int | None = None):
    """One SNP block of y += W W^T xp in two-float arithmetic.

    ``carry`` is the (y_hi, y_err) pair; returns the updated pair.
    W = W_hi + W_lo is the exact standardized block (decode_lut)."""
    y_hi, y_err = carry
    Wh = decode_lut(packed, lut_hi, xp.dtype)
    Wl = decode_lut(packed, lut_lo, xp.dtype)
    # stage 1: z = W xp, contraction over samples (the long axis)
    zh, zl = rowdot_ff(Wh, xp, chunk=chunk)
    zl = zl + jnp.dot(Wl, xp, precision=_HP)   # eps-level correction
    # stage 2: t = W^T z, contraction over this block's SNPs (short)
    t = jnp.dot(Wh.T, zh, precision=_HP)
    y_hi, e = twosum(y_hi, t)
    y_err = (y_err + e
             + jnp.dot(Wh.T, zl, precision=_HP)
             + jnp.dot(Wl.T, zh, precision=_HP))
    return y_hi, y_err


def gram_ff_p(packed, lut_hi, lut_lo, xp, *, block_size: int,
              chunk: int | None = None):
    """(y_hi, y_lo) of W W^T xp over all SNP blocks (permuted space).
    Caller masks byte-padding positions on input and output."""
    nb = packed.shape[0] // block_size

    def at_block(i, carry):
        s = i * block_size
        pb = lax.dynamic_slice_in_dim(packed, s, block_size, axis=0)
        lh = lax.dynamic_slice_in_dim(lut_hi, s, block_size, axis=0)
        ll = lax.dynamic_slice_in_dim(lut_lo, s, block_size, axis=0)
        return gram_ff_block(pb, lh, ll, xp, carry, chunk=chunk)

    # twosum with a zero carry is exact, so the whole loop starts at
    # 0 -- a manually unrolled first block would double the traced
    # body (the heaviest part of this fallback) for no numeric gain
    carry = (jnp.zeros_like(xp), jnp.zeros_like(xp))
    if nb == 1:
        return at_block(0, carry)
    return lax.fori_loop(0, nb, at_block, carry)


# ---------------------------------------------------------------------------
# Compensated Rayleigh-Ritz / residual reductions
# ---------------------------------------------------------------------------

@jax.jit
def _ritz_ff_jit(U, y_hi, y_lo):
    g_hi, g_lo = matdot_ff(U, y_hi)
    g_lo = g_lo + jnp.dot(U.T, y_lo, precision=_HP)
    # ONE stacked output: separate hi/lo fetches each pay the remote
    # link's per-transfer floor (CLAUDE.md rule 2, review r4)
    return jnp.stack([g_hi, g_lo])


def ritz_ff(U, y_hi, y_lo):
    """float64 host Gram G = U^T (A U) from a two-float product pair,
    with the long reduction chunk-compensated (a plain f32 U^T y at
    N ~ 5e5 re-adds the very noise the ff product removed)."""
    g = np.asarray(_ritz_ff_jit(U, y_hi, y_lo), dtype=np.float64)
    return g[0] + g[1]


@jax.jit
def _residual_jit(y_hi, y_lo, U, dd_hi, dd_lo):
    # r = (y_hi + y_lo) - U * dd, all cancellation error captured
    p, pe = twoprod(U, dd_hi[None, :])
    s, se = twosum(y_hi, -p)
    r = s + (y_lo - pe - U * dd_lo[None, :] + se)
    chunk = default_chunk()
    r = _pad_axis(r, 0, chunk)
    n, k = r.shape
    parts = (r * r).reshape(n // chunk, chunk, k).sum(axis=1)
    e_hi, e_lo = sum_ff(parts)
    return e_hi + e_lo


def residual_sums_ff(y_hi, y_lo, U, dd):
    """(K,) per-component sums of squared residual
    ``(A U)_ik - U_ik * dd_k`` with the subtraction in two-float
    arithmetic (dd = eigenvalue * divisor, float64, split on host).
    Returns float64 host values."""
    dd_hi, dd_lo = split_f64(dd)
    out = _residual_jit(y_hi, y_lo, U,
                        jnp.asarray(dd_hi), jnp.asarray(dd_lo))
    return np.asarray(out, dtype=np.float64)


@jax.jit
def _gram_small_ff_jit(B):
    # ONE stacked output (see _ritz_ff_jit)
    return jnp.stack(matdot_ff(B, B))


def gram_small_ff(B):
    """float64 host Gram M = B^T B with the long reduction
    chunk-compensated (the metric matrix for the generalized
    Rayleigh-Ritz in polish_subspace)."""
    m = np.asarray(_gram_small_ff_jit(B), dtype=np.float64)
    M = m[0] + m[1]
    return 0.5 * (M + M.T)


# ---------------------------------------------------------------------------
# Dense-matrix compensated gram (DenseOperator / matrix API)
# ---------------------------------------------------------------------------

@jax.jit
def dense_gram_ff(X, x2):
    """(hi, lo) of X X^T x2 for a resident dense f32 X (N, p): both
    contractions chunk-compensated.  Here the 'exact' matrix IS the f32
    X (the DenseOperator's own data)."""
    zh, zl = matdot_ff(X, x2)                  # z = X^T x
    yh, yl = rowdot_ff(X, zh)                  # y = X z
    yl = yl + jnp.dot(X, zl, precision=_HP)
    return yh, yl
