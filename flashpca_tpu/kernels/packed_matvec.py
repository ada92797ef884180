"""Pallas TPU kernels: fused 2-bit decode -> standardize -> matvec.

The genotype matrix X (N samples x p SNPs) lives in HBM as raw PLINK
packed bytes, SNP-major ``(p_pad, nbytes_pad)`` uint8 -- 16x smaller
than f32.  These kernels decode tiles of it to standardized float32
inside VMEM and contract them on the MXU immediately, so the decoded
matrix never touches HBM.  Per product the HBM traffic is just the
packed bytes (+ small vectors), vs ~16x more for a decode-then-GEMM
pipeline (reference analog: the fused read-decode-GEMV block loop of
SVDWideOnline::perform_op, svdwide.cpp:48-62).

Layout
------
Permuted sample space (see ops/genotypes.py): position ``s*nbytes_pad+b``
holds original sample ``4b+s``, so bit-plane ``s`` of byte column ``b``
lines up with a contiguous segment.  Kernels work on transposed
small operands so the long dimension is always the 128-lane axis:

* ``xt``: (4, k8, nbytes_pad)  -- permuted vectors, plane-major
* ``zt``: (k8, p_pad)          -- SNP-space products
* k8 = k padded to a multiple of 8 (f32 sublane tile)

Tiles: TILE_P x TILE_NB packed bytes decode to four (TILE_P, TILE_NB)
f32 plane tiles (one per 2-bit plane) entirely in registers/VMEM.

Decode per plane s: ``c = (byte >> 2s) & 3``; dosage = ``(4-c) >> 1``
(maps 0->2, 2->1, 3->0); missing (c==1) contributes 0; standardized
value = ``(dosage - mean) * inv_sd * (c != 1)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_P = 512      # SNP rows per tile (measured best vs 256 on v5e)
LANE = 128        # TPU lane width; byte-tile sizes are multiples of this


def _decode_plane(packed_i32, s, a0, a1, a2, a3):
    """(TILE_P, TILE_NB) int32-widened bytes -> standardized f32 for
    2-bit plane s, via the per-SNP cubic through the 4 code values.

    value(c) for c = 0,1,2,3 must be (2-m)*i, 0, (1-m)*i, (0-m)*i --
    the reference's scaled_geno_lookup (data.cpp:316-320).  A cubic
    a0 + t(a1 + t(a2 + t a3)) hits all four exactly and costs 3 FMAs
    + 1 convert + 2 bit ops per genotype, vs ~10 VPU ops for the
    shift/mask/select chain (the kernels are VPU-decode-bound).
    Mosaic legalizes shifts on i32 vectors, not i8, hence the widen.
    """
    t = ((packed_i32 >> (2 * s)) & 3).astype(jnp.float32)
    return a0 + t * (a1 + t * (a2 + t * a3))


def _coeff_rows(mean, invsd):
    """Per-SNP cubic coefficients (4 x (1, p_pad) f32) from mean/inv_sd.

    Interpolates y(0)=(2-m)i, y(1)=0, y(2)=(1-m)i, y(3)=-m*i:
    a1 = (-11 y0 - 9 y2 + 2 y3)/6, a2 = (2 y0 + 4 y2 - y3)/2,
    a3 = (-y0 - 3 y2 + y3)/6 (standard 4-point Vandermonde solve).
    Computed in float64 so the f32 coefficients are correctly rounded.
    """
    m = mean.astype(jnp.float64)
    i = invsd.astype(jnp.float64)
    y0 = (2.0 - m) * i
    y2 = (1.0 - m) * i
    y3 = -m * i
    a0 = y0
    a1 = (-11.0 * y0 - 9.0 * y2 + 2.0 * y3) / 6.0
    a2 = (2.0 * y0 + 4.0 * y2 - y3) / 2.0
    a3 = (-y0 - 3.0 * y2 + y3) / 6.0
    return tuple(a.astype(jnp.float32)[None, :] for a in (a0, a1, a2, a3))


def _cols(ref):
    """(1, TILE_P) coefficient row -> (TILE_P, 1) broadcast column."""
    return ref[0, :][:, None]


def _crossprod_kernel(packed_ref, a0_ref, a1_ref, a2_ref, a3_ref,
                      xt_ref, zt_ref):
    """zt[k8, TILE_P] += sum_s xt[s] @ W_s^T, accumulated over byte tiles."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        zt_ref[:] = jnp.zeros_like(zt_ref)

    packed = packed_ref[:].astype(jnp.int32)     # (TILE_P, TILE_NB)
    a0, a1, a2, a3 = (_cols(a0_ref), _cols(a1_ref),
                      _cols(a2_ref), _cols(a3_ref))
    acc = zt_ref[:]
    for s in range(4):
        w = _decode_plane(packed, s, a0, a1, a2, a3)      # (TILE_P, TILE_NB)
        x_s = xt_ref[s]                                   # (k8, TILE_NB)
        acc = acc + jax.lax.dot_general(
            x_s, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    zt_ref[:] = acc


def _matvec_kernel(packed_ref, a0_ref, a1_ref, a2_ref, a3_ref,
                   vt_ref, yt_ref):
    """yt[s, k8, TILE_NB] += vt @ W_s, accumulated over SNP tiles."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        yt_ref[:] = jnp.zeros_like(yt_ref)

    packed = packed_ref[:].astype(jnp.int32)     # (TILE_P, TILE_NB)
    a0, a1, a2, a3 = (_cols(a0_ref), _cols(a1_ref),
                      _cols(a2_ref), _cols(a3_ref))
    vt = vt_ref[:]                               # (k8, TILE_P)
    for s in range(4):
        w = _decode_plane(packed, s, a0, a1, a2, a3)      # (TILE_P, TILE_NB)
        yt_ref[s] += jax.lax.dot_general(
            vt, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )


def _tile_nb(nbytes_pad: int) -> int:
    for cand in (512, 256, 128):
        if nbytes_pad % cand == 0:
            return cand
    raise ValueError(f"nbytes_pad={nbytes_pad} not a multiple of 128")


def _pad_k(x2, k8):
    k = x2.shape[1]
    return x2 if k == k8 else jnp.pad(x2, ((0, 0), (0, k8 - k)))


def _to_planes(x2, nbytes_pad, k8):
    """(n4, k) permuted -> (4, k8, nbytes_pad)."""
    xt = _pad_k(x2, k8).T                        # (k8, n4)
    return xt.reshape(k8, 4, nbytes_pad).transpose(1, 0, 2)


def _from_planes(yt, k):
    """(4, k8, nbytes_pad) -> (n4, k)."""
    k8, nbp = yt.shape[1], yt.shape[2]
    return yt.transpose(1, 0, 2).reshape(k8, 4 * nbp).T[:, :k]


def crossprod_planes(packed, coeffs, xt, *, interpret=False):
    """zt = [x^T W^T]: (4, k8, nbytes_pad) -> (k8, p_pad).

    packed: (p_pad, nbytes_pad) u8; coeffs: 4 x (1, p_pad) f32 rows.
    """
    p_pad, nbp = packed.shape
    k8 = xt.shape[1]
    tile_nb = _tile_nb(nbp)
    grid = (p_pad // TILE_P, nbp // tile_nb)
    row_spec = pl.BlockSpec((1, TILE_P), lambda i, j: (0, i),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _crossprod_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_P, tile_nb), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            row_spec, row_spec, row_spec, row_spec,
            pl.BlockSpec((4, k8, tile_nb), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k8, TILE_P), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k8, p_pad), jnp.float32),
        interpret=interpret,
    )(packed, *coeffs, xt)


def matvec_planes(packed, coeffs, vt, *, interpret=False):
    """yt = W^T v in plane layout: (k8, p_pad) -> (4, k8, nbytes_pad)."""
    p_pad, nbp = packed.shape
    k8 = vt.shape[0]
    tile_nb = _tile_nb(nbp)
    grid = (nbp // tile_nb, p_pad // TILE_P)
    row_spec = pl.BlockSpec((1, TILE_P), lambda j, i: (0, i),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _matvec_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_P, tile_nb), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            row_spec, row_spec, row_spec, row_spec,
            pl.BlockSpec((k8, TILE_P), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, k8, tile_nb), lambda j, i: (0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, k8, nbp), jnp.float32),
        interpret=interpret,
    )(packed, *coeffs, vt)


# ---------------------------------------------------------------------------
# Permuted-space wrappers matching ops/operator.py's functional signatures
# ---------------------------------------------------------------------------

def _round_k(k: int) -> int:
    return max(8, ((k + 7) // 8) * 8)


def crossprod_p(packed, mean, invsd, xp, *, interpret=False):
    """z = W xp: (n4, k) -> (p_pad, k)."""
    p_pad, nbp = packed.shape
    k = xp.shape[1]
    k8 = _round_k(k)
    xt = _to_planes(xp.astype(jnp.float32), nbp, k8)
    zt = crossprod_planes(packed, _coeff_rows(mean, invsd), xt,
                          interpret=interpret)
    return zt.T[:, :k]


def matvec_p(packed, mean, invsd, v, *, interpret=False):
    """y = W^T v: (p_pad, k) -> (n4, k)."""
    k = v.shape[1]
    k8 = _round_k(k)
    vt = _pad_k(v.astype(jnp.float32), k8).T      # (k8, p_pad)
    yt = matvec_planes(packed, _coeff_rows(mean, invsd), vt,
                       interpret=interpret)
    return _from_planes(yt, k)


def gram_matvec_p(packed, mean, invsd, xp, *, interpret=False):
    """yp = W^T (W xp): (n4, k) -> (n4, k).  Two fused passes over the
    packed bytes; the standardized matrix never exists in HBM."""
    p_pad, nbp = packed.shape
    k = xp.shape[1]
    k8 = _round_k(k)
    coeffs = _coeff_rows(mean, invsd)
    xt = _to_planes(xp.astype(jnp.float32), nbp, k8)
    zt = crossprod_planes(packed, coeffs, xt, interpret=interpret)
    yt = matvec_planes(packed, coeffs, zt, interpret=interpret)
    return _from_planes(yt, k)
