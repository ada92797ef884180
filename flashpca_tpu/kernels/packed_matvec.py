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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_P = 512      # SNP rows per tile (measured best vs 256 on v5e)
LANE = 128        # TPU lane width; byte-tile sizes are multiples of this


def _decode_plane(packed_i32, s, b0, b1, b2):
    """(TILE_P, TILE_NB) int32-widened bytes -> standardized f32 for
    2-bit plane s, via a per-SNP cubic through the 4 code values.

    value(c) for c = 0,1,2,3 must be (2-m)*i, 0, (1-m)*i, (0-m)*i --
    the reference's scaled_geno_lookup (data.cpp:316-320).  The cubic
    is kept in FACTORED form (t-1)(b0 + t(b1 + t b2)): code 1 is the
    missing genotype, and (t-1) == 0.0 is exact in f32, so missing
    decodes to EXACTLY zero regardless of coefficient rounding (the
    unfactored a0+t(a1+t(a2+t a3)) leaves missing an O(eps_f32 * i)
    residue when the coefficients are computed without float64, which
    is the case on real TPUs -- ADVICE r1).  Costs 4 VPU FMAs/muls +
    1 convert + 2 bit ops per genotype, vs ~10 for a shift/mask/select
    chain (the kernels are VPU-decode-bound).  Mosaic legalizes shifts
    on i32 vectors, not i8, hence the widen.
    """
    t = ((packed_i32 >> (2 * s)) & 3).astype(jnp.float32)
    return (t - 1.0) * (b0 + t * (b1 + t * b2))


def _coeff_rows(mean, invsd):
    """Per-SNP factored-cubic coefficients (3 x (1, p_pad) f32).

    (t-1)(b0 + b1 t + b2 t^2) interpolates y(0)=(2-m)i, y(1)=0,
    y(2)=(1-m)i, y(3)=-m*i with b0 = (m-2)i, b1 = (19-12m)i/6,
    b2 = (3m-5)i/6 (3-point Vandermonde solve of the quadratic factor;
    the root at t=1 is structural, not numerical).
    """
    m = mean.astype(jnp.float32)
    i = invsd.astype(jnp.float32)
    b0 = (m - 2.0) * i
    b1 = (19.0 - 12.0 * m) * i * (1.0 / 6.0)
    b2 = (3.0 * m - 5.0) * i * (1.0 / 6.0)
    return tuple(a[None, :] for a in (b0, b1, b2))


def _cols(ref):
    """(1, TILE_P) coefficient row -> (TILE_P, 1) broadcast column."""
    return ref[0, :][:, None]


def _crossprod_kernel(packed_ref, b0_ref, b1_ref, b2_ref,
                      xt_ref, zt_ref, ze_ref):
    """zt[k8, TILE_P] += sum_s xt[s] @ W_s^T, accumulated over byte
    tiles with TwoSum compensation (``ze`` scratch carries the exact
    accumulation errors; folded into zt on the last tile).

    Plain f32 accumulation across the ~1e3 grid steps of a biobank
    product costs ~1e3*eps relative noise -- the single error source
    that kept the solver's converged pairs (and the --check contract)
    pinned at mse ~2e-8; compensation is ~8 VPU ops per step on a
    small accumulator tile, unmeasurable next to the decode."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        zt_ref[:] = jnp.zeros_like(zt_ref)
        ze_ref[:] = jnp.zeros_like(ze_ref)

    packed = packed_ref[:].astype(jnp.int32)     # (TILE_P, TILE_NB)
    b0, b1, b2 = _cols(b0_ref), _cols(b1_ref), _cols(b2_ref)
    t = jnp.zeros_like(zt_ref)
    for s in range(4):
        w = _decode_plane(packed, s, b0, b1, b2)          # (TILE_P, TILE_NB)
        x_s = xt_ref[s]                                   # (k8, TILE_NB)
        t = t + jax.lax.dot_general(
            x_s, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    s_, e_ = _twosum(zt_ref[:], t)
    zt_ref[:] = s_
    ze_ref[:] = ze_ref[:] + e_

    @pl.when(j == nj - 1)
    def _():
        zt_ref[:] = zt_ref[:] + ze_ref[:]


def _matvec_kernel(packed_ref, b0_ref, b1_ref, b2_ref,
                   vt_ref, yt_ref, ye_ref):
    """yt[s, k8, TILE_NB] += vt @ W_s, accumulated over SNP tiles with
    TwoSum compensation (see _crossprod_kernel)."""
    i = pl.program_id(1)
    ni = pl.num_programs(1)

    @pl.when(i == 0)
    def _():
        yt_ref[:] = jnp.zeros_like(yt_ref)
        ye_ref[:] = jnp.zeros_like(ye_ref)

    packed = packed_ref[:].astype(jnp.int32)     # (TILE_P, TILE_NB)
    b0, b1, b2 = _cols(b0_ref), _cols(b1_ref), _cols(b2_ref)
    vt = vt_ref[:]                               # (k8, TILE_P)
    for s in range(4):
        w = _decode_plane(packed, s, b0, b1, b2)          # (TILE_P, TILE_NB)
        t = jax.lax.dot_general(
            vt, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        s_, e_ = _twosum(yt_ref[s], t)
        yt_ref[s] = s_
        ye_ref[s] = ye_ref[s] + e_

    @pl.when(i == ni - 1)
    def _():
        yt_ref[:] = yt_ref[:] + ye_ref[:]


def _tile_nb(nbytes_pad: int) -> int:
    for cand in (512, 256, 128):
        if nbytes_pad % cand == 0:
            return cand
    raise ValueError(f"nbytes_pad={nbytes_pad} not a multiple of 128")


def _check_tile_p(p_pad: int, tp: int) -> int:
    """grid = p_pad // tp silently DROPS the remainder SNP rows --
    garbage/omitted tiles with no error -- so the divisibility must be
    loud here, like _tile_nb is for the byte axis (review r4)."""
    if p_pad % tp:
        raise ValueError(
            f"p_pad={p_pad} is not a multiple of tile_p={tp}; pad the "
            "SNP axis to whole tiles (the operators do this)")
    return tp


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


def crossprod_planes(packed, coeffs, xt, *, interpret=False,
                     tile_p=None):
    """zt = [x^T W^T]: (4, k8, nbytes_pad) -> (k8, p_pad).

    packed: (p_pad, nbytes_pad) u8; coeffs: 3 x (1, p_pad) f32 rows.
    ``tile_p`` overrides TILE_P for offline autotuning sweeps (the
    production layout keeps p_pad a TILE_P multiple; measured sweep:
    256/512/1024 within 10%, 512 default).
    """
    p_pad, nbp = packed.shape
    k8 = xt.shape[1]
    tp = _check_tile_p(p_pad, tile_p or TILE_P)
    tile_nb = _tile_nb(nbp)
    grid = (p_pad // tp, nbp // tile_nb)
    row_spec = pl.BlockSpec((1, tp), lambda i, j: (0, i),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _crossprod_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tp, tile_nb), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            row_spec, row_spec, row_spec,
            pl.BlockSpec((4, k8, tile_nb), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k8, tp), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k8, p_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((k8, tp), jnp.float32)],
        interpret=interpret,
    )(packed, *coeffs, xt)


def matvec_planes(packed, coeffs, vt, *, interpret=False, tile_p=None):
    """yt = W^T v in plane layout: (k8, p_pad) -> (4, k8, nbytes_pad)."""
    p_pad, nbp = packed.shape
    k8 = vt.shape[0]
    tp = _check_tile_p(p_pad, tile_p or TILE_P)
    tile_nb = _tile_nb(nbp)
    grid = (nbp // tile_nb, p_pad // tp)
    row_spec = pl.BlockSpec((1, tp), lambda j, i: (0, i),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _matvec_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tp, tile_nb), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            row_spec, row_spec, row_spec,
            pl.BlockSpec((k8, tp), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, k8, tile_nb), lambda j, i: (0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, k8, nbp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((4, k8, tile_nb), jnp.float32)],
        interpret=interpret,
    )(packed, *coeffs, vt)


# ---------------------------------------------------------------------------
# Permuted-space wrappers matching ops/operator.py's functional signatures
# ---------------------------------------------------------------------------

def _round_k(k: int) -> int:
    return max(8, ((k + 7) // 8) * 8)


def crossprod_p(packed, mean, invsd, xp, *, interpret=False, tile_p=None):
    """z = W xp: (n4, k) -> (p_pad, k)."""
    p_pad, nbp = packed.shape
    k = xp.shape[1]
    k8 = _round_k(k)
    xt = _to_planes(xp.astype(jnp.float32), nbp, k8)
    zt = crossprod_planes(packed, _coeff_rows(mean, invsd), xt,
                          interpret=interpret, tile_p=tile_p)
    return zt.T[:, :k]


def matvec_p(packed, mean, invsd, v, *, interpret=False, tile_p=None):
    """y = W^T v: (p_pad, k) -> (n4, k)."""
    k = v.shape[1]
    k8 = _round_k(k)
    vt = _pad_k(v.astype(jnp.float32), k8).T      # (k8, p_pad)
    yt = matvec_planes(packed, _coeff_rows(mean, invsd), vt,
                       interpret=interpret, tile_p=tile_p)
    return _from_planes(yt, k)


def gram_matvec_p(packed, mean, invsd, xp, *, interpret=False, tile_p=None):
    """yp = W^T (W xp): (n4, k) -> (n4, k).  Two fused passes over the
    packed bytes; the standardized matrix never exists in HBM."""
    p_pad, nbp = packed.shape
    k = xp.shape[1]
    k8 = _round_k(k)
    coeffs = _coeff_rows(mean, invsd)
    xt = _to_planes(xp.astype(jnp.float32), nbp, k8)
    zt = crossprod_planes(packed, coeffs, xt, interpret=interpret,
                          tile_p=tile_p)
    yt = matvec_planes(packed, coeffs, zt, interpret=interpret,
                       tile_p=tile_p)
    return _from_planes(yt, k)


# ---------------------------------------------------------------------------
# Compensated (two-float) fused kernels
#
# Same tiling and decode-in-VMEM design as above, but the standardized
# values enter as an EXACT two-float split of the float64 value (per-SNP
# LUT over the 2-bit code; ops/compensated.py code_value_luts) and the
# long accumulations across grid steps use TwoSum, so the product's
# error stays ~eps of the final value instead of growing with the
# contraction length.  This is the data-pass engine behind the f64-grade
# check and the ff-Krylov polish (reference contract: f64 end-to-end,
# randompca.cpp:684-697).  Cost ~2x the plain kernels (still fused --
# the jnp fallback in ops/compensated.py is ~16x the plain pass).
# ---------------------------------------------------------------------------


def _twosum(a, b):
    """Knuth branch-free TwoSum on tiles (exact: a + b == s + e).

    MUST stay identical to ops/compensated.twosum (the jnp fallback
    these kernels are exactness-twins of); a direct import would cycle
    through ops/__init__ -> operator -> kernels, so the twin is named
    here instead."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _decode_plane_lut(packed_i32, s, l0, l2, l3):
    """(TILE_P, TILE_NB) bytes -> plane-s values via EXACT per-code
    lookup (no arithmetic touches the table values, so eps-sized lo
    tables survive bit-for-bit).  Code 1 (missing) is always 0."""
    t = (packed_i32 >> (2 * s)) & 3
    zero = jnp.zeros_like(l0)
    v = jnp.where(t == 0, l0, zero)
    v = jnp.where(t == 2, l2, v)
    return jnp.where(t == 3, l3, v)


def _lut_cols(refs):
    return tuple(r[0, :][:, None] for r in refs)   # (1,TP) -> (TP,1)


def _crossprod_ff_kernel(packed_ref, h0, h2, h3, g0, g2, g3,
                         xt_ref, zt_ref, ze_ref):
    """(z_hi, z_err) of sum_s xt[s] @ W_s^T, TwoSum across byte tiles.
    W = W_hi + W_lo; the W_lo term is eps-sized and accumulates plain
    into z_err."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        zt_ref[:] = jnp.zeros_like(zt_ref)
        ze_ref[:] = jnp.zeros_like(ze_ref)

    packed = packed_ref[:].astype(jnp.int32)
    lh = _lut_cols((h0, h2, h3))
    ll = _lut_cols((g0, g2, g3))
    hp = jax.lax.Precision.HIGHEST
    t = jnp.zeros_like(zt_ref)
    c = jnp.zeros_like(ze_ref)
    for s in range(4):
        wh = _decode_plane_lut(packed, s, *lh)            # (TP, TNB)
        wl = _decode_plane_lut(packed, s, *ll)
        x_s = xt_ref[s]                                   # (k8, TNB)
        t = t + jax.lax.dot_general(
            x_s, wh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hp)
        c = c + jax.lax.dot_general(
            x_s, wl, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hp)
    s_, e_ = _twosum(zt_ref[:], t)
    zt_ref[:] = s_
    ze_ref[:] = ze_ref[:] + e_ + c


def _matvec_ff_kernel_for(has_vl):
    """(y_hi, y_err) of W^T (v_hi [+ v_lo]), TwoSum across SNP tiles.

    ``has_vl=False`` builds the variant without the v_lo operand and
    its ``dot(vl, wh)`` term: the tall gram's stage 1 feeds an
    all-zero v_lo, and the compiler cannot eliminate a runtime-zero
    MXU dot (review r4 -- one of the three HIGHEST dots per plane)."""

    def kernel(packed_ref, h0, h2, h3, g0, g2, g3, *rest):
        if has_vl:
            vh_ref, vl_ref, yt_ref, ye_ref = rest
        else:
            vh_ref, yt_ref, ye_ref = rest
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            yt_ref[:] = jnp.zeros_like(yt_ref)
            ye_ref[:] = jnp.zeros_like(ye_ref)

        packed = packed_ref[:].astype(jnp.int32)
        lh = _lut_cols((h0, h2, h3))
        ll = _lut_cols((g0, g2, g3))
        hp = jax.lax.Precision.HIGHEST
        vh = vh_ref[:]                                    # (k8, TILE_P)
        for s in range(4):
            wh = _decode_plane_lut(packed, s, *lh)        # (TP, TNB)
            wl = _decode_plane_lut(packed, s, *ll)
            t = jax.lax.dot_general(
                vh, wh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=hp)
            c = jax.lax.dot_general(
                vh, wl, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=hp)
            if has_vl:
                c = c + jax.lax.dot_general(
                    vl_ref[:], wh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=hp)
            s_, e_ = _twosum(yt_ref[s], t)
            yt_ref[s] = s_
            ye_ref[s] = ye_ref[s] + e_ + c

    return kernel


_matvec_ff_kernel = _matvec_ff_kernel_for(True)
_matvec_ff_kernel_novl = _matvec_ff_kernel_for(False)


def _lut_rows(lut_hi, lut_lo):
    """(p_pad, 4) hi/lo tables -> 6 (1, p_pad) code rows (code 1 is
    structurally zero and needs no row)."""
    return tuple(lut[:, c][None, :].astype(jnp.float32)
                 for lut in (lut_hi, lut_lo) for c in (0, 2, 3))


def crossprod_ff_planes(packed, lut6, xt, *, interpret=False, tile_p=None):
    p_pad, nbp = packed.shape
    k8 = xt.shape[1]
    tp = _check_tile_p(p_pad, tile_p or TILE_P)
    tile_nb = _tile_nb(nbp)
    grid = (p_pad // tp, nbp // tile_nb)
    row_spec = pl.BlockSpec((1, tp), lambda i, j: (0, i),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((k8, tp), lambda i, j: (0, i),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _crossprod_ff_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tp, tile_nb), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            *([row_spec] * 6),
            pl.BlockSpec((4, k8, tile_nb), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((k8, p_pad), jnp.float32)] * 2,
        interpret=interpret,
    )(packed, *lut6, xt)


def matvec_ff_planes(packed, lut6, vh, vl=None, *, interpret=False,
                     tile_p=None):
    """``vl=None`` selects the no-v_lo kernel variant (skips one MXU
    dot per plane per tile -- the tall gram's stage-1 caller)."""
    p_pad, nbp = packed.shape
    k8 = vh.shape[0]
    tp = _check_tile_p(p_pad, tile_p or TILE_P)
    tile_nb = _tile_nb(nbp)
    grid = (nbp // tile_nb, p_pad // tp)
    row_spec = pl.BlockSpec((1, tp), lambda j, i: (0, i),
                            memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((k8, tp), lambda j, i: (0, i),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((4, k8, tile_nb), lambda j, i: (0, 0, j),
                            memory_space=pltpu.VMEM)
    v_specs = [v_spec] if vl is None else [v_spec, v_spec]
    v_args = (vh,) if vl is None else (vh, vl)
    return pl.pallas_call(
        _matvec_ff_kernel_novl if vl is None else _matvec_ff_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tp, tile_nb), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            *([row_spec] * 6),
            *v_specs,
        ],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((4, k8, nbp), jnp.float32)] * 2,
        interpret=interpret,
    )(packed, *lut6, *v_args)


# Widest panel the ff kernels compile at (Mosaic VMEM: the compensated
# kernels hold ~3x the plain kernels' live tiles; 96 measured OK at
# full biobank width, 116 crashes the TPU compiler).  Wider requests
# are column-chunked by the wrappers -- an extra decode pass per chunk,
# amortized fine for the polish/check one-shots that use them.
FF_MAX_K = 96


def _round_k_ff(k: int) -> int:
    """ff-kernel panel width: like _round_k, but k8 in {48, 56} crashes
    the Mosaic compiler (measured on v5e: 40/64/72/88/96 compile,
    48/56/104+ abort the tpu_compile_helper subprocess) -- pad those up
    to 64.  Zero-padded columns are exact no-ops."""
    k8 = _round_k(k)
    return 64 if k8 in (48, 56) else k8


def _column_chunked(fn, xp, width):
    k = xp.shape[1]
    if k <= width:
        return fn(xp)
    outs = [fn(xp[:, s: s + width]) for s in range(0, k, width)]
    return (jnp.concatenate([o[0] for o in outs], axis=1),
            jnp.concatenate([o[1] for o in outs], axis=1))


def gram_ff_p(packed, lut_hi, lut_lo, xp, *, interpret=False, tile_p=None):
    """(y_hi, y_lo) of the sample-space gram ``W^T (W xp)`` under THIS
    file's W = (p_pad, n4) layout (ops/compensated.py writes the same
    product as ``X X^T x`` in its opposite X-orientation) -- fused
    Pallas twin of ops/compensated.gram_ff_p (same contract; caller
    masks byte-padding positions)."""
    p_pad, nbp = packed.shape

    def one(xpc):
        k = xpc.shape[1]
        k8 = _round_k_ff(k)
        lut6 = _lut_rows(lut_hi, lut_lo)
        xt = _to_planes(xpc.astype(jnp.float32), nbp, k8)
        zh, zl = crossprod_ff_planes(packed, lut6, xt,
                                     interpret=interpret, tile_p=tile_p)
        yh, yl = matvec_ff_planes(packed, lut6, zh, zl,
                                  interpret=interpret, tile_p=tile_p)
        return _from_planes(yh, k), _from_planes(yl, k)

    return _column_chunked(one, xp, FF_MAX_K)


def gram_tall_ff_p(packed, lut_hi, lut_lo, mean, invsd, v2, valid2d, *,
                   interpret=False, tile_p=None):
    """(z_hi, z_lo) of W^T (M (W v)) for the TALL gram X^T X: v2 is
    (p_pad, k) SNP-space, M the diagonal valid-sample mask.

    Stage 1 (y = W^T v) and stage 2's main term run through the ff
    kernels; stage 2's eps-sized correction W y_lo rides the PLAIN
    (compensated) crossprod kernel -- its decode differs from the
    exact hi table by ~eps, which lands at eps^2 of the result."""
    p_pad, nbp = packed.shape

    def one(v2c):
        k = v2c.shape[1]
        k8 = _round_k_ff(k)
        lut6 = _lut_rows(lut_hi, lut_lo)
        vh = _pad_k(v2c.astype(jnp.float32), k8).T       # (k8, p_pad)
        # vl=None: the no-v_lo kernel variant (v is plain f32 here;
        # a zero vl operand costs a full MXU dot per plane, review r4)
        yh, yl = matvec_ff_planes(packed, lut6, vh,
                                  interpret=interpret, tile_p=tile_p)
        m = valid2d.reshape(4, 1, nbp)
        yh = yh * m
        yl = yl * m
        zh, zl = crossprod_ff_planes(packed, lut6, yh,
                                     interpret=interpret, tile_p=tile_p)
        zl = zl + crossprod_planes(packed, _coeff_rows(mean, invsd), yl,
                                   interpret=interpret, tile_p=tile_p)
        return zh.T[:, :k], zl.T[:, :k]

    return _column_chunked(one, v2, FF_MAX_K)
