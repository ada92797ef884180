"""Matrix-free genotype operators (the heart of the framework).

TPU-native equivalents of the reference's ``SVDWide`` / ``SVDWideOnline``
(svdwide.h:11-107): blocked products against the implicitly-standardized
genotype matrix X (N samples x p SNPs), where X never materializes --
the packed 2-bit bytes decode to standardized floats on the fly, block
by block, inside a ``lax.scan``.

Products provided (reference naming in parens):

* ``perform_op(x)``  : y = X Xt x        (perform_op / perform_op_mat)
* ``crossprod(x)``   : z = Xt x          (crossprod / crossprod2)
* ``prod(v)``        : y = X v           (prod / prod3)
* ``snp_sumsq``      : per-SNP sum X_ij^2; ``trace`` = their sum
  (trace accumulation, svdwide.cpp:44-45)

Multi-chip: with a ``jax.sharding.Mesh`` the SNP axis is sharded across
devices (1-D feature sharding -- SURVEY.md section 2.4): each device
holds a contiguous SNP range of packed bytes; ``X Xt x`` and ``X v``
form local partial products and ``psum`` them over ICI; ``Xt x`` writes
its SNP segment locally (sharded output).  The length-N iterate stays
replicated.
"""

from __future__ import annotations

import math
import os
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..io.plink import PACK_DENSITY, bytes_per_snp
from ..kernels.packed_matvec import TILE_P as _TILE_P
from ..utils.fetch import fetch_global
from .genotypes import (
    decode_standardized,
    permute_samples,
    permute_samples_np,
    unpermute_samples,
    valid_mask_permuted,
)
from .standardize import lookup_tables


def default_dtype():
    """Device compute dtype every analysis mode defaults to: f64 when
    the runtime allows (x64 on, e.g. CPU tests), else f32 (real TPU)."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


# ---------------------------------------------------------------------------
# Functional core: blocked products in permuted sample space.
# All are pure and shard_map/jit friendly; block_size is static.
# ---------------------------------------------------------------------------

def _nblocks(p_pad: int, block_size: int) -> int:
    assert p_pad % block_size == 0
    return p_pad // block_size


def budget_block_size(rows: int, n4: int, itemsize: int = 4,
                      cap: int | None = None) -> int:
    """Largest divisor of ``rows`` whose DECODED (bs, n4) block stays
    within a ~128 MiB budget (optionally capped).

    Used for the pure-jnp blocked scans (snp_sumsq everywhere; all
    products on the non-Pallas path).  The Pallas KERNEL block size
    cannot be reused for these: its TILE_P rounding forces >= 512 rows,
    which at biobank n4 decodes multi-GB blocks inside the scan and
    OOMs the trace pass (review r2: streaming/tall at 1M+ samples)."""
    budget = max(1, (128 << 20) // max(1, n4 * itemsize))
    bs = max(1, min(rows, budget, cap if cap else rows))
    while rows % bs:
        bs -= 1
    return bs


def _slice_block(arrs, i, block_size):
    packed, mean, invsd = arrs
    start = i * block_size
    pb = lax.dynamic_slice_in_dim(packed, start, block_size, axis=0)
    mb = lax.dynamic_slice_in_dim(mean, start, block_size, axis=0)
    ib = lax.dynamic_slice_in_dim(invsd, start, block_size, axis=0)
    return pb, mb, ib


def gram_matvec_p(packed, mean, invsd, xp, *, block_size):
    """yp = W^T (W xp): (n4, k) -> (n4, k), permuted space.

    W is the (p_pad, n4) standardized matrix, decoded blockwise."""
    dtype = xp.dtype
    nb = _nblocks(packed.shape[0], block_size)

    def body(y, i):
        pb, mb, ib = _slice_block((packed, mean, invsd), i, block_size)
        W = decode_standardized(pb, mb, ib, dtype)
        z = jnp.dot(W, xp, preferred_element_type=dtype,
                     precision=jax.lax.Precision.HIGHEST)
        return y + jnp.dot(W.T, z, preferred_element_type=dtype,
                     precision=jax.lax.Precision.HIGHEST), None

    # Block 0 runs outside the scan so the carry starts with the right
    # sharding/varying type under shard_map (and nb==1 skips scan overhead).
    y, _ = body(jnp.zeros_like(xp), 0)
    if nb > 1:
        y, _ = lax.scan(body, y, jnp.arange(1, nb))
    return y


def crossprod_p(packed, mean, invsd, xp, *, block_size):
    """z = W xp: (n4, k) -> (p_pad, k). Output is SNP-space (sharded-out
    under a mesh, like the reference's y.segment writes, svdwide.cpp:136-150)."""
    dtype = xp.dtype
    nb = _nblocks(packed.shape[0], block_size)

    def body(_, i):
        pb, mb, ib = _slice_block((packed, mean, invsd), i, block_size)
        W = decode_standardized(pb, mb, ib, dtype)
        return None, jnp.dot(W, xp, preferred_element_type=dtype,
                     precision=jax.lax.Precision.HIGHEST)

    if nb == 1:
        return body(None, 0)[1]
    _, zs = lax.scan(body, None, jnp.arange(nb))
    return zs.reshape(packed.shape[0], xp.shape[1])


def matvec_p(packed, mean, invsd, v, *, block_size):
    """yp = W^T v: (p_pad, k) -> (n4, k) (y = X v in sample space)."""
    dtype = v.dtype
    p_pad, nbytes = packed.shape
    nb = _nblocks(p_pad, block_size)
    n4 = nbytes * PACK_DENSITY

    def body(y, i):
        pb, mb, ib = _slice_block((packed, mean, invsd), i, block_size)
        W = decode_standardized(pb, mb, ib, dtype)
        vb = lax.dynamic_slice_in_dim(v, i * block_size, block_size, axis=0)
        return y + jnp.dot(W.T, vb, preferred_element_type=dtype,
                     precision=jax.lax.Precision.HIGHEST), None

    y, _ = body(jnp.zeros((n4, v.shape[1]), dtype), 0)
    if nb > 1:
        y, _ = lax.scan(body, y, jnp.arange(1, nb))
    return y


def _host_sumsq(snp_sumsq, n_snps: int) -> np.ndarray | None:
    """Validate a precomputed per-SNP sum of squared standardized
    genotypes (float64 host vector, original SNP order).  Passing one
    makes ``trace`` / ``snp_sumsq`` free -- no decode pass at all (the
    analytic byproduct of the host stats pass, see
    standardize.sumsq_from_moments)."""
    if snp_sumsq is None:
        return None
    arr = np.asarray(snp_sumsq, dtype=np.float64)
    if arr.shape != (n_snps,):
        raise ValueError(
            f"snp_sumsq must have shape ({n_snps},), got {arr.shape}")
    return arr


def snp_sumsq_p(packed, mean, invsd, valid, *, block_size):
    """Per-SNP sum of squared standardized genotypes, (p_pad,).
    ``valid`` masks out byte-padding sample positions."""
    dtype = valid.dtype
    nb = _nblocks(packed.shape[0], block_size)
    v2 = valid[:, None]

    def body(_, i):
        pb, mb, ib = _slice_block((packed, mean, invsd), i, block_size)
        W = decode_standardized(pb, mb, ib, dtype)
        return None, jnp.dot(W * W, v2, preferred_element_type=dtype,
                     precision=jax.lax.Precision.HIGHEST)[:, 0]

    if nb == 1:
        return body(None, 0)[1]
    _, sq = lax.scan(body, None, jnp.arange(nb))
    return sq.reshape(packed.shape[0])


# ---------------------------------------------------------------------------
# Operator classes
# ---------------------------------------------------------------------------

class LinearOperatorBase:
    """Common vector<->matrix plumbing for the public products."""

    n_samples: int
    n_snps: int

    def _as_2d(self, x, length, name):
        x = jnp.asarray(x, dtype=self.dtype)
        vec = x.ndim == 1
        if vec:
            x = x[:, None]
        if x.shape[0] != length:
            raise ValueError(f"{name}: expected leading dim {length}, got {x.shape[0]}")
        return x, vec

    # public API -----------------------------------------------------------
    def perform_op(self, x):
        """y = X X^T x; x is (N,) or (N, k)."""
        x2, vec = self._as_2d(x, self.n_samples, "perform_op")
        y = self._gram(x2)
        return y[:, 0] if vec else y

    def crossprod(self, x):
        """z = X^T x; x is (N,) or (N, k) -> (p,) or (p, k)."""
        x2, vec = self._as_2d(x, self.n_samples, "crossprod")
        z = self._crossprod(x2)
        return z[:, 0] if vec else z

    def prod(self, v):
        """y = X v; v is (p,) or (p, k) -> (N,) or (N, k)."""
        v2, vec = self._as_2d(v, self.n_snps, "prod")
        y = self._prod(v2)
        return y[:, 0] if vec else y


class PackedOperator(LinearOperatorBase):
    """HBM-resident packed-genotype operator, optionally SNP-sharded
    over a device mesh.

    Parameters
    ----------
    packed : (p, nbytes) uint8, the raw .bed payload (no magic bytes).
    mean, sd : per-SNP standardization stats (float64, exact).
    n_samples : true N.
    block_size : SNPs decoded per scan step.  Chosen so a decoded block
        (block_size x n4 floats) fits comfortably in HBM scratch; this
        is the analog of the reference's --blocksize / --memory budget
        (flashpca.cpp:646-684).
    mesh / axis_name : optional 1-D mesh; SNP dim sharded across it.
    """

    @staticmethod
    def resolve_use_pallas(use_pallas, dtype):
        """Fused Pallas decode->matvec kernels: default on real TPU
        (f32 only); 'interpret' runs the same kernels interpreted
        (tests).  The jnp lax.scan path covers everything else."""
        if use_pallas is None:
            use_pallas = (
                jax.default_backend() == "tpu" and dtype == jnp.float32)
        return use_pallas

    @staticmethod
    def plan_layout(p, nbytes, *, block_size=None, dtype=jnp.float32,
                    nshards=1, use_pallas=None):
        """Padded layout the operator uses for (p, nbytes) packed data:
        dict with nbytes_pad, block_size, p_pad, use_pallas.  Exposed so
        distributed loaders (parallel/dist.py) can shard the file into
        exactly this layout without materializing it globally."""
        use_pallas = PackedOperator.resolve_use_pallas(use_pallas, dtype)
        # Byte (sample) padding: Pallas tiles need the byte width to be
        # a multiple of 128 lanes; harmless for the jnp path.  Large
        # widths pad to 512 so the kernels get full-width tiles --
        # narrow 128-byte tiles make the Mosaic compile of the big-grid
        # kernels pathologically slow (minutes instead of seconds).
        if use_pallas:
            unit = 512 if nbytes > 4096 else 128
            nbytes_pad = ((nbytes + unit - 1) // unit) * unit
        else:
            nbytes_pad = nbytes
        n4 = nbytes_pad * PACK_DENSITY
        if block_size is None:
            # target ~128 MiB decoded block per device
            itemsize = jnp.dtype(dtype).itemsize
            block_size = max(128, (128 << 20) // (n4 * itemsize))
        block_size = min(block_size, max(1, math.ceil(p / nshards)))
        if use_pallas:
            # keep every shard a whole number of SNP tiles (block_size
            # only drives the jnp fallback/sumsq path).  When one block
            # covers the whole shard, round UP so p_pad doesn't jump to
            # a whole extra block of padding (test before flooring: the
            # pre-clamp above can make block_size == per_shard exactly).
            t = _TILE_P
            per_shard = -(-p // nshards)
            if block_size >= per_shard:
                block_size = -(-per_shard // t) * t
            else:
                block_size = max(t, (block_size // t) * t)
        # pad p so every shard holds a whole number of blocks
        chunk = block_size * nshards
        p_pad = ((p + chunk - 1) // chunk) * chunk
        return dict(nbytes_pad=int(nbytes_pad), block_size=int(block_size),
                    p_pad=int(p_pad), use_pallas=use_pallas)

    def __init__(
        self,
        packed: np.ndarray,
        mean: np.ndarray,
        sd: np.ndarray,
        n_samples: int,
        *,
        block_size: int | None = None,
        dtype=jnp.float32,
        mesh: Mesh | None = None,
        axis_name: str = "snps",
        use_pallas: bool | str | None = None,
        n_snps: int | None = None,
        snp_sumsq: np.ndarray | None = None,
    ):
        nbytes = bytes_per_snp(n_samples)
        p = int(n_snps) if n_snps is not None else int(packed.shape[0])
        self.n_samples = int(n_samples)
        self.n_snps = p
        self.nbytes = int(nbytes)
        self.dtype = dtype
        self.mesh = mesh
        self.axis_name = axis_name
        self.nshards = mesh.shape[axis_name] if mesh is not None else 1
        # exact f64 standardization stats (drivers report these as
        # center/scale, the analog of X_meansd)
        self.center = np.asarray(mean, dtype=np.float64)
        self.scale = np.asarray(sd, dtype=np.float64)

        plan = self.plan_layout(
            p, nbytes, block_size=block_size, dtype=dtype,
            nshards=self.nshards, use_pallas=use_pallas)
        use_pallas = plan["use_pallas"]
        self.use_pallas = use_pallas
        nbytes_pad = plan["nbytes_pad"]
        self.nbytes_pad = nbytes_pad
        self.n4 = nbytes_pad * PACK_DENSITY
        self.block_size = plan["block_size"]
        p_pad = plan["p_pad"]
        self.p_pad = p_pad

        if packed.shape not in ((p, nbytes), (p_pad, nbytes_pad)):
            raise ValueError(
                f"packed shape {packed.shape} matches neither the raw "
                f"({p}, {nbytes}) nor the padded ({p_pad}, {nbytes_pad}) "
                "layout")
        already_padded = packed.shape == (p_pad, nbytes_pad)

        mean_f, invsd_f = lookup_tables(mean, sd, dtype=jnp.dtype(dtype).type)
        mean_pad = np.zeros(p_pad, dtype=mean_f.dtype)
        mean_pad[:p] = mean_f
        invsd_pad = np.zeros(p_pad, dtype=invsd_f.dtype)  # 0 => pad rows inert
        invsd_pad[:p] = invsd_f

        # If the packed bytes are already a device array (e.g. generated
        # on device or assembled shard-by-shard), pad on device -- never
        # round-trip through the host (it may be GBs, and host<->device
        # bandwidth can be the scarcest resource).
        if already_padded:
            packed_pad = packed
        elif isinstance(packed, jax.Array):
            packed_pad = jnp.pad(
                packed, ((0, p_pad - p), (0, nbytes_pad - nbytes)))
        else:
            packed_pad = np.zeros((p_pad, nbytes_pad), dtype=np.uint8)
            packed_pad[:p, :nbytes] = packed

        if mesh is not None:
            snp_sharding = NamedSharding(mesh, P(axis_name))
            row_sharding = NamedSharding(mesh, P(axis_name, None))
            self.packed = jax.device_put(packed_pad, row_sharding)
            self.mean = jax.device_put(mean_pad, snp_sharding)
            self.invsd = jax.device_put(invsd_pad, snp_sharding)
        else:
            self.packed = jnp.asarray(packed_pad)
            self.mean = jnp.asarray(mean_pad)
            self.invsd = jnp.asarray(invsd_pad)

        self._valid = valid_mask_permuted(n_samples, nbytes_pad, dtype)
        self._build_fns()
        self._sumsq = _host_sumsq(snp_sumsq, p)
        self._trace = None
        self.nops = 0

    # -- jit/shard_map plumbing --------------------------------------------
    def _build_fns(self):
        bs = self.block_size
        if self.use_pallas:
            from ..kernels import packed_matvec as _pk

            interp = self.use_pallas == "interpret"
            raw_gram = partial(_pk.gram_matvec_p, interpret=interp)
            raw_mv = partial(_pk.matvec_p, interpret=interp)
            raw_cross = partial(_pk.crossprod_p, interpret=interp)
        else:
            raw_gram = partial(gram_matvec_p, block_size=bs)
            raw_mv = partial(matvec_p, block_size=bs)
            raw_cross = partial(crossprod_p, block_size=bs)

        # Mask byte-padding sample positions on BOTH input and output:
        # pad codes in the .bed are arbitrary bits, so decoded W has
        # garbage columns there.  Masking only the output would make the
        # gram operator non-symmetric for vectors with nonzero padding
        # components (random solver panels!) -- input masking restores
        # exact symmetry with extra zero eigenvalues.
        def gram(packed, mean, invsd, xp, valid):
            xp = xp * valid[:, None]
            return raw_gram(packed, mean, invsd, xp) * valid[:, None]

        def mv(packed, mean, invsd, v, valid):
            return raw_mv(packed, mean, invsd, v) * valid[:, None]

        def cross_masked(packed, mean, invsd, xp, valid):
            return raw_cross(packed, mean, invsd, xp * valid[:, None])

        cross = cross_masked
        sumsq = partial(snp_sumsq_p, block_size=budget_block_size(
            self.p_pad // self.nshards, self.nbytes_pad * PACK_DENSITY))

        if self.mesh is not None:
            ax = self.axis_name
            mesh = self.mesh
            snp = P(ax)
            row = P(ax, None)
            rep = P(None, None)
            local_gram, local_mv, local_sumsq = (raw_gram, raw_mv, sumsq)

            def gram_psum(packed, mean, invsd, xp, valid):
                xp = xp * valid[:, None]
                y = lax.psum(local_gram(packed, mean, invsd, xp), ax)
                return y * valid[:, None]

            def cross_psum(packed, mean, invsd, xp, valid):
                return raw_cross(packed, mean, invsd, xp * valid[:, None])

            def prod_psum(packed, mean, invsd, v, valid):
                y = lax.psum(local_mv(packed, mean, invsd, v), ax)
                return y * valid[:, None]

            from jax import shard_map

            # check_vma=False on every product: a pallas_call inside
            # shard_map trips the vma check (the ff paths below carry
            # the same flag; mesh+jnp paths are unaffected)
            gram = shard_map(
                gram_psum, mesh=mesh,
                in_specs=(row, snp, snp, rep, P(None)), out_specs=rep,
                check_vma=False,
            )
            cross = shard_map(
                cross_psum, mesh=mesh,
                in_specs=(row, snp, snp, rep, P(None)), out_specs=row,
                check_vma=False,
            )
            mv = shard_map(
                prod_psum, mesh=mesh,
                in_specs=(row, snp, snp, row, P(None)), out_specs=rep,
                check_vma=False,
            )
            sumsq = shard_map(
                local_sumsq, mesh=mesh,
                in_specs=(row, snp, snp, P(None)), out_specs=snp,
                check_vma=False,
            )

        self._gram_fn = jax.jit(gram)
        self._cross_fn = jax.jit(cross)
        self._mv_fn = jax.jit(mv)
        self._sumsq_fn = jax.jit(sumsq)
        # pure wrappers built ONCE: solvers jit with the matvec as a
        # static argument, so a stable function identity means repeat
        # solves reuse the compiled cycle programs instead of
        # re-tracing (a multi-second saving per call on remote devices)
        self._pure_gram = (
            lambda xp, packed, mean, invsd, valid:
                gram(packed, mean, invsd, xp, valid))
        self._pure_cross = (
            lambda xp, packed, mean, invsd, valid:
                cross(packed, mean, invsd, xp, valid))
        self._pure_mv = (
            lambda v, packed, mean, invsd, valid:
                mv(packed, mean, invsd, v, valid))

    # -- permuted-space interface (used by the eigensolver; no per-call
    #    permutes or host transfers) ------------------------------------------
    def permute(self, x):
        return permute_samples(jnp.asarray(x, self.dtype), self.nbytes_pad)

    def permute_np(self, x):
        """Host-side twin of :meth:`permute` (numpy in/out) -- lets the
        solver seed v0 with zero device traffic (review r2)."""
        return permute_samples_np(x, self.nbytes_pad)

    def unpermute(self, yp):
        return unpermute_samples(yp, self.n_samples)

    def gram_permuted(self, xp):
        """yp = X X^T xp in permuted space; (n4,) or (n4,k) -> same.
        Byte-padding positions are masked to exactly zero."""
        vec = xp.ndim == 1
        xp2 = xp[:, None] if vec else xp
        yp = self._gram_fn(self.packed, self.mean, self.invsd, xp2, self._valid)
        self.nops += 1
        return yp[:, 0] if vec else yp

    def gram_pure(self):
        """(fn, operands) with ``fn(xp, *operands)`` = gram_permuted.

        Solvers jit fn with the operands as explicit arguments: a
        closure/constant reference to the packed array inside a jitted
        program would be embedded as an MLIR constant, which
        MATERIALIZES the multi-GB buffer on the host.  The returned fn
        is UNJITTED -- nesting an inner jit inside the solver's cycle
        program stalls the remote compile pipeline.  The same function
        object is returned every call (stable identity for solver-side
        static-argument jit caching)."""
        return self._pure_gram, (self.packed, self.mean, self.invsd,
                                 self._valid)

    def products_pure(self):
        """(cross_fn, mv_fn, operands) for device-resident iteration
        loops (e.g. SCCA): ``cross_fn(xp, *operands)`` = X^T x in
        (padded) SNP space for a PERMUTED sample-space input, and
        ``mv_fn(v, *operands)`` = X v in permuted sample space for a
        (p_pad, k) input.  Unjitted and constant-free, like gram_pure;
        stable function identities across calls."""
        return self._pure_cross, self._pure_mv, (
            self.packed, self.mean, self.invsd, self._valid)

    @property
    def op_dim(self) -> int:
        """Length of permuted-space vectors."""
        return self.n4

    # -- products ------------------------------------------------------------
    def _gram(self, x2):
        xp = permute_samples(x2, self.nbytes_pad)
        yp = self._gram_fn(self.packed, self.mean, self.invsd, xp, self._valid)
        self.nops += 1
        return unpermute_samples(yp, self.n_samples)

    def _crossprod(self, x2):
        xp = permute_samples(x2, self.nbytes_pad)
        z = self._cross_fn(self.packed, self.mean, self.invsd, xp,
                           self._valid)
        self.nops += 1
        return z[: self.n_snps]

    def _prod(self, v2):
        pad = self.p_pad - self.n_snps
        if pad:
            v2 = jnp.pad(v2, ((0, pad), (0, 0)))
        yp = self._mv_fn(self.packed, self.mean, self.invsd, v2, self._valid)
        self.nops += 1
        return unpermute_samples(yp, self.n_samples)

    # -- trace ----------------------------------------------------------------
    @property
    def snp_sumsq(self) -> np.ndarray:
        """Per-SNP sum of squared standardized genotypes (float64 host)."""
        if self._sumsq is None:
            sq = self._sumsq_fn(self.packed, self.mean, self.invsd, self._valid)
            # the lazy reduction's output is SNP-sharded under a mesh:
            # gather process-safely (np.asarray raises on an array
            # spanning other controllers' devices, review r4)
            self._sumsq = fetch_global(sq, dtype=np.float64)[: self.n_snps]
        return self._sumsq

    @property
    def trace(self) -> float:
        """trace(X X^T) = sum of squares of X (svdwide.cpp:44-45).
        Fetches ONE scalar (not the (p,) vector -- device->host links
        can be very slow); pad rows have invsd == 0 so summing over
        p_pad is exact."""
        if self._sumsq is not None:
            return float(self._sumsq.sum())
        if self._trace is None:
            sq = self._sumsq_fn(self.packed, self.mean, self.invsd,
                                self._valid)
            self._trace = float(jnp.sum(sq))
        return self._trace

    # -- compensated (two-float) product: f64-grade verification ------------
    def _ff(self):
        """Lazy jitted compensated gram (ops/compensated.py): built on
        first use (check / final polish rotation), cached per operator."""
        if getattr(self, "_ff_state", None) is None:
            from .compensated import code_value_luts, gram_ff_p

            lh, ll = code_value_luts(self.center, self.scale, self.p_pad)
            if self.mesh is not None:
                row = NamedSharding(self.mesh, P(self.axis_name, None))
                lut_hi = jax.device_put(lh, row)
                lut_lo = jax.device_put(ll, row)
            else:
                lut_hi = jnp.asarray(lh)
                lut_lo = jnp.asarray(ll)
            if self.use_pallas:
                # fused compensated kernels: decode stays in VMEM, ~2x
                # a plain pass (the jnp fallback materializes W_hi/W_lo
                # in HBM and runs ~16x a plain pass at biobank n4)
                from ..kernels import packed_matvec as _pk

                interp = self.use_pallas == "interpret"
                raw = partial(_pk.gram_ff_p, interpret=interp)
            else:
                # two decoded (bs, n4) blocks live at once: halve the
                # budget; cap at the compensation chunk so the stage-2
                # contraction (over the block's SNPs) stays within one
                # chunk's error floor
                from .compensated import default_chunk

                bs = budget_block_size(self.p_pad // self.nshards,
                                       self.n4, itemsize=8,
                                       cap=default_chunk())
                raw = partial(gram_ff_p, block_size=bs)

            def gram_ff(packed, lut_hi, lut_lo, xp, valid):
                v = valid[:, None]
                hi, lo = raw(packed, lut_hi, lut_lo, xp * v)
                return hi * v, lo * v

            if self.mesh is not None:
                ax = self.axis_name
                snp_row = P(ax, None)
                rep = P(None, None)

                def gram_ff_psum(packed, lut_hi, lut_lo, xp, valid):
                    v = valid[:, None]
                    hi, lo = raw(packed, lut_hi, lut_lo, xp * v)
                    # psum hi and lo separately: lo terms are eps-sized,
                    # so the f32 collective adds only ~eps^2 error
                    hi = lax.psum(hi, ax)
                    lo = lax.psum(lo, ax)
                    return hi * v, lo * v

                from jax import shard_map

                gram_ff = shard_map(
                    gram_ff_psum, mesh=self.mesh,
                    in_specs=(snp_row, snp_row, snp_row, rep, P(None)),
                    out_specs=(rep, rep), check_vma=False,
                )
            self._ff_state = (jax.jit(gram_ff), lut_hi, lut_lo)
        return self._ff_state

    def gram_ff_permuted(self, xp):
        """(y_hi, y_lo) two-float pair of X X^T xp, permuted space.
        One pass, ~2-3x the cost of a plain gram product; used only for
        the final Rayleigh-Ritz rotation and models.check."""
        fn, lut_hi, lut_lo = self._ff()
        vec = xp.ndim == 1
        xp2 = xp[:, None] if vec else xp
        hi, lo = fn(self.packed, lut_hi, lut_lo, xp2, self._valid)
        self.nops += 1
        return (hi[:, 0], lo[:, 0]) if vec else (hi, lo)

    def perform_op_ff(self, x):
        """Sample-space twin of :meth:`gram_ff_permuted`."""
        x2, vec = self._as_2d(x, self.n_samples, "perform_op_ff")
        hi, lo = self.gram_ff_permuted(permute_samples(x2, self.nbytes_pad))
        hi = unpermute_samples(hi, self.n_samples)
        lo = unpermute_samples(lo, self.n_samples)
        return (hi[:, 0], lo[:, 0]) if vec else (hi, lo)

    def stats(self) -> dict:
        """Observability counters (the analog of the reference's nops /
        verbose block logging, svdwide.h:46): operator ops dispatched,
        packed bytes resident, and the per-pass decode volume."""
        bytes_per_pass = self.p_pad * self.nbytes_pad
        itemsize = jnp.dtype(self.dtype).itemsize
        return {
            "nops": self.nops,
            "packed_bytes": bytes_per_pass,
            "decoded_gb_per_pass": bytes_per_pass * 4 * itemsize / 1e9,
            "use_pallas": bool(self.use_pallas),
            "n_shards": self.nshards,
            "block_size": self.block_size,
        }


class TallPackedOperator:
    """Tall-path operator: eigendecomposition target is the p x p Gram
    ``X^T X`` (right singular vectors), for the n >> p regime.

    The reference *declared* this path but never instantiated it
    (``SVDTall``/``SVDTallOnline`` are dead duplicates of the wide
    operator, svdtall.cpp:21-343); here it is real.  Multi-chip
    decomposition is SAMPLE sharding: the packed bytes are split along
    the byte (sample) axis, each device forms the local partial
    ``X_d^T (X_d v)`` with the SAME fused decode kernels as the wide
    path, and a psum over the mesh reduces the p-length result --
    solver state (p x ncv) stays replicated.
    """

    @staticmethod
    def plan_layout(n_snps: int, nbytes: int, *, block_size=None,
                    dtype=jnp.float32, nshards: int = 1,
                    use_pallas=None) -> dict:
        """Padding/blocking geometry shared by the constructor and the
        per-host sample-shard loader (parallel/dist.py): a host that
        reads only its byte-column range must pre-pad to the exact
        (p_pad, nbytes_pad) the operator would compute."""
        use_pallas = PackedOperator.resolve_use_pallas(use_pallas, dtype)
        # byte padding: every shard gets an equal, tile-multiple range
        # (512 for large widths: narrow Pallas tiles compile very slowly
        # -- same heuristic as the wide plan_layout, but per SHARD here
        # because the tall path splits the byte axis across the mesh)
        if use_pallas:
            unit = 512 if nbytes > 4096 * nshards else 128
        else:
            unit = 4
        per_shard = -(-nbytes // (unit * nshards)) * unit
        nbytes_pad = per_shard * nshards

        if block_size is None:
            itemsize = jnp.dtype(dtype).itemsize
            block_size = max(128, (128 << 20) // (4 * per_shard * itemsize))
        if use_pallas:
            # p_pad MUST be a whole number of SNP tiles or the kernel
            # grid is empty and outputs stay uninitialized
            t = _TILE_P
            if block_size >= n_snps:
                block_size = -(-n_snps // t) * t
            else:
                block_size = max(t, (block_size // t) * t)
        else:
            block_size = min(block_size, max(1, n_snps))
        p_pad = -(-n_snps // block_size) * block_size
        return {
            "p_pad": int(p_pad),
            "nbytes_pad": int(nbytes_pad),
            "block_size": int(block_size),
            "use_pallas": use_pallas,
        }

    def __init__(
        self,
        packed: np.ndarray,
        mean: np.ndarray,
        sd: np.ndarray,
        n_samples: int,
        *,
        block_size: int | None = None,
        dtype=jnp.float32,
        mesh: Mesh | None = None,
        axis_name: str = "samples",
        use_pallas: bool | str | None = None,
        snp_sumsq: np.ndarray | None = None,
        n_snps: int | None = None,
    ):
        p_in, nb_in = packed.shape
        nbytes = bytes_per_snp(n_samples)
        p = int(n_snps) if n_snps is not None else int(p_in)
        self.n_samples = int(n_samples)
        self.n_snps = p
        self.nbytes = int(nbytes)
        self.dtype = dtype
        self.mesh = mesh
        self.axis_name = axis_name
        self.nshards = mesh.shape[axis_name] if mesh is not None else 1
        self.center = np.asarray(mean, dtype=np.float64)
        self.scale = np.asarray(sd, dtype=np.float64)

        plan = TallPackedOperator.plan_layout(
            p, nbytes, block_size=block_size, dtype=dtype,
            nshards=self.nshards, use_pallas=use_pallas)
        use_pallas = plan["use_pallas"]
        self.use_pallas = use_pallas
        nbytes_pad = plan["nbytes_pad"]
        self.nbytes_pad = nbytes_pad
        self.n4 = nbytes_pad * PACK_DENSITY
        self.block_size = plan["block_size"]
        p_pad = plan["p_pad"]
        self.p_pad = p_pad

        mean_f, invsd_f = lookup_tables(mean, sd, dtype=jnp.dtype(dtype).type)
        mean_pad = np.zeros(p_pad, dtype=mean_f.dtype)
        mean_pad[:p] = mean_f
        invsd_pad = np.zeros(p_pad, dtype=invsd_f.dtype)
        invsd_pad[:p] = invsd_f

        if (p_in, nb_in) == (p_pad, nbytes_pad):
            # pre-padded (e.g. the per-host sample-shard loader built the
            # global sharded array to this exact layout)
            packed_pad = packed
        elif (p_in, nb_in) == (p, nbytes):
            row_extra = p_pad - p
            col_extra = nbytes_pad - nbytes
            if isinstance(packed, jax.Array):
                packed_pad = (
                    jnp.pad(packed, ((0, row_extra), (0, col_extra)))
                    if row_extra or col_extra else packed
                )
            else:
                packed_pad = np.zeros((p_pad, nbytes_pad), dtype=np.uint8)
                packed_pad[:p, :nbytes] = packed
        else:
            raise ValueError(
                f"packed shape {packed.shape} matches neither the raw "
                f"({p}, {nbytes}) nor the padded ({p_pad}, {nbytes_pad}) "
                "layout for this n_samples/n_snps")

        # valid-sample mask as (4, nbytes_pad): entry (s, b) covers
        # sample 4b+s; sharding axis 1 hands each device its local
        # plane slices in the right layout
        sample_idx = (
            PACK_DENSITY * np.arange(nbytes_pad)[None, :]
            + np.arange(PACK_DENSITY)[:, None]
        )
        valid2d = (sample_idx < n_samples).astype(
            np.dtype(jnp.dtype(dtype).name))

        if mesh is not None:
            byte_shard = NamedSharding(mesh, P(None, axis_name))
            rep = NamedSharding(mesh, P())
            self.packed = jax.device_put(packed_pad, byte_shard)
            self.valid2d = jax.device_put(valid2d, byte_shard)
            self.mean = jax.device_put(mean_pad, rep)
            self.invsd = jax.device_put(invsd_pad, rep)
        else:
            self.packed = jnp.asarray(packed_pad)
            self.valid2d = jnp.asarray(valid2d)
            self.mean = jnp.asarray(mean_pad)
            self.invsd = jnp.asarray(invsd_pad)

        self._build_fns()
        self._sumsq = _host_sumsq(snp_sumsq, int(p))
        self._trace = None
        self.nops = 0

    def _raw_fns(self):
        bs = self.block_size
        # sumsq is a pure-jnp scan over FULL p_pad rows x the per-shard
        # byte range -- size its decoded block by memory budget, not by
        # the (tile-rounded) kernel block size
        n4_local = (self.nbytes_pad // self.nshards) * PACK_DENSITY
        sumsq_bs = budget_block_size(self.p_pad, n4_local)
        if self.use_pallas:
            from ..kernels import packed_matvec as _pk

            interp = self.use_pallas == "interpret"
            return (partial(_pk.matvec_p, interpret=interp),
                    partial(_pk.crossprod_p, interpret=interp),
                    partial(snp_sumsq_p, block_size=sumsq_bs))
        return (partial(matvec_p, block_size=bs),
                partial(crossprod_p, block_size=bs),
                partial(snp_sumsq_p, block_size=sumsq_bs))

    def _build_fns(self):
        raw_mv, raw_cross, raw_sumsq = self._raw_fns()

        def local_gram(packed, mean, invsd, v, valid2d):
            vmask = valid2d.reshape(-1)[:, None]
            y = raw_mv(packed, mean, invsd, v) * vmask
            return raw_cross(packed, mean, invsd, y)

        def local_prod(packed, mean, invsd, v, valid2d):
            # natural sample order output for this byte range
            y = raw_mv(packed, mean, invsd, v)
            y = y * valid2d.reshape(-1)[:, None]
            nb = packed.shape[1]
            k = y.shape[1]
            return y.reshape(PACK_DENSITY, nb, k).transpose(1, 0, 2).reshape(
                PACK_DENSITY * nb, k)

        def local_sumsq(packed, mean, invsd, valid2d):
            return raw_sumsq(packed, mean, invsd, valid2d.reshape(-1))

        if self.mesh is not None:
            ax = self.axis_name
            byte = P(None, ax)
            rep1 = P(None)
            rep2 = P(None, None)

            def gram_psum(packed, mean, invsd, v, valid2d):
                return lax.psum(local_gram(packed, mean, invsd, v, valid2d),
                                ax)

            def sumsq_psum(packed, mean, invsd, valid2d):
                return lax.psum(
                    local_sumsq(packed, mean, invsd, valid2d), ax)

            from jax import shard_map

            # check_vma=False: a pallas_call inside shard_map trips
            # the vma check (same flag as the ff path)
            gram = shard_map(
                gram_psum, mesh=self.mesh,
                in_specs=(byte, rep1, rep1, rep2, byte), out_specs=rep2,
                check_vma=False)
            prod = shard_map(
                local_prod, mesh=self.mesh,
                in_specs=(byte, rep1, rep1, rep2, byte),
                out_specs=P(ax, None), check_vma=False)
            sumsq = shard_map(
                sumsq_psum, mesh=self.mesh,
                in_specs=(byte, rep1, rep1, byte), out_specs=rep1,
                check_vma=False)
        else:
            gram, prod, sumsq = local_gram, local_prod, local_sumsq

        self._gram_fn = jax.jit(gram)
        self._prod_fn = jax.jit(prod)
        self._sumsq_fn = jax.jit(sumsq)
        self._pure_gram = (
            lambda v, packed, mean, invsd, valid2d:
                gram(packed, mean, invsd, v, valid2d))

    # -- solver interface (SNP space; no permutation needed) ---------------
    @property
    def op_dim(self) -> int:
        return self.p_pad

    def permute(self, v):
        v = jnp.asarray(v, self.dtype)
        pad = self.p_pad - self.n_snps
        if pad:
            widths = ((0, pad), (0, 0)) if v.ndim == 2 else ((0, pad),)
            v = jnp.pad(v, widths)
        return v

    def permute_np(self, v):
        """Host-side twin of :meth:`permute` (numpy in/out)."""
        v = np.asarray(v)
        pad = self.p_pad - self.n_snps
        if pad:
            widths = ((0, pad), (0, 0)) if v.ndim == 2 else ((0, pad),)
            v = np.pad(v, widths)
        return v

    def unpermute(self, u):
        return u[: self.n_snps]

    def gram_permuted(self, v):
        """u = X^T X v in (padded) SNP space; (p_pad,) or (p_pad, k)."""
        vec = v.ndim == 1
        v2 = v[:, None] if vec else v
        u = self._gram_fn(self.packed, self.mean, self.invsd, v2,
                          self.valid2d)
        self.nops += 1
        return u[:, 0] if vec else u

    def gram_pure(self):
        """(fn, operands): see PackedOperator.gram_pure."""
        return self._pure_gram, (self.packed, self.mean, self.invsd,
                                 self.valid2d)

    def prod(self, v):
        """y = X v: (p,) or (p, k) -> (N,) or (N, k), natural order."""
        v2 = jnp.asarray(v, self.dtype)
        vec = v2.ndim == 1
        if vec:
            v2 = v2[:, None]
        if v2.shape[0] != self.n_snps:
            raise ValueError("prod: expected leading dim n_snps")
        v2 = self.permute(v2)
        y = self._prod_fn(self.packed, self.mean, self.invsd, v2,
                          self.valid2d)
        y = y[: self.n_samples]
        self.nops += 1
        return y[:, 0] if vec else y

    # -- compensated (two-float) product -------------------------------------
    @property
    def supports_ff(self) -> bool:
        """The tall ff gram rides the fused Pallas kernels only (the
        jnp fallback has no tall composition; CPU tests run the kernels
        interpreted via use_pallas='interpret')."""
        return bool(self.use_pallas)

    def _ff(self):
        if getattr(self, "_ff_state", None) is None:
            if not self.use_pallas:
                raise NotImplementedError(
                    "tall compensated gram needs the Pallas kernels "
                    "(use_pallas=True or 'interpret')")
            from ..kernels import packed_matvec as _pk
            from .compensated import code_value_luts

            lh, ll = code_value_luts(self.center, self.scale, self.p_pad)
            if self.mesh is not None:
                rep = NamedSharding(self.mesh, P())
                lut_hi = jax.device_put(lh, rep)
                lut_lo = jax.device_put(ll, rep)
            else:
                lut_hi = jnp.asarray(lh)
                lut_lo = jnp.asarray(ll)
            interp = self.use_pallas == "interpret"
            raw = partial(_pk.gram_tall_ff_p, interpret=interp)

            if self.mesh is not None:
                from jax import shard_map

                ax = self.axis_name
                byte = P(None, ax)
                rep1, rep2 = P(None), P(None, None)

                def gram_ff_psum(packed, lut_hi, lut_lo, mean, invsd,
                                 v2, valid2d):
                    hi, lo = raw(packed, lut_hi, lut_lo, mean, invsd,
                                 v2, valid2d)
                    return lax.psum(hi, ax), lax.psum(lo, ax)

                gram_ff = shard_map(
                    gram_ff_psum, mesh=self.mesh,
                    in_specs=(byte, rep2, rep2, rep1, rep1, rep2, byte),
                    out_specs=(rep2, rep2),
                    # a pallas_call inside shard_map trips the vma check
                    check_vma=False)
            else:
                gram_ff = raw
            self._ff_state = (jax.jit(gram_ff), lut_hi, lut_lo)
        return self._ff_state

    def gram_ff_permuted(self, v):
        """(z_hi, z_lo) two-float pair of X^T X v in (padded) SNP
        space; see PackedOperator.gram_ff_permuted."""
        fn, lut_hi, lut_lo = self._ff()
        vec = v.ndim == 1
        v2 = v[:, None] if vec else v
        hi, lo = fn(self.packed, lut_hi, lut_lo, self.mean, self.invsd,
                    v2, self.valid2d)
        self.nops += 1
        return (hi[:, 0], lo[:, 0]) if vec else (hi, lo)

    @property
    def snp_sumsq(self) -> np.ndarray:
        if self._sumsq is None:
            sq = self._sumsq_fn(self.packed, self.mean, self.invsd,
                                self.valid2d)
            self._sumsq = np.asarray(sq, dtype=np.float64)[: self.n_snps]
        return self._sumsq

    @property
    def trace(self) -> float:
        """trace(X^T X) = trace(X X^T) = sum of squares of X
        (scalar fetch; see PackedOperator.trace)."""
        if self._sumsq is not None:
            return float(self._sumsq.sum())
        if self._trace is None:
            sq = self._sumsq_fn(self.packed, self.mean, self.invsd,
                                self.valid2d)
            self._trace = float(jnp.sum(sq))
        return self._trace


class StreamingPackedOperator(LinearOperatorBase):
    """Bounded-device-memory operator: the packed genotypes stay on the
    HOST (numpy array or .bed memmap) and stream to the device block by
    block during each product -- the direct analog of the reference's
    disk-streaming ``SVDWideOnline`` (svdwide.cpp:21-68) with the
    host->HBM boundary in place of disk->RAM.

    Device memory is bounded by two block buffers regardless of p, so a
    cohort larger than HBM (the reference's ">= 1M individuals" claim,
    README.md:12) still runs on one chip.  Successive ``device_put`` +
    jitted-accumulate calls pipeline naturally: JAX dispatch is async,
    so block i+1 uploads while block i computes.

    With a ``mesh`` each staged block is additionally SNP-sharded over
    the devices (per-device memory = block/nshards, partial products
    psum'd over ICI) -- the multi-chip generalization for cohorts
    larger than even the AGGREGATE device memory.
    """

    def __init__(
        self,
        source,
        mean: np.ndarray,
        sd: np.ndarray,
        n_samples: int,
        *,
        block_snps: int | None = None,
        memory_mb: int | None = None,
        dtype=jnp.float32,
        use_pallas: bool | str | None = None,
        mesh: Mesh | None = None,
        axis_name: str = "snps",
        snp_sumsq: np.ndarray | None = None,
        cache_mb: int | str | None = "auto",
        prefetch: bool | None = None,
    ):
        from ..io.plink import PlinkDataset

        if isinstance(source, PlinkDataset):
            packed = source._map()          # np.memmap: blocks read lazily
        else:
            packed = np.asarray(source)
        p, nbytes = packed.shape
        if nbytes != bytes_per_snp(n_samples):
            raise ValueError("packed width does not match n_samples")
        self.n_samples = int(n_samples)
        self.n_snps = int(p)
        self.nbytes = int(nbytes)
        self.dtype = dtype
        self._host_packed = packed
        self.center = np.asarray(mean, dtype=np.float64)
        self.scale = np.asarray(sd, dtype=np.float64)
        self.mesh = mesh
        self.axis_name = axis_name
        self.nshards = mesh.shape[axis_name] if mesh is not None else 1

        use_pallas = PackedOperator.resolve_use_pallas(use_pallas, dtype)
        self.use_pallas = use_pallas
        if use_pallas:
            unit = 512 if nbytes > 4096 else 128
            nbytes_pad = ((nbytes + unit - 1) // unit) * unit
        else:
            nbytes_pad = nbytes
        self.nbytes_pad = int(nbytes_pad)
        self.n4 = nbytes_pad * PACK_DENSITY

        self._memory_bounded = memory_mb is not None
        if block_snps is None:
            if memory_mb is not None:
                # --memory semantics: two packed block buffers on device
                block_snps = max(1, (memory_mb << 20) // (2 * nbytes_pad))
            else:
                block_snps = max(1, (1 << 30) // nbytes_pad)  # ~1 GiB
        t = _TILE_P if use_pallas else 1
        chunk = t * self.nshards
        block_snps = max(chunk, (min(block_snps, p) // chunk) * chunk)
        self.block_snps = int(block_snps)
        self.n_blocks = -(-p // block_snps)
        self.p_pad = self.n_blocks * block_snps

        mean_f, invsd_f = lookup_tables(mean, sd, dtype=jnp.dtype(dtype).type)
        self._mean_pad = np.zeros(self.p_pad, dtype=mean_f.dtype)
        self._mean_pad[:p] = mean_f
        self._invsd_pad = np.zeros(self.p_pad, dtype=invsd_f.dtype)
        self._invsd_pad[:p] = invsd_f

        self._valid = valid_mask_permuted(n_samples, nbytes_pad, dtype)
        self._build_fns()
        self._sumsq = _host_sumsq(snp_sumsq, int(p))
        self._trace = None
        self._stage = None
        self._inflight = [None, None]
        self.nops = 0
        # device-side block residency (the general form of the
        # reference's single-block optimization, svdwide.cpp:32-40:
        # when one block covers the data, keep it and skip re-reads).
        # The FIRST n_cached blocks stay pinned on device after their
        # first staging; later products re-stage only the remainder.
        # A pinned PREFIX (not LRU) deliberately: products scan blocks
        # cyclically, and an LRU smaller than the working set gets zero
        # hits on a cyclic scan.
        self.cache_mb = cache_mb
        self._cache: dict = {}
        self._n_cached: int | None = None
        self.staged_host_blocks = 0   # observability: actual host reads
        # host-fill prefetch thread (overlaps disk/memmap reads with
        # device compute; the reference reads synchronously inside its
        # block loop, data.cpp:250).  Opt-in: constructor arg, else
        # FLASHPCA_STREAM_PREFETCH=1.
        if prefetch is None:
            prefetch = os.environ.get("FLASHPCA_STREAM_PREFETCH") == "1"
        self._prefetch = bool(prefetch)
        self._prefetch_pool = None
        # staging-phase timers (VERDICT r4 item 2: separate host-fill
        # cost from upload cost when a streaming pass collapses)
        self._stage_stats = {"fill_s": 0.0, "put_s": 0.0, "sync_s": 0.0,
                             "wait_s": 0.0, "staged_bytes": 0}

    def _raw(self):
        # under a mesh the raw fns see PER-SHARD rows, so the inner
        # scan block size must divide block_snps / nshards
        per = self.block_snps // self.nshards
        # sumsq decodes (bs, n4) inside a jnp scan: budget its block
        # (the whole staged block's rows would decode ~16x the packed
        # gigabytes at biobank n4 and OOM the trace pass -- review r2)
        n4 = self.nbytes_pad * PACK_DENSITY
        sumsq_bs = budget_block_size(per, n4)
        if self.use_pallas:
            from ..kernels import packed_matvec as _pk

            interp = self.use_pallas == "interpret"
            return (partial(_pk.gram_matvec_p, interpret=interp),
                    partial(_pk.crossprod_p, interpret=interp),
                    partial(_pk.matvec_p, interpret=interp),
                    partial(snp_sumsq_p, block_size=sumsq_bs))
        bs = budget_block_size(per, n4, cap=8192)
        return (partial(gram_matvec_p, block_size=bs),
                partial(crossprod_p, block_size=bs),
                partial(matvec_p, block_size=bs),
                partial(snp_sumsq_p, block_size=sumsq_bs))

    def _build_fns(self):
        raw_gram, raw_cross, raw_mv, raw_sumsq = self._raw()

        if self.mesh is not None:
            # streaming x mesh: each staged block is SNP-row-sharded
            # over the devices, partial products psum over ICI -- the
            # multi-chip path for cohorts larger than aggregate HBM
            # (per-device memory = block/nshards).
            from jax import shard_map

            ax = self.axis_name
            row, snp = P(ax, None), P(ax)
            rep, v1 = P(None, None), P(None)

            # check_vma=False: a pallas_call inside shard_map trips
            # the vma check (same flag as the ff path)
            gram_shard = shard_map(
                lambda pb, mb, ib, xp, valid: lax.psum(
                    raw_gram(pb, mb, ib, xp * valid[:, None]), ax),
                mesh=self.mesh,
                in_specs=(row, snp, snp, rep, v1), out_specs=rep,
                check_vma=False)
            cross_shard = shard_map(
                lambda pb, mb, ib, xp, valid: raw_cross(
                    pb, mb, ib, xp * valid[:, None]),
                mesh=self.mesh,
                in_specs=(row, snp, snp, rep, v1), out_specs=row,
                check_vma=False)
            mv_shard = shard_map(
                lambda pb, mb, ib, vb, valid: lax.psum(
                    raw_mv(pb, mb, ib, vb), ax),
                mesh=self.mesh,
                in_specs=(row, snp, snp, row, v1), out_specs=rep,
                check_vma=False)
            sumsq_shard = shard_map(
                raw_sumsq, mesh=self.mesh,
                in_specs=(row, snp, snp, v1), out_specs=snp,
                check_vma=False)

            def gram_acc(pb, mb, ib, xp, valid, acc):
                return acc + gram_shard(pb, mb, ib, xp, valid)

            def cross_blk(pb, mb, ib, xp, valid):
                return cross_shard(pb, mb, ib, xp, valid)

            def mv_acc(pb, mb, ib, vb, valid, acc):
                return acc + mv_shard(pb, mb, ib, vb, valid)

            def sumsq_blk(pb, mb, ib, valid):
                return sumsq_shard(pb, mb, ib, valid)
        else:
            def gram_acc(pb, mb, ib, xp, valid, acc):
                return acc + raw_gram(pb, mb, ib, xp * valid[:, None])

            def cross_blk(pb, mb, ib, xp, valid):
                return raw_cross(pb, mb, ib, xp * valid[:, None])

            def mv_acc(pb, mb, ib, vb, valid, acc):
                return acc + raw_mv(pb, mb, ib, vb)

            def sumsq_blk(pb, mb, ib, valid):
                return raw_sumsq(pb, mb, ib, valid)

        self._gram_acc = jax.jit(gram_acc)
        self._cross_blk = jax.jit(cross_blk)
        self._mv_acc = jax.jit(mv_acc)
        self._sumsq_blk = jax.jit(sumsq_blk)

    # -- block staging -----------------------------------------------------
    def _resolve_cache_blocks(self) -> int:
        """Number of leading blocks pinned on device (see __init__).

        ``cache_mb``: explicit MB budget, 'auto' (on TPU, half the
        device's HBM limit minus two staging buffers -- conservative,
        since the streaming operator exists precisely because the data
        may exceed HBM; elsewhere 0, keeping CPU test semantics pure
        streaming), or None/0 for off."""
        if self._n_cached is None:
            block_bytes = self.block_snps * self.nbytes_pad
            if not self.cache_mb:
                n = 0
            elif self.cache_mb == "auto":
                n = 0
                # an explicit --memory bound means the USER capped
                # device memory at two block buffers; auto-pinning
                # beyond it would violate that contract (pass cache_mb
                # explicitly to combine the two)
                if (jax.default_backend() == "tpu"
                        and not self._memory_bounded):
                    # same 16 GB default as resolve_streaming: some
                    # backends (axon) report no bytes_limit at all
                    ms = jax.devices()[0].memory_stats()
                    limit = (ms or {}).get("bytes_limit", 16 << 30)
                    budget = limit // 2 - 2 * block_bytes
                    n = max(0, int(budget // max(1, block_bytes)))
            else:
                n = int((int(self.cache_mb) << 20) // max(1, block_bytes))
            self._n_cached = min(n, self.n_blocks)
        return self._n_cached

    def _prep_host_block(self, i: int, buf: np.ndarray | None = None):
        """Fill a host staging buffer with block ``i``'s packed bytes
        (zero-padded tail); returns (buf, lo, hi).  Pure numpy + source
        reads, so it is safe on the prefetch thread.  A passed ``buf``
        (staging-buffer reuse) is rewritten in place."""
        bs = self.block_snps
        lo = i * bs
        hi = min(lo + bs, self.n_snps)
        t0 = time.perf_counter()
        if buf is None:
            buf = np.zeros((bs, self.nbytes_pad), dtype=np.uint8)
        elif hi - lo < bs:
            buf[hi - lo:] = 0
        buf[: hi - lo, : self.nbytes] = self._host_packed[lo:hi]
        st = self._stage_stats
        st["fill_s"] += time.perf_counter() - t0
        st["staged_bytes"] += (hi - lo) * self.nbytes
        return buf, lo, hi

    def _pool(self):
        if self._prefetch_pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._prefetch_pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="flashpca-stage")
        return self._prefetch_pool

    def close(self) -> None:
        """Release the prefetch worker thread (idempotent).  Long-lived
        processes constructing many prefetch-enabled operators should
        call this (or drop the operator -- ``__del__`` covers it) so
        idle workers don't accumulate."""
        pool, self._prefetch_pool = self._prefetch_pool, None
        if pool is not None:
            pool.shutdown(wait=False, cancel_futures=True)

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def _blocks(self):
        """Yield (packed_dev, mean_dev, invsd_dev, start, size) per block.
        device_put is async: the next block uploads while the previous
        one computes.  The first ``_resolve_cache_blocks()`` blocks are
        served from the device-resident cache after their first staging.

        With ``prefetch`` on, the host fill (disk/memmap read + memcpy
        into the staging buffer) of block i+1 runs on a background
        thread while block i's device_put/compute dispatches -- the
        double-buffered read/stage overlap the reference lacks (its
        ifstream read is synchronous inside the block loop,
        data.cpp:250).

        Staging-buffer reuse (FLASHPCA_STAGE_REUSE=1, default OFF)
        double-buffers two preallocated host arrays instead of a fresh
        allocation per block, syncing on the device array created from
        the same buffer two blocks ago before rewriting it.  It is
        OPT-IN because it is only safe where (a) device_put does not
        alias the numpy buffer (it may on CPU) and (b) block_until_ready
        truly waits for the host->device copy -- on remote-tunnel
        backends it can return early (see CLAUDE.md), making the
        rewrite race unverifiable, so the safe default is a fresh
        buffer per block.  Cached blocks never ride the reuse buffers
        (their bytes must outlive the staging cycle); prefetch and
        reuse are mutually exclusive (prefetch wins -- its own bounded
        queue already caps host allocation at ~2 blocks)."""
        bs = self.block_snps
        n_cached = self._resolve_cache_blocks()
        reuse = (os.environ.get("FLASHPCA_STAGE_REUSE") == "1"
                 and jax.default_backend() != "cpu")
        prefetch = self._prefetch
        reuse = reuse and not prefetch   # prefetch wins (the safe path)
        if reuse and self._stage is None:
            self._stage = [
                np.zeros((bs, self.nbytes_pad), dtype=np.uint8)
                for _ in range(2)
            ]
        # persists ACROSS products: back-to-back unforced products would
        # otherwise rewrite a buffer whose previous-call copy is still
        # in flight
        inflight = self._inflight
        if self.mesh is not None:
            row_sh = NamedSharding(self.mesh, P(self.axis_name, None))
            snp_sh = NamedSharding(self.mesh, P(self.axis_name))
        # diagnosis mode: force each staged block's transfer to finish
        # before moving on, so its cost lands in sync_s instead of
        # hiding inside the next compute (block_until_ready can return
        # early over remote tunnels -- a computed scalar cannot lie)
        sync = os.environ.get("FLASHPCA_STREAM_SYNC") == "1"
        # backpressure mode: force completion every M staged blocks.
        # device_put is lazy and the client pins every staging buffer
        # until its transfer drains, so a many-pass solve dispatched
        # ahead of a slow link accumulates unbounded host RAM (r5: a
        # 17 GB beyond-HBM run OOM-killed at ~112 GB RSS mid-polish).
        # A periodic computed-scalar sync (~0.1 s) bounds the backlog
        # to ~M blocks; block_until_ready cannot (it lies there).
        sync_every = int(os.environ.get(
            "FLASHPCA_STREAM_SYNC_EVERY", "0") or 0)
        st = self._stage_stats
        pending: dict = {}

        def submit(j):
            """Queue the host fill of the first non-cached block >= j."""
            while j < self.n_blocks and j in self._cache:
                j += 1
            if j < self.n_blocks and j not in pending:
                pending[j] = self._pool().submit(self._prep_host_block, j)

        if prefetch:
            submit(0)
        seq = 0   # staging-buffer parity counts STREAMED blocks only
        for i in range(self.n_blocks):
            lo = i * bs
            hi = min(lo + bs, self.n_snps)
            cached = self._cache.get(i)
            if cached is not None:
                pb, mb, ib = cached
                yield (pb, mb, ib, lo, hi - lo)
                continue
            pin = i < n_cached
            if prefetch:
                fut = pending.pop(i, None)
                submit(i + 1)   # keep the worker busy while we wait
                if fut is not None:
                    t0 = time.perf_counter()
                    buf, lo, hi = fut.result()
                    st["wait_s"] += time.perf_counter() - t0
                else:
                    buf, lo, hi = self._prep_host_block(i)
            elif reuse and not pin:
                buf0 = self._stage[seq % 2]
                if inflight[seq % 2] is not None:
                    t0 = time.perf_counter()
                    inflight[seq % 2].block_until_ready()
                    st["wait_s"] += time.perf_counter() - t0
                buf, lo, hi = self._prep_host_block(i, buf0)
            else:
                buf, lo, hi = self._prep_host_block(i)
            t0 = time.perf_counter()
            if self.mesh is not None:
                pb = jax.device_put(buf, row_sh)
                mb = jax.device_put(self._mean_pad[lo: lo + bs], snp_sh)
                ib = jax.device_put(self._invsd_pad[lo: lo + bs], snp_sh)
            else:
                pb = jax.device_put(buf)
                mb = jax.device_put(self._mean_pad[lo: lo + bs])
                ib = jax.device_put(self._invsd_pad[lo: lo + bs])
            st["put_s"] += time.perf_counter() - t0
            self.staged_host_blocks += 1
            if sync or (sync_every
                        and self.staged_host_blocks % sync_every == 0):
                t0 = time.perf_counter()
                float(jnp.sum(pb))
                st["sync_s"] += time.perf_counter() - t0
            if pin:
                self._cache[i] = (pb, mb, ib)
            elif reuse:
                inflight[seq % 2] = pb
                seq += 1
            yield (pb, mb, ib, lo, hi - lo)

    def stats(self) -> dict:
        """Staging observability (VERDICT r4 item 2): cumulative
        host-fill seconds, device_put dispatch seconds, forced-transfer
        seconds (``FLASHPCA_STREAM_SYNC=1`` diagnosis mode; normally
        transfers complete lazily inside compute and ``sync_s`` stays
        ~0), prefetch/reuse wait seconds, staged block/byte counts, and
        cache residency -- enough to tell "the upload path is slow"
        apart from "the host staging is slow" when a streaming pass
        collapses (the reference's analog is its verbose per-block
        logging, svdwide.cpp:53-54)."""
        s = dict(self._stage_stats)
        s.update(
            nops=self.nops,
            staged_host_blocks=self.staged_host_blocks,
            n_blocks=self.n_blocks,
            n_cached=self._resolve_cache_blocks(),
            block_bytes=self.block_snps * self.nbytes_pad,
            packed_bytes=self.n_snps * self.nbytes,
            prefetch=self._prefetch,
        )
        return s

    def reset_stats(self) -> None:
        """Zero the cumulative counters (cache residency is kept)."""
        self.nops = 0
        self.staged_host_blocks = 0
        for k in self._stage_stats:
            self._stage_stats[k] = 0

    # -- products ----------------------------------------------------------
    def _gram(self, x2):
        xp = permute_samples(x2, self.nbytes_pad)
        acc = jnp.zeros_like(xp)
        for pb, mb, ib, _, _ in self._blocks():
            acc = self._gram_acc(pb, mb, ib, xp, self._valid, acc)
        self.nops += 1
        acc = acc * self._valid[:, None]
        return unpermute_samples(acc, self.n_samples)

    def gram_permuted(self, xp):
        vec = xp.ndim == 1
        xp2 = xp[:, None] if vec else xp
        acc = jnp.zeros_like(xp2)
        xp2 = xp2 * self._valid[:, None]
        for pb, mb, ib, _, _ in self._blocks():
            acc = self._gram_acc(pb, mb, ib, xp2, self._valid, acc)
        self.nops += 1
        acc = acc * self._valid[:, None]
        return acc[:, 0] if vec else acc

    @property
    def op_dim(self) -> int:
        return self.n4

    def permute(self, x):
        return permute_samples(jnp.asarray(x, self.dtype), self.nbytes_pad)

    def permute_np(self, x):
        """Host-side twin of :meth:`permute` (numpy in/out) -- lets the
        solver seed v0 with zero device traffic (review r2)."""
        return permute_samples_np(x, self.nbytes_pad)

    def unpermute(self, yp):
        return unpermute_samples(yp, self.n_samples)

    def _crossprod(self, x2):
        xp = permute_samples(x2, self.nbytes_pad)
        outs = []
        for pb, mb, ib, _, _ in self._blocks():
            outs.append(self._cross_blk(pb, mb, ib, xp, self._valid))
        self.nops += 1
        return jnp.concatenate(outs, axis=0)[: self.n_snps]

    def _prod(self, v2):
        pad = self.p_pad - self.n_snps
        if pad:
            v2 = jnp.pad(v2, ((0, pad), (0, 0)))
        acc = jnp.zeros((self.n4, v2.shape[1]), self.dtype)
        bs = self.block_snps
        for pb, mb, ib, lo, _ in self._blocks():
            acc = self._mv_acc(pb, mb, ib,
                               lax.dynamic_slice_in_dim(v2, lo, bs, 0),
                               self._valid, acc)
        self.nops += 1
        acc = acc * self._valid[:, None]
        return unpermute_samples(acc, self.n_samples)

    # -- compensated (two-float) product -------------------------------------
    def _ff(self):
        """Lazy per-staged-block compensated gram accumulate (host loop
        twin of PackedOperator._ff; see ops/compensated.py)."""
        if getattr(self, "_ff_state", None) is None:
            from .compensated import (code_value_luts, default_chunk,
                                      gram_ff_p, twosum)

            lh, ll = code_value_luts(self.center, self.scale, self.p_pad)
            if self.use_pallas:
                from ..kernels import packed_matvec as _pk

                interp = self.use_pallas == "interpret"
                raw = partial(_pk.gram_ff_p, interpret=interp)
            else:
                inner = budget_block_size(self.block_snps // self.nshards,
                                          self.n4, itemsize=8,
                                          cap=default_chunk())
                raw = partial(gram_ff_p, block_size=inner)

            if self.mesh is not None:
                from jax import shard_map

                ax = self.axis_name
                row, rep, v1 = P(ax, None), P(None, None), P(None)
                blk = shard_map(
                    lambda pb, bh, bl, xp: tuple(
                        lax.psum(t, ax) for t in raw(pb, bh, bl, xp)),
                    mesh=self.mesh,
                    in_specs=(row, row, row, rep), out_specs=(rep, rep),
                    check_vma=False)
            else:
                blk = raw

            def acc(pb, bh, bl, xp, y_hi, y_err):
                t_hi, t_err = blk(pb, bh, bl, xp)
                y_hi, e = twosum(y_hi, t_hi)
                return y_hi, y_err + e + t_err

            self._ff_state = (jax.jit(acc), lh, ll)
        return self._ff_state

    def gram_ff_permuted(self, xp):
        """(y_hi, y_lo) two-float pair of X X^T xp, permuted space
        (one streamed pass; see PackedOperator.gram_ff_permuted)."""
        acc, lh, ll = self._ff()
        vec = xp.ndim == 1
        xp2 = xp[:, None] if vec else xp
        xp2 = xp2 * self._valid[:, None]
        y_hi = jnp.zeros_like(xp2)
        y_err = jnp.zeros_like(xp2)
        bs = self.block_snps
        if self.mesh is not None:
            row_sh = NamedSharding(self.mesh, P(self.axis_name, None))
        for pb, _, _, lo, _ in self._blocks():
            bh, bl = lh[lo: lo + bs], ll[lo: lo + bs]
            if self.mesh is not None:
                bh = jax.device_put(bh, row_sh)
                bl = jax.device_put(bl, row_sh)
            y_hi, y_err = acc(pb, bh, bl, xp2, y_hi, y_err)
        self.nops += 1
        v = self._valid[:, None]
        y_hi, y_err = y_hi * v, y_err * v
        return (y_hi[:, 0], y_err[:, 0]) if vec else (y_hi, y_err)

    def perform_op_ff(self, x):
        """Sample-space twin of :meth:`gram_ff_permuted`."""
        x2, vec = self._as_2d(x, self.n_samples, "perform_op_ff")
        hi, lo = self.gram_ff_permuted(permute_samples(x2, self.nbytes_pad))
        hi = unpermute_samples(hi, self.n_samples)
        lo = unpermute_samples(lo, self.n_samples)
        return (hi[:, 0], lo[:, 0]) if vec else (hi, lo)

    @property
    def snp_sumsq(self) -> np.ndarray:
        if self._sumsq is None:
            outs = []
            for pb, mb, ib, _, _ in self._blocks():
                outs.append(fetch_global(
                    self._sumsq_blk(pb, mb, ib, self._valid),
                    dtype=np.float64))
            self._sumsq = np.concatenate(outs)[: self.n_snps]
        return self._sumsq

    @property
    def trace(self) -> float:
        """Per-block scalar sums (pad rows are inert), one scalar
        fetch per block."""
        if self._sumsq is not None:
            return float(self._sumsq.sum())
        if self._trace is None:
            tot = 0.0
            for pb, mb, ib, _, _ in self._blocks():
                tot += float(jnp.sum(
                    self._sumsq_blk(pb, mb, ib, self._valid)))
            self._trace = tot
        return self._trace


class TallStreamingOperator:
    """Tall-path streaming operator: the p x p Gram ``X^T X`` with the
    packed genotypes HOST-resident, streamed to the device in
    SAMPLE(byte)-axis blocks -- the bounded-device-memory composition
    the reference stubbed twice over (``SVDTallOnline`` is dead code,
    svdtall.cpp:21-343, and even its wide streaming design,
    svdwide.cpp:21-68, only ever blocks the SNP axis).  An n >> p
    cohort larger than HBM (5M+ individuals) finally has a tall route:
    without it the only streaming fallback is the wide X X^T whose
    n x n iterate is the wrong problem at that scale (VERDICT r3
    missing #2).

    Per staged block b (a byte-column range = a sample range), the
    gram accumulates ``acc += X_b^T (X_b v)`` -- two fused kernel
    applications per block; with a ``mesh`` each staged block is
    additionally byte-split across the devices and the partial products
    psum over ICI.  The length-p iterate and solver state stay
    replicated; device memory is bounded by two (p_pad, block_bytes)
    buffers plus the optional pinned-prefix block cache
    (``cache_mb='auto'``, same residency rule as the wide
    StreamingPackedOperator).

    IO note: a byte-column slice of the SNP-major .bed reads a strided
    window from every SNP row per block (p short reads / block).  On a
    memmap the page cache amortizes this across blocks; the byte axis
    is still the only axis whose blocks bound device memory in the
    tall regime (the SNP axis is the SMALL axis here).
    """

    def __init__(
        self,
        source,
        mean: np.ndarray,
        sd: np.ndarray,
        n_samples: int,
        *,
        block_bytes: int | None = None,
        memory_mb: int | None = None,
        dtype=jnp.float32,
        use_pallas: bool | str | None = None,
        mesh: Mesh | None = None,
        axis_name: str = "samples",
        snp_sumsq: np.ndarray | None = None,
        cache_mb: int | str | None = "auto",
    ):
        from ..io.plink import PlinkDataset

        if isinstance(source, PlinkDataset):
            packed = source._map()          # np.memmap: blocks read lazily
        else:
            packed = np.asarray(source)
        p, nbytes = packed.shape
        if nbytes != bytes_per_snp(n_samples):
            raise ValueError("packed width does not match n_samples")
        self.n_samples = int(n_samples)
        self.n_snps = int(p)
        self.nbytes = int(nbytes)
        self.dtype = dtype
        self._host_packed = packed
        self.center = np.asarray(mean, dtype=np.float64)
        self.scale = np.asarray(sd, dtype=np.float64)
        self.mesh = mesh
        self.axis_name = axis_name
        self.nshards = mesh.shape[axis_name] if mesh is not None else 1

        use_pallas = PackedOperator.resolve_use_pallas(use_pallas, dtype)
        self.use_pallas = use_pallas

        # SNP rows pad to whole kernel tiles ONCE (the small axis --
        # a few hundred KB of zero rows at worst); byte blocks pad to
        # the kernel's byte-tile unit per shard
        if use_pallas:
            t = _TILE_P
            p_pad = -(-p // t) * t
            unit = 512 if nbytes > 4096 * self.nshards else 128
        else:
            p_pad = p
            unit = 4
        self.p_pad = int(p_pad)
        chunk = unit * self.nshards

        self._memory_bounded = memory_mb is not None
        if block_bytes is None:
            if memory_mb is not None:
                # --memory semantics: two staged device buffers
                block_bytes = max(1, (memory_mb << 20) // (2 * p_pad))
            else:
                block_bytes = max(1, (1 << 30) // p_pad)   # ~1 GiB
        block_bytes = max(chunk, (min(block_bytes, nbytes) // chunk) * chunk)
        self.block_bytes = int(block_bytes)
        self.n_blocks = -(-nbytes // block_bytes)
        self.nbytes_pad = self.n_blocks * block_bytes

        mean_f, invsd_f = lookup_tables(mean, sd, dtype=jnp.dtype(dtype).type)
        mean_pad = np.zeros(p_pad, dtype=mean_f.dtype)
        mean_pad[:p] = mean_f
        invsd_pad = np.zeros(p_pad, dtype=invsd_f.dtype)
        invsd_pad[:p] = invsd_f
        if mesh is not None:
            rep = NamedSharding(mesh, P())
            self.mean = jax.device_put(mean_pad, rep)
            self.invsd = jax.device_put(invsd_pad, rep)
        else:
            self.mean = jnp.asarray(mean_pad)
            self.invsd = jnp.asarray(invsd_pad)

        self._build_fns()
        self._sumsq = _host_sumsq(snp_sumsq, int(p))
        self._trace = None
        self.cache_mb = cache_mb
        self._cache: dict = {}
        self._n_cached: int | None = None
        self.staged_host_blocks = 0
        self.nops = 0
        self._stage_stats = {"fill_s": 0.0, "put_s": 0.0,
                             "staged_bytes": 0}

    # -- per-block compiled programs ---------------------------------------
    def _raw(self):
        bb = self.block_bytes // self.nshards
        n4_local = bb * PACK_DENSITY
        sumsq_bs = budget_block_size(self.p_pad, n4_local)
        if self.use_pallas:
            from ..kernels import packed_matvec as _pk

            interp = self.use_pallas == "interpret"
            return (partial(_pk.matvec_p, interpret=interp),
                    partial(_pk.crossprod_p, interpret=interp),
                    partial(snp_sumsq_p, block_size=sumsq_bs))
        bs = budget_block_size(self.p_pad, n4_local, cap=8192)
        return (partial(matvec_p, block_size=bs),
                partial(crossprod_p, block_size=bs),
                partial(snp_sumsq_p, block_size=sumsq_bs))

    def _build_fns(self):
        raw_mv, raw_cross, raw_sumsq = self._raw()

        def local_gram(pb, mean, invsd, v, valid2d):
            y = raw_mv(pb, mean, invsd, v) * valid2d.reshape(-1)[:, None]
            return raw_cross(pb, mean, invsd, y)

        def local_prod(pb, mean, invsd, v, valid2d):
            # natural sample order for this byte range
            y = raw_mv(pb, mean, invsd, v)
            y = y * valid2d.reshape(-1)[:, None]
            nb, k = pb.shape[1], y.shape[1]
            return y.reshape(PACK_DENSITY, nb, k).transpose(1, 0, 2).reshape(
                PACK_DENSITY * nb, k)

        def local_cross(pb, mean, invsd, xp, valid2d):
            return raw_cross(pb, mean, invsd,
                             xp * valid2d.reshape(-1)[:, None])

        def local_sumsq(pb, mean, invsd, valid2d):
            return raw_sumsq(pb, mean, invsd, valid2d.reshape(-1))

        if self.mesh is not None:
            from jax import shard_map

            ax = self.axis_name
            byte = P(None, ax)
            rep1, rep2 = P(None), P(None, None)

            # check_vma=False throughout: a pallas_call inside
            # shard_map trips the vma check (same as the ff paths)
            gram = shard_map(
                lambda pb, m, iv, v, va: lax.psum(
                    local_gram(pb, m, iv, v, va), ax),
                mesh=self.mesh,
                in_specs=(byte, rep1, rep1, rep2, byte), out_specs=rep2,
                check_vma=False)
            prod = shard_map(
                local_prod, mesh=self.mesh,
                in_specs=(byte, rep1, rep1, rep2, byte),
                out_specs=P(ax, None), check_vma=False)
            cross = shard_map(
                # xp arrives as a (4, bb, k) view of the block's
                # PERMUTED sample segment so its byte axis can shard
                # alongside the packed bytes; the local fn flattens it
                # back to the plane-major (4*bb_local, k) kernel layout
                lambda pb, m, iv, xp3, va: lax.psum(
                    local_cross(pb, m, iv,
                                xp3.reshape(-1, xp3.shape[2]), va), ax),
                mesh=self.mesh,
                in_specs=(byte, rep1, rep1, P(None, ax, None), byte),
                out_specs=rep2, check_vma=False)
            sumsq = shard_map(
                lambda pb, m, iv, va: lax.psum(
                    local_sumsq(pb, m, iv, va), ax),
                mesh=self.mesh,
                in_specs=(byte, rep1, rep1, byte), out_specs=rep1,
                check_vma=False)
        else:
            gram, prod, sumsq = local_gram, local_prod, local_sumsq

            def cross(pb, m, iv, xp3, va):
                return local_cross(pb, m, iv,
                                   xp3.reshape(-1, xp3.shape[2]), va)

        def gram_acc(pb, mean, invsd, v, valid2d, acc):
            return acc + gram(pb, mean, invsd, v, valid2d)

        def cross_acc(pb, mean, invsd, xp3, valid2d, acc):
            return acc + cross(pb, mean, invsd, xp3, valid2d)

        self._gram_acc = jax.jit(gram_acc)
        self._prod_blk = jax.jit(prod)
        self._cross_acc = jax.jit(cross_acc)
        self._sumsq_blk = jax.jit(sumsq)

    # -- block staging ------------------------------------------------------
    def _resolve_cache_blocks(self) -> int:
        """Pinned-prefix device residency, same policy as
        StreamingPackedOperator._resolve_cache_blocks."""
        if self._n_cached is None:
            block_bytes = self.p_pad * self.block_bytes
            if not self.cache_mb:
                n = 0
            elif self.cache_mb == "auto":
                n = 0
                if (jax.default_backend() == "tpu"
                        and not self._memory_bounded):
                    ms = jax.devices()[0].memory_stats()
                    limit = (ms or {}).get("bytes_limit", 16 << 30)
                    budget = limit // 2 - 2 * block_bytes
                    n = max(0, int(budget // max(1, block_bytes)))
            else:
                n = int((int(self.cache_mb) << 20) // max(1, block_bytes))
            self._n_cached = min(n, self.n_blocks)
        return self._n_cached

    def _block_valid(self, lo: int) -> np.ndarray:
        """(4, block_bytes) mask: entry (s, b) covers sample 4(lo+b)+s."""
        bs = self.block_bytes
        sample_idx = (
            PACK_DENSITY * (lo + np.arange(bs))[None, :]
            + np.arange(PACK_DENSITY)[:, None]
        )
        return (sample_idx < self.n_samples).astype(
            np.dtype(jnp.dtype(self.dtype).name))

    def _blocks(self):
        """Yield (packed_dev, valid_dev, lo, size) per byte block;
        device_put is async, so block i+1 uploads while i computes.
        The first ``_resolve_cache_blocks()`` blocks pin on device.
        (No staging-buffer reuse here: unlike the wide path the host
        cost is dominated by the strided column-slice copy, not the
        allocation.)"""
        bs = self.block_bytes
        n_cached = self._resolve_cache_blocks()
        if self.mesh is not None:
            byte_sh = NamedSharding(self.mesh, P(None, self.axis_name))
        for i in range(self.n_blocks):
            lo = i * bs
            hi = min(lo + bs, self.nbytes)
            cached = self._cache.get(i)
            if cached is not None:
                pb, va = cached
                yield (pb, va, lo, hi - lo)
                continue
            t0 = time.perf_counter()
            buf = np.zeros((self.p_pad, bs), dtype=np.uint8)
            buf[: self.n_snps, : hi - lo] = self._host_packed[:, lo:hi]
            va_np = self._block_valid(lo)
            self._stage_stats["fill_s"] += time.perf_counter() - t0
            self._stage_stats["staged_bytes"] += self.n_snps * (hi - lo)
            t0 = time.perf_counter()
            if self.mesh is not None:
                pb = jax.device_put(buf, byte_sh)
                va = jax.device_put(va_np, byte_sh)
            else:
                pb = jax.device_put(buf)
                va = jnp.asarray(va_np)
            self._stage_stats["put_s"] += time.perf_counter() - t0
            self.staged_host_blocks += 1
            if i < n_cached:
                self._cache[i] = (pb, va)
            yield (pb, va, lo, hi - lo)

    # -- solver interface (SNP space, same as TallPackedOperator) ----------
    @property
    def op_dim(self) -> int:
        return self.p_pad

    def permute(self, v):
        v = jnp.asarray(v, self.dtype)
        pad = self.p_pad - self.n_snps
        if pad:
            widths = ((0, pad), (0, 0)) if v.ndim == 2 else ((0, pad),)
            v = jnp.pad(v, widths)
        return v

    def permute_np(self, v):
        v = np.asarray(v)
        pad = self.p_pad - self.n_snps
        if pad:
            widths = ((0, pad), (0, 0)) if v.ndim == 2 else ((0, pad),)
            v = np.pad(v, widths)
        return v

    def unpermute(self, u):
        return u[: self.n_snps]

    def gram_permuted(self, v):
        """u = X^T X v in (padded) SNP space, one streamed pass."""
        vec = v.ndim == 1
        v2 = jnp.asarray(v, self.dtype)
        if vec:
            v2 = v2[:, None]
        acc = jnp.zeros_like(v2)
        for pb, va, _, _ in self._blocks():
            acc = self._gram_acc(pb, self.mean, self.invsd, v2, va, acc)
        self.nops += 1
        return acc[:, 0] if vec else acc

    def prod(self, v):
        """y = X v: (p,) or (p, k) -> (N,) or (N, k), natural order."""
        v2 = jnp.asarray(v, self.dtype)
        vec = v2.ndim == 1
        if vec:
            v2 = v2[:, None]
        if v2.shape[0] != self.n_snps:
            raise ValueError("prod: expected leading dim n_snps")
        v2 = self.permute(v2)
        segs = []
        for pb, va, _, _ in self._blocks():
            segs.append(self._prod_blk(pb, self.mean, self.invsd, v2, va))
        y = jnp.concatenate(segs, axis=0)[: self.n_samples]
        self.nops += 1
        return y[:, 0] if vec else y

    def crossprod(self, x):
        """z = X^T x: (N,) or (N, k) -> (p,) or (p, k)."""
        x2 = jnp.asarray(x, self.dtype)
        vec = x2.ndim == 1
        if vec:
            x2 = x2[:, None]
        if x2.shape[0] != self.n_samples:
            raise ValueError("crossprod: expected leading dim n_samples")
        n4 = self.nbytes_pad * PACK_DENSITY
        pad = n4 - x2.shape[0]
        xpad = jnp.pad(x2, ((0, pad), (0, 0))) if pad else x2
        bs4 = self.block_bytes * PACK_DENSITY
        acc = jnp.zeros((self.p_pad, x2.shape[1]), self.dtype)
        for pb, va, lo, _ in self._blocks():
            seg = lax.dynamic_slice_in_dim(xpad, lo * PACK_DENSITY, bs4, 0)
            xp3 = permute_samples(seg, self.block_bytes).reshape(
                PACK_DENSITY, self.block_bytes, x2.shape[1])
            acc = self._cross_acc(pb, self.mean, self.invsd, xp3, va, acc)
        self.nops += 1
        z = acc[: self.n_snps]
        return z[:, 0] if vec else z

    # -- compensated (two-float) product ------------------------------------
    @property
    def supports_ff(self) -> bool:
        """Same rule as TallPackedOperator: the tall ff gram is a
        Pallas composition only."""
        return bool(self.use_pallas)

    def _ff(self):
        if getattr(self, "_ff_state", None) is None:
            if not self.use_pallas:
                raise NotImplementedError(
                    "tall compensated gram needs the Pallas kernels "
                    "(use_pallas=True or 'interpret')")
            from ..kernels import packed_matvec as _pk
            from .compensated import code_value_luts, twosum

            lh, ll = code_value_luts(self.center, self.scale, self.p_pad)
            if self.mesh is not None:
                rep = NamedSharding(self.mesh, P())
                lut_hi = jax.device_put(lh, rep)
                lut_lo = jax.device_put(ll, rep)
            else:
                lut_hi = jnp.asarray(lh)
                lut_lo = jnp.asarray(ll)
            interp = self.use_pallas == "interpret"
            raw = partial(_pk.gram_tall_ff_p, interpret=interp)

            if self.mesh is not None:
                from jax import shard_map

                ax = self.axis_name
                byte = P(None, ax)
                rep1, rep2 = P(None), P(None, None)
                blk = shard_map(
                    lambda pb, bh, bl, m, iv, v2, va: tuple(
                        lax.psum(t, ax)
                        for t in raw(pb, bh, bl, m, iv, v2, va)),
                    mesh=self.mesh,
                    in_specs=(byte, rep2, rep2, rep1, rep1, rep2, byte),
                    out_specs=(rep2, rep2),
                    check_vma=False)
            else:
                blk = raw

            def acc_fn(pb, bh, bl, m, iv, v2, va, z_hi, z_err):
                t_hi, t_err = blk(pb, bh, bl, m, iv, v2, va)
                z_hi, e = twosum(z_hi, t_hi)
                return z_hi, z_err + e + t_err

            self._ff_state = (jax.jit(acc_fn), lut_hi, lut_lo)
        return self._ff_state

    def gram_ff_permuted(self, v):
        """(z_hi, z_lo) two-float pair of X^T X v in (padded) SNP
        space, one streamed pass (per-block tall ff gram + TwoSum
        across blocks)."""
        acc_fn, lut_hi, lut_lo = self._ff()
        vec = v.ndim == 1
        v2 = v[:, None] if vec else v
        z_hi = jnp.zeros_like(v2)
        z_err = jnp.zeros_like(v2)
        for pb, va, _, _ in self._blocks():
            z_hi, z_err = acc_fn(pb, lut_hi, lut_lo, self.mean,
                                 self.invsd, v2, va, z_hi, z_err)
        self.nops += 1
        return (z_hi[:, 0], z_err[:, 0]) if vec else (z_hi, z_err)

    @property
    def snp_sumsq(self) -> np.ndarray:
        if self._sumsq is None:
            # combine per-block partials in HOST f64 like the wide
            # streaming twin: device-dtype (f32) cross-block adds leak
            # ~1e-6 relative into trace/pve on many-block cohorts
            tot = np.zeros(self.p_pad, dtype=np.float64)
            for pb, va, _, _ in self._blocks():
                tot += np.asarray(
                    self._sumsq_blk(pb, self.mean, self.invsd, va),
                    dtype=np.float64)
            self._sumsq = tot[: self.n_snps]
        return self._sumsq

    @property
    def trace(self) -> float:
        if self._sumsq is not None:
            return float(self._sumsq.sum())
        if self._trace is None:
            self._trace = float(self.snp_sumsq.sum())
        return self._trace

    def stats(self) -> dict:
        """Staging observability (see StreamingPackedOperator.stats)."""
        s = dict(self._stage_stats)
        s.update(
            nops=self.nops,
            staged_host_blocks=self.staged_host_blocks,
            n_blocks=self.n_blocks,
            n_cached=self._resolve_cache_blocks(),
            block_bytes=self.p_pad * self.block_bytes,
            packed_bytes=self.n_snps * self.nbytes,
        )
        return s

    def reset_stats(self) -> None:
        self.nops = 0
        self.staged_host_blocks = 0
        for k in self._stage_stats:
            self._stage_stats[k] = 0


def resolve_streaming(streaming, ds, mesh) -> bool:
    """Resolve the streaming tri-state ('auto'/True/False) shared by all
    analysis modes: auto turns streaming on when the packed data would
    not fit the device's HBM (single real-TPU device only -- a mesh
    keeps the data sharded and resident).  The reference streams every
    mode from disk (randompca.cpp:387-528 SCCA, :578-625 UCCA, :663-703
    check, :790-820 project); here the host->HBM boundary replaces
    disk->RAM."""
    if streaming != "auto":
        return bool(streaming)
    if jax.default_backend() != "tpu":
        return False
    ms = jax.devices()[0].memory_stats()
    limit = (ms or {}).get("bytes_limit", 16 << 30)
    if mesh is not None:
        limit *= mesh.size   # resident data is sharded: aggregate HBM
    packed_bytes = ds.n_snps * ds.nbytes_per_snp
    return bool(limit and packed_bytes > 0.7 * limit)


def check_operator_conflicts(op, *, dtype=None, mesh=None,
                             streaming="auto", memory_mb=None,
                             block_size=None):
    """Reject keyword requests that a PREBUILT operator cannot honor.

    Prebuilt operators carry their own dtype, sharding, residency, and
    block geometry; the analysis modes (pca/scca/ucca/check/project)
    previously dropped a caller's explicit ``dtype=``/``mesh=``/
    ``streaming=`` (review r2) -- and later ``memory_mb=``/
    ``block_size=`` (review r4) -- silently when an operator was
    passed as the data argument; a caller writing
    ``ucca(op_f32, Y, dtype=jnp.float64)`` believed the accuracy knob
    took effect.  Conflicts raise instead."""
    if memory_mb is not None:
        raise ValueError(
            "memory_mb= was passed with a prebuilt operator, whose "
            "residency and block geometry are fixed at construction; "
            "rebuild the operator with the desired memory_mb"
        )
    if block_size is not None:
        raise ValueError(
            "block_size= was passed with a prebuilt operator, whose "
            "block geometry is fixed at construction; rebuild the "
            "operator with the desired blocking"
        )
    if dtype is not None and np.dtype(dtype) != np.dtype(op.dtype):
        raise ValueError(
            f"dtype={np.dtype(dtype).name} conflicts with the prebuilt "
            f"{type(op).__name__}'s dtype={np.dtype(op.dtype).name}; "
            "rebuild the operator with the desired dtype"
        )
    # value equality, not identity: callers commonly rebuild an
    # identical Mesh(jax.devices(), ...) per call (the CLI does)
    if mesh is not None and getattr(op, "mesh", None) != mesh:
        raise ValueError(
            "mesh= conflicts with the prebuilt operator's device "
            "placement; build the operator on the target mesh instead"
        )
    is_stream = isinstance(op, (StreamingPackedOperator,
                                TallStreamingOperator))
    if streaming is True and not is_stream:
        raise ValueError(
            "streaming=True was passed with an HBM-resident prebuilt "
            "operator; build a StreamingPackedOperator / "
            "TallStreamingOperator (or pass the PLINK data directly) "
            "for bounded device memory"
        )
    if streaming is False and is_stream:
        raise ValueError(
            "streaming=False was passed with a prebuilt streaming "
            "operator; build a resident operator instead"
        )


def build_packed_operator(
    ds,
    mean,
    sd,
    *,
    streaming="auto",
    memory_mb: int | None = None,
    block_size: int | None = None,
    dtype=jnp.float32,
    mesh: Mesh | None = None,
    snp_sumsq: np.ndarray | None = None,
    cache_mb: int | str | None = "auto",
):
    """Build the right packed operator for an analysis mode: HBM-resident
    (optionally mesh-sharded) or host-streaming with bounded device
    memory.  ``ds`` is an opened PlinkDataset."""
    stream = resolve_streaming(streaming, ds, mesh)
    if stream:
        return StreamingPackedOperator(
            ds, mean, sd, ds.n_samples, memory_mb=memory_mb,
            block_snps=block_size, dtype=dtype,
            mesh=mesh, snp_sumsq=snp_sumsq, cache_mb=cache_mb,
        )
    return PackedOperator(
        ds.read_packed(), mean, sd, ds.n_samples,
        block_size=block_size, dtype=dtype, mesh=mesh,
        snp_sumsq=snp_sumsq,
    )


class DenseOperator(LinearOperatorBase):
    """Operator over an in-memory standardized dense matrix (N, p) --
    the analog of ``SVDWide`` (svdwide.h:11-31), used for the
    numeric-matrix API path and as a test oracle."""

    def __init__(self, X_std: np.ndarray, *, dtype=jnp.float32,
                 center=None, scale=None):
        X_std = np.asarray(X_std)
        self.n_samples, self.n_snps = X_std.shape
        self.dtype = dtype
        self.center = (np.zeros(self.n_snps) if center is None
                       else np.asarray(center, dtype=np.float64))
        self.scale = (np.ones(self.n_snps) if scale is None
                      else np.asarray(scale, dtype=np.float64))
        self.X = jnp.asarray(X_std, dtype=dtype)
        # HIGHEST precision like the packed kernels: TPU DEFAULT f32
        # dots lose ~2^-8, visible in solver convergence floors
        hp = lax.Precision.HIGHEST
        gram = lambda X, x: jnp.dot(              # noqa: E731
            X, jnp.dot(X.T, x, precision=hp), precision=hp)
        self._gram_fn = jax.jit(gram)
        self._cross_fn = jax.jit(
            lambda X, x: jnp.dot(X.T, x, precision=hp))
        self._mv_fn = jax.jit(lambda X, v: jnp.dot(X, v, precision=hp))
        self._pure_gram = lambda x, X: gram(X, x)
        self._pure_cross = lambda x, X: jnp.dot(X.T, x, precision=hp)
        self._pure_mv = lambda v, X: jnp.dot(X, v, precision=hp)
        self.nops = 0

    # identity "permutation" so the eigensolver can treat both operators
    # uniformly
    def permute(self, x):
        return jnp.asarray(x, self.dtype)

    def permute_np(self, x):
        return np.asarray(x)

    def unpermute(self, yp):
        return yp

    def gram_permuted(self, xp):
        vec = xp.ndim == 1
        x2 = xp[:, None] if vec else xp
        self.nops += 1
        y = self._gram_fn(self.X, x2)
        return y[:, 0] if vec else y

    def gram_pure(self):
        """(fn, operands): see PackedOperator.gram_pure."""
        return self._pure_gram, (self.X,)

    def products_pure(self):
        """(cross_fn, mv_fn, operands): see PackedOperator.products_pure
        (identity sample permutation here)."""
        return self._pure_cross, self._pure_mv, (self.X,)

    @property
    def op_dim(self) -> int:
        return self.n_samples

    def _gram(self, x2):
        self.nops += 1
        return self._gram_fn(self.X, x2)

    def _crossprod(self, x2):
        self.nops += 1
        return self._cross_fn(self.X, x2)

    def _prod(self, v2):
        self.nops += 1
        return self._mv_fn(self.X, v2)

    def gram_ff_permuted(self, xp):
        """(y_hi, y_lo) two-float pair of X X^T xp (identity sample
        permutation); the 'exact' matrix here is the resident f32 X."""
        from .compensated import dense_gram_ff

        vec = xp.ndim == 1
        x2 = xp[:, None] if vec else xp
        hi, lo = dense_gram_ff(self.X, x2)
        self.nops += 1
        return (hi[:, 0], lo[:, 0]) if vec else (hi, lo)

    def perform_op_ff(self, x):
        x2, vec = self._as_2d(x, self.n_samples, "perform_op_ff")
        hi, lo = self.gram_ff_permuted(x2)
        return (hi[:, 0], lo[:, 0]) if vec else (hi, lo)

    @property
    def snp_sumsq(self) -> np.ndarray:
        """Per-SNP sum of squares (same contract as PackedOperator's)."""
        return np.asarray(jnp.sum(self.X * self.X, axis=0),
                          dtype=np.float64)

    @property
    def trace(self) -> float:
        # reduce on device; only the scalar crosses the (slow) link
        return float(jnp.sum(self.X * self.X))
