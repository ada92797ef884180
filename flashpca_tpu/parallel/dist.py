"""Multi-host / multi-device distribution of the packed genotype matrix.

The reference is strictly single-process (SURVEY.md section 2.4); the
TPU-native scaling story is 1-D SNP (feature) sharding: SNP j of a
PLINK .bed lives at byte offset ``3 + j * ceil(N/4)``, so a contiguous
SNP range is a contiguous byte range, and every host can read ONLY its
own shard of the file (no broadcast, no scatter).  This module plans
those ranges and assembles the global sharded device array that
:class:`~flashpca_tpu.ops.operator.PackedOperator` computes against;
partial products are psum'd over the mesh by the operator itself.

Single-host multi-device works the same way (device_put per shard);
multi-host requires ``jax.distributed.initialize()`` to have been
called (see :func:`init_distributed`).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..io.plink import PlinkDataset


def init_distributed(**kwargs) -> None:
    """Initialize the JAX multi-host runtime (idempotent wrapper)."""
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        # jax has spelled re-initialization both "already initialized"
        # and "should only be called once" across versions (review r4)
        msg = str(e).lower()
        if "already" not in msg and "once" not in msg:
            raise


def snp_mesh(devices=None, axis_name: str = "snps") -> Mesh:
    """1-D mesh over all (global) devices for SNP sharding."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, (axis_name,))


def _require_1d(mesh: Mesh, fn: str) -> None:
    """The shard loaders zip mesh.devices.reshape(-1) against 1-D range
    plans; a multi-axis mesh would silently mispair devices and ranges
    (review r4)."""
    if len(mesh.shape) != 1:
        raise ValueError(
            f"{fn} needs a 1-D mesh (got axes {tuple(mesh.shape)}); "
            "build it with parallel.snp_mesh()")


def _allgather_f64_sum(arr: np.ndarray) -> np.ndarray:
    """Bit-exact f64 allgather-and-sum: with x64 off (the real-TPU
    default) JAX canonicalizes f64 -> f32, silently rounding (review
    r2), so ship the f64 BIT PATTERNS as int32 lanes and reinterpret
    after the gather; sum only in host f64.  ONE implementation for
    both stats paths (review r4)."""
    from jax.experimental import multihost_utils

    bits = np.ascontiguousarray(arr).view(np.int32)
    g = np.asarray(multihost_utils.process_allgather(bits))
    return np.ascontiguousarray(g).view(np.float64).sum(axis=0)


def plan_row_shards(p_pad: int, n_shards: int) -> list[tuple[int, int]]:
    """Equal [start, stop) row ranges of the padded SNP dimension."""
    assert p_pad % n_shards == 0
    step = p_pad // n_shards
    return [(i * step, (i + 1) * step) for i in range(n_shards)]


def shard_byte_ranges(ds: PlinkDataset, p_pad: int,
                      n_shards: int) -> list[tuple[int, int]]:
    """File byte ranges [lo, hi) each shard must read (clipped to the
    real SNP count; padding rows are zeros, read nothing)."""
    out = []
    for start, stop in plan_row_shards(p_pad, n_shards):
        start = min(start, ds.n_snps)
        stop = min(stop, ds.n_snps)
        out.append(ds.byte_range(start, stop))
    return out


def load_sharded_packed(
    ds: PlinkDataset,
    mesh: Mesh,
    *,
    p_pad: int,
    nbytes_pad: int,
    axis_name: str = "snps",
) -> jax.Array:
    """Assemble the global (p_pad, nbytes_pad) uint8 array, SNP-sharded
    over ``mesh``, with each addressable device's shard read directly
    from the local .bed byte range -- per-host IO only.
    """
    _require_1d(mesh, "load_sharded_packed")
    n_shards = mesh.shape[axis_name]
    rows = plan_row_shards(p_pad, n_shards)
    sharding = NamedSharding(mesh, P(axis_name, None))
    mesh_devices = list(mesh.devices.reshape(-1))
    local = []
    for dev, (start, stop) in zip(mesh_devices, rows):
        if dev.process_index != jax.process_index():
            continue
        lo = min(start, ds.n_snps)
        hi = min(stop, ds.n_snps)
        buf = np.zeros((stop - start, nbytes_pad), dtype=np.uint8)
        if hi > lo:
            buf[: hi - lo, : ds.nbytes_per_snp] = ds.read_packed(lo, hi)
        local.append(jax.device_put(buf, dev))
    return jax.make_array_from_single_device_arrays(
        (p_pad, nbytes_pad), sharding, local)


def sharded_snp_stats(
    ds: PlinkDataset,
    mesh: Mesh,
    p_pad: int,
    *,
    stand: str = "binom2",
    axis_name: str = "snps",
    with_sumsq: bool = False,
):
    """Per-SNP (mean, sd) with PER-HOST IO: each process computes stats
    only for its own devices' SNP ranges (reading only those file
    bytes), then the (p,)-length vectors are allgathered.  With one
    process this is exactly ``ds.snp_stats(stand)``.  Keeps the stats
    pass host-scalable like the shard load itself ("every host can read
    ONLY its own shard of the file", module docstring).

    ``with_sumsq=True`` additionally returns the exact per-SNP sum of
    squared standardized genotypes, derived from per-host raw dosage
    moments -- identical on every process, no device data pass (see
    PlinkDataset.snp_stats)."""
    if jax.process_count() == 1:
        return ds.snp_stats(stand, with_sumsq=with_sumsq)
    _require_1d(mesh, "sharded_snp_stats")
    rows = plan_row_shards(p_pad, mesh.shape[axis_name])
    n_out = 3 if with_sumsq else 2
    local = np.zeros((n_out, ds.n_snps), dtype=np.float64)
    me = jax.process_index()
    for dev, (start, stop) in zip(mesh.devices.reshape(-1), rows):
        if dev.process_index != me:
            continue
        lo, hi = min(start, ds.n_snps), min(stop, ds.n_snps)
        if hi > lo:
            # per-SNP quantities: each range's values are independent
            # of every other range, so per-host slices assemble exactly
            local[:, lo:hi] = ds.snp_stats(
                stand, snp_range=(lo, hi), with_sumsq=with_sumsq)
    # shard ranges are disjoint and zero elsewhere: summing the
    # bit-exact allgathered copies reassembles the global vectors
    out = _allgather_f64_sum(local.reshape(-1)).reshape(n_out, ds.n_snps)
    return tuple(out)


def sharded_operator(
    data,
    mesh: Mesh | None = None,
    *,
    stand: str = "binom2",
    block_size: int | None = None,
    dtype=jnp.float32,
    axis_name: str = "snps",
    use_pallas: bool | str | None = None,
):
    """Build a SNP-sharded :class:`PackedOperator` from a PLINK fileset
    with per-host shard IO.

    ``data`` is a ``--bfile`` root or an opened :class:`PlinkDataset`.
    """
    from ..ops.operator import PackedOperator

    ds = PlinkDataset.open(data) if isinstance(data, str) else data
    if mesh is None:
        mesh = snp_mesh(axis_name=axis_name)

    plan = PackedOperator.plan_layout(
        ds.n_snps, ds.nbytes_per_snp, block_size=block_size, dtype=dtype,
        nshards=mesh.shape[axis_name], use_pallas=use_pallas)
    mean, sd, sumsq = sharded_snp_stats(
        ds, mesh, plan["p_pad"], stand=stand, axis_name=axis_name,
        with_sumsq=True)
    packed = load_sharded_packed(
        ds, mesh, p_pad=plan["p_pad"], nbytes_pad=plan["nbytes_pad"],
        axis_name=axis_name)
    return PackedOperator(
        packed, mean, sd, ds.n_samples,
        block_size=plan["block_size"], dtype=dtype, mesh=mesh,
        axis_name=axis_name, use_pallas=plan["use_pallas"],
        n_snps=ds.n_snps, snp_sumsq=sumsq,
    )


# ---------------------------------------------------------------------------
# Sample(byte)-axis sharding for the tall path (VERDICT r3 missing #3):
# the tall operator splits the BYTE axis of the .bed, so each host reads
# a byte-COLUMN window of every SNP row (offset 3 + j*ceil(N/4) + lo,
# length hi-lo, for each SNP j) -- strided per-host IO, served by the
# memmap's page cache.
# ---------------------------------------------------------------------------

def plan_byte_shards(nbytes_pad: int, n_shards: int) -> list[tuple[int, int]]:
    """Equal [lo, hi) byte-column ranges of the padded sample axis."""
    assert nbytes_pad % n_shards == 0
    step = nbytes_pad // n_shards
    return [(i * step, (i + 1) * step) for i in range(n_shards)]


def load_sample_sharded_packed(
    ds: PlinkDataset,
    mesh: Mesh,
    *,
    p_pad: int,
    nbytes_pad: int,
    axis_name: str = "samples",
) -> jax.Array:
    """Assemble the global (p_pad, nbytes_pad) uint8 array sharded along
    the BYTE (sample) axis, each addressable device's byte-column window
    read from the local .bed only -- the sample-shard twin of
    :func:`load_sharded_packed`."""
    _require_1d(mesh, "load_sample_sharded_packed")
    cols = plan_byte_shards(nbytes_pad, mesh.shape[axis_name])
    sharding = NamedSharding(mesh, P(None, axis_name))
    nb = ds.nbytes_per_snp
    local = []
    for dev, (lo, hi) in zip(mesh.devices.reshape(-1), cols):
        if dev.process_index != jax.process_index():
            continue
        lo_r, hi_r = min(lo, nb), min(hi, nb)
        buf = np.zeros((p_pad, hi - lo), dtype=np.uint8)
        if hi_r > lo_r:
            buf[: ds.n_snps, : hi_r - lo_r] = ds._map()[:, lo_r:hi_r]
        local.append(jax.device_put(buf, dev))
    return jax.make_array_from_single_device_arrays(
        (p_pad, nbytes_pad), sharding, local)


def sample_sharded_moments(
    ds: PlinkDataset,
    mesh: Mesh,
    *,
    nbytes_pad: int,
    axis_name: str = "samples",
):
    """Per-SNP raw dosage moments (ngood, dsum, d2sum) with PER-HOST IO
    over byte-column shards: each process decodes only its own devices'
    sample windows, partial moments sum exactly across disjoint sample
    ranges, and the f64 vectors are allgathered bit-exactly (the same
    int32-lane trick as :func:`sharded_snp_stats`)."""
    from ..io import cbed
    from ..io.plink import snp_moments_from_codes, unpack_codes

    if jax.process_count() == 1:
        return ds.snp_moments()
    _require_1d(mesh, "sample_sharded_moments")
    nb = ds.nbytes_per_snp
    local = np.zeros((3, ds.n_snps), dtype=np.float64)
    me = jax.process_index()
    blk = 8192       # SNP blocking bounds the decode intermediates
    for dev, (lo, hi) in zip(mesh.devices.reshape(-1),
                             plan_byte_shards(nbytes_pad,
                                              mesh.shape[axis_name])):
        if dev.process_index != me:
            continue
        lo_r, hi_r = min(lo, nb), min(hi, nb)
        if hi_r <= lo_r:
            continue
        # packing is position-independent per byte, so a byte WINDOW is
        # itself a valid packed block of ns samples: the native LUT
        # kernel and the blockwise decode both apply (an unblocked
        # whole-file decode materialized O(n_snps x window x 8B) host
        # intermediates -- tens of GB at the tall path's scale,
        # review r4)
        ns = min(ds.n_samples - lo_r * 4, (hi_r - lo_r) * 4)
        native = cbed.moments_available()
        for start in range(0, ds.n_snps, blk):
            stop = min(start + blk, ds.n_snps)
            sub = np.ascontiguousarray(ds._map()[start:stop, lo_r:hi_r])
            if native:
                ng, dsum, d2 = cbed.moments(sub, ns)
            else:
                ng, dsum, d2 = snp_moments_from_codes(
                    unpack_codes(sub, ns))
            local[0, start:stop] += ng
            local[1, start:stop] += dsum
            local[2, start:stop] += d2
    out = _allgather_f64_sum(local.reshape(-1)).reshape(3, ds.n_snps)
    return tuple(out)


def tall_sharded_operator(
    data,
    mesh: Mesh | None = None,
    *,
    stand: str = "binom2",
    block_size: int | None = None,
    dtype=jnp.float32,
    axis_name: str = "samples",
    use_pallas: bool | str | None = None,
):
    """Build a sample(byte)-sharded :class:`TallPackedOperator` from a
    PLINK fileset with per-host byte-window IO -- the tall twin of
    :func:`sharded_operator` for multi-controller n >> p runs."""
    from ..io.plink import stats_from_moments
    from ..ops.operator import TallPackedOperator
    from ..ops.standardize import sumsq_from_moments

    if stand not in ("binom", "binom2"):
        # fail BEFORE the per-host decode + allgather pass
        raise ValueError(f"unknown standardisation method: {stand}")
    ds = PlinkDataset.open(data) if isinstance(data, str) else data
    if mesh is None:
        mesh = snp_mesh(axis_name=axis_name)
    _require_1d(mesh, "tall_sharded_operator")

    plan = TallPackedOperator.plan_layout(
        ds.n_snps, ds.nbytes_per_snp, block_size=block_size, dtype=dtype,
        nshards=mesh.shape[axis_name], use_pallas=use_pallas)
    ngood, dsum, d2sum = sample_sharded_moments(
        ds, mesh, nbytes_pad=plan["nbytes_pad"], axis_name=axis_name)
    mean, sd = stats_from_moments(ngood, dsum, stand)
    sumsq = sumsq_from_moments(ngood, dsum, d2sum, mean, sd)
    packed = load_sample_sharded_packed(
        ds, mesh, p_pad=plan["p_pad"], nbytes_pad=plan["nbytes_pad"],
        axis_name=axis_name)
    return TallPackedOperator(
        packed, mean, sd, ds.n_samples,
        block_size=plan["block_size"], dtype=dtype, mesh=mesh,
        axis_name=axis_name, use_pallas=plan["use_pallas"],
        snp_sumsq=sumsq, n_snps=ds.n_snps,
    )
