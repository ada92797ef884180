"""Headline benchmark: top-k PCA of a biobank-scale genotype matrix.

Reference baseline (BASELINE.md / flashpca README.md:11): partial PCA
k=20 of 500,000 individuals x 100,000 SNPs in < 6 h (21600 s) on a
single node with 2 GB RAM.  This benchmark runs the same computation
END TO END through the user entry point ``models.pca()`` (thick-restart
block Lanczos + buffered solve + compensated ff-Krylov polish, the
contract-meeting default) on synthetic structured genotypes generated
on-device, then validates the result with ``models.check()`` (the
reference's --check accuracy contract, README.md:207).

vs_baseline = reference_seconds / our_seconds (higher is better).  If
the full 500k x 100k does not fit on the device, the problem is scaled
down and the reference time prorated linearly in N*p (its streaming
algorithm is linear in the data size).

Output contract: ONE JSON line on stdout, printed AS SOON AS the timed
solve completes; every diagnostic (check mse, fast-mode wall, SCCA/UCCA
timings, streaming GB/s) goes to stderr AFTER it.  A watchdog thread
(FLASHPCA_BENCH_BUDGET_S, default 1080 s) emits a best-so-far JSON and
exits 0 instead of letting an external timeout kill the run with no
parseable output (the round-3 failure mode: one cold-compile tunnel
stall starved the driver budget before the single late print).

Environment overrides: FLASHPCA_BENCH_N, FLASHPCA_BENCH_P,
FLASHPCA_BENCH_K, FLASHPCA_BENCH_TOL, FLASHPCA_BENCH_REPEATS (timed
solve repeats, min wall reported; default 1 -- set 2 to strip tunnel
per-dispatch noise from the metric), FLASHPCA_BENCH_BUDGET_S (watchdog
seconds), FLASHPCA_BENCH_EXTRA=1 (adds scca_grid + projection-pass
timings to the tail).

FLASHPCA_BENCH_MODE=tall switches to the n >> p regime the reference
stubbed (svdtall.cpp dead code): >1M individuals x 50k SNPs -- the
same 12.6 GB of packed data -- through `TallPackedOperator` (p x p
Gram X^T X).  This demonstrates the reference's ">= 1M individuals"
claim (README.md:12) resident on ONE chip.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
import numpy as np

REF_SECONDS = 6 * 3600.0
REF_N = 500_000
REF_P = 100_000
# actual bench sizes: nearest sizes where ceil(N/4) is a multiple of 512
# (full-width Pallas byte tiles) and p a multiple of 256, so neither
# generation nor the operator ever copies the multi-GB packed buffer
# (padding/slicing would double peak HBM use)
BENCH_N = 501_760   # ceil(N/4) = 125440 = 245 * 512
BENCH_P = 100_352   # 196 * 512 SNP rows (whole 512-row Pallas tiles)
N_POPS = 8

# -- watchdog state (module globals so the timer thread can see them) ----
_START = time.time()
# the oversize (beyond-device-memory streaming) mode is upload-bound
# over this remote tunnel; give it a longer default leash
_BUDGET = float(os.environ.get(
    "FLASHPCA_BENCH_BUDGET_S",
    "2400" if os.environ.get("FLASHPCA_BENCH_MODE") == "oversize"
    else "1080"))
_json_printed = False
_json_lock = threading.Lock()
_metric_name = "pca_incomplete"
_ref_scaled = 0.0
_walls: list[float] = []
# breadth metrics gathered by the tail stages; the ONE stdout JSON line
# carries them under "submetrics" (VERDICT r4 item 4: the driver JSON
# should evidence the k=100 / tall / fast / streaming breadth itself,
# not just the builder's stderr)
_SUB: dict = {}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


# the stdout contract is ONE JSON line: route every library notice
# (models' log() notes) to stderr before anything imports them
def _quiet_stdout():
    from flashpca_tpu.utils.logging import set_default_stream

    set_default_stream(sys.stderr)


def budget_left() -> float:
    return _BUDGET - (time.time() - _START)


def emit_json():
    """Print the one-line stdout contract exactly once: min wall over
    the completed timed solves, or an explicit incomplete marker if
    none finished inside the budget."""
    global _json_printed
    with _json_lock:        # the watchdog thread races the main thread
        if _json_printed:
            return
        _json_printed = True
    walls = list(_walls)    # snapshot: the main thread may append
    if walls:
        w = min(walls)
        result = {
            "metric": _metric_name,
            "value": round(w, 2),
            "unit": "s",
            "vs_baseline": round(_ref_scaled / w, 2),
        }
    else:
        result = {
            "metric": _metric_name,
            "value": round(time.time() - _START, 2),
            "unit": "s",
            "vs_baseline": 0.0,
            "incomplete": True,
        }
    if _SUB:
        result["submetrics"] = dict(_SUB)   # whatever the tail finished
    print(json.dumps(result), flush=True)


def _watchdog():
    emit_json()
    log(f"bench: WATCHDOG budget ({_BUDGET:.0f}s) reached -- emitted "
        f"{'best-so-far' if _walls else 'incomplete'} JSON and exiting 0 "
        "(raise FLASHPCA_BENCH_BUDGET_S for the full tail)")
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)


def gen_packed_block(key, probs, nbytes, n_samples):
    """Generate (bp, nbytes) packed genotypes ~ Binom(2, p) with
    population structure.  probs: (bp, N_POPS) allele freqs."""
    import jax
    import jax.numpy as jnp

    bp = probs.shape[0]
    # population of sample 4b+s
    sample_idx = (
        4 * jnp.arange(nbytes, dtype=jnp.int32)[:, None]
        + jnp.arange(4, dtype=jnp.int32)[None, :]
    )
    pop = sample_idx % N_POPS                       # (nbytes, 4)
    valid = sample_idx < n_samples
    p_site = probs[:, pop]                          # (bp, nbytes, 4)
    thresh = (p_site * 256.0).astype(jnp.uint8)
    b1 = jax.random.bits(key, (2, bp, nbytes, 4), dtype=jnp.uint8)
    dosage = (b1[0] < thresh).astype(jnp.uint8) + (b1[1] < thresh).astype(
        jnp.uint8)
    # dosage -> PLINK code: 2->0, 1->2, 0->3 (never emit NA code 1)
    code = jnp.where(dosage == 2, 0, jnp.where(dosage == 1, 2, 3)).astype(
        jnp.uint8)
    code = jnp.where(valid[None], code, 0)
    packed = (
        code[:, :, 0]
        | (code[:, :, 1] << 2)
        | (code[:, :, 2] << 4)
        | (code[:, :, 3] << 6)
    )
    return packed


def generate_dataset(n, p, seed=7):
    """On-device synthetic structured genotypes: returns (packed, mean, sd).

    The packed matrix never leaves the device: host<->device bandwidth
    over the tunnel is far scarcer than on-device generation, so the
    whole (p, ceil(N/4)) buffer is filled blockwise inside one jitted
    fori_loop with in-place dynamic updates.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    from flashpca_tpu.io.plink import bytes_per_snp

    nbytes = bytes_per_snp(n)
    rng = np.random.default_rng(seed)
    maf = rng.uniform(0.05, 0.5, size=p)
    delta = rng.normal(0.0, 0.05, size=(p, N_POPS))
    probs_np = np.clip(maf[:, None] + delta, 0.02, 0.98)

    bp = 256 if p % 256 == 0 else max(64, min(2048, (1 << 28) // (nbytes * 8)))
    p_pad = ((p + bp - 1) // bp) * bp
    probs_pad = np.zeros((p_pad, N_POPS), dtype=np.float32)
    probs_pad[:p] = probs_np

    def gen_all(key, probs_all):
        packed = jnp.zeros((p_pad, nbytes), dtype=jnp.uint8)

        def body(i, acc):
            pr = lax.dynamic_slice(probs_all, (i * bp, 0), (bp, N_POPS))
            blk = gen_packed_block(jax.random.fold_in(key, i), pr,
                                   nbytes, n)
            return lax.dynamic_update_slice(acc, blk, (i * bp, 0))

        return lax.fori_loop(0, p_pad // bp, body, packed)

    packed = jax.jit(gen_all, donate_argnums=())(
        jax.random.PRNGKey(seed), jnp.asarray(probs_pad))
    if p_pad > p:
        packed = packed[:p]   # copies -- only hit for odd CLI overrides
    jax.block_until_ready(packed)

    # binom2 stats from the *theoretical* allele frequency of each SNP
    # (exact empirical stats are irrelevant to throughput; the operator
    # work is identical)
    p_hat = probs_np.mean(axis=1)
    mean = 2.0 * p_hat
    sd = np.sqrt(2.0 * p_hat * (1.0 - p_hat))
    return packed, mean, sd


def measure_upload(log, mb=96):
    """Raw host->device upload throughput: device_put + a forced sum
    (block_until_ready can lie over remote tunnels; a computed scalar
    cannot).  This is the speed-of-light for ALL host-streaming
    numbers, measured so their GB/s is explainable (VERDICT r4 item
    2: the r4 'collapse' was the tunnel itself dropping from ~300 to
    ~10 MB/s between rounds)."""
    import jax
    import jax.numpy as jnp

    buf = np.random.default_rng(9).integers(
        0, 256, size=(mb << 20,), dtype=np.uint8)
    rates = []
    for r in range(2):
        t0 = time.time()
        d = jax.device_put(buf)
        float(jnp.sum(d))
        dt = time.time() - t0
        rates.append(buf.nbytes / dt / 1e9)
        del d
    up = max(rates)    # first rep may pay the jnp.sum compile
    log(f"bench: raw upload {mb} MB x2 -> {up:.3f} GB/s (reps: "
        f"{[round(r, 3) for r in rates]})")
    _SUB["upload_gbps"] = round(up, 3)
    return up


def measure_streaming(log):
    """Host->device streaming operator throughput with the per-phase
    staging stats (fill/put/sync), a prefetch run, and the
    device-resident block cache -- each explained against the measured
    raw upload rate.  The streamed volume adapts to that rate so a
    degraded tunnel cannot eat the whole tail budget (r4: 508 s)."""
    import jax.numpy as jnp

    from flashpca_tpu.ops.operator import StreamingPackedOperator

    up_gbps = measure_upload(log)
    n = int(os.environ.get("FLASHPCA_STREAM_N", 62_720))
    p_env = os.environ.get("FLASHPCA_STREAM_P")
    nbytes = (n + 3) // 4
    if p_env:
        p = int(p_env)
    else:
        # each config streams ~(npass+1) passes; size p so that costs
        # ~40 s at the measured rate, within [1024, 12544] whole
        # 512-SNP tiles (r4's fixed 12544 burned 508 s of tail when
        # the tunnel dropped to ~3 MB/s)
        p = int(10.0 * up_gbps * 1e9 / nbytes)
        p = min(12_544, max(1024, (p // 512) * 512))
    rng = np.random.default_rng(3)
    packed = rng.integers(0, 256, size=(p, nbytes), dtype=np.uint8)
    maf = rng.uniform(0.1, 0.5, p)
    mean, sd = 2 * maf, np.sqrt(2 * maf * (1 - maf))
    x = None
    npass = 3
    res = {}

    def run(tag, cache_mb, reuse=False, prefetch=False):
        nonlocal x
        prev = os.environ.get("FLASHPCA_STAGE_REUSE")
        os.environ["FLASHPCA_STAGE_REUSE"] = "1" if reuse else "0"
        try:
            op = StreamingPackedOperator(
                packed, mean, sd, n, memory_mb=(None if cache_mb else 256),
                block_snps=(p // 2 if cache_mb else None),
                cache_mb=cache_mb, prefetch=prefetch)
            if x is None:
                x = jnp.asarray(rng.standard_normal((n, 8)),
                                dtype=op.dtype)
            float(jnp.sum(op.perform_op(x)))        # warm compiles (+cache)
            op.reset_stats()
            t0 = time.time()
            for _ in range(npass):
                y = op.perform_op(x)
            float(jnp.sum(y))
            dt = time.time() - t0
            st = op.stats()
            gbps = st["staged_bytes"] / max(dt, 1e-9) / 1e9
            eff = (f", {100 * gbps / up_gbps:.0f}% of raw upload"
                   if st["staged_bytes"] else "")
            log(f"bench: streaming gram [{tag}] {npass}x ({p}x{nbytes} "
                f"bytes, {op.n_blocks} blocks/pass, "
                f"{st['staged_host_blocks']} stagings) in {dt:.1f}s -> "
                f"{gbps:.2f} GB/s staged{eff} "
                f"[fill {st['fill_s']:.1f}s put {st['put_s']:.1f}s "
                f"wait {st['wait_s']:.1f}s]")
            res[tag] = {"s": round(dt, 2), "gbps": round(gbps, 3),
                        "fill_s": round(st["fill_s"], 2),
                        "staged_gb": round(st["staged_bytes"] / 1e9, 3)}
            return gbps
        finally:
            if prev is None:
                os.environ.pop("FLASHPCA_STAGE_REUSE", None)
            else:
                os.environ["FLASHPCA_STAGE_REUSE"] = prev

    run("fresh", cache_mb=0)
    if budget_left() > 150:
        run("prefetch", cache_mb=0, prefetch=True)
    if budget_left() > 120:
        # device-resident block cache: warm passes skip staging entirely
        run("cache", cache_mb="auto")
    _SUB["stream"] = res
    return res


def measure_scca_ucca(op, n, log):
    """Warm SCCA s/iter, a CONVERGED sparse multi-dim SCCA, and a full
    UCCA scan at the headline scale (the reference's second and third
    modes, randompca.cpp:387-625) -- in the default tail so the driver
    captures them officially (VERDICT r3 item 6, r4 item 5)."""
    import jax.numpy as jnp

    from flashpca_tpu.models.scca import scca
    from flashpca_tpu.models.ucca import ucca

    rng = np.random.default_rng(11)
    Y = rng.standard_normal((n, 10))

    # lambda=0: plain penalized power iteration -- soft-thresholding on
    # random phenotypes would zero u and trip the all-zero abort before
    # the iteration count is reached, invalidating the timing.  Warm
    # the jitted while_loop engine first with the SAME maxiter as the
    # timed run: the per-dimension program is jit-cache-keyed on
    # maxiter, so a maxiter=1 warm would leave the timed call paying a
    # fresh compile (review r2).
    iters = 10
    t0 = time.time()
    scca(op, Y[:, :2], lambda1=0.0, lambda2=0.0, ndim=1, maxiter=iters,
         tol=0.0)
    log(f"bench: scca warm(compile) pass in {time.time() - t0:.1f}s")
    t0 = time.time()
    scca(op, Y[:, :2], lambda1=0.0, lambda2=0.0, ndim=1,
         maxiter=iters, tol=0.0)
    dt = time.time() - t0
    log(f"bench: scca 1 dim x {iters} iters (warm) in {dt:.1f}s "
        f"-> {dt / iters:.2f} s/iter (d stays 0 for iteration-capped "
        f"dims, reference semantics randompca.cpp:502-518)")
    _SUB["scca_s_per_iter"] = round(dt / iters, 3)

    # -- converged sparse SCCA at the full scale (VERDICT r4 item 5):
    # real penalties, ndim >= 3, d > 0, nonzeros << p.  Plant a sparse
    # signal so penalized canonical directions exist: Y gains a
    # component of X u* for three sparse u* (one prod pass builds all).
    if budget_left() > 300:
        p = op.n_snps
        ndim_s = 3
        nnz_plant = 200
        Ustar = np.zeros((p, ndim_s), dtype=np.float64)
        for j in range(ndim_s):
            idx = rng.choice(p, size=nnz_plant, replace=False)
            Ustar[idx, j] = rng.normal(size=nnz_plant)
            Ustar[:, j] /= np.linalg.norm(Ustar[:, j])
        Xu = np.asarray(op.prod(jnp.asarray(Ustar, dtype=op.dtype)),
                        dtype=np.float64)          # (n, 3), one pass
        Ys = rng.standard_normal((n, 10))
        Ys[:, :ndim_s] += Xu * (3.0 / Xu.std(axis=0, keepdims=True))
        # normalized-u noise entries are ~N(0, 1/p); thresholding at
        # 2.5 sigma keeps the planted support + ~1% of the noise
        # (measured at 1/sqrt(p): 29k nonzeros -- sparse but not
        # "<< p"; 2.5/sqrt(p) lands ~1-3k)
        lam1 = 2.5 / np.sqrt(p)
        lam2 = 0.02
        t0 = time.time()
        res = scca(op, Ys, lambda1=lam1, lambda2=lam2, ndim=ndim_s,
                   maxiter=100, tol=1e-4, seed=7, verbose=True)
        dt = time.time() - t0
        nz = [int(np.sum(res.U[:, j] != 0)) for j in range(ndim_s)]
        log(f"bench: sparse scca ndim={ndim_s} lambda1={lam1:.2e} "
            f"lambda2={lam2} in {dt:.1f}s: d={np.round(res.d, 3)} "
            f"nonzeros={nz} of {p} converged={res.converged}")
        if not (res.converged and all(res.d > 0)):
            log("bench: WARNING sparse scca did not converge to d > 0")
        _SUB["scca_sparse"] = {
            "s": round(dt, 1), "d": [round(float(x), 2) for x in res.d],
            "nonzeros": nz, "converged": bool(res.converged),
        }

    if budget_left() < 180:
        log("bench: skipping ucca scan (budget)")
        return
    t0 = time.time()
    ucca(op, Y)                      # warm the compiled scan
    log(f"bench: ucca warm(compile) scan in {time.time() - t0:.1f}s")
    t0 = time.time()
    uc = ucca(op, Y)
    dt = time.time() - t0
    log(f"bench: ucca full scan ({op.n_snps} SNPs x {Y.shape[1]} phenos, "
        f"warm) in {dt:.1f}s; median R={np.median(uc.result[:, 0]):.4f}")
    _SUB["ucca_scan_s"] = round(dt, 2)


def measure_bed_streaming(log):
    """Wrapper: runs the .bed streaming drive and always removes the
    multi-hundred-MB scratch fileset (review r5: a mid-stage exception
    leaked it)."""
    import shutil
    import tempfile

    tmpdir = tempfile.mkdtemp(prefix="flashpca_bed_")
    try:
        _measure_bed_streaming(log, tmpdir)
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)


def _measure_bed_streaming(log, tmpdir):
    """Disk -> host -> device pipeline from a REAL .bed file (VERDICT
    r4 item 3): a PlinkDataset-backed StreamingPackedOperator with the
    prefetch thread, one cold-cache pass (posix_fadvise(DONTNEED)
    evicts the page cache so the read hits the disk) and one warm
    pass, each reported as file-to-device GB/s with the read/stage
    overlap ratio (fill happens on the prefetch thread while the
    previous block uploads/computes)."""
    import jax.numpy as jnp

    from flashpca_tpu.io.plink import PlinkDataset
    from flashpca_tpu.ops.operator import StreamingPackedOperator

    up = _SUB.get("upload_gbps", 0.05)
    n = 62_720
    nbytes = (n + 3) // 4
    # size the file to ~30 s of upload at the measured rate
    p = int(30.0 * up * 1e9 / nbytes)
    p = min(25_088, max(1024, (p // 512) * 512))
    rng = np.random.default_rng(21)
    root = tmpdir + "/stream"
    t0 = time.time()
    with open(root + ".bed", "wb") as f:
        f.write(bytes([0x6C, 0x1B, 0x01]))
        rng.integers(0, 256, size=(p, nbytes), dtype=np.uint8).tofile(f)
        # flush dirty pages NOW: POSIX_FADV_DONTNEED only drops CLEAN
        # pages, so without the fsync the "cold" pass would silently
        # read the page cache (review r5)
        f.flush()
        os.fsync(f.fileno())
    with open(root + ".fam", "w") as f:
        f.writelines(f"F{i} I{i} 0 0 0 -9\n" for i in range(n))
    with open(root + ".bim", "w") as f:
        f.writelines(f"1 snp{j} 0 {j} A B\n" for j in range(p))
    gb = p * nbytes / 1e9
    log(f"bench: wrote {gb:.2f} GB .bed fileset in {time.time() - t0:.1f}s")

    maf = rng.uniform(0.1, 0.5, p)
    mean, sd = 2 * maf, np.sqrt(2 * maf * (1 - maf))
    ds = PlinkDataset.open(root)
    op = StreamingPackedOperator(ds, mean, sd, n, memory_mb=256,
                                 cache_mb=0, prefetch=True)
    x = jnp.asarray(rng.standard_normal((n, 8)), dtype=op.dtype)
    float(jnp.sum(op.perform_op(x)))      # warm compiles
    res = {}
    for tag in ("cold", "warm"):
        if tag == "cold":
            # evict the just-written pages: the cold pass must read
            # the platters/SSD, not the page cache
            with open(root + ".bed", "rb") as f:
                os.posix_fadvise(f.fileno(), 0, 0,
                                 os.POSIX_FADV_DONTNEED)
        op.reset_stats()
        t0 = time.time()
        y = op.perform_op(x)
        float(jnp.sum(y))
        dt = time.time() - t0
        st = op.stats()
        gbps = st["staged_bytes"] / max(dt, 1e-9) / 1e9
        # overlap: serial lower bound = disk fill + upload; ratio ~1
        # means the prefetch thread fully hid the disk read
        serial = st["fill_s"] + st["staged_bytes"] / max(up, 1e-9) / 1e9
        overlap = serial / max(dt, 1e-9)
        log(f"bench: .bed streaming [{tag}-cache] pass {gb:.2f} GB in "
            f"{dt:.1f}s -> {gbps:.3f} GB/s file->device "
            f"(disk fill {st['fill_s']:.1f}s on the prefetch thread; "
            f"serial-bound/wall = {overlap:.2f}, 1.0 = full overlap)")
        res[tag] = {"s": round(dt, 1), "gbps": round(gbps, 3),
                    "fill_s": round(st["fill_s"], 2),
                    "overlap": round(overlap, 2)}
    _SUB["bed_stream"] = res


def measure_extra_modes(op, n, log):
    """FLASHPCA_BENCH_EXTRA=1: the batched penalty grid
    (docs/PERFORMANCE.md 'other modes'; the projection pass runs in
    the DEFAULT tail since r5)."""
    from flashpca_tpu.models.scca import scca_grid

    rng = np.random.default_rng(11)
    Y = rng.standard_normal((n, 10))
    iters = 10

    # batched penalty grid: C cells ride ONE panel pass per iteration;
    # on the decode-bound kernel this should cost ~1 cell (the
    # sequential equivalent is C x the single-cell time)
    C = 16
    lam = np.zeros(C)
    scca_grid(op, Y[:, :2], lam, lam, pairs=True, ndim=1,
              maxiter=iters, tol=0.0)          # warm
    t0 = time.time()
    scca_grid(op, Y[:, :2], lam, lam, pairs=True, ndim=1,
              maxiter=iters, tol=0.0)
    dt_g = time.time() - t0
    log(f"bench: scca_grid {C} cells x {iters} iters (warm) in "
        f"{dt_g:.1f}s -> {dt_g / iters:.2f} s/iter for the whole grid "
        f"(sequential grid would be ~{C}x one cell)")

    # (projection timing lives in the default tail's run_projection)


def gen_host_packed(n, p, rng, chunk=256, pops=N_POPS):
    """Host-side Binom(2, maf) packed genotypes with the SAME 8-way
    population structure as the on-device generator (the numpy twin of
    gen_packed_block).  Both the codes and the structure matter:
    random uint8 bytes against binom2 stats blow the spectrum up ~100x
    (theta_max 2e9 vs 2e6), inflating the ABSOLUTE check mse past the
    reference's 1e-8 contract at better relative accuracy; and
    structure-free Binomial draws give a tight Marchenko-Pastur bulk
    with no separated leading eigenvalues, grinding the k=20 solve to
    maxiter (r5: nconv stuck at 1/28 for 26 cycles).

    Implementation notes (all measured on this VM): every FRESH mmap
    faults at ~26 MB/s while arena reuse is ~4 GB/s, so the per-chunk
    temporaries are preallocated once and written through out=; the
    dosage->code map is a uint8 LUT (an np.where chain promotes to
    int64, 100x slower); thresholds are pre-quantized to uint8 (the
    f64 fancy gather was 180x slower); randomness comes from
    rng.bytes (the bounded-int uint8 path of rng.integers pushed a
    2 GB generation to 711 s)."""
    nbytes, probs, thresh8, pop_flat, vmask = _gen_prologue(n, p, rng, pops)
    packed = np.empty((p, nbytes), dtype=np.uint8)
    _gen_fill_rows(packed, thresh8, pop_flat, vmask, rng, chunk=chunk)
    # binom2 stats from the theoretical pooled allele frequency, like
    # the device generator (generate_dataset)
    p_hat = probs.mean(axis=1)
    return packed, 2.0 * p_hat, np.sqrt(2.0 * p_hat * (1.0 - p_hat))


def _gen_prologue(n, p, rng, pops):
    """Shared head of the host generators: per-SNP x per-population
    allele-frequency thresholds + the byte-layout gather/mask tables."""
    nbytes = (n + 3) // 4
    maf = rng.uniform(0.05, 0.5, p)
    delta = rng.normal(0.0, 0.05, size=(p, pops))
    probs = np.clip(maf[:, None] + delta, 0.02, 0.98)
    sample_idx = (4 * np.arange(nbytes, dtype=np.int64)[:, None]
                  + np.arange(4)[None, :])
    pop_flat = (sample_idx % pops).astype(np.int64).ravel()
    valid = sample_idx < n
    vmask = (np.uint8(3) * valid).astype(np.uint8)[None]
    thresh8 = (probs * 256.0).astype(np.uint8)
    return nbytes, probs, thresh8, pop_flat, vmask


def _gen_fill_rows(packed, thresh8, pop_flat, vmask, rng, chunk=256):
    """Fill ``packed`` (rows, nbytes) with Binom(2, prob) PLINK codes;
    ``thresh8`` carries the matching rows.  Pure numpy, self-contained
    per row-slice, so it is the unit both the serial generator and the
    multiprocessing workers run."""
    p, nbytes = packed.shape
    chunk = min(chunk, p)
    shape = (chunk, nbytes, 4)
    t = np.empty(shape, np.uint8)
    m1 = np.empty(shape, np.bool_)
    m2 = np.empty(shape, np.bool_)
    dos = np.empty(shape, np.uint8)
    code = np.empty(shape, np.uint8)
    tmp = np.empty((chunk, nbytes), np.uint8)
    for lo in range(0, p, chunk):
        hi = min(lo + chunk, p)
        cs = hi - lo
        # per-(SNP, sample) threshold through the population of sample
        # 4b+s -- the probs[:, pop] gather the device generator runs
        np.take(thresh8[lo:hi], pop_flat, axis=1,
                out=t[:cs].reshape(cs, -1), mode="clip")
        nb = cs * nbytes * 4
        r = np.frombuffer(rng.bytes(nb), np.uint8).reshape(cs, nbytes, 4)
        np.less(r, t[:cs], out=m1[:cs])
        del r                      # free BEFORE the next same-size alloc
        r = np.frombuffer(rng.bytes(nb), np.uint8).reshape(cs, nbytes, 4)
        np.less(r, t[:cs], out=m2[:cs])
        del r
        np.add(m1.view(np.uint8)[:cs], m2.view(np.uint8)[:cs],
               out=dos[:cs])
        # dosage -> PLINK code {2->0, 1->2, 0->3} as pure arithmetic,
        # code = 3 - dos - (dos == 2): an np.take LUT measured
        # 1-16 s per 128 MB chunk (fancy-index overhead); these
        # in-place uint8 ops run at memory speed
        np.equal(dos[:cs], 2, out=m1[:cs])
        np.subtract(3, dos[:cs], out=code[:cs])
        np.subtract(code[:cs], m1.view(np.uint8)[:cs], out=code[:cs])
        code[:cs] &= vmask
        pk = packed[lo:hi]
        np.copyto(pk, code[:cs, :, 0])
        for j in (1, 2, 3):
            np.left_shift(code[:cs, :, j], 2 * j, out=tmp[:cs])
            pk |= tmp[:cs]


_GEN_CTX = None


def _gen_pool_init(shm_name, shape, thresh8, pop_flat, vmask):
    global _GEN_CTX
    from multiprocessing import shared_memory
    shm = shared_memory.SharedMemory(name=shm_name)
    packed = np.ndarray(shape, dtype=np.uint8, buffer=shm.buf)
    _GEN_CTX = (shm, packed, thresh8, pop_flat, vmask)


def _gen_pool_task(task):
    lo, hi, seed = task
    _shm, packed, thresh8, pop_flat, vmask = _GEN_CTX
    _gen_fill_rows(packed[lo:hi], thresh8[lo:hi], pop_flat, vmask,
                   np.random.default_rng(seed))
    return lo


def gen_host_packed_parallel(n, p, rng, pops=N_POPS, workers=None,
                             task_rows=4096):
    """Multiprocessing twin of :func:`gen_host_packed` for the
    many-GB oversize datasets: SNP row-slices are statistically
    independent, so W spawn-workers fill disjoint slices of one
    shared-memory buffer (serial generation measured ~60 s/GB on this
    VM -- 17 min of the failed 17.28 GB beyond-HBM attempt's budget
    went to generation alone).  Each fixed 4096-row task draws its own
    child seed from ``rng``, so the output is a deterministic function
    of (seed, n, p, pops) and IDENTICAL for any worker count.  Spawn
    (not fork) start method: the caller has live JAX/TPU threads.
    Falls back to the serial generator for tiny p or workers <= 1."""
    workers = workers if workers is not None else min(16, os.cpu_count() or 1)
    nbytes = (n + 3) // 4
    if workers <= 1 or p < 2 * task_rows:
        return gen_host_packed(n, p, rng, pops=pops)
    _, probs, thresh8, pop_flat, vmask = _gen_prologue(n, p, rng, pops)
    bounds = list(range(0, p, task_rows)) + [p]
    seeds = rng.integers(0, 2**63, size=len(bounds) - 1)
    tasks = [(lo, hi, int(s))
             for lo, hi, s in zip(bounds[:-1], bounds[1:], seeds)]
    import multiprocessing as mp
    from concurrent.futures import ProcessPoolExecutor
    from multiprocessing import shared_memory
    shm = shared_memory.SharedMemory(create=True, size=p * nbytes)
    try:
        # ProcessPoolExecutor (not mp.Pool): a failing initializer
        # raises BrokenProcessPool instead of respawning forever
        with ProcessPoolExecutor(
                max_workers=workers, mp_context=mp.get_context("spawn"),
                initializer=_gen_pool_init,
                initargs=(shm.name, (p, nbytes), thresh8,
                          pop_flat, vmask)) as pool:
            list(pool.map(_gen_pool_task, tasks))
        packed = np.ndarray((p, nbytes), np.uint8, buffer=shm.buf).copy()
    except Exception as e:  # pragma: no cover - environment-dependent
        sys.stderr.write(f"bench: parallel gen failed ({e!r}); "
                         "falling back to the serial generator\n")
        shm.close()
        shm.unlink()
        return gen_host_packed(n, p, rng, pops=pops)
    else:
        shm.close()
        shm.unlink()
    p_hat = probs.mean(axis=1)
    return packed, 2.0 * p_hat, np.sqrt(2.0 * p_hat * (1.0 - p_hat))


def _main_oversize(platform, n, p, k, tol):
    """FLASHPCA_BENCH_MODE=oversize: end-to-end wide PCA where the
    packed data does NOT reside on the device -- the reference's core
    bounded-memory claim (README.md:11-12; svdwide.cpp:21-68) measured
    at its design point on the chip (VERDICT r4 item 1).  Host-resident
    packed bytes stream through ``StreamingPackedOperator``; two
    configurations:

    * **beyond-HBM** (chosen when the measured upload rate affords it):
      packed > the device's HBM limit, a pinned-prefix block cache
      (``cache_mb``, the generalized single-block optimization,
      svdwide.cpp:32-40) holds the leading ~11 GB, and every pass
      re-stages the beyond-HBM remainder over the host link.
    * **bounded-memory** (fallback): device residency capped at two
      256 MB staging buffers (``memory_mb=256``, cache off -- the
      literal --memory semantics, flashpca.cpp:646-684) on a packed
      size the link can afford; device memory stays bounded while the
      data is many times larger.

    Every staged byte rides the measured host->device link, so the
    mode measures the raw upload rate FIRST and sizes the problem to
    the watchdog budget unless FLASHPCA_BENCH_P is set (this tunnel
    has measured anywhere between ~300 MB/s and ~5 MB/s across
    rounds; GB/s is reported against that bound so it is explainable).
    """
    global _metric_name, _ref_scaled
    import jax
    import jax.numpy as jnp

    from flashpca_tpu.io.plink import bytes_per_snp
    from flashpca_tpu.models.check import check
    from flashpca_tpu.models.pca import pca
    from flashpca_tpu.ops.operator import StreamingPackedOperator

    on_tpu = platform == "tpu"
    n = n or (501_760 if on_tpu else 4_096)
    nbytes = bytes_per_snp(n)
    k = k or 20
    _metric_name = f"pca_oversize_n{n}_k{k}_stream_wall_s"

    up = measure_upload(log, mb=96 if on_tpu else 8)
    ms = jax.devices()[0].memory_stats() or {}
    hbm_limit = ms.get("bytes_limit", 16 << 30) if on_tpu else (1 << 30)

    # pass-count model for the sizing: the 32-pop structured spectrum
    # converges in ~8 solver passes + polish + the compensated check
    # (measured r5: n_ops=8, total ~14 staged passes incl. trace/warm);
    # 20 keeps ~1.4x headroom for harder links mid-run
    n_passes = 20 if k >= 20 else 14
    solve_budget = max(120.0, budget_left() - 240.0)
    p_user = bool(p)
    if p:
        packed_gb = p * nbytes / 1e9
        cache_mb = 11_264 if packed_gb * 1e9 > hbm_limit else 0
        memory_mb = None if cache_mb else 256
    else:
        beyond_gb = 1.05 * hbm_limit / 1e9   # just past the HBM limit
        cache_gb = min(11.0, 0.7 * hbm_limit / 1e9)
        need_gb = beyond_gb + (n_passes - 1) * (beyond_gb - cache_gb)
        if on_tpu and up * solve_budget >= need_gb:
            packed_gb, cache_mb, memory_mb = beyond_gb, int(cache_gb * 1024), None
        else:
            # bounded-memory fallback: size packed to the link, bound
            # the device at two 256 MB buffers (>= 4x data:memory)
            packed_gb = max(2.0 if on_tpu else 0.008,
                            up * solve_budget / n_passes)
            packed_gb = min(packed_gb, 12.0)
            cache_mb, memory_mb = 0, 256
        p = int(packed_gb * 1e9 / nbytes)
        p = max(1024, (p // 512) * 512)
    packed_bytes = p * nbytes
    beyond = packed_bytes > hbm_limit
    log(f"bench: oversize config N={n} p={p} packed "
        f"{packed_bytes / 1e9:.2f} GB vs HBM limit "
        f"{hbm_limit / 1e9:.1f} GB ({'BEYOND-HBM' if beyond else 'bounded-memory demo'}) "
        f"cache_mb={cache_mb} memory_mb={memory_mb} "
        f"upload={up:.3f} GB/s budget left {budget_left():.0f}s")

    # backpressure: without periodic forced syncs the lazy-transfer
    # backlog of a many-pass run OOMs the host (the first 17 GB
    # beyond-HBM attempt died at ~112 GB RSS; see operator._blocks)
    os.environ.setdefault("FLASHPCA_STREAM_SYNC_EVERY", "4")
    t0 = time.time()
    rng = np.random.default_rng(13)
    # 32 subpopulations: the k=20 head must be separated structure
    # eigenvalues (like a real biobank cohort), not the tight
    # Marchenko-Pastur bulk a small-p random draw would put there --
    # bulk pairs at p~14k converged ~10x slower than the headline's
    # p=100k geometry (r5: nconv stalled at 8/28 for 6+ cycles)
    host_packed, mean, sd = gen_host_packed_parallel(n, p, rng, pops=32)
    log(f"bench: host-generated {packed_bytes / 1e9:.2f} GB packed "
        f"(Binom(2, maf) codes) in {time.time() - t0:.1f}s")

    def build_op(hp, m, s, cmb=None):
        return StreamingPackedOperator(
            hp, m, s, n, memory_mb=memory_mb,
            cache_mb=(cmb if cmb is not None
                      else (cache_mb if cache_mb else 0)),
            prefetch=True)

    # EFFECTIVE-rate calibration on a 2-block slice before committing
    # to the full size: the raw probe above is a single transfer, but
    # the realized streaming rate over this tunnel can sit 30-50%
    # lower and drift by the minute (r5: probe 28 MB/s, realized 19
    # -> the first oversize attempt would have overrun its watchdog).
    # The slice shares the full-size block shape, so its compiles warm
    # the real run's programs too.
    if on_tpu and not p_user:
        cal_op = build_op(host_packed, mean, sd, cmb=0)
        cal_rows = min(p, 2 * cal_op.block_snps)
        # cache OFF for the calibration slice: a pinned slice would
        # serve the timed pass from device and measure eff=0 (review r5)
        cal_op = build_op(host_packed[:cal_rows], mean[:cal_rows],
                          sd[:cal_rows], cmb=0)
        xw = jnp.zeros((n, 16), dtype=cal_op.dtype)
        float(jnp.sum(cal_op.perform_op(xw)))      # compile + 1st pass
        cal_op.reset_stats()
        t0 = time.time()
        float(jnp.sum(cal_op.perform_op(xw)))
        cal_dt = time.time() - t0
        eff = cal_op.stats()["staged_bytes"] / max(cal_dt, 1e-9) / 1e9
        log(f"bench: calibration pass {cal_rows} SNPs in {cal_dt:.1f}s "
            f"-> effective {eff:.3f} GB/s ({100 * eff / max(up, 1e-9):.0f}% "
            "of raw probe)")
        del cal_op
        # re-size to 60% of the remaining budget at the EFFECTIVE rate
        afford = 0.6 * max(60.0, budget_left() - 120.0) * eff
        p_fit = int(afford * 1e9 / nbytes / n_passes)
        if cache_mb:
            # beyond-HBM: only the un-cached remainder re-stages
            rem = afford * 1e9 / (n_passes - 1) + cache_mb * (1 << 20)
            p_fit = int(rem / nbytes)
        p_fit = max(1024, (p_fit // 512) * 512)
        if p_fit < p:
            if cache_mb and p_fit * nbytes <= hbm_limit:
                # the link cannot afford beyond-HBM anymore: drop to
                # the bounded-memory demo rather than a fake config
                cache_mb, memory_mb = 0, 256
                beyond = False
            p = p_fit
            # .copy(): a bare slice is a view pinning the full
            # generation (up to ~17 GB of dead host RAM) for the
            # whole solve (review r5)
            host_packed = host_packed[:p].copy()
            mean, sd = mean[:p], sd[:p]
            packed_bytes = p * nbytes
            beyond = packed_bytes > hbm_limit
            log(f"bench: re-sized to p={p} ({packed_bytes / 1e9:.2f} GB) "
                f"for the effective link rate")
    _metric_name = f"pca_oversize_n{n}_p{p}_k{k}_stream_wall_s"
    _ref_scaled = REF_SECONDS * (n / REF_N) * (p / REF_P)

    op = build_op(host_packed, mean, sd)
    # warm pass 1: moments/trace (fills the pinned-prefix cache);
    # warm pass 2: one gram pass (per-block programs already warm from
    # the calibration slice at identical block shapes)
    t0 = time.time()
    _ = op.trace
    log(f"bench: trace/cache-fill pass in {time.time() - t0:.1f}s "
        f"(cached blocks: {op._resolve_cache_blocks()}/{op.n_blocks})")
    op.reset_stats()
    t0 = time.time()
    xw = jnp.zeros((n, 16), dtype=op.dtype)
    float(jnp.sum(op.perform_op(xw)))
    warm_dt = time.time() - t0
    log(f"bench: warm gram pass in {warm_dt:.1f}s")
    # SECOND re-size on the warm pass's realized full-size rate: the
    # remote link here swings 10x within minutes (r5: calibrated
    # 41 MB/s, then 3.6 MB/s on the very next pass), and a mid-solve
    # collapse cannot be survived -- only under-committed to.  If the
    # honest data:residency ratio (>= 4x) no longer fits the shrunk
    # size, the memory bound shrinks with it (64 MB floor).
    eff2 = op.stats()["staged_bytes"] / max(warm_dt, 1e-9) / 1e9
    # per-pass cost = the warm pass itself (it staged exactly what a
    # solve pass will: the full data, or the beyond-cache remainder)
    est_solve = (n_passes - 4) * warm_dt
    room = 0.6 * max(60.0, budget_left() - 120.0)
    if on_tpu and not p_user and est_solve > room:
        p2 = int(room * eff2 * 1e9 / nbytes / (n_passes - 4))
        p2 = max(1024, (p2 // 512) * 512)
        if p2 < p:
            p = p2
            host_packed = host_packed[:p].copy()   # drop the big base
            mean, sd = mean[:p], sd[:p]
            packed_bytes = p * nbytes
            beyond = packed_bytes > hbm_limit
            if not beyond and memory_mb is None:
                cache_mb, memory_mb = 0, 256
            while (memory_mb and memory_mb > 64
                   and packed_bytes < 4 * (memory_mb << 20)):
                memory_mb //= 2
            log(f"bench: warm-pass rate {eff2:.3f} GB/s -> re-sized to "
                f"p={p} ({packed_bytes / 1e9:.2f} GB), memory_mb="
                f"{memory_mb}")
            _metric_name = f"pca_oversize_n{n}_p{p}_k{k}_stream_wall_s"
            _ref_scaled = REF_SECONDS * (n / REF_N) * (p / REF_P)
            op = build_op(host_packed, mean, sd)
            t0 = time.time()
            _ = op.trace
            float(jnp.sum(op.perform_op(xw)))
            log(f"bench: re-sized trace+warm in {time.time() - t0:.1f}s")
    op.reset_stats()

    t0 = time.time()
    res = pca(op, k, tol=tol, maxiter=500, device_results=True,
              verbose=True)
    float(jnp.sum(res.projection))
    wall = time.time() - t0
    _walls.append(wall)
    st = op.stats()
    staged_gbps = st["staged_bytes"] / max(wall, 1e-9) / 1e9
    peak = (jax.devices()[0].memory_stats() or {}).get("peak_bytes_in_use")
    log(f"bench: oversize pca() k={k} in {wall:.1f}s n_ops={res.n_ops} "
        f"converged={res.converged}; staged "
        f"{st['staged_bytes'] / 1e9:.1f} GB over {st['staged_host_blocks']} "
        f"blocks -> {staged_gbps:.3f} GB/s "
        f"({100 * staged_gbps / max(up, 1e-9):.0f}% of raw upload) "
        f"[fill {st['fill_s']:.1f}s put {st['put_s']:.1f}s]")
    if peak:
        log(f"bench: HBM high-water {peak / 1e9:.2f} GB "
            f"(packed data {packed_bytes / 1e9:.2f} GB stayed on host)")
    _SUB.update({
        "mode": "beyond_hbm" if beyond else "bounded_memory",
        "packed_gb": round(packed_bytes / 1e9, 3),
        "hbm_limit_gb": round(hbm_limit / 1e9, 2),
        "cache_mb": cache_mb, "memory_mb": memory_mb,
        "n_ops": int(res.n_ops),
        "staged_gb": round(st["staged_bytes"] / 1e9, 3),
        "staged_gbps": round(staged_gbps, 3),
        "upload_frac": round(staged_gbps / max(up, 1e-9), 2),
    })
    if peak:
        _SUB["hbm_peak_gb"] = round(peak / 1e9, 2)

    t0 = time.time()
    chk = check(op, res.vectors, res.values)   # compensated, streamed
    d_max = float(np.max(res.values))
    log(f"bench: oversize check in {time.time() - t0:.1f}s "
        f"mse={chk.mse:.3e} rmse/d_max={chk.rmse / d_max:.3e} "
        f"(contract README.md:207: < 1e-8)")
    if chk.mse > 1e-8:
        log("bench: WARNING accuracy contract (mse < 1e-8) violated")
    _SUB["check_mse"] = float(f"{chk.mse:.3e}")
    _SUB["contract_met"] = bool(chk.mse < 1e-8)


def _cache_entries(cache_dir):
    try:
        return len(os.listdir(cache_dir))
    except OSError:
        return 0


def main():
    global _metric_name, _ref_scaled

    # the watchdog guarantees a parseable stdout line + rc 0 even if a
    # tunnel stall eats the whole budget (BENCH_r03 died rc=124 with
    # the JSON still unprinted)
    wd = threading.Timer(max(1.0, _BUDGET - (time.time() - _START)),
                         _watchdog)
    wd.daemon = True
    wd.start()

    import jax
    import jax.numpy as jnp

    # FLASHPCA_FORCE_CPU=1: CPU smoke run (the environment's
    # sitecustomize force-registers the TPU backend, so the env var
    # JAX_PLATFORMS alone cannot select CPU -- same hook as examples/)
    if os.environ.get("FLASHPCA_FORCE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")

    # persistent compile cache: repeat bench runs skip the multi-second
    # remote compiles entirely
    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    platform = jax.devices()[0].platform
    mode = os.environ.get("FLASHPCA_BENCH_MODE", "wide")
    n = int(os.environ.get("FLASHPCA_BENCH_N", 0))
    p = int(os.environ.get("FLASHPCA_BENCH_P", 0))
    k = int(os.environ.get("FLASHPCA_BENCH_K", 20))
    tol = float(os.environ.get("FLASHPCA_BENCH_TOL", 1e-6))

    if mode == "oversize":
        _quiet_stdout()
        try:
            _main_oversize(platform, n, p, k, tol)
        finally:
            emit_json()
            wd.cancel()
        return

    # independent overrides: a set FLASHPCA_BENCH_N or _P is honored
    # even when the other comes from defaults (review r2)
    if mode == "tall":
        dn, dp = ((1_003_520, 50_176) if platform == "tpu"
                  else (40_000, 2_000))
        # > 1M individuals; ceil(N/4) = 250880 = 490*512, p = 98*512
        # -- the same 12.59 GB packed as the wide bench
        n, p = n or dn, p or dp
    else:
        if platform == "tpu":
            p_user = bool(p)
            n, p = n or BENCH_N, p or BENCH_P
            if not p_user:
                # fit packed (p, ceil(N/4)) + decode blocks in HBM: the
                # full 12.6 GB problem fits a 16 GB chip with room for
                # the solver basis (measured peak ~13.1 GB).  A user-
                # forced p is respected as-is.
                hbm = jax.devices()[0].memory_stats()
                limit = (hbm or {}).get("bytes_limit", 16 << 30)
                while p * ((n + 3) // 4) > 0.85 * limit:
                    p = (p // 2 // 512) * 512  # copy-free tile multiples
                    if p < 512:
                        raise RuntimeError(
                            f"N={n} does not fit the device HBM at any "
                            "tile-multiple p; lower FLASHPCA_BENCH_N")
        else:
            n, p = n or 20_000, p or 4_000  # CPU smoke size
    tag = "pca_tall" if mode == "tall" else "pca"
    _metric_name = f"{tag}_n{n}_p{p}_k{k}_end_to_end_wall_s"
    _ref_scaled = REF_SECONDS * (n / REF_N) * (p / REF_P)
    log(f"bench: platform={platform} N={n} p={p} k={k} tol={tol} "
        f"budget={_BUDGET:.0f}s compile-cache={cache_dir} "
        f"({_cache_entries(cache_dir)} entries)")

    _quiet_stdout()
    from flashpca_tpu.models.pca import pca
    from flashpca_tpu.ops.operator import PackedOperator, TallPackedOperator
    from flashpca_tpu.solvers.block_lanczos import eigsh_block, polish_subspace

    t0 = time.time()
    packed, mean, sd = generate_dataset(n, p)
    log(f"bench: generated {packed.nbytes / 1e9:.2f} GB packed "
        f"in {time.time() - t0:.1f}s")

    t_op = time.time()
    if mode == "tall":
        op = TallPackedOperator(packed, mean, sd, n, dtype=jnp.float32)
    else:
        op = PackedOperator(packed, mean, sd, n, dtype=jnp.float32)
    del packed
    # Warm every compiled program the timed solve will hit (excluded
    # from timing, like the reference's one-time process startup): the
    # remote-compile tunnel in this environment has high-variance
    # first-execution cost (8s..560s observed for identical work).
    # Each step is logged so a stall is attributable (review r3: the
    # watchdog catches it either way).
    def warm(label, fn):
        t1 = time.time()
        fn()
        log(f"bench: warm {label} in {time.time() - t1:.1f}s "
            f"(budget left {budget_left():.0f}s)")

    # (no k=1 gram warm: pca() never calls the operator's own jitted
    # vector program -- the solver traces mv from gram_pure into its
    # own cycle programs, warmed below.  The old warm cost 67 s of
    # cold compile for a program the timed path never ran.)
    mv, ops_ = op.gram_pure()
    # same ff gate as pca() itself: the tall operator exposes
    # gram_ff_permuted unconditionally but supports it only on the
    # Pallas path (supports_ff False on CPU-no-pallas -> plain polish)
    use_ff = (hasattr(op, "gram_ff_permuted")
              and getattr(op, "supports_ff", True))
    # warm the cycle program at pca()'s ACTUAL shapes: the wide ff
    # path at k <= 32 runs the r5 fixed schedule (nev = k + 4); wide
    # k > 32 and the tall path keep the adaptive schedule (nev = k +
    # 8); the plain path solves nev = k at the solver-default basis
    # (mismatched warm shapes leave every timed compile cold --
    # review r4/r5)
    if use_ff:
        nev_w = k + (8 if (mode == "tall" or k > 32) else 4)
    else:
        nev_w = k
    warm("solver cycle", lambda: eigsh_block(
        mv, op.op_dim, nev_w, block=16, maxiter=1, tol=tol,
        ncv=(nev_w + max(72, (3 * nev_w) // 2)) if use_ff else None,
        dtype=op.dtype, seed=1, operands=ops_))
    # an orthonormal warm panel (not zeros): the ff-refined polish
    # solves a generalized eigenproblem whose metric must be full rank.
    # Width nev_w matches the real pca() run, so the refinement's
    # compiled programs are warm at the right shapes.
    warm_U = jnp.eye(op.op_dim, nev_w, dtype=op.dtype)
    warm("ff polish", lambda: polish_subspace(
        mv, warm_U, iters=1, operands=ops_,
        ff_gram=op.gram_ff_permuted if use_ff else None))
    # trace: resolved (and cached, one scalar fetch) during operator
    # prep, like the real PLINK path where it is an analytic f64
    # byproduct of the host stats pass (snp_stats(with_sumsq=True) ->
    # snp_sumsq=) costing no device pass at all; synthetic
    # device-generated data has no host stats pass, so the device
    # reduction runs here, untimed
    warm("trace", lambda: op.trace)
    if mode == "tall":
        warm("prod tail", lambda: float(jnp.sum(op.prod(
            jnp.ones((p, k), op.dtype)))))                   # U = X V tail
    # the warm locals hold references into the multi-GB packed operand
    # tuple; the tall-in-default tail stage frees the operator to make
    # HBM room, which only works if no frame still pins these (r5: the
    # first tall-in-default attempt OOM'd through exactly this)
    del mv, ops_, warm_U
    log(f"bench: operator built + programs warmed in "
        f"{time.time() - t_op:.1f}s "
        f"(compile cache now {_cache_entries(cache_dir)} entries)")

    # -- the measured end-to-end user path -------------------------------
    # Default ONE timed run so the stdout JSON lands early; the tunnel
    # adds 30-60 s of per-dispatch variance to identical work, so
    # FLASHPCA_BENCH_REPEATS=2 restores the min-over-repeats estimator
    # when the budget is known to allow it.
    repeats = max(1, int(os.environ.get("FLASHPCA_BENCH_REPEATS", "1")))
    gb = op.n_snps * op.nbytes / 1e9
    res = None
    try:
        for r in range(repeats):
            t0 = time.time()
            res = pca(op, k, tol=tol, maxiter=500, device_results=True)
            float(jnp.sum(res.projection))   # force the device-side tail
            _walls.append(time.time() - t0)
            log(f"bench: pca() k={k} end-to-end run {r + 1}/{repeats} in "
                f"{_walls[-1]:.1f}s; converged={res.converged} "
                f"n_ops={res.n_ops} restarts={res.n_restarts}; effective "
                f"decode {gb * res.n_ops / _walls[-1]:.1f} GB/s "
                f"(packed bytes x matvecs / s)")
            if budget_left() < 120 and r + 1 < repeats:
                log("bench: skipping remaining repeats (budget)")
                break
    except Exception as e:
        log(f"bench: timed solve raised: {e!r}")
        if not _walls:
            # keep stdout parseable even on a hard failure: the daemon
            # watchdog dies with the interpreter, so the incomplete
            # marker must print HERE before the re-raise (review r4)
            emit_json()
            raise
    if len(_walls) > 1:
        log(f"bench: wall min over {len(_walls)} identical runs = "
            f"{min(_walls):.1f}s (all: {[round(w, 1) for w in _walls]})")
    log(f"bench: headline wall {min(_walls):.1f}s (JSON prints at the "
        "END with the tail submetrics; the watchdog emits it early on "
        "a budget stall)")
    # crash breadcrumb: the stdout contract now prints after the tail,
    # so a process-fatal tail stage (host OOM-kill, segfault) would
    # otherwise lose a completed headline -- stderr carries it too
    log("bench: headline-json " + json.dumps({
        "metric": _metric_name, "value": round(min(_walls), 2),
        "unit": "s", "vs_baseline": round(_ref_scaled / min(_walls), 2)}))
    log(f"bench: top eigenvalues d=lam/p: {np.round(res.values, 4)[:5]}")
    log(f"bench: pve: {np.round(res.pve, 5)[:5]} trace={res.trace:.1f}")

    # -- tail metrics (budget-gated, best-effort; each lands in _SUB) ----
    try:
        _run_tail(op, res, mode, platform, n, p, k, tol)
    except Exception as e:
        log(f"bench: tail diagnostics aborted: {e!r}")
    # the stdout contract: ONE JSON line, now carrying the tail's
    # submetrics.  The watchdog guarantees it prints (with whatever
    # submetrics exist) even if a tail stage stalls the budget out.
    emit_json()
    wd.cancel()


def _stage(name, fn, min_budget=120):
    """Run one tail stage best-effort: budget-gated, exception-proofed
    (a failed stage logs and the rest of the tail still runs)."""
    if budget_left() < min_budget:
        log(f"bench: skipping {name} (budget left {budget_left():.0f}s)")
        return
    try:
        fn()
    except Exception as e:
        log(f"bench: {name} failed: {e!r}")


def measure_warm_pass(op, panel, log):
    """Warm per-pass wall of one gram panel pass -- the unit cost the
    headline wall is n_ops multiples of.  Dispatch-inclusive but warm,
    so the headline's compile/tunnel variance is factored out
    (device-busy floor measured separately: docs/PERFORMANCE.md
    profile_gram, ~381 ms plain / ~855 ms ff per pass)."""
    import jax.numpy as jnp

    mv, ops_ = op.gram_pure()
    import jax

    f = jax.jit(mv)
    xp = jnp.zeros((op.op_dim, panel), op.dtype)
    float(jnp.sum(f(xp, *ops_)))          # warm
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        y = f(xp, *ops_)
    float(jnp.sum(y))
    per = (time.time() - t0) / reps
    log(f"bench: warm gram panel pass ({panel} cols) {per:.2f} s/pass "
        "(dispatch-inclusive; x n_ops approximates the solve's "
        "device-side wall)")
    _SUB["warm_s_per_pass"] = round(per, 3)


def measure_k100(op, tol, log):
    """k=100 contract solve + compensated check (VERDICT r4 item 3/4:
    the k=100 number must reach the driver-captured JSON)."""
    import jax.numpy as jnp

    from flashpca_tpu.models.check import check
    from flashpca_tpu.models.pca import pca

    t0 = time.time()
    r = pca(op, 100, tol=tol, maxiter=500, device_results=True)
    float(jnp.sum(r.projection))
    wall = time.time() - t0
    chk = check(op, r.vectors, r.values)
    log(f"bench: pca() k=100 end-to-end in {wall:.1f}s n_ops={r.n_ops} "
        f"converged={r.converged}; check mse={chk.mse:.3e} "
        "(cold-compile inclusive: k=100 shapes are not warmed)")
    _SUB["k100"] = {"s": round(wall, 1), "n_ops": int(r.n_ops),
                    "check_mse": float(f"{chk.mse:.3e}"),
                    "converged": bool(r.converged)}


def measure_tall_in_default(k, tol, log):
    """The tall (n >> p) flagship shape inside the DEFAULT bench run:
    1,003,520 x 50,176 (the same 12.59 GB packed) through
    TallPackedOperator -- so BENCH_rNN.json itself evidences the
    reference's '>= 1M individuals' claim (README.md:12).  Caller must
    free the wide operator first (both cannot fit HBM together)."""
    import jax.numpy as jnp

    from flashpca_tpu.models.pca import pca
    from flashpca_tpu.ops.operator import TallPackedOperator

    n_t, p_t = 1_003_520, 50_176
    t0 = time.time()
    packed, mean, sd = generate_dataset(n_t, p_t)
    log(f"bench: tall dataset {packed.nbytes / 1e9:.2f} GB generated "
        f"in {time.time() - t0:.1f}s")
    top = TallPackedOperator(packed, mean, sd, n_t, dtype=jnp.float32)
    del packed
    t0 = time.time()
    r = pca(top, k, tol=tol, maxiter=500, device_results=True)
    float(jnp.sum(r.projection))
    wall = time.time() - t0
    rel = float(np.max(r.residuals)) / (float(np.max(r.values)) * p_t)
    log(f"bench: tall pca() {n_t}x{p_t} k={k} in {wall:.1f}s "
        f"n_ops={r.n_ops} converged={r.converged} "
        f"pre-polish scaled residual {rel:.1e} (cold compiles included "
        "unless /tmp/jax_cache is warm)")
    _SUB["tall_1m"] = {"s": round(wall, 1), "n_ops": int(r.n_ops),
                       "n": n_t, "p": p_t,
                       "converged": bool(r.converged)}


def _run_tail(op, res, mode, platform, n, p, k, tol):
    """Everything after the timed solve: the accuracy contract first
    (the round's key evidence), then per-pass cost, the other solver
    modes, SCCA/UCCA, streaming -- each stage recording its submetric
    so the final stdout JSON carries the breadth (VERDICT r4 item 4)."""
    import jax.numpy as jnp

    from flashpca_tpu.models.check import check
    from flashpca_tpu.models.pca import pca

    # -- accuracy contract ---------------------------------------------
    if mode == "tall":
        # check() verifies XX^T U (wide semantics); the tall solve's
        # accuracy evidence is the solver's own scaled residual
        # ||X^T X v - theta v|| / theta_max at acceptance
        rel = float(np.max(res.residuals)) / (
            float(np.max(res.values)) * p)   # values = lam/div, div=p
        log(f"bench: tall solve max scaled PRE-polish solver residual "
            f"{rel:.3e} (solver acceptance tol*|theta|, tol=1e-4 on "
            "the ff path; the returned pairs are then polished -- "
            "models/pca.py polish_subspace)")
        _SUB["pre_polish_scaled_residual"] = float(f"{rel:.3e}")
    else:
        t1 = time.time()
        chk = check(op, res.vectors, res.values)   # compensated (f64-grade)
        dt = time.time() - t1
        d_max = float(np.max(res.values))
        rel_rmse = chk.rmse / d_max
        log(f"bench: check in {dt:.1f}s: mse={chk.mse:.3e} "
            f"rmse={chk.rmse:.3e} rmse/d_max={rel_rmse:.3e} "
            f"(reference contract README.md:207: mse < 1e-8 -- measured "
            f"with the compensated two-float residual, the f64-grade "
            f"measurement the reference's pipeline uses)")
        if chk.mse > 1e-8:
            log("bench: WARNING accuracy contract (mse < 1e-8) violated")
        _SUB["check_mse"] = float(f"{chk.mse:.3e}")
        _SUB["check_s"] = round(dt, 2)
        _SUB["contract_met"] = bool(chk.mse < 1e-8)

    _SUB["n_ops"] = int(res.n_ops)
    _stage("warm-pass", lambda: measure_warm_pass(
        op, 16, log), min_budget=90)

    # -- the fast-mode wall (polish="fast", VERDICT r3 item 2) ----------
    def run_fast():
        t0 = time.time()
        rf = pca(op, k, tol=tol, maxiter=500, device_results=True,
                 polish="fast")
        float(jnp.sum(rf.projection))
        wall = time.time() - t0
        log(f"bench: pca(polish='fast') k={k} in {wall:.1f}s"
            f" n_ops={rf.n_ops} (cold plain-path compiles included; "
            "residual floors at plain-f32, check mse ~2e-8 at this "
            "scale)")
        _SUB["fast"] = {"s": round(wall, 1), "n_ops": int(rf.n_ops)}

    def run_projection():
        # the --project hot path is one prod pass over the loadings
        # (randompca.cpp:813-819)
        rng = np.random.default_rng(11)
        V = jnp.asarray(rng.standard_normal((op.n_snps, 10)),
                        dtype=op.dtype)
        float(jnp.sum(op.prod(V)))       # warm
        t0 = time.time()
        float(jnp.sum(op.prod(V)))
        dt = time.time() - t0
        log(f"bench: projection pass ({op.n_snps} SNPs x 10 PCs, warm) "
            f"in {dt:.2f}s")
        _SUB["projection_s"] = round(dt, 2)

    if mode != "tall":
        _stage("projection", run_projection, min_budget=90)
        _stage("fast-mode", run_fast, min_budget=300)
        # k=100 before scca/streaming: it is the costlier headline
        # breadth item (VERDICT r4 item 3)
        if platform == "tpu" and k != 100:
            _stage("k100", lambda: measure_k100(op, tol, log),
                   min_budget=420)
        _stage("scca/ucca", lambda: measure_scca_ucca(op, n, log),
               min_budget=240)
        if os.environ.get("FLASHPCA_BENCH_EXTRA") == "1":
            # before the tall stage: it frees op.packed for HBM room
            _stage("extra-modes", lambda: measure_extra_modes(op, n, log),
                   min_budget=120)

    # -- tall flagship inside the default run (frees the wide op first:
    # 2 x 12.59 GB cannot co-reside in 16 GB HBM) ----------------------
    if (platform == "tpu" and mode == "wide"
            and os.environ.get("FLASHPCA_BENCH_NOTALL") != "1"):
        def run_tall():
            import gc

            op._cache = {}
            for attr in ("packed",):
                if hasattr(op, attr):
                    delattr(op, attr)
            gc.collect()
            measure_tall_in_default(k, tol, log)

        _stage("tall-in-default", run_tall, min_budget=300)

    if platform == "tpu" and mode != "tall":
        _stage("streaming", lambda: measure_streaming(log),
               min_budget=180)
        _stage("bed-streaming", lambda: measure_bed_streaming(log),
               min_budget=150)

if __name__ == "__main__":
    main()
