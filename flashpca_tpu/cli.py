"""Command-line front end, flag-compatible with the reference binary.

Mirrors flashpca.cpp's option table (flashpca.cpp:40-92), mode conflict
checks (:136-228), defaults (ndim=10, standx=binom2, standy=sd, div=p,
tol=1e-6, maxiter=500, memory=2048MB, seed=1, precision=7, suffix=.txt)
and output files/formats (:755-878).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from . import __version__
from .io.plink import PlinkDataset
from .io.text import read_text, save_text, TXT_SEP
from .models.check import check as run_check
from .models.pca import pca as run_pca
from .models.project import project as run_project
from .models.scca import scca as run_scca
from .models.ucca import ucca as run_ucca
from .utils.logging import log, set_show_timestamp, timestamp


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="flashpca-tpu", add_help=False,
        description="TPU-native PCA of PLINK genotype data "
                    "(flag-compatible with flashpca 2.x)",
    )
    p.add_argument("--help", action="help")
    p.add_argument("--cca", action="store_true",
                   help="perform canonical correlation analysis (CCA) "
                        "[DISABLED, matches the reference]")
    p.add_argument("--scca", action="store_true",
                   help="perform sparse canonical correlation analysis (SCCA)")
    p.add_argument("--ucca", action="store_true",
                   help="perform per-SNP canonical correlation analysis")
    p.add_argument("--project", "-p", action="store_true",
                   help="project new samples onto existing principal components")
    p.add_argument("--check", "-c", action="store_true",
                   help="check eigenvalues/eigenvectors")
    p.add_argument("--batch", action="store_true",
                   help="load all genotypes into RAM at once (PCA/UCCA; "
                        "scca/check/project follow the reference's forced "
                        "memory modes, flashpca.cpp:230-235)")
    p.add_argument("--memory", "-m", type=int, default=None,
                   help="size of block, in MB")
    p.add_argument("--blocksize", "-b", type=int, default=None,
                   help="size of block, in number of SNPs")
    p.add_argument("--numthreads", "-n", type=int, default=None,
                   help="OpenMP threads for the native host IO kernels "
                        "(XLA manages device threading itself; default: "
                        "the OpenMP runtime's own default, all cores)")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--bed"), p.add_argument("--bim"), p.add_argument("--fam")
    p.add_argument("--pheno")
    p.add_argument("--bfile")
    p.add_argument("--ndim", "-d", type=int, default=10)
    p.add_argument("--standx", "-s", default="binom2",
                   choices=["binom", "binom2"])
    p.add_argument("--standy", default="sd",
                   choices=["sd", "binom", "binom2", "none", "center"])
    p.add_argument("--div", default="p", choices=["p", "n1", "none"])
    p.add_argument("--outpc"), p.add_argument("--outpcx"), p.add_argument("--outpcy")
    p.add_argument("--outvec"), p.add_argument("--outload")
    p.add_argument("--outvecx"), p.add_argument("--outvecy")
    p.add_argument("--outval"), p.add_argument("--outpve")
    p.add_argument("--outmeansd"), p.add_argument("--outproj")
    p.add_argument("--inload"), p.add_argument("--inmeansd"), p.add_argument("--inmaf")
    p.add_argument("--verbose", "-v", action="store_true")
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--lambda1", type=float, default=0.0)
    p.add_argument("--lambda2", type=float, default=0.0)
    p.add_argument("--maxiter", type=int, default=500)
    p.add_argument("--debug", action="store_true")
    p.add_argument("--profile", metavar="DIR", default=None,
                   help="write a jax.profiler trace of the run to DIR "
                        "(TPU-specific extension; view with TensorBoard "
                        "or xprof)")
    p.add_argument("--suffix", "-f", default=".txt")
    p.add_argument("--precision", type=int, default=7)
    p.add_argument("--notime", action="store_true")
    p.add_argument("--save-vinit", action="store_true", dest="save_vinit")
    p.add_argument("--version", action="store_true")
    # TPU-specific extensions
    p.add_argument("--dtype", default=None, choices=["float32", "float64"],
                   help="device compute dtype (default: float32; "
                        "float64 on CPU)")
    p.add_argument("--shards", type=int, default=None,
                   help="shard SNPs over this many devices (default: all)")
    p.add_argument("--stream", default="auto",
                   choices=["auto", "on", "off"],
                   help="stream packed genotypes from host per block "
                        "(bounded device memory; auto = when the data "
                        "exceeds device HBM)")
    p.add_argument("--opmode", default="auto",
                   choices=["auto", "wide", "tall"],
                   help="decompose X X^T (wide), X^T X (tall, for "
                        "N >> p), or pick automatically")
    p.add_argument("--outstate", metavar="FILE", default=None,
                   help="write an .npz restart checkpoint: PCA saves "
                        "the Ritz panel after the solve (converged or "
                        "not); SCCA saves after every completed "
                        "dimension")
    p.add_argument("--instate", metavar="FILE", default=None,
                   help="resume from a checkpoint written by "
                        "--outstate (PCA warm start / SCCA skips "
                        "finished dimensions)")
    p.add_argument("--checkpoint-every", metavar="R", type=int, default=0,
                   help="PCA with --outstate: also rewrite the "
                        "checkpoint after every R-th restart DURING "
                        "the solve (mid-run fault tolerance; 0 = off)")
    p.add_argument("--polish", default="contract",
                   choices=["contract", "fast"],
                   help="f32 accuracy/speed knob: 'contract' (default) "
                        "meets the reference's --check mse < 1e-8 via "
                        "the compensated polish at ~2x the data "
                        "passes; 'fast' stops at the plain-f32 floor "
                        "(~2e-8) in about half the passes")
    return p


def _die(msg: str) -> int:
    print(f"Error: {msg}", file=sys.stderr)
    print("Use --help to get more help", file=sys.stderr)
    return 1


def _block_size_from_memory(memory_mb, n, p, ndim, do_loadings, verbose):
    """The reference's memory-budget -> block-size formula
    (flashpca.cpp:636-684), kept for CLI compatibility."""
    mem = memory_mb * 1048576
    mem_req = (
        2 * p * 8 * 2
        + 3 * p * 8
        + n * ndim * 8
        + (p * ndim * 8 if do_loadings else 0)
        + 2 * n
        + 2 * (n + p) * ndim * 8
        + 2 * 1024 * 1024 + n * 8
    )
    remain = mem - mem_req
    if verbose:
        # the reference's verbose budget diagnostics
        # (flashpca.cpp:662-665, 675-677)
        print(timestamp() + f"mem: {mem}")
        print(timestamp() + f"mem_req: {mem_req}")
        print(timestamp() + f"mem remaining: {remain}")
    if remain <= 0:
        raise ValueError(
            "The memory specified using --memory is not sufficient, try "
            f"increasing it to at least {(mem_req + n * 8) // 1048576} MB"
        )
    bs = int(remain // (n * 8))
    if bs < 1:
        raise ValueError(
            "The memory specified using --memory is not sufficient, "
            "try increasing it"
        )
    return bs


def main(argv=None) -> int:
    import os

    if os.environ.get("FLASHPCA_FORCE_CPU") == "1":
        # CPU run (f64-capable) regardless of any TPU plugin the
        # environment force-registers -- same hook as examples/_env.py
        # and bench.py (the env var JAX_PLATFORMS alone can be
        # overridden by a sitecustomize)
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    args = build_parser().parse_args(argv)
    set_show_timestamp(not args.notime)
    if args.numthreads is not None and args.numthreads > 0:
        # XLA manages device threading; this caps the native host
        # decode kernels like the reference (flashpca.cpp:571-577).
        # Only an EXPLICIT flag caps them: the reference's default of 1
        # throttles its compute GEMMs, but here the host kernels are IO
        # prep, and capping them to 1 by default would silently slow
        # the stats pass on big cohorts (review r2).
        from .io.cbed import set_num_threads

        set_num_threads(args.numthreads)

    if args.version:
        print(f"flashpca-tpu {__version__}")
        return 0

    print(timestamp() + "arguments: flashpca-tpu "
          + " ".join(argv if argv is not None else sys.argv[1:]))

    modes = [m for m in ("cca", "scca", "ucca", "project", "check")
             if getattr(args, m)]
    if len(modes) > 1:
        return _die(f"conflicting modes requested: --{modes[0]}, --{modes[1]}")
    mode = modes[0] if modes else "pca"
    if mode == "cca":
        # flag exists but is rejected, exactly like flashpca.cpp:142-157
        # (which prints no "Use --help" hint for this one)
        print("Error: CCA is currently disabled", file=sys.stderr)
        return 1

    if mode == "project":
        if not args.inload:
            return _die("SNP-loadings must be specified using --inload")
        if not args.inmaf and not args.inmeansd:
            return _die("one of MAF or mean/stdev must be specified using "
                        "--inmaf or --inmeansd, respectively")
    if args.inmeansd and args.inmaf:
        return _die("conflicting options requested --inmeansd, --inmaf")
    if args.memory is not None and args.blocksize is not None:
        return _die("cannot specify both --memory and --blocksize at the "
                    "same time")
    if args.memory is not None and args.memory < 1:
        return _die("memory (MB) must be >=1")
    if args.blocksize is not None and args.blocksize < 1:
        return _die("blocksize must be >=1")
    if args.ndim < 1:
        return _die("--ndim can't be less than 1")
    if args.maxiter <= 0:
        return _die("--maxiter can't be less than 1")
    if args.tol <= 0:
        return _die("--tol can't be zero or negative")
    if args.lambda1 < 0:
        return _die("--lambda1 can't be negative")
    if args.lambda2 < 0:
        return _die("--lambda2 can't be negative")
    if args.precision is not None and args.precision <= 1:
        return _die("output --precision too low")
    if args.checkpoint_every:
        if args.checkpoint_every < 0:
            return _die("--checkpoint-every must be a positive restart "
                        "interval")
        if mode != "pca":
            # only the PCA solver takes mid-run checkpoints; accepting
            # the flag elsewhere would silently drop the fault tolerance
            # the user asked for (SCCA checkpoints per-dimension via
            # --outstate instead)
            return _die("--checkpoint-every applies to PCA mode only "
                        "(SCCA persists per completed dimension with "
                        "--outstate)")
        if not args.outstate:
            return _die("--checkpoint-every requires --outstate")
    # same no-silent-drop rule for the other mode-specific extensions:
    # accepting them in a mode that never reads them would quietly lose
    # the fault tolerance / solver setting the user asked for
    if (args.outstate or args.instate) and mode not in ("pca", "scca"):
        return _die("--outstate/--instate apply to PCA and SCCA modes "
                    "only (this mode has no restart state)")
    if args.opmode != "auto" and mode != "pca":
        return _die("--opmode applies to PCA mode only (the other modes "
                    "run the wide operator)")
    if args.polish != "contract" and mode != "pca":
        return _die("--polish applies to PCA mode only")

    if args.bfile:
        bed, bim, fam = (args.bfile + ext for ext in (".bed", ".bim", ".fam"))
    elif args.bed and args.bim and args.fam:
        bed, bim, fam = args.bed, args.bim, args.fam
    else:
        return _die("you must specify either --bfile or --bed / --fam / --bim")

    if mode in ("scca", "ucca") and not args.pheno:
        return _die("you must specify a phenotype file in CCA/UCCA/SCCA "
                    "mode using --pheno")

    suffix = args.suffix
    out = {
        "pc": args.outpc or f"pcs{suffix}",
        "pcx": args.outpcx or f"pcsX{suffix}",
        "pcy": args.outpcy or f"pcsY{suffix}",
        "vec": args.outvec or f"eigenvectors{suffix}",
        "vecx": args.outvecx or f"eigenvectorsX{suffix}",
        "vecy": args.outvecy or f"eigenvectorsY{suffix}",
        "val": args.outval or f"eigenvalues{suffix}",
        "pve": args.outpve or f"pve{suffix}",
        "meansd": args.outmeansd or f"meansd{suffix}",
        "proj": args.outproj or f"projection{suffix}",
        "ucca": f"ucca{suffix}",
        "load": args.outload,
    }
    prec = args.precision

    import jax
    import jax.numpy as jnp

    dtype = None
    if args.dtype:
        if args.dtype == "float64":
            jax.config.update("jax_enable_x64", True)
        dtype = {"float32": jnp.float32, "float64": jnp.float64}[args.dtype]

    mesh = None
    ndev = len(jax.devices())
    nshards = args.shards if args.shards is not None else ndev
    if nshards > ndev:
        # never clamp silently: the user sized per-device memory on it
        return _die(f"--shards {nshards} exceeds the {ndev} available "
                    f"device(s)")
    if nshards < 1:
        return _die(f"--shards must be >= 1 (got {nshards})")
    if nshards > 1:
        from jax.sharding import Mesh
        mesh = Mesh(np.array(jax.devices()[:nshards]), ("snps",))

    if args.profile:
        jax.profiler.start_trace(args.profile)

    try:
        ds = PlinkDataset.open(bed, bim, fam)
        log(f"Detected BED file: {bed} with N={ds.n_samples} samples, "
            f"{ds.n_snps} SNPs", verbose=args.verbose)

        Y = None
        if args.pheno and mode in ("scca", "ucca"):
            # the reference reads --pheno only for (S)CCA/UCCA and the
            # .fam phenotype otherwise (flashpca.cpp:585-588): a stale
            # --pheno on a PCA command line must not kill the run
            Y = read_text(args.pheno, firstcol=3)
            if Y.shape[0] != ds.n_samples:
                return _die("phenotype file rows must match .fam rows")

        # the reference validates ndim before the mode switch
        # (flashpca.cpp:623-634), i.e. for EVERY mode
        max_dim = int((min(ds.n_samples, ds.n_snps) - 1) / 2.0)
        if args.ndim > max_dim:
            return _die(f"You asked for {args.ndim} dimensions, but only "
                        f"{max_dim} allowed")

        block_size = args.blocksize
        if block_size is None and args.memory is not None:
            try:
                block_size = _block_size_from_memory(
                    args.memory, ds.n_samples, ds.n_snps, args.ndim,
                    bool(args.outload), args.verbose)
            except ValueError as e:
                # same error channel as every other CLI failure (the
                # reference prints the message + "Use --help" hint)
                return _die(str(e))
        if block_size is not None:
            # clamp + log for BOTH the --memory and --blocksize paths,
            # like the reference (flashpca.cpp:686-690)
            block_size = min(block_size, ds.n_snps)
            print(timestamp() + f"blocksize: {block_size}")

        stream = {"auto": "auto", "on": True, "off": False}[args.stream]

        # built lazily: a 10M-row id+allele string list costs real time
        # and memory, and only some modes/flags consume each
        _rn_cache = {}

        def fam_rownames():
            if "fam" not in _rn_cache:
                _rn_cache["fam"] = [f + TXT_SEP + i for f, i in
                                    zip(ds.fam_ids, ds.indiv_ids)]
            return _rn_cache["fam"]

        def snp_rownames():
            if "snp" not in _rn_cache:
                _rn_cache["snp"] = [s + TXT_SEP + a for s, a in
                                    zip(ds.snp_ids, ds.ref_alleles)]
            return _rn_cache["snp"]

        meansd_out = None

        if mode == "pca":
            print(timestamp() + "PCA begin")
            res = run_pca(
                ds, args.ndim, stand=args.standx, divisor=args.div,
                maxiter=args.maxiter, tol=args.tol, seed=args.seed,
                block_size=block_size, do_loadings=bool(args.outload),
                dtype=dtype, mesh=mesh, batch=args.batch,
                verbose=args.verbose, operator_mode=args.opmode,
                streaming=stream, memory_mb=args.memory,
                state_in=args.instate, state_out=args.outstate,
                checkpoint_every=args.checkpoint_every,
                polish=args.polish,
            )
            print(timestamp() + "PCA done")
            save_text(res.values.reshape(-1, 1), out["val"], precision=prec)
            ucol = ["FID" + TXT_SEP + "IID"] + [
                f"U{i+1}" for i in range(res.vectors.shape[1])]
            save_text(res.vectors, out["vec"], colnames=ucol,
                      rownames=fam_rownames(), precision=prec)
            pccol = ["FID" + TXT_SEP + "IID"] + [
                f"PC{i+1}" for i in range(res.projection.shape[1])]
            save_text(res.projection, out["pc"], colnames=pccol,
                      rownames=fam_rownames(), precision=prec)
            save_text(res.pve.reshape(-1, 1), out["pve"], precision=prec)
            if args.outload:
                vcol = ["SNP" + TXT_SEP + "RefAllele"] + [
                    f"V{i+1}" for i in range(res.loadings.shape[1])]
                save_text(res.loadings, out["load"], colnames=vcol,
                          rownames=snp_rownames(), precision=prec)
            meansd_out = np.column_stack([res.center, res.scale])

        elif mode == "scca":
            print(timestamp() + "SCCA begin")
            res = run_scca(
                ds, Y, args.lambda1, args.lambda2, ndim=args.ndim,
                stand_x=args.standx, stand_y=args.standy, divisor=args.div,
                maxiter=args.maxiter, tol=args.tol, seed=args.seed,
                block_size=block_size, dtype=dtype, mesh=mesh,
                verbose=args.verbose, streaming=stream,
                memory_mb=args.memory,
                state_out=args.outstate, state_in=args.instate,
            )
            print(timestamp() + "SCCA done")
            if not res.converged:
                print(timestamp() + "SCCA did not converge")
            if args.save_vinit:
                save_text(res.V0, "scca_v0.txt", precision=prec)
            save_text(res.d.reshape(-1, 1), out["val"], precision=prec)
            save_text(res.U, out["vecx"], precision=prec)
            save_text(res.V, out["vecy"], precision=prec)
            save_text(res.Px, out["pcx"], precision=prec)
            save_text(res.Py, out["pcy"], precision=prec)

        elif mode == "ucca":
            print(timestamp() + "UCCA begin")
            if args.batch:
                X = ds.read_matrix()
                res = run_ucca(X, Y, stand_x=args.standx, stand_y=args.standy)
            else:
                res = run_ucca(ds, Y, stand_x=args.standx,
                               stand_y=args.standy, block_size=block_size,
                               dtype=dtype, mesh=mesh, streaming=stream,
                               memory_mb=args.memory)
            print(timestamp() + "UCCA done")
            save_text(res.result, out["ucca"],
                      colnames=["SNP", "R", "Fstat", "P"],
                      rownames=list(ds.snp_ids), precision=prec)

        elif mode == "check":
            eval_ = read_text(out["val"], firstcol=1, skip=0)[:, 0]
            evec = read_text(out["vec"], firstcol=3, skip=1)
            res = run_check(ds, evec, eval_, stand=args.standx,
                            divisor=args.div, block_size=block_size,
                            dtype=dtype, mesh=mesh, streaming=stream,
                            memory_mb=args.memory)
            for j in range(len(res.err)):
                print(timestamp() + f"eval({j+1}): {eval_[j]}, "
                      f"sum squared error: {res.err[j]}")
            print(timestamp() + f"Mean squared error: {res.mse}, "
                  f"Root mean squared error: {res.rmse} (n={ds.n_samples})")

        elif mode == "project":
            V = read_text(args.inload, firstcol=3, skip=1)
            maf = meansd = None
            if args.inmaf:
                from .io.text import read_maf
                maf = read_maf(args.inmaf, ds.snp_ids)
            else:
                meansd = read_text(args.inmeansd, firstcol=3, skip=1)
            res = run_project(
                ds, V, meansd=meansd, maf=maf, divisor=args.div,
                stand=args.standx, block_size=block_size, dtype=dtype,
                mesh=mesh, streaming=stream, memory_mb=args.memory,
            )
            pccol = ["FID" + TXT_SEP + "IID"] + [
                f"PC{i+1}" for i in range(res.projection.shape[1])]
            save_text(res.projection, out["proj"], colnames=pccol,
                      rownames=fam_rownames(), precision=prec)

        if args.outmeansd and meansd_out is None:
            # the reference writes X_meansd after EVERY mode
            # (flashpca.cpp:867-878, outside the mode switch): the
            # stats the run standardized with -- the loaded/derived
            # ones for project, the computed ones otherwise
            if mode == "project":
                from .io.text import maf2meansd

                ms = maf2meansd(maf) if maf is not None else meansd
                meansd_out = np.asarray(ms, dtype=np.float64)
            else:
                m_, s_ = ds.snp_stats(args.standx)
                meansd_out = np.column_stack([m_, s_])
        if args.outmeansd:
            save_text(
                meansd_out, out["meansd"],
                colnames=["SNP" + TXT_SEP + "RefAllele", "Mean", "SD"],
                rownames=snp_rownames(), precision=prec)

        print(timestamp() + "Goodbye!")
        return 0
    except SystemExit:
        raise
    except Exception as e:
        print(timestamp() + f"Exception: {e}", file=sys.stderr)
        print(timestamp() + "Terminating", file=sys.stderr)
        return 1
    finally:
        if args.profile:
            jax.profiler.stop_trace()


if __name__ == "__main__":
    sys.exit(main())
