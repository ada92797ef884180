"""PCA driver: top-k PCs of standardized genotype data.

Equivalent of ``RandomPCA::pca_fast`` (reference: randompca.cpp:121-218),
both the in-RAM matrix overload and the streaming PLINK overload, with
identical post-processing:

* ``values  d   = eigenvalues(X X^T) / div``  (div in {p, n-1, 1})
* ``vectors U   = eigenvectors``               (N x k)
* ``projection  Px = U diag(sqrt(d))``
* ``loadings V  = X^T U diag(1/sqrt(d)) / sqrt(div)``
* ``trace = sum X^2 / div``, ``pve = d / trace``

plus the Spectra ncv rule ``ncv = 2*ndim + 1`` and the dimension cap
``ndim <= (min(N, p) - 1) / 2`` (flashpca.cpp:614-633).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax.numpy as jnp

from ..io.plink import PlinkDataset
from ..ops.operator import (DenseOperator, PackedOperator,
                            StreamingPackedOperator, TallPackedOperator,
                            TallStreamingOperator,
                            build_packed_operator, check_operator_conflicts,
                            default_dtype as _default_dtype)
from ..ops.standardize import standardize
from ..solvers.block_lanczos import eigsh_block, polish_subspace
from ._common import fetch_global as _fetch
from ._common import resolve_divisor as _resolve_divisor

DIVISORS = ("p", "n1", "none")


@dataclass
class PCAResult:
    values: np.ndarray
    vectors: np.ndarray
    projection: np.ndarray
    pve: np.ndarray
    trace: float
    center: np.ndarray
    scale: np.ndarray
    loadings: np.ndarray | None = None
    converged: bool = True
    n_ops: int = 0
    n_restarts: int = 0
    residuals: np.ndarray | None = None

    def __repr__(self):
        return f"PCAResult(ndim={len(self.values)}, converged={self.converged})"


def _check_ndim(ndim: int, n: int, p: int) -> None:
    if ndim < 1:
        raise ValueError("ndim can't be less than 1")
    max_dim = int((min(n, p) - 1) / 2.0)
    if ndim > max_dim:
        raise ValueError(
            f"You asked for {ndim} dimensions, but only {max_dim} allowed"
        )


def pca(
    data,
    ndim: int = 10,
    *,
    stand: str = "binom2",
    divisor: str = "p",
    maxiter: int = 500,
    tol: float = 1e-6,
    seed: int = 1,
    block_size: int | None = None,
    do_loadings: bool = False,
    dtype=None,
    mesh=None,
    batch: bool = False,
    check_geno: bool = True,
    ncv: int | None = None,
    panel: int = 16,
    verbose: bool = False,
    operator_mode: str = "auto",
    streaming: bool | str = "auto",
    memory_mb: int | None = None,
    device_results: bool = False,
    state_in: str | None = None,
    state_out: str | None = None,
    checkpoint_every: int = 0,
    polish: str = "contract",
) -> PCAResult:
    """Compute the top ``ndim`` principal components.

    ``data`` may be a PLINK root path / :class:`PlinkDataset` (streaming
    packed path, stand must be binom/binom2), a numeric (N, p) matrix
    (batch path, any standardization; NaN = missing, mean-imputed), or
    a prebuilt operator (Packed/Streaming/Tall/Dense -- e.g. device-
    generated data that never had a PLINK fileset).

    ``device_results=True`` keeps the big (N x k) outputs (vectors,
    projection, loadings) as device arrays instead of fetching them to
    host numpy -- essential when the device link is slow and the caller
    consumes them on device (e.g. a follow-up ``check``).

    ``panel`` is the block-Lanczos panel width (columns decoded per
    data pass).  16 measured fastest end-to-end on TPU (decode-bound
    kernels make panel columns nearly free to ~32; see
    docs/PERFORMANCE.md); tuning is rarely needed.

    ``state_out`` writes an .npz restart checkpoint (the Ritz panel in
    sample space) after the solve -- even when it did NOT converge, so
    an interrupted/maxiter-limited run can resume.  ``state_in`` warm-
    starts the solver from such a checkpoint (seeds up to one solver
    panel of columns), typically converging in fewer data passes.
    ``checkpoint_every=R`` additionally rewrites ``state_out`` after
    every R-th thick restart DURING the solve, so even a killed process
    resumes from its last checkpoint (mid-run fault tolerance; costs
    one (N, panel) device->host fetch per checkpoint).

    ``polish`` is the accuracy/speed knob for f32 (TPU) runs:

    * ``"contract"`` (default): a FIXED-SCHEDULE capped solve (8 thick
      restarts, ndim + up-to-4 buffer pairs) finished with the
      compensated (two-float) ff-Krylov refinement, whose accuracy
      floor is schedule-determined rather than spectrum-determined;
      an ff-accurate residual gate computes ``check()``'s mse
      statistic (no extra data pass), accepts under 7e-9, deepens by
      one more refinement application if missed, and falls back to a
      full adaptive solve if still missed -- meeting the reference's
      ``--check`` contract literally and MEASURABLY (mse < 1e-8,
      README.md:207; measured 2.3-5.8e-9 across data seeds at
      501,760 x 100,352 k=20, n_ops=20).  The fixed schedule applies
      on the WIDE path for ndim <= 32 (its validated regime --
      restarts get ncv/panel ops wide, so large ndim keeps the r4
      adaptive schedule with 8 buffer pairs, e.g. k=100 at 80 ops /
      mse 2.4e-9; the tall path keeps the adaptive schedule + single
      compensated polish throughout).
    * ``"fast"``: plain f32 solve + f32 subspace polish -- about half
      the passes; the residual floors at the f32 product-noise level
      (check mse ~2.4e-8 at the same scale -- far beyond any
      statistical need for PCA, but above the literal contract).

    On f64 (CPU) runs both settings are identical (the f64 path never
    needs the compensated refinement).
    """
    if polish not in ("contract", "fast"):
        raise ValueError(
            f"polish must be 'contract' or 'fast', got {polish!r}")
    if operator_mode not in ("auto", "wide", "tall"):
        raise ValueError(f"unknown operator_mode: {operator_mode}")
    if checkpoint_every:
        if checkpoint_every < 0:
            raise ValueError(
                f"checkpoint_every must be a positive restart interval, "
                f"got {checkpoint_every}")
        if state_out is None:
            raise ValueError(
                "checkpoint_every requires state_out (a path to write "
                "the mid-run checkpoints to)"
            )
    dtype_arg = dtype          # None unless the caller chose explicitly
    dtype = dtype or _default_dtype()

    if isinstance(data, str):
        data = PlinkDataset.open(data)

    if isinstance(data, (TallPackedOperator, TallStreamingOperator,
                         PackedOperator, StreamingPackedOperator,
                         DenseOperator)):
        # a prebuilt operator fixes dtype/sharding/residency; explicit
        # conflicting kwargs raise instead of being dropped silently
        check_operator_conflicts(data, dtype=dtype_arg, mesh=mesh,
                                 streaming=streaming,
                                 memory_mb=memory_mb,
                                 block_size=block_size)
        if batch:
            raise ValueError(
                "batch=True has no effect on a prebuilt operator"
            )
        # the decomposition shape is fixed by the operator class too
        is_tall_op = isinstance(data, (TallPackedOperator,
                                       TallStreamingOperator))
        if operator_mode != "auto" and (operator_mode == "tall") != is_tall_op:
            raise ValueError(
                f"operator_mode={operator_mode!r} conflicts with the "
                f"prebuilt {type(data).__name__}; build the matching "
                "operator class instead"
            )
    if isinstance(data, (TallPackedOperator, TallStreamingOperator)):
        _check_ndim(ndim, data.n_samples, data.n_snps)
        return _pca_tall(
            data, ndim, divisor, maxiter, tol, seed, do_loadings,
            data.dtype, ncv, data.center, data.scale, panel=panel,
            fused=not isinstance(data, TallStreamingOperator),
            state_in=state_in, state_out=state_out,
            checkpoint_every=checkpoint_every,
            device_results=device_results, verbose=verbose,
            polish=polish,
        )
    if isinstance(data, (PackedOperator, StreamingPackedOperator,
                         DenseOperator)):
        _check_ndim(ndim, data.n_samples, data.n_snps)
        return _pca_operator(
            data, ndim, divisor, maxiter, tol, seed, do_loadings,
            data.dtype, ncv, data.center, data.scale, panel=panel,
            fused=not isinstance(data, StreamingPackedOperator),
            device_results=device_results,
            state_in=state_in, state_out=state_out, verbose=verbose,
            checkpoint_every=checkpoint_every, polish=polish,
        )

    if isinstance(data, PlinkDataset):
        if stand not in ("binom", "binom2"):
            raise ValueError(
                "When using PLINK data, you must use stand='binom' or 'binom2'"
            )
        n, p = data.n_samples, data.n_snps
        _check_ndim(ndim, n, p)
        if batch:
            # reference semantics: --batch forces the in-RAM path and
            # ignores the memory budget (flashpca.cpp:230-235) -- keep
            # that flag-compatible behavior, but say so when the caller
            # explicitly asked for bounded memory
            if streaming is True or memory_mb is not None:
                from ..utils.logging import log

                log("note: batch=True loads the whole matrix; the "
                    "streaming/memory_mb request is ignored (reference "
                    "--batch semantics)")
            if operator_mode == "tall":
                raise ValueError(
                    "operator_mode='tall' has no batch (dense) "
                    "implementation; drop batch=True for the tall path"
                )
            if device_results:
                raise ValueError(
                    "device_results=True is not supported on the batch "
                    "(dense) path; use the packed path or a prebuilt "
                    "operator"
                )
            X = data.read_matrix()
            return _pca_matrix(
                X, ndim, stand, divisor, maxiter, tol, seed,
                do_loadings, dtype, ncv, panel=panel,
                verbose=verbose, mesh=mesh,
                state_in=state_in, state_out=state_out,
                checkpoint_every=checkpoint_every, polish=polish,
            )
        # one host pass yields (mean, sd) AND the exact per-SNP sum of
        # squares of standardized X -- so trace/pve cost no device data
        # pass (the reference accumulates trace during its first
        # operator pass instead, svdwide.cpp:44-45)
        mean, sd, sumsq = data.snp_stats(stand, with_sumsq=True)
        # tall regime (n >> p): decompose the p x p Gram X^T X instead
        # of the n x n X X^T -- the path the reference stubbed
        # (svdtall.cpp; see SURVEY.md 2.1).  Since r4 tall COMPOSES
        # with streaming: data larger than HBM keeps the p x p problem
        # shape and streams sample(byte)-axis blocks through
        # TallStreamingOperator (host-driven solver cycles).
        from ..ops.operator import resolve_streaming

        stream_on = resolve_streaming(streaming, data, mesh)
        tall = (operator_mode == "tall"
                or (operator_mode == "auto" and n > 2 * p))
        if tall:
            # tall sharding splits the SAMPLE (byte) axis; reuse whatever
            # axis name the caller's 1-D mesh carries (CLI meshes are
            # built as ("snps",) -- the name is just a label here)
            ax = mesh.axis_names[0] if mesh is not None else "samples"
            if stream_on:
                if block_size is not None:
                    # block_size counts SNPs-per-block (the wide axis);
                    # the tall streaming operator blocks the BYTE
                    # (sample) axis, so a SNP count is not honorable --
                    # raising beats dropping it silently (the prebuilt-
                    # operator conflict rule, check_operator_conflicts)
                    raise ValueError(
                        "block_size= (SNPs per block) does not apply to "
                        "the tall streaming path, which blocks the "
                        "sample(byte) axis; bound its staged buffers "
                        "with memory_mb= instead"
                    )
                # streaming x tall: byte-axis blocks staged from host
                # (the composition the reference stubbed twice --
                # svdtall.cpp dead + svdwide.cpp:21-68 SNP-blocks-only)
                op = TallStreamingOperator(
                    data, mean, sd, n, memory_mb=memory_mb,
                    dtype=dtype, mesh=mesh, axis_name=ax,
                    snp_sumsq=sumsq,
                )
            else:
                op = TallPackedOperator(
                    data.read_packed(), mean, sd, n,
                    block_size=block_size, dtype=dtype, mesh=mesh,
                    axis_name=ax, snp_sumsq=sumsq,
                )
            return _pca_tall(
                op, ndim, divisor, maxiter, tol, seed, do_loadings,
                dtype, ncv, mean, sd, panel=panel, fused=not stream_on,
                state_in=state_in, state_out=state_out,
                checkpoint_every=checkpoint_every,
                device_results=device_results, verbose=verbose,
                polish=polish,
            )
        # streaming: host(/disk)-resident packed data, bounded device
        # memory -- the reference's core capability (README.md:11-12).
        # auto-on when the packed matrix won't fit on the device.
        op = build_packed_operator(
            data, mean, sd, streaming=stream_on, memory_mb=memory_mb,
            block_size=block_size, dtype=dtype, mesh=mesh,
            snp_sumsq=sumsq,
        )
        return _pca_operator(
            op, ndim, divisor, maxiter, tol, seed, do_loadings,
            dtype, ncv, mean, sd, panel=panel,
            fused=not isinstance(op, StreamingPackedOperator),
            device_results=device_results,
            state_in=state_in, state_out=state_out,
            verbose=verbose, checkpoint_every=checkpoint_every,
            polish=polish,
        )

    # dense-matrix input: packed-path and device-residency requests
    # cannot be honored -- raise instead of dropping them silently
    # (the prebuilt-operator conflict rule; review r4)
    if streaming is True or memory_mb is not None:
        raise ValueError(
            "streaming=True / memory_mb apply to packed (PLINK) data; "
            "a dense matrix X is held in device memory whole"
        )
    if operator_mode == "tall":
        raise ValueError(
            "operator_mode='tall' is a packed-path option; the dense "
            "matrix path has no tall operator"
        )
    if device_results:
        raise ValueError(
            "device_results=True is not supported on the dense matrix "
            "path; standardize and build a DenseOperator, then call "
            "pca(op, ...) for device-resident results"
        )
    X = np.asarray(data, dtype=np.float64)
    if X.ndim != 2:
        raise ValueError("X must be a 2-D matrix")
    if X.shape[1] < 2 or X.shape[0] < 2:
        raise ValueError("X must have at least two rows and columns")
    if stand in ("binom", "binom2") and check_geno:
        ok = np.isnan(X) | np.isin(X, (0.0, 1.0, 2.0))
        if not ok.all():
            raise ValueError(
                "Your data contains values other than {0, 1, 2}, "
                "stand='binom'/'binom2' can't be used here"
            )
    _check_ndim(ndim, X.shape[0], X.shape[1])
    return _pca_matrix(
        X, ndim, stand, divisor, maxiter, tol, seed, do_loadings,
        dtype, ncv, panel=panel, verbose=verbose,
        mesh=mesh, state_in=state_in, state_out=state_out,
        checkpoint_every=checkpoint_every, polish=polish,
    )


def _solver_v0(op, native_len, seed, state_in):
    """Initial vector/panel in the operator's padded device space:
    a warm-start Ritz panel from a checkpoint, else seeded random."""
    if state_in is not None:
        from ..solvers.lanczos import load_state

        st = load_state(state_in)
        panel = st["vectors"]
        if panel.shape[0] != native_len:
            raise ValueError(
                f"restart state has {panel.shape[0]} rows; expected "
                f"{native_len}")
        # host-side permutation: a device permute + fetch costs a
        # download on slow device links (review r2)
        return op.permute_np(panel)
    rng = np.random.default_rng(seed)
    return op.permute_np(rng.standard_normal(native_len))


def _save_solver_state(op, res, state_out):
    if state_out is not None:
        from ..solvers.lanczos import save_state

        # Every process writes (the panel is replicated and identical,
        # and hosts may not share a filesystem); save_state's atomic
        # rename makes concurrent shared-path writes benign.
        save_state(state_out, np.asarray(op.unpermute(res.eigenvectors)),
                   res.eigenvalues, res.residuals, res.converged)


def _mid_run_checkpointer(op, state_out, checkpoint_every):
    """Solver callback persisting the current Ritz panel every R-th
    restart (mid-run fault tolerance: survives process death, not just
    a maxiter cap).  None when not requested."""
    if state_out is None or checkpoint_every <= 0:
        return None
    from ..solvers.lanczos import save_state
    from ..utils.logging import log

    # visible cost note: each write fetches the (N, panel) Ritz panel
    # to host -- trivial locally, minutes per checkpoint over a thin
    # remote-device link (CLAUDE.md rule 2); pick R accordingly
    log(f"mid-run checkpoints every {checkpoint_every} restart(s) -> "
        f"{state_out} (fetches the Ritz panel each time; use a larger "
        "interval on slow device links)")

    def ckpt(panel, values, residuals):
        save_state(state_out, np.asarray(op.unpermute(panel)),
                   values, residuals, False)

    return ckpt


def _clamp_buffer(extra, ndim, ncv, panel):
    """Cap the buffer-pair count so a USER-pinned basis keeps the block
    solver viable (eigsh_block falls back to scalar Lanczos when
    nev + panel > ncv -- 1-column matvecs on a decode-bound operator,
    ~16x the data passes).  A previously-valid (ndim, ncv) call must
    not silently cross that guard because of the internal nev
    inflation; the buffer shrinks instead.  The guard compares against
    the PANEL-ROUNDED basis (eigsh_block floor-rounds a user ncv to a
    multiple of the panel width), so clamp against that value."""
    if ncv is None:
        return extra
    ncv, panel = int(ncv), int(panel)
    ncv_eff = panel * (ncv // panel) if ncv % panel else ncv
    return max(0, min(extra, ncv_eff - panel - int(ndim)))


def _clamp_auto_ncv(ncv, ndim, extra, panel, op_dim):
    """Keep the AUTO ff basis inside the block solver's viability guard
    (``ncv + 2*panel <= op_dim`` in whole panels): a small problem must
    not be kicked to scalar Lanczos (1-column matvecs, ~16x the data
    passes) by the internal basis inflation alone.  Shrinks the buffer
    with the basis; returns (ncv, extra, nev_solve).  ``_clamp_buffer``
    gives USER-pinned bases the same protection (review r4)."""
    ncv_max = panel * ((op_dim - 2 * panel) // panel)
    if ncv > ncv_max >= ndim + panel:
        ncv = ncv_max
        extra = _clamp_buffer(extra, ndim, ncv, panel)
    return ncv, extra, ndim + extra


def _gate_convergence(res, ndim, tol):
    """Requested pairs govern success; buffer pairs are best-effort.

    The f32 contract path solves nev = ndim + buffer (see
    _pca_operator); a buffer pair stuck in a tight cluster until
    maxiter must not fail a run whose REQUESTED ndim pairs met
    tolerance (that call succeeded before buffers existed), and a real
    failure must report the residual that failed -- res.residuals spans
    all solved pairs, so max over [:ndim] can read below tol while the
    solve aborts.  Returns the converged flag for the PCAResult."""
    if res.converged:
        return True
    mask = res.conv_mask
    nsolve = len(res.residuals)
    if (mask is not None and len(mask) >= ndim
            and bool(np.all(mask[:ndim]))):
        from ..utils.logging import log

        miss = int(np.sum(~np.asarray(mask[ndim:], dtype=bool)))
        log(f"note: {miss}/{nsolve - ndim} buffer pair(s) missed "
            "tolerance by maxiter; the requested pairs converged (max "
            f"residual {float(np.max(res.residuals[:ndim])):.3e}) -- "
            "continuing (the compensated polish may land slightly "
            "above the check contract; models.check() measures it)")
        return True
    raise RuntimeError(
        "eigen-decomposition was not successful: max residual "
        f"{float(np.max(res.residuals[:ndim])):.3e} over the {ndim} "
        f"requested pair(s) after {res.n_restarts} restarts "
        f"(buffer={nsolve - ndim}, max residual "
        f"{float(np.max(res.residuals)):.3e} incl. buffers, tol={tol})"
    )


def _pca_tall(op, ndim, divisor, maxiter, tol, seed, do_loadings,
              dtype, ncv, mean, sd, panel=16, fused=True, state_in=None,
              state_out=None, checkpoint_every=0, device_results=False,
              verbose=False, polish="contract") -> PCAResult:
    """Tall path: eigenpairs of X^T X; identical outputs to the wide
    path: lambda(X^T X) = lambda(X X^T) on the top spectrum,
    U = X V_s Lambda^{-1/2}, and the loadings V equal V_s exactly
    (V = X^T U diag(1/sqrt(d))/sqrt(div) = V_s, randompca.cpp:151-152).
    """
    n, p = op.n_samples, op.n_snps
    div = _resolve_divisor(divisor, n, p)

    v0 = _solver_v0(op, p, seed, state_in)

    # same buffered-solve + compensated-polish pattern as the wide path
    # (see _pca_operator); the tall ff gram rides the Pallas kernels
    use_ff = (jnp.dtype(dtype) == jnp.dtype(jnp.float32)
              and getattr(op, "supports_ff", False)
              and polish == "contract")
    if (polish == "contract" and not use_ff
            and jnp.dtype(dtype) == jnp.dtype(jnp.float32)):
        # contract-grade accuracy needs the compensated (ff) Pallas
        # kernels, which this tall operator lacks (non-TPU backend or
        # use_pallas=False) -- say so instead of silently returning a
        # plain-f32-floor result under the 'contract' label (review r4)
        from ..utils.logging import log

        log("note: this tall operator has no compensated (ff) kernel "
            "support; the f32 result floors at plain precision "
            "(check mse ~2e-8 at biobank scale, above the mse < 1e-8 "
            "contract) -- build the operator with Pallas enabled for "
            "contract-grade accuracy")
    max_dim = int((min(n, p) - 1) / 2.0)
    extra = min(8, max(0, max_dim - ndim)) if use_ff else 0
    extra = _clamp_buffer(extra, ndim, ncv, panel)
    nev_solve = ndim + extra
    if use_ff and ncv is None:
        ncv = nev_solve + max(72, (3 * nev_solve) // 2)
        ncv, extra, nev_solve = _clamp_auto_ncv(
            ncv, ndim, extra, panel, op.op_dim)
    solver_tol = max(tol, 1e-4) if use_ff else tol

    if fused:
        mv, ops_ = op.gram_pure()
    else:
        mv, ops_ = op.gram_permuted, ()
    res = eigsh_block(
        mv, op.op_dim, nev_solve, block=panel, ncv=ncv,
        maxiter=maxiter, tol=solver_tol, dtype=dtype, seed=seed, v0=v0,
        operands=ops_, fused=fused, verbose=verbose,
        checkpoint_every=checkpoint_every,
        checkpoint_fn=_mid_run_checkpointer(op, state_out,
                                            checkpoint_every),
    )
    _save_solver_state(op, res, state_out)
    converged = _gate_convergence(res, ndim, tol)

    lam = res.eigenvalues
    V_dev = res.eigenvectors
    if jnp.dtype(dtype) == jnp.dtype(jnp.float32):
        lam, V_dev = polish_subspace(
            mv, V_dev, iters=2, operands=ops_, fused=fused,
            ff_gram=op.gram_ff_permuted if use_ff else None)
    lam = lam[:ndim]
    V_dev = V_dev[:, :ndim]
    d = lam / div
    trace = op.trace / div
    pve = d / trace

    Vs_dev = op.unpermute(V_dev)
    if device_results:
        Vs = Vs_dev
        U = op.prod(Vs_dev) * jnp.asarray(
            1.0 / np.sqrt(lam), dtype)[None, :]
        Px = U * jnp.asarray(np.sqrt(d), U.dtype)[None, :]
    else:
        # feed prod the DEVICE panel (an f32->f64->f32 host round trip
        # is value-identical and costs a (p, k) download + upload per
        # run over a thin device link, review r4); fetch the loadings
        # only when asked.  tall-path U = X v is SAMPLE-sharded: gather
        # under multi-controller execution
        U = _fetch(op.prod(Vs_dev), dtype=np.float64)
        U = U / np.sqrt(lam)[None, :]
        Px = U * np.sqrt(d)[None, :]
        Vs = (np.asarray(Vs_dev, dtype=np.float64)
              if do_loadings else None)

    return PCAResult(
        values=d,
        vectors=U,
        projection=Px,
        pve=pve,
        trace=trace,
        center=np.asarray(mean, dtype=np.float64),
        scale=np.asarray(sd, dtype=np.float64),
        loadings=Vs if do_loadings else None,
        converged=converged,
        n_ops=res.n_ops,
        n_restarts=res.n_restarts,
        residuals=res.residuals[:ndim],
    )


def _pca_matrix(X, ndim, stand, divisor, maxiter, tol, seed, do_loadings,
                dtype, ncv, panel=16, verbose=False,
                mesh=None, state_in=None, state_out=None,
                checkpoint_every=0, polish="contract"):
    if mesh is not None and mesh.size > 1:
        # the dense-matrix path has no sharded implementation; silent
        # single-device placement would hide a dropped request
        # (review r2) -- but a default all-devices CLI mesh with
        # --batch is legitimate, so warn rather than raise
        from ..utils.logging import log

        log("note: the dense-matrix (batch) PCA path runs unsharded; "
            "mesh= is ignored (use the packed path for SNP sharding)")
    X_std, mean, sd = standardize(X, stand)
    op = DenseOperator(X_std, dtype=dtype)
    return _pca_operator(
        op, ndim, divisor, maxiter, tol, seed, do_loadings, dtype, ncv,
        mean, sd, panel=panel, verbose=verbose,
        state_in=state_in, state_out=state_out,
        checkpoint_every=checkpoint_every, polish=polish,
    )


def _pca_operator(op, ndim, divisor, maxiter, tol, seed, do_loadings,
                  dtype, ncv, mean, sd, panel=16,
                  fused=True, device_results=False, state_in=None,
                  state_out=None, checkpoint_every=0,
                  verbose=False, polish="contract") -> PCAResult:
    n, p = op.n_samples, op.n_snps
    div = _resolve_divisor(divisor, n, p)

    # v0 built in sample space so byte-padding coordinates start at zero
    v0 = _solver_v0(op, n, seed, state_in)

    use_ff = (jnp.dtype(dtype) == jnp.dtype(jnp.float32)
              and hasattr(op, "gram_ff_permuted")
              and polish == "contract")
    # FIXED-SCHEDULE contract regime (r5): validated for ndim <= 32 --
    # at k=20 a capped 8-restart solve is ~20 ops, but restarts get
    # ~(ncv/panel) ops WIDE, so at k=100 the "capped" solve already
    # costs ~100 ops and a gate miss doubles the work (measured:
    # 163 s vs the adaptive path's 59 s).  Large ndim keeps the r4
    # adaptive schedule.
    capped = use_ff and ndim <= 32
    # Buffer pairs beyond ndim, SOLVED alongside the requested ones:
    # with the boundary pairs' spectral neighbors in the refinement
    # basis, the compensated polish cleans the requested pairs like
    # interior ones.  4 pairs suffice on the fixed-schedule path
    # (measured, r5); the adaptive path keeps 8 (the r4 sweep's
    # cost-minimal contract configuration -- smaller buffers converge
    # SLOWER adaptively, docs/PERFORMANCE.md).
    max_dim = int((min(n, p) - 1) / 2.0)
    extra = min(4 if capped else 8, max(0, max_dim - ndim)) if use_ff else 0
    extra = _clamp_buffer(extra, ndim, ncv, panel)
    nev_solve = ndim + extra
    if use_ff and ncv is None:
        # basis rule for the contract-meeting path, swept at full size
        # (k in {10,20,40,100}, docs/PERFORMANCE.md): what matters is
        # ABSOLUTE headroom beyond the solved pairs (~72 columns at
        # panel 16) plus proportional room for large nev; the plain
        # 4*nev rule costs ~1.7x the passes at k=100 for the same
        # final accuracy
        ncv = nev_solve + max(72, (3 * nev_solve) // 2)
        ncv, extra, nev_solve = _clamp_auto_ncv(
            ncv, ndim, extra, panel, op.op_dim)
    # With the ff polish running, the solver's job is SPAN-building:
    # the polish refines the returned pairs regardless of how tightly
    # the solver iterated, so driving the f32 solve past ~1e-4 only
    # burns data passes.
    solver_tol = max(tol, 1e-4) if use_ff else tol

    if fused:
        mv, ops_ = op.gram_pure()
    else:
        mv, ops_ = op.gram_permuted, ()
    # panel matvecs amortize the packed-decode pass over a 16-column
    # panel: the fused decode kernels are VPU-decode-bound, so panel
    # columns are nearly free to ~32, and the measured end-to-end
    # sweep (b in {8,16,32} at 500k x 50k, k=20) picked 16 (35%
    # faster than 8; 32 over-restarts on clustered spectra)
    ckpt = _mid_run_checkpointer(op, state_out, checkpoint_every)
    # FIXED-SCHEDULE contract path (r5): cap the f32 solve at 8 thick
    # restarts -- it only needs to build SPAN; the compensated
    # refinement sets the final accuracy, and its floor is schedule-
    # determined, NOT spectrum-determined (measured at 501,760 x
    # 100,352 k=20 across data seeds {7,11,23}, whose adaptive solves
    # cost 30/46/54 ops: one polish application lands check mse
    # 5.66-5.82e-9, two land 2.26-2.33e-9 -- near-constant).  The
    # ff-accurate residual gate below MEASURES the contract instead of
    # assuming it: accept at mse_est < 7e-9, deepen by one more polish
    # application if missed, and fall back to the full adaptive solve
    # (the r4 behavior) if still missed.  Net: n_ops 30 -> 20 at k=20
    # for the same contract, robustly.
    cap = min(8, maxiter) if capped else maxiter
    res = eigsh_block(
        mv, op.op_dim, nev_solve, block=panel, ncv=ncv,
        maxiter=cap, tol=solver_tol, dtype=dtype, seed=seed,
        v0=v0, operands=ops_, fused=fused, verbose=verbose,
        checkpoint_every=checkpoint_every, checkpoint_fn=ckpt,
    )
    _save_solver_state(op, res, state_out)
    # the Spectra-style failure gate applies to ADAPTIVE solves; a
    # capped span-building solve is EXPECTED to stop short -- its
    # delivered accuracy is measured by the ff-residual gate below
    converged = (_gate_convergence(res, ndim, tol)
                 if not capped else res.converged)

    lam = res.eigenvalues
    U_dev = res.eigenvectors
    resid_out = res.residuals[:ndim]
    n_ops_extra = 0
    if use_ff:
        ff_gram = op.gram_ff_permuted
        # contract gate: mse_est is exactly check()'s statistic, from
        # the refinement's own two-float residuals (no data pass)
        ok = False
        for _app in range(2 if capped else 1):
            lam, U_dev, resid = polish_subspace(
                mv, U_dev, iters=2, operands=ops_, fused=fused,
                ff_gram=ff_gram, return_resid=True)
            mse_est = float(np.sum((resid[:ndim] / div) ** 2)
                            / (n * ndim))
            if not capped or mse_est < 7e-9:
                ok = capped or mse_est < 1e-8 or converged
                break
        if not ok and cap < maxiter:
            # pathological spectrum: the measured estimate missed the
            # contract -- rerun the r4 adaptive schedule from scratch
            # (the discarded capped attempt's passes stay on the bill:
            # n_ops is the bench's stable cost metric)
            if verbose:
                from ..utils.logging import log

                log(f"pca: capped schedule missed the contract "
                    f"(mse_est {mse_est:.2e}); falling back to the "
                    "adaptive solve")
            n_ops_extra = res.n_ops
            res = eigsh_block(
                mv, op.op_dim, nev_solve, block=panel, ncv=ncv,
                maxiter=maxiter, tol=solver_tol, dtype=dtype,
                seed=seed, v0=v0, operands=ops_, fused=fused,
                verbose=verbose, checkpoint_every=checkpoint_every,
                checkpoint_fn=ckpt,
            )
            _save_solver_state(op, res, state_out)
            converged = _gate_convergence(res, ndim, tol)
            lam, U_dev, resid = polish_subspace(
                mv, res.eigenvectors, iters=2, operands=ops_,
                fused=fused, ff_gram=ff_gram, return_resid=True)
            mse_est = float(np.sum((resid[:ndim] / div) ** 2)
                            / (n * ndim))
            ok = mse_est < 1e-8
        elif not ok:
            # user capped maxiter at/below the schedule and the gate
            # missed: apply the Spectra-style failure semantics the
            # adaptive path has (raises on a genuinely failed solve;
            # permits it when the requested pairs converged) -- a
            # capped run must not silently swallow failure (review r5)
            converged = _gate_convergence(res, ndim, tol)
        # post-polish ff residuals are the HONEST convergence evidence
        # (the solver's own flag reflects the capped schedule, not the
        # delivered accuracy); report them in the result too
        converged = bool(ok) or converged
        resid_out = resid[:ndim]
        if capped and ok and state_out is not None and not res.converged:
            # the persisted state must carry the DELIVERED outcome: a
            # gate-passing capped run is a successful solve even though
            # the 8-restart solver itself stopped short of its tol
            # (resume/inspection consumers read this flag, review r5)
            from ..solvers.lanczos import save_state

            save_state(state_out,
                       np.asarray(op.unpermute(res.eigenvectors)),
                       res.eigenvalues, res.residuals, True)
    elif jnp.dtype(dtype) == jnp.dtype(jnp.float32):
        # f32 restart cycles accumulate basis drift; fresh subspace
        # sweeps + host-f64 Rayleigh-Ritz recover accuracy near the
        # plain-f32 product-noise floor (polish='fast', or operators
        # without a compensated gram)
        lam, U_dev = polish_subspace(
            mv, U_dev, iters=2, operands=ops_, fused=fused)
    # drop the buffer pairs: only the requested dimensions are returned
    lam = lam[:ndim]
    U_dev = U_dev[:, :ndim]
    d = lam / div
    trace = op.trace / div
    pve = d / trace

    if device_results:
        U = op.unpermute(U_dev)
        Px = U * jnp.asarray(np.sqrt(d), U.dtype)[None, :]
        loadings = None
        if do_loadings:
            Vt = op.crossprod(U)
            loadings = Vt * jnp.asarray(
                1.0 / np.sqrt(d) / np.sqrt(div), Vt.dtype)[None, :]
    else:
        U_unperm = op.unpermute(U_dev)
        U = np.asarray(U_unperm, dtype=np.float64)
        loadings = None
        if do_loadings:
            # crossprod consumes the DEVICE panel (re-uploading the
            # just-fetched host copy is value-identical and wastes an
            # (n, k) transfer, review r4); its output is SNP-sharded:
            # gather under multi-controller execution (fetch_global)
            Vt = _fetch(op.crossprod(U_unperm), dtype=np.float64)
            loadings = Vt * (1.0 / np.sqrt(d) / np.sqrt(div))[None, :]
        Px = U * np.sqrt(d)[None, :]

    return PCAResult(
        values=d,
        vectors=U,
        projection=Px,
        pve=pve,
        trace=trace,
        center=np.asarray(mean, dtype=np.float64),
        scale=np.asarray(sd, dtype=np.float64),
        loadings=loadings,
        converged=converged,
        n_ops=res.n_ops + n_ops_extra,
        n_restarts=res.n_restarts,
        residuals=resid_out,
    )


# R-package-compatible alias (flashpcaR::flashpca)
def flashpca(X, ndim=10, stand="binom2", divisor="p", maxiter=100,
             tol=1e-4, seed=1, block_size=1000, verbose=False,
             do_loadings=False, check_geno=True, **kw) -> PCAResult:
    """Alias with the R package's defaults (flashpcaR/R/flashpca.R:99-103).

    ``block_size`` keeps the R default (1000) for signature parity but
    only reaches ``pca()`` for PLINK inputs, where it means SNPs per
    scan block: a dense matrix has no blocking, and a prebuilt
    operator's block geometry is fixed at construction (forwarding the
    R default would trip the conflict check, review r4)."""
    if isinstance(X, (str, PlinkDataset)):
        kw.setdefault("block_size", block_size)
    return pca(
        X, ndim, stand=stand, divisor=divisor, maxiter=maxiter, tol=tol,
        seed=seed, do_loadings=do_loadings,
        check_geno=check_geno, verbose=verbose, **kw,
    )
