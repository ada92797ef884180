"""Sparse canonical correlation analysis (SCCA).

Equivalent of ``RandomPCA::scca`` (reference: randompca.cpp:225-528):
penalized alternating power iteration on X^T Y with sequential
Gram-Schmidt deflation.  Per dimension j:

* ``u <- X^T (Y v)``; orthogonalize against U[:, :j]; ``norm_thresh(u, l1)``
* ``v <- Y^T (X u)``; orthogonalize against V[:, :j]; ``norm_thresh(v, l2)``
* converged when ``max|du| < tol`` and ``max|dv| < tol``
* ``d[j] = (X u_j)^T (Y v_j)``

``norm_thresh(x, l)``: normalize, soft-threshold by l, renormalize
(randompca.cpp:233-245).  With ``divisor='n1'`` both sides carry a
``1/sqrt(n-1)`` factor (applied as ``invdiv`` on the streamed products,
randompca.cpp:404-409).

The X-side products are the streamed packed-genotype passes
(``crossprod`` / ``prod``); U/V/thresholding stay replicated on host in
float64 -- the deflation is inherently sequential per dimension
(SURVEY.md section 7 "hard parts").
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..io.plink import PlinkDataset
from ..ops.operator import (DenseOperator, PackedOperator,
                            StreamingPackedOperator, build_packed_operator,
                            check_operator_conflicts, default_dtype)
from ..ops.standardize import standardize
from ..utils.logging import log
from ._common import fetch_global


@dataclass
class SCCAResult:
    U: np.ndarray          # (p, ndim) X-side weights
    V: np.ndarray          # (k, ndim) Y-side weights
    d: np.ndarray          # (ndim,) canonical covariances
    Px: np.ndarray         # (N, ndim) = X U (scaled)
    Py: np.ndarray         # (N, ndim) = Y V
    converged: bool
    V0: np.ndarray         # the initial V (for reproducibility, --save-vinit)

    def __repr__(self):
        return f"SCCAResult(ndim={len(self.d)}, converged={self.converged})"


def soft_thresh(a: np.ndarray, b: float) -> np.ndarray:
    """sign(a) * max(|a| - b, 0) (randompca.cpp:225-231)."""
    return np.sign(a) * np.maximum(np.abs(a) - b, 0.0)


def norm_thresh(x: np.ndarray, lam: float) -> np.ndarray:
    s = np.linalg.norm(x)
    if s > 0:
        x = x / s
        x = soft_thresh(x, lam)
        s = np.linalg.norm(x)
        if s > 0:
            x = x / s
    return x


def make_gaussian(rows: int, cols: int, seed: int) -> np.ndarray:
    """Seeded standard-normal init matrix (randompca.cpp:16-27).

    Uses numpy's PCG64 rather than boost mt19937 -- values differ from
    the reference for the same seed, but determinism and distribution
    match; parity harnesses share V0 explicitly (--save-vinit).
    """
    return np.random.default_rng(seed).standard_normal((rows, cols))


def save_scca_state(path, U, V, d, next_dim, V0,
                    lambda1, lambda2, *, divisor=None, stand_x=None,
                    stand_y=None) -> None:
    """Persist SCCA progress after a completed dimension (atomic write,
    same tmp+rename discipline as the PCA Ritz checkpoints).  The
    deflation is strictly sequential (randompca.cpp:428-498), so the
    finished columns U[:, :next_dim] / V / d plus the shared V0 are the
    complete resume state; the reference has no such surface.  The
    problem identity (penalties, divisor, standardizations) rides along
    so a resume under different settings is rejected instead of mixing
    deflation sequences."""
    from ..utils.state import atomic_savez

    extra = {}
    if divisor is not None:
        extra["divisor"] = np.asarray(str(divisor))
    if stand_x is not None:
        extra["stand_x"] = np.asarray(str(stand_x))
    if stand_y is not None:
        extra["stand_y"] = np.asarray(str(stand_y))
    atomic_savez(
        path,
        U=np.asarray(U, dtype=np.float64),
        V=np.asarray(V, dtype=np.float64),
        d=np.asarray(d, dtype=np.float64),
        next_dim=np.asarray(int(next_dim)),
        V0=np.asarray(V0, dtype=np.float64),
        lambda1=np.asarray(float(lambda1)),
        lambda2=np.asarray(float(lambda2)),
        **extra,
    )


def load_scca_state(path) -> dict:
    """Load a checkpoint written by :func:`save_scca_state`."""
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def _gram_schmidt(vec: np.ndarray, basis: np.ndarray, j: int) -> np.ndarray:
    """Orthogonalize vec against basis[:, :j], one column at a time with
    per-column normalization (randompca.cpp:270-278 order preserved)."""
    for k in range(j):
        col = basis[:, k]
        denom = col @ col
        if denom > 0:
            vec = vec - (vec @ col) * col / denom
    return vec


# ---------------------------------------------------------------------------
# Device-resident iteration engine: the whole per-dimension penalized
# power iteration runs as ONE jitted lax.while_loop on device (the host
# sees one dispatch + a handful of scalars per dimension).  This is the
# TPU-native shape of the reference's loop (randompca.cpp:428-498): at
# biobank scale each host-driven iteration would cost two dispatches
# plus a p-length device->host round trip.
# ---------------------------------------------------------------------------

def _scca_dim_device_grid(cross_fn, mv_fn, U, V, Yp, j, v0, alive, consts,
                          lam1, lam2, invdiv, tol, maxiter):
    """One SCCA dimension for ALL penalty-grid cells at once.

    TPU-native acceleration of the reference's grid workloads (scca.sh
    runs every (lambda1, lambda2) cell as an independent flashpca
    process, scca.sh:65-79; cv.scca lapply's over the grid,
    scca.R:291-300): the expensive genotype products are penalty-
    independent, so C cells stack into the panel dimension of ONE
    ``crossprod``/``prod`` pass per iteration -- and panel columns are
    nearly free on the VPU-decode-bound kernel (docs/PERFORMANCE.md).
    A C-cell grid therefore costs ~max(iters) data passes instead of
    the sequential ~sum(iters).  A solo ``scca(engine='device')`` run
    is the C=1 instance of this same engine (one implementation, no
    parity drift between solo and grid results).

    Shapes carry a trailing cell axis: ``U`` (p_pad, ndim, C) /
    ``V`` (k, ndim, C) per-cell deflation histories, ``v0`` (k, C),
    ``lam1``/``lam2`` (C,).  ``alive`` (C,) masks cells whose earlier
    dimension failed (zero-abort or non-convergence): their state is
    frozen so the surviving cells' math is bit-identical to a solo run.

    Returns ``(U_out, V_out, packed)``: the histories with column j
    filled in (device-resident -- the host never fetches them), and
    ONE (p_pad + k + 5, C) array stacking u, v, and the per-cell
    scalars [iters, conv, u_zero, v_zero, d] so the host loop pays a
    single device->host transfer per dimension (CLAUDE.md rule 2: the
    per-fetch floor over the remote tunnel is ~0.1 s; seven separate
    fetches per dimension cost more than the payload).  iters rides
    the data dtype: exact up to 2^24 in f32, far beyond any maxiter.
    """
    dtype = Yp.dtype
    hp = lax.Precision.HIGHEST

    def gs(x, basis):
        # orthogonalize x[:, c] against basis[:, :j, c], one column at
        # a time (reference order, randompca.cpp:270-278)
        def body(k, xx):
            col = basis[:, k, :]
            denom = jnp.einsum("pc,pc->c", col, col, precision=hp)
            num = jnp.einsum("pc,pc->c", xx, col, precision=hp)
            proj = jnp.where(denom > 0,
                             num / jnp.where(denom > 0, denom, 1.0), 0.0)
            return xx - proj[None, :] * col

        return lax.fori_loop(0, j, body, x)

    def norm_thresh(x, lam):
        # per-cell normalize -> soft-threshold -> renormalize
        s = jnp.linalg.norm(x, axis=0)
        x = jnp.where(s > 0, x / jnp.where(s > 0, s, 1.0)[None, :], x)
        x = jnp.sign(x) * jnp.maximum(jnp.abs(x) - lam[None, :], 0.0)
        s2 = jnp.linalg.norm(x, axis=0)
        return jnp.where(s2 > 0, x / jnp.where(s2 > 0, s2, 1.0)[None, :], x)

    def u_step(v):
        yv = jnp.dot(Yp, v, precision=hp)              # (n4, C)
        u = cross_fn(yv, *consts) * invdiv             # ONE panel pass
        u = gs(u, U)
        return norm_thresh(u, lam1)

    def v_step(u):
        xu = mv_fn(u, *consts) * invdiv                # ONE panel pass
        v = jnp.dot(Yp.T, xu, precision=hp)            # (k, C)
        v = gs(v, V)
        return norm_thresh(v, lam2)

    def active_of(it, du, dv, uz, vz):
        act = alive & (it < maxiter) & ((it == 0) | (du >= tol) | (dv >= tol))
        return act & ~((j == 0) & (uz | vz))

    def cond(carry):
        u, v, it, du, dv, uz, vz = carry
        return jnp.any(active_of(it, du, dv, uz, vz))

    def body(carry):
        u, v, it, du, dv, uz, vz = carry
        act = active_of(it, du, dv, uz, vz)
        u_new = u_step(v)
        uzi = jnp.max(jnp.abs(u_new), axis=0) < tol   # u zeroed THIS iter
        v_new = v_step(u_new)
        du_new = jnp.max(jnp.abs(u_new - u), axis=0)
        dv_new = jnp.max(jnp.abs(v_new - v), axis=0)
        uz_new = uz | uzi
        vz_new = vz | (jnp.max(jnp.abs(v_new), axis=0) < tol)
        # frozen (converged/dead) cells keep their state untouched;
        # a dim-0 u-zero abort additionally keeps v at its PRE-step
        # value (V0): the reference aborts BEFORE the v step
        # (randompca.cpp:280-287), as does the solo host engine
        keep_v = act & ~((j == 0) & uzi)
        u = jnp.where(act, u_new, u)
        v = jnp.where(keep_v, v_new, v)
        du = jnp.where(act, du_new, du)
        dv = jnp.where(keep_v, dv_new, dv)
        uz = jnp.where(act, uz_new, uz)
        vz = jnp.where(keep_v, vz_new, vz)
        return u, v, it + act.astype(jnp.int32), du, dv, uz, vz

    C = v0.shape[1]
    u0 = jnp.zeros((U.shape[0], C), dtype)
    inf = jnp.full((C,), jnp.inf, dtype)
    carry = (u0, v0, jnp.zeros((C,), jnp.int32), inf, inf,
             jnp.zeros((C,), bool), jnp.zeros((C,), bool))
    u, v, it, du, dv, uz, vz = lax.while_loop(cond, body, carry)
    conv = (du < tol) & (dv < tol)
    # d_c = (X u_c)^T (Y v_c), both sides invdiv-scaled (one panel pass)
    xu = mv_fn(u, *consts) * invdiv
    d = jnp.einsum("nc,nc->c", xu, jnp.dot(Yp, v, precision=hp),
                   precision=hp)
    U_out = U.at[:, j, :].set(u)
    V_out = V.at[:, j, :].set(v)
    scalars = jnp.stack([it.astype(dtype), conv.astype(dtype),
                         uz.astype(dtype), vz.astype(dtype), d])
    return U_out, V_out, jnp.concatenate([u, v, scalars], axis=0)


@functools.lru_cache(maxsize=32)
def _grid_jit_for(cross_fn, mv_fn, maxiter):
    """Bounded cache of jitted per-dimension programs keyed by the
    operator's STABLE pure-product identities (ops/operator.py caches
    them for exactly this reason) -- repeat solves on the same operator
    (auto_init's two runs, cv/grid searches, every solo C=1 run) reuse
    the compiled while_loop instead of re-tracing it; same pattern as
    the solvers' _expand_jit_for.  Shapes (including the cell count C)
    key jit's own cache."""
    return jax.jit(partial(_scca_dim_device_grid, cross_fn, mv_fn,
                           maxiter=maxiter))


def _unpack_dim(packed, p_dev, k):
    """Split the engine's single per-dimension device->host transfer
    back into per-cell host arrays ``(u, v, iters, conv, u_zero,
    v_zero, d)`` (u keeps its (p_dev, C) padded rows; slice ``[:p]``
    at the call site).  Under multi-controller execution the stacked
    array can inherit the u-rows' SNP sharding and span processes:
    gather globally (every controller sees the identical stack, which
    the lockstep host bookkeeping requires)."""
    out = fetch_global(packed, dtype=np.float64)
    u = out[:p_dev]
    v = out[p_dev:p_dev + k]
    it = out[p_dev + k].astype(np.int64)
    conv = out[p_dev + k + 1] > 0
    uz = out[p_dev + k + 2] > 0
    vz = out[p_dev + k + 3] > 0
    d = out[p_dev + k + 4]
    return u, v, it, conv, uz, vz, d


def _scca_dim_host_grid(op, U, V, Y_std, j, v0, alive, lam1, lam2,
                        invdiv, tol, maxiter, dtype):
    """One SCCA dimension for ALL penalty-grid cells, HOST-driven: the
    batched twin of :func:`_scca_dim_device_grid` for STREAMING
    operators, whose products stage host blocks and cannot be traced
    into the device while_loop.

    The streaming bottleneck is the host->device upload per staged
    pass, and that cost is panel-width independent (the decode kernel
    is VPU-bound; panel columns are nearly free, docs/PERFORMANCE.md).
    So each iteration's ``X^T (Y v)`` / ``X u`` products run as ONE
    C-column panel through the operator and all C cells share every
    staged pass: a C-cell grid costs ~max-over-cells iterations in
    data passes instead of the sequential per-cell sum -- the same win
    the device grid engine gives resident operators, brought to the
    bounded-memory (--memory / streaming) regime.

    Per-cell math mirrors the device engine cell for cell (GS
    deflation order randompca.cpp:270-278, norm_thresh, zero and
    convergence tests, frozen-cell masking); host arithmetic runs in
    f64 like the sequential host engine it batches.  ``U`` (p, ndim,
    C) / ``V`` (k, ndim, C) are the f64 deflation histories (read
    only); returns ``(u, v, it, conv, uz, vz, d)`` per cell -- the
    same tuple :func:`_unpack_dim` yields from the device engine, so
    :func:`scca_grid`'s bookkeeping is shared by both engines."""
    p, C = U.shape[0], v0.shape[1]

    def gs(x, basis):
        # orthogonalize x[:, c] against basis[:, :j, c], one column at
        # a time (reference order preserved)
        for t in range(j):
            col = basis[:, t, :]
            denom = np.einsum("mc,mc->c", col, col)
            num = np.einsum("mc,mc->c", x, col)
            proj = np.where(denom > 0,
                            num / np.where(denom > 0, denom, 1.0), 0.0)
            x = x - proj[None, :] * col
        return x

    def nthresh(x, lam):
        s = np.linalg.norm(x, axis=0)
        x = np.where(s > 0, x / np.where(s > 0, s, 1.0)[None, :], x)
        x = np.sign(x) * np.maximum(np.abs(x) - lam[None, :], 0.0)
        s2 = np.linalg.norm(x, axis=0)
        return np.where(s2 > 0, x / np.where(s2 > 0, s2, 1.0)[None, :], x)

    def cross_panel(yn):   # (n, C) -> (p, C), ONE staged pass
        # (fetch_global: the SNP-sharded output spans processes under
        # multi-controller execution)
        return fetch_global(op.crossprod(jnp.asarray(yn, dtype)),
                            dtype=np.float64) * invdiv

    def prod_panel(up):    # (p, C) -> (n, C), ONE staged pass
        return np.asarray(op.prod(jnp.asarray(up, dtype)),
                          dtype=np.float64) * invdiv

    u = np.zeros((p, C), dtype=np.float64)
    v = np.asarray(v0, dtype=np.float64).copy()
    it = np.zeros(C, dtype=np.int64)
    du = np.full(C, np.inf)
    dv = np.full(C, np.inf)
    uz = np.zeros(C, dtype=bool)
    vz = np.zeros(C, dtype=bool)

    def active():
        act = (alive & (it < maxiter)
               & ((it == 0) | (du >= tol) | (dv >= tol)))
        return act & ~((j == 0) & (uz | vz))

    act = active()
    while act.any():
        u_new = nthresh(gs(cross_panel(Y_std @ v), U), lam1)
        uzi = np.max(np.abs(u_new), axis=0) < tol     # u zeroed THIS iter
        v_new = nthresh(gs(Y_std.T @ prod_panel(u_new), V), lam2)
        du_new = np.max(np.abs(u_new - u), axis=0)
        dv_new = np.max(np.abs(v_new - v), axis=0)
        uz_new = uz | uzi
        vz_new = vz | (np.max(np.abs(v_new), axis=0) < tol)
        # frozen (converged/dead) cells keep their state untouched;
        # a dim-0 u-zero abort keeps v at its PRE-step value (V0) --
        # the reference aborts BEFORE the v step (randompca.cpp:280-287)
        keep_v = act & ~((j == 0) & uzi)
        u = np.where(act, u_new, u)
        v = np.where(keep_v, v_new, v)
        du = np.where(act, du_new, du)
        dv = np.where(keep_v, dv_new, dv)
        uz = np.where(act, uz_new, uz)
        vz = np.where(keep_v, vz_new, vz)
        it = it + act.astype(np.int64)
        act = active()

    conv = (du < tol) & (dv < tol)
    d = np.einsum("nc,nc->c", prod_panel(u), Y_std @ v)
    return u, v, it, conv, uz, vz, d


# scca() kwargs the batched grid engine understands -- the ONE
# definition shared by the cv_scca and split_scca fast paths (each
# composes its caller-specific extras on top via grid_fastpath) so the
# lists cannot drift apart and silently strand a caller on the
# C-times-slower sequential fallback.
GRID_COMPAT_KWARGS = frozenset({
    "divisor", "maxiter", "tol", "seed", "dtype", "mesh",
    "block_size", "auto_init",
})
# resolved by the caller (operator choice / engine gate) and dropped
# before forwarding to scca_grid, which takes none of them
_GRID_RESOLVED_KWARGS = frozenset({"engine", "streaming", "memory_mb"})


def grid_fastpath(scca_kwargs, *extra):
    """Decide whether ``scca_kwargs`` can ride the batched grid engine.

    Returns ``(ok, gkw)``: ``ok`` is False when the caller forced the
    host engine or passed a kwarg the grid engine does not understand
    (fall back to sequential per-cell scca() runs); ``gkw`` is the
    filtered kwargs to forward to :func:`scca_grid`.  ``extra`` lists
    caller-specific kwargs that are also acceptable (e.g. cv_scca
    forwards stand_x/stand_y; split_scca resolves them itself but may
    forward V0)."""
    allowed = GRID_COMPAT_KWARGS | _GRID_RESOLVED_KWARGS
    for names in extra:
        allowed = allowed | frozenset(names)
    eng = scca_kwargs.get("engine", "auto")
    ok = eng in ("auto", "device") and set(scca_kwargs) <= allowed
    if (eng == "device"
            and (scca_kwargs.get("streaming") is True
                 or scca_kwargs.get("memory_mb") is not None)):
        # solo scca() raises on engine='device' + a streaming operator;
        # falling back to the sequential path surfaces that SAME error
        # instead of silently downgrading the explicit engine request
        # to the host-driven grid
        ok = False
    gkw = {kk: vv for kk, vv in scca_kwargs.items()
           if kk not in _GRID_RESOLVED_KWARGS}
    return ok, gkw


def _xside_operator(X, n, k, ndim, stand_x, *, streaming, memory_mb,
                    block_size, dtype_arg, mesh):
    """Resolve the X side of an (S)CCA problem to an operator.

    Accepts a PLINK root string / :class:`PlinkDataset` (packed
    operator), a dense (N, p) matrix (DenseOperator over the
    standardized copy), or a prebuilt operator (kwarg-conflict
    checked).  The ndim cap is validated against (p, n, k) BEFORE any
    potentially huge genotype load (scca.R:210-215).  Returns
    ``(op, dtype)``."""
    if isinstance(X, str):
        X = PlinkDataset.open(X)
    dtype = dtype_arg or default_dtype()
    # more canonical dimensions than the spaces support cannot converge
    # (deflation exhausts the Y side)
    p = (X.n_snps if isinstance(X, (PlinkDataset, PackedOperator,
                                    StreamingPackedOperator, DenseOperator))
         else np.shape(X)[1])
    max_dim = min(p, n, k)
    if ndim > max_dim:
        raise ValueError(
            f"You asked for {ndim} dimensions, but only {max_dim} allowed"
        )
    if isinstance(X, (PackedOperator, StreamingPackedOperator,
                      DenseOperator)):
        # prebuilt operator (e.g. device-generated data): X-side
        # standardization is baked into it; conflicting explicit
        # kwargs raise instead of being dropped silently
        check_operator_conflicts(X, dtype=dtype_arg, mesh=mesh,
                                 streaming=streaming,
                                 memory_mb=memory_mb,
                                 block_size=block_size)
        if X.n_samples != n:
            raise ValueError("Y rows must equal the number of samples")
        return X, X.dtype
    if isinstance(X, PlinkDataset):
        if X.n_samples != n:
            raise ValueError("Y rows must equal the number of samples")
        mean, sd = X.snp_stats(stand_x)
        return build_packed_operator(
            X, mean, sd, streaming=streaming, memory_mb=memory_mb,
            block_size=block_size, dtype=dtype, mesh=mesh,
        ), dtype
    # dense-matrix X: there is no streaming dense operator, so an
    # EXPLICIT bounded-memory request cannot be honored -- raise like
    # check_operator_conflicts does, never drop it silently (review r2)
    if streaming is True or memory_mb is not None:
        raise ValueError(
            "streaming=True / memory_mb apply to PLINK (packed) X data; "
            "a dense matrix X is held in device memory whole -- pass the "
            "PLINK fileset (or a StreamingPackedOperator) for bounded "
            "device memory"
        )
    if mesh is not None and getattr(mesh, "size", 1) > 1:
        # same precedent as the dense (batch) PCA path: no sharded
        # dense implementation exists, and a default all-devices mesh
        # is a legitimate CLI artifact -- say so instead of silently
        # running unsharded (review r4)
        log("note: the dense-matrix SCCA path runs unsharded; mesh= is "
            "ignored (use the packed PLINK path for SNP sharding)")
    Xm = np.asarray(X, dtype=np.float64)
    if Xm.shape[0] != n:
        raise ValueError("Y rows must equal the number of samples")
    X_std, _, _ = standardize(Xm, stand_x)
    return DenseOperator(X_std, dtype=dtype), dtype


def scca(
    X,
    Y: np.ndarray,
    lambda1: float = 0.0,
    lambda2: float = 0.0,
    *,
    ndim: int = 10,
    stand_x: str = "binom2",
    stand_y: str = "sd",
    divisor: str = "p",
    maxiter: int = 500,
    tol: float = 1e-6,
    seed: int = 1,
    V0: np.ndarray | None = None,
    block_size: int | None = None,
    dtype=None,
    mesh=None,
    verbose: bool = False,
    auto_init: bool = False,
    engine: str = "auto",
    streaming: bool | str = "auto",
    memory_mb: int | None = None,
    state_out: str | None = None,
    state_in: str | None = None,
) -> SCCAResult:
    """SCCA of ``X`` (PLINK root/dataset or (N, p) matrix) against the
    (N, k) phenotype matrix ``Y``.

    ``auto_init=True`` reproduces the R package's initialization: a
    first SCCA run at lambda ~= 0 (an approximate SVD of X^T Y) whose V
    seeds the penalized run (flashpcaR/R/scca.R:224-246).

    ``engine='device'`` runs each dimension's whole penalized power
    iteration as one jitted while_loop; ``'host'`` drives it from the
    host one product at a time (required for the streaming operator,
    whose products stage host blocks -- the analog of the reference's
    disk-streaming SCCA, randompca.cpp:387-528).  ``'auto'`` picks
    device for resident operators, host for streaming.

    ``state_out`` writes an .npz checkpoint after EVERY completed
    dimension (the deflation is sequential, so finished U/V columns +
    the shared V0 are the full resume state -- and they are already on
    host, so this costs nothing extra).  ``state_in`` resumes: finished
    dimensions are skipped, the run continues at the next one with
    identical results to an uninterrupted run."""
    if state_in is not None and V0 is None:
        auto_init = False      # the state carries the (possibly
        #                        auto-initialized) V0 already
    if auto_init and V0 is None:
        s0 = scca(
            X, Y, 1e-12, 1e-12, ndim=ndim, stand_x=stand_x,
            stand_y=stand_y, divisor=divisor, maxiter=maxiter, tol=tol,
            seed=seed, block_size=block_size, dtype=dtype, mesh=mesh,
            verbose=verbose, auto_init=False, engine=engine,
            streaming=streaming, memory_mb=memory_mb,
        )
        V0 = s0.V
    Y = np.asarray(Y, dtype=np.float64)
    if Y.ndim == 1:
        Y = Y[:, None]
    Y_std, _, _ = standardize(Y, stand_y)
    n, k = Y_std.shape

    invdiv = 1.0
    if divisor == "n1":
        invdiv = 1.0 / np.sqrt(n - 1.0)
    Y_std = Y_std * invdiv

    op, dtype = _xside_operator(
        X, n, k, ndim, stand_x, streaming=streaming, memory_mb=memory_mb,
        block_size=block_size, dtype_arg=dtype, mesh=mesh)
    p = op.n_snps

    def xt(y_n):  # u-step product: X^T y, scaled (crossprod output is
        #             SNP-sharded under a mesh: gather globally so
        #             multi-controller host engines stay lockstep)
        return fetch_global(
            op.crossprod(jnp.asarray(y_n, dtype=dtype)), dtype=np.float64
        ) * invdiv

    def xv(u_p):  # v-step product: X u, scaled
        return np.asarray(
            op.prod(jnp.asarray(u_p, dtype=dtype)), dtype=np.float64
        ) * invdiv

    v0_explicit = V0 is not None
    if V0 is None:
        V0 = make_gaussian(k, ndim, seed)
    else:
        V0 = np.asarray(V0, dtype=np.float64)
        if V0.shape != (k, ndim):
            raise ValueError(f"V0 must be ({k}, {ndim})")

    V = V0.copy()
    U = np.zeros((p, ndim), dtype=np.float64)
    d = np.zeros(ndim, dtype=np.float64)

    start_dim = 0
    if state_in is not None:
        st = load_scca_state(state_in)
        if st["U"].shape != (p, ndim) or st["V"].shape != (k, ndim):
            raise ValueError(
                f"SCCA state has U {st['U'].shape} / V {st['V'].shape}; "
                f"expected ({p}, {ndim}) / ({k}, {ndim})")
        if (float(st["lambda1"]) != float(lambda1)
                or float(st["lambda2"]) != float(lambda2)):
            raise ValueError(
                "SCCA state was written under different penalties "
                f"(lambda1={float(st['lambda1']):g}, "
                f"lambda2={float(st['lambda2']):g}); resuming under new "
                "ones would mix deflation sequences")
        # the rest of the problem identity (review r4): dimensions
        # already deflated under a different divisor/standardization
        # cannot be composed with new ones (keys absent in states
        # written before 0.4.1 -- skip, do not reject old checkpoints)
        for key, cur in (("divisor", divisor), ("stand_x", stand_x),
                         ("stand_y", stand_y)):
            if key in st and str(st[key]) != str(cur):
                raise ValueError(
                    f"SCCA state was written under {key}="
                    f"{str(st[key])!r}; resuming under {str(cur)!r} "
                    "would mix deflation sequences")
        if v0_explicit and not np.array_equal(st["V0"], V0):
            # a DIFFERENT explicit V0 contradicts the state; a default
            # (seed-generated) V0 simply yields to the checkpoint's
            raise ValueError(
                "explicit V0 differs from the checkpoint's V0")
        V0 = st["V0"]
        U, V, d = st["U"].copy(), st["V"].copy(), st["d"].copy()
        start_dim = int(st["next_dim"])
        log(f"resuming SCCA at dimension {start_dim} from {state_in}",
            verbose=verbose)

    def result(conv):
        Px = xv(U)
        Py = Y_std @ V
        return SCCAResult(U=U, V=V, d=d, Px=Px, Py=Py, converged=conv, V0=V0)

    if engine == "auto":
        engine = ("host" if isinstance(op, StreamingPackedOperator)
                  else "device")
    elif engine == "device" and isinstance(op, StreamingPackedOperator):
        raise ValueError(
            "engine='device' needs a resident operator (the streaming "
            "operator's products stage host blocks and cannot be traced "
            "into the device iteration loop); use engine='host' or "
            "engine='auto'"
        )
    if engine not in ("device", "host"):
        raise ValueError(f"unknown engine: {engine}")

    if engine == "device":
        # whole per-dimension iteration on device: one dispatch + ONE
        # device->host transfer per dimension instead of 2 dispatches +
        # a p-length round trip per iteration.  A solo run is the C=1
        # instance of the batched grid engine -- one implementation
        # serves scca(), scca_grid(), cv_scca and split_scca, so their
        # per-cell semantics cannot drift apart.
        cross_fn, mv_fn, consts = op.products_pure()
        Yp = op.permute(jnp.asarray(Y_std, dtype=dtype))
        p_dev = (op.p_pad if isinstance(op, PackedOperator) else p)
        dim_fn = _grid_jit_for(cross_fn, mv_fn, maxiter)
        # restored columns (zeros when not resuming) into padded space
        U_dev = jnp.zeros((p_dev, ndim, 1), dtype=dtype).at[:p, :, 0].set(
            jnp.asarray(U, dtype=dtype))
        V_dev = jnp.asarray(V, dtype=dtype)[:, :, None]
        V0_dev = jnp.asarray(V0, dtype=dtype)
        alive_t = jnp.ones((1,), bool)
        lam1_t = jnp.full((1,), lambda1, dtype)
        lam2_t = jnp.full((1,), lambda2, dtype)
        inv_t = jnp.asarray(invdiv, dtype)
        tol_t = jnp.asarray(tol, dtype)
        for j in range(start_dim, ndim):
            # j as a traced scalar: one compile serves every dimension
            U_dev, V_dev, packed = dim_fn(
                U_dev, V_dev, Yp, jnp.asarray(j, jnp.int32),
                V0_dev[:, j][:, None], alive_t, consts,
                lam1_t, lam2_t, inv_t, tol_t)
            u_np, v_np, it_np, conv_np, uz_np, vz_np, dj_np = (
                _unpack_dim(packed, p_dev, k))
            it = int(it_np[0])
            if bool(uz_np[0]):
                log(f"U[{j}] is all zero, {it}, l1 penalty too large",
                    verbose=verbose)
            if bool(vz_np[0]):
                log(f"V[{j}] is all zero, {it}, l2 penalty too large",
                    verbose=verbose)
            U[:, j] = u_np[:p, 0]
            V[:, j] = v_np[:, 0]
            if j == 0 and (bool(uz_np[0]) or bool(vz_np[0])):
                return result(False)
            if not bool(conv_np[0]):
                log(f"SCCA did not converge in {maxiter} iterations",
                    verbose=verbose)
                return result(False)
            d[j] = float(dj_np[0])
            nzu = int(np.count_nonzero(U[:, j]))
            nzv = int(np.count_nonzero(V[:, j]))
            log(f"dim {j} finished in {it} iterations", verbose=verbose)
            log(f"U_{j} non-zeros: {nzu}, V_{j} non-zeros: {nzv}",
                verbose=verbose)
            log(f"d[{j}]: {d[j]}", verbose=verbose)
            if state_out is not None:
                save_scca_state(state_out, U, V, d, j + 1, V0,
                                lambda1, lambda2, divisor=divisor,
                                stand_x=stand_x, stand_y=stand_y)
        return result(True)

    for j in range(start_dim, ndim):
        it = 0
        while it < maxiter:
            uj_old = U[:, j].copy()
            vj_old = V[:, j].copy()
            vj = V[:, j]

            uj = xt(Y_std @ vj)
            uj = _gram_schmidt(uj, U, j)
            uj = norm_thresh(uj, lambda1)
            if np.max(np.abs(uj)) < tol:
                log(f"U[{j}] is all zero, {it}, l1 penalty too large",
                    verbose=verbose)
                if j == 0:
                    return result(False)
            U[:, j] = uj

            vj = Y_std.T @ xv(U[:, j])
            vj = _gram_schmidt(vj, V, j)
            vj = norm_thresh(vj, lambda2)
            if np.max(np.abs(vj)) < tol:
                log(f"V[{j}] is all zero, {it}, l2 penalty too large",
                    verbose=verbose)
                if j == 0:
                    return result(False)
            V[:, j] = vj

            if (it > 0
                    and np.max(np.abs(vj_old - vj)) < tol
                    and np.max(np.abs(uj_old - uj)) < tol):
                log(f"dim {j} finished in {it} iterations", verbose=verbose)
                break
            it += 1

        if it >= maxiter:
            log(f"SCCA did not converge in {maxiter} iterations",
                verbose=verbose)
            return result(False)

        nzu = int(np.count_nonzero(U[:, j]))
        nzv = int(np.count_nonzero(V[:, j]))
        log(f"U_{j} non-zeros: {nzu}, V_{j} non-zeros: {nzv}", verbose=verbose)
        d[j] = xv(U[:, j]) @ (Y_std @ V[:, j])
        log(f"d[{j}]: {d[j]}", verbose=verbose)
        if state_out is not None:
            save_scca_state(state_out, U, V, d, j + 1, V0,
                            lambda1, lambda2, divisor=divisor,
                            stand_x=stand_x, stand_y=stand_y)

    return result(True)


@dataclass
class SCCAGridResult:
    """Per-cell results of a batched penalty-grid SCCA run.

    Cells are row-major over the (lambda1, lambda2) cross-product
    (cell ``c = i * len(lambda2_axis) + j``) unless ``pairs=True`` zips
    the penalty lists.  ``converged[c]`` is True only when every
    dimension of cell c converged (matching ``SCCAResult.converged``
    of a solo run)."""

    lambda1: np.ndarray    # (C,) per-cell l1 penalty
    lambda2: np.ndarray    # (C,) per-cell l2 penalty
    U: np.ndarray          # (p, ndim, C) X-side weights per cell
    V: np.ndarray          # (k, ndim, C) Y-side weights per cell
    d: np.ndarray          # (ndim, C) canonical covariances
    converged: np.ndarray  # (C,) bool
    n_iters: np.ndarray    # (ndim, C) iterations per dimension
    V0: np.ndarray         # (k, ndim) shared init panel

    def __repr__(self):
        return (f"SCCAGridResult(cells={len(self.lambda1)}, "
                f"ndim={self.d.shape[0]}, "
                f"converged={int(self.converged.sum())})")


def scca_grid(
    X,
    Y: np.ndarray,
    lambda1,
    lambda2,
    *,
    pairs: bool = False,
    ndim: int = 10,
    stand_x: str = "binom2",
    stand_y: str = "sd",
    divisor: str = "p",
    maxiter: int = 500,
    tol: float = 1e-6,
    seed: int = 1,
    V0: np.ndarray | None = None,
    block_size: int | None = None,
    dtype=None,
    mesh=None,
    verbose: bool = False,
    auto_init: bool = False,
    streaming: bool | str = "auto",
    memory_mb: int | None = None,
) -> SCCAGridResult:
    """SCCA over a whole (lambda1, lambda2) penalty grid in one batched
    run: every cell advances through SHARED genotype data passes.

    The reference fans the grid out as independent processes
    (scca.sh:65-79) or an lapply (scca.R:291-300), so a C-cell grid
    costs C full SCCA runs.  Here the per-iteration ``X^T (Y v)`` /
    ``Y^T (X u)`` products -- the only expensive step -- are penalty-
    independent in shape, so all C cells ride ONE C-column panel pass
    (:func:`_scca_dim_device_grid`); on the VPU-decode-bound kernel a
    16-column pass costs ~1.05x a 1-column pass (docs/PERFORMANCE.md),
    making the grid ~C times cheaper in data passes (it runs each
    dimension until the slowest cell converges: ~max over cells of the
    per-cell iteration count, instead of the sum).

    Per-cell math is identical to ``scca(engine='device')`` with the
    same shared ``V0``: frozen/converged cells are masked out of
    updates, so results match solo runs (tested at f64 to ~1e-10).

    ``lambda1``/``lambda2`` are 1-D penalty axes crossed row-major into
    C = len(lambda1) x len(lambda2) cells; ``pairs=True`` zips them
    instead (C = len(lambda1) = len(lambda2)).  ``V0`` (k, ndim) seeds
    every cell (the cv.scca convention, scca.R:291-300);
    ``auto_init=True`` derives it from one near-zero-penalty solo run.

    Resident operators (PLINK root/dataset, dense matrix, or prebuilt
    Packed/Dense operator) run the device while_loop engine; a
    STREAMING operator (``streaming=True`` / ``memory_mb=`` or a
    prebuilt :class:`StreamingPackedOperator`) rides the host-driven
    batched twin (:func:`_scca_dim_host_grid`) -- the staged
    host->device upload per pass is panel-width independent, so the
    shared-pass win carries over to the bounded-memory regime.  Device
    memory: the per-cell deflation histories add
    2 * p * ndim * C * itemsize bytes on top of the packed genotypes
    (resident engine only).
    """
    l1_axis = np.atleast_1d(np.asarray(lambda1, dtype=np.float64))
    l2_axis = np.atleast_1d(np.asarray(lambda2, dtype=np.float64))
    if pairs:
        if len(l1_axis) != len(l2_axis):
            raise ValueError(
                "pairs=True needs lambda1 and lambda2 of equal length")
        lam1_c, lam2_c = l1_axis.copy(), l2_axis.copy()
    else:
        lam1_c = np.repeat(l1_axis, len(l2_axis))
        lam2_c = np.tile(l2_axis, len(l1_axis))
    C = len(lam1_c)

    if auto_init and V0 is None:
        s0 = scca(X, Y, 1e-12, 1e-12, ndim=ndim, stand_x=stand_x,
                  stand_y=stand_y, divisor=divisor, maxiter=maxiter,
                  tol=tol, seed=seed, block_size=block_size, dtype=dtype,
                  mesh=mesh, verbose=verbose, auto_init=False,
                  streaming=streaming, memory_mb=memory_mb)
        V0 = s0.V

    Y = np.asarray(Y, dtype=np.float64)
    if Y.ndim == 1:
        Y = Y[:, None]
    Y_std, _, _ = standardize(Y, stand_y)
    n, k = Y_std.shape
    invdiv = 1.0
    if divisor == "n1":
        invdiv = 1.0 / np.sqrt(n - 1.0)
    Y_std = Y_std * invdiv

    op, dtype = _xside_operator(
        X, n, k, ndim, stand_x, streaming=streaming, memory_mb=memory_mb,
        block_size=block_size, dtype_arg=dtype, mesh=mesh)
    p = op.n_snps

    if V0 is None:
        V0 = make_gaussian(k, ndim, seed)
    else:
        V0 = np.asarray(V0, dtype=np.float64)
        if V0.shape != (k, ndim):
            raise ValueError(f"V0 must be ({k}, {ndim})")

    # streaming operators stage host blocks inside their products and
    # cannot be traced into the device while_loop: they ride the
    # host-driven batched engine instead (same shared-pass win -- the
    # staged upload is panel-width independent)
    host_engine = isinstance(op, StreamingPackedOperator)
    if not host_engine:
        cross_fn, mv_fn, consts = op.products_pure()
        Yp = op.permute(jnp.asarray(Y_std, dtype=dtype))
        p_dev = (op.p_pad if isinstance(op, PackedOperator) else p)
        grid_fn = _grid_jit_for(cross_fn, mv_fn, maxiter)
        U_dev = jnp.zeros((p_dev, ndim, C), dtype=dtype)
        V_dev = jnp.broadcast_to(
            jnp.asarray(V0, dtype=dtype)[:, :, None], (k, ndim, C))
        V0_dev = jnp.asarray(V0, dtype=dtype)
        lam1_t = jnp.asarray(lam1_c, dtype)
        lam2_t = jnp.asarray(lam2_c, dtype)
        inv_t = jnp.asarray(invdiv, dtype)
        tol_t = jnp.asarray(tol, dtype)

    U_host = np.zeros((p, ndim, C), dtype=np.float64)
    # dimensions never reached keep their V0 columns, like a solo run
    # (scca()'s V = V0.copy(); the reference leaves V at its init too)
    V_host = np.broadcast_to(V0[:, :, None], (k, ndim, C)).copy()
    d_host = np.zeros((ndim, C), dtype=np.float64)
    n_iters = np.zeros((ndim, C), dtype=np.int64)
    alive = np.ones(C, dtype=bool)
    conv_all = np.ones(C, dtype=bool)

    for j in range(ndim):
        if not alive.any():
            break
        if host_engine:
            u_np, v_np, it_np, conv_np, uz_np, vz_np, dj_np = (
                _scca_dim_host_grid(
                    op, U_host, V_host, Y_std, j,
                    np.broadcast_to(V0[:, j][:, None], (k, C)),
                    alive, lam1_c, lam2_c, invdiv, tol, maxiter, dtype))
        else:
            v0_j = jnp.broadcast_to(V0_dev[:, j][:, None], (k, C))
            U_dev, V_dev, packed = grid_fn(
                U_dev, V_dev, Yp, jnp.asarray(j, jnp.int32), v0_j,
                jnp.asarray(alive), consts, lam1_t, lam2_t, inv_t, tol_t)
            u_np, v_np, it_np, conv_np, uz_np, vz_np, dj_np = (
                _unpack_dim(packed, p_dev, k))
            u_np = u_np[:p]
        started = alive.copy()
        U_host[:, j, started] = u_np[:, started]
        V_host[:, j, started] = v_np[:, started]
        n_iters[j, started] = it_np[started]
        for c in np.flatnonzero(started):
            if uz_np[c]:
                log(f"[cell {c}] U[{j}] is all zero, {int(it_np[c])}, "
                    "l1 penalty too large", verbose=verbose)
            if vz_np[c]:
                log(f"[cell {c}] V[{j}] is all zero, {int(it_np[c])}, "
                    "l2 penalty too large", verbose=verbose)
            if j == 0 and (uz_np[c] or vz_np[c]):
                alive[c] = False
                conv_all[c] = False
            elif not conv_np[c]:
                log(f"[cell {c}] SCCA did not converge in {maxiter} "
                    "iterations", verbose=verbose)
                alive[c] = False
                conv_all[c] = False
            else:
                d_host[j, c] = dj_np[c]
                log(f"[cell {c}] dim {j} finished in {int(it_np[c])} "
                    "iterations", verbose=verbose)

    return SCCAGridResult(
        lambda1=lam1_c, lambda2=lam2_c, U=U_host, V=V_host, d=d_host,
        converged=conv_all, n_iters=n_iters, V0=V0,
    )


@dataclass
class CVSCCAResult:
    """k-fold cross-validation over an (lambda1, lambda2) grid
    (equivalent of flashpcaR::cv.scca, scca.R:410-557)."""

    ndim: int
    lambda1: np.ndarray
    lambda2: np.ndarray
    opt_dim: int
    best_lambda1: float
    best_lambda2: float
    best_corr: float
    corr: np.ndarray       # (ndim, len(l1), len(l2)) pooled test correlation
    nzero_x: np.ndarray    # (ndim, len(l1), len(l2)) mean non-zeros in U
    nzero_y: np.ndarray
    nfolds: int
    converged: np.ndarray  # (nfolds, len(l1), len(l2))
    folds: np.ndarray      # (n,) fold assignment, 0-based

    def __repr__(self):
        return (f"CVSCCAResult(best_lambda1={self.best_lambda1:g}, "
                f"best_lambda2={self.best_lambda2:g}, "
                f"best_corr={self.best_corr:.4f})")


def cv_scca(
    X,
    Y: np.ndarray,
    lambda1=None,
    lambda2=None,
    *,
    ndim: int = 3,
    nfolds: int = 10,
    folds: np.ndarray | None = None,
    opt_dim: int = 1,
    init: bool = True,
    seed: int = 1,
    verbose: bool = False,
    workdir: str | None = None,
    **scca_kwargs,
) -> CVSCCAResult:
    """Cross-validated SCCA penalty selection.

    glmnet-style pooling (scca.R:497-523): per fold, train on the
    complement, write test-row predictions ``X[test] U`` / ``Y[test] V``
    into pooled arrays; the per-dimension score is the Pearson
    correlation of the POOLED predictions.  A non-converged model marks
    its fold's predictions NaN.  ``init=True`` seeds every fold's grid
    with the V of a near-zero-penalty run on that fold's training data.

    ``X`` may be a dense (N, p) matrix OR a PLINK root path /
    :class:`PlinkDataset`: the PLINK path keeps genotypes 2-bit packed
    through the whole CV (per-fold ``subset_samples`` repack + packed
    train operators + packed raw-dosage test projection) and honors
    ``streaming``/``memory_mb`` for bounded device memory.  ``workdir``
    is where the per-fold train/test filesets are written and KEPT; by
    default they go to a temp dir and are deleted as each fold
    completes (scratch high-water: one fold's train+test repack).
    PLINK path only.
    """
    for bad in ("state_out", "state_in"):
        if bad in scca_kwargs:
            raise ValueError(
                f"{bad} cannot be forwarded to a penalty grid: every "
                "(fold, lambda) cell would overwrite the same file; "
                "checkpoint individual scca() runs instead")
    if isinstance(X, (str, PlinkDataset)):
        return _cv_scca_plink(
            X, Y, lambda1, lambda2, ndim=ndim, nfolds=nfolds,
            folds=folds, opt_dim=opt_dim, init=init, seed=seed,
            verbose=verbose, workdir=workdir, **scca_kwargs)
    # matrix-only CV has no bounded-memory path: an explicit streaming /
    # memory_mb request would otherwise vanish into the grid fast path's
    # resolved-kwargs filter (review r3 -- the no-silent-drops rule)
    if (scca_kwargs.get("streaming") is True
            or scca_kwargs.get("memory_mb") is not None):
        raise ValueError(
            "an explicit streaming/memory_mb request needs packed "
            "genotypes: pass the PLINK root (or PlinkDataset) as X "
            "instead of a dense matrix"
        )
    X = np.asarray(X, dtype=np.float64)
    Y = np.asarray(Y, dtype=np.float64)
    if Y.ndim == 1:
        Y = Y[:, None]
    n = Y.shape[0]
    if X.shape[0] != n:
        raise ValueError("X and Y must have the same number of rows")
    lambda1 = np.atleast_1d(
        np.asarray(lambda1 if lambda1 is not None
                   else np.linspace(1e-6, 1e-3, 5), dtype=np.float64))
    lambda2 = np.atleast_1d(
        np.asarray(lambda2 if lambda2 is not None
                   else np.linspace(1e-6, 1e-3, 5), dtype=np.float64))
    if not (1 <= opt_dim <= ndim):
        raise ValueError("opt_dim must be between 1 and ndim")

    rng = np.random.default_rng(seed)
    if folds is not None:
        folds = np.asarray(folds, dtype=np.int64)
        if folds.shape != (n,):
            raise ValueError("folds must have one entry per sample")
        nfolds = int(folds.max()) + 1
    else:
        if nfolds > n:
            raise ValueError("nfolds is too large for the number of samples")
        folds = rng.integers(0, nfolds, size=n)

    n1, n2 = len(lambda1), len(lambda2)
    xpred = np.full((n, ndim, n1, n2), np.nan)
    ypred = np.full((n, ndim, n1, n2), np.nan)
    nzx = np.zeros((ndim, n1, n2))
    nzy = np.zeros((ndim, n1, n2))
    conv = np.zeros((nfolds, n1, n2), dtype=bool)

    # anything outside the grid engine's kwargs (or an explicit host
    # engine / streaming request) falls back to the sequential per-cell
    # loop -- visibly, since that costs ~C times more genotype passes
    # the CV seed also seeds the inner runs' V0 (init=False path) --
    # without this every inner call fell back to make_gaussian(seed=1)
    # regardless of the user's seed (split_scca's pattern, review r4)
    scca_kwargs.setdefault("seed", seed)
    grid_ok, gkw = grid_fastpath(scca_kwargs, ("stand_x", "stand_y"))
    if not grid_ok:
        log("cv_scca: sequential per-cell fallback (host engine or "
            "kwargs outside GRID_COMPAT_KWARGS)", verbose=verbose)

    # ONE standardize + DenseOperator per fold, shared by the init run,
    # the batched grid, and every sequential cell (the dense twin of
    # the PLINK path's op_tr; the inner calls previously re-standardized
    # and re-uploaded X[train] each time, review r4).  stand_x is
    # consumed here; stand_y still applies inside scca().
    cv_stand_x = scca_kwargs.pop("stand_x", "binom2")
    gkw.pop("stand_x", None)
    if scca_kwargs.get("mesh") is not None:
        # match solo scca()'s dense-path behavior: note and ignore (no
        # sharded dense implementation; prebuilt-op conflict checking
        # would otherwise turn the solo note into a CV-only raise)
        log("note: the dense-matrix SCCA path runs unsharded; mesh= is "
            "ignored (use the packed PLINK path for SNP sharding)")
        scca_kwargs.pop("mesh")
        gkw.pop("mesh", None)
    op_dtype = scca_kwargs.get("dtype") or default_dtype()

    for fold in range(nfolds):
        train = folds != fold
        test = ~train
        log(f"-> fold {fold + 1}/{nfolds}", verbose=verbose)
        X_tr_std, _, _ = standardize(
            np.asarray(X[train], dtype=np.float64), cv_stand_x)
        op_tr = DenseOperator(X_tr_std, dtype=op_dtype)
        V0 = None
        if init:
            V0g = rng.standard_normal((Y.shape[1], ndim))
            s0 = scca(op_tr, Y[train], 1e-12, 1e-12, ndim=ndim,
                      V0=V0g, verbose=verbose, **scca_kwargs)
            V0 = s0.V
        if grid_ok:
            # whole penalty grid in one batched run: every cell rides
            # the same X-side panel pass per iteration (scca_grid)
            g = scca_grid(op_tr, Y[train], lambda1, lambda2,
                          ndim=ndim, V0=V0, verbose=verbose, **gkw)
            for c in range(len(g.lambda1)):
                i, j = divmod(c, n2)
                conv[fold, i, j] = g.converged[c]
                nzx[:, i, j] += np.count_nonzero(g.U[:, :, c],
                                                 axis=0) / nfolds
                nzy[:, i, j] += np.count_nonzero(g.V[:, :, c],
                                                 axis=0) / nfolds
                if g.converged[c]:
                    xpred[test, :, i, j] = X[test] @ g.U[:, :, c]
                    ypred[test, :, i, j] = Y[test] @ g.V[:, :, c]
            continue
        for i, l1 in enumerate(lambda1):
            for j, l2 in enumerate(lambda2):
                res = scca(op_tr, Y[train], float(l1), float(l2),
                           ndim=ndim, V0=V0, verbose=verbose,
                           **scca_kwargs)
                conv[fold, i, j] = res.converged
                nzx[:, i, j] += np.count_nonzero(res.U, axis=0) / nfolds
                nzy[:, i, j] += np.count_nonzero(res.V, axis=0) / nfolds
                if res.converged:
                    xpred[test, :, i, j] = X[test] @ res.U
                    ypred[test, :, i, j] = Y[test] @ res.V

    return _cv_pooled_result(xpred, ypred, lambda1, lambda2, ndim,
                             opt_dim, nzx, nzy, conv, nfolds, folds)


def _cv_pooled_result(xpred, ypred, lambda1, lambda2, ndim, opt_dim,
                      nzx, nzy, conv, nfolds, folds) -> CVSCCAResult:
    """Pooled-prediction scoring shared by the matrix and PLINK CV
    paths (glmnet-style, scca.R:497-523)."""
    n1, n2 = len(lambda1), len(lambda2)
    corr = np.full((ndim, n1, n2), np.nan)
    with np.errstate(invalid="ignore", divide="ignore"):
        for d_ in range(ndim):
            for i in range(n1):
                for j in range(n2):
                    a, b = xpred[:, d_, i, j], ypred[:, d_, i, j]
                    ok = ~(np.isnan(a) | np.isnan(b))
                    if ok.sum() > 1 and a[ok].std() > 0 and b[ok].std() > 0:
                        corr[d_, i, j] = np.corrcoef(a[ok], b[ok])[0, 1]

    sl = corr[opt_dim - 1]
    if np.all(np.isnan(sl)):
        raise RuntimeError("no cv.scca model converged on any penalty pair")
    best = np.unravel_index(np.nanargmax(sl), sl.shape)
    return CVSCCAResult(
        ndim=ndim, lambda1=lambda1, lambda2=lambda2, opt_dim=opt_dim,
        best_lambda1=float(lambda1[best[0]]),
        best_lambda2=float(lambda2[best[1]]),
        best_corr=float(sl[best]), corr=corr,
        nzero_x=nzx, nzero_y=nzy, nfolds=nfolds, converged=conv,
        folds=folds,
    )


def _cv_scca_plink(
    data,
    Y,
    lambda1,
    lambda2,
    *,
    ndim,
    nfolds,
    folds,
    opt_dim,
    init,
    seed,
    verbose,
    workdir=None,
    **scca_kwargs,
) -> CVSCCAResult:
    """k-fold CV over a PLINK fileset: genotypes stay 2-bit PACKED
    through the whole CV (reference analog: scca.R:410-557 k-fold +
    scca.sh's plink-subset workflow).  Per fold the train/test sample
    splits are repacked with :func:`io.plink.subset_samples`, the
    training operator standardizes with the fold's training stats, and
    the test projection ``X[test] @ U`` runs through a RAW-DOSAGE
    packed operator (mean=0, sd=1 -- matching the matrix path's
    unstandardized ``X[test] @ U``; missing genotypes contribute 0
    where the matrix path drops NaN rows).  ``streaming``/``memory_mb``
    are honored (bounded device memory per fold)."""
    import os
    import tempfile

    from ..io.plink import subset_samples
    from ..ops.operator import build_packed_operator

    ds = PlinkDataset.open(data) if isinstance(data, str) else data
    Y = np.asarray(Y, dtype=np.float64)
    if Y.ndim == 1:
        Y = Y[:, None]
    n = ds.n_samples
    if Y.shape[0] != n:
        raise ValueError("Y rows must match the number of samples")
    lambda1 = np.atleast_1d(
        np.asarray(lambda1 if lambda1 is not None
                   else np.linspace(1e-6, 1e-3, 5), dtype=np.float64))
    lambda2 = np.atleast_1d(
        np.asarray(lambda2 if lambda2 is not None
                   else np.linspace(1e-6, 1e-3, 5), dtype=np.float64))
    if not (1 <= opt_dim <= ndim):
        raise ValueError("opt_dim must be between 1 and ndim")

    rng = np.random.default_rng(seed)
    if folds is not None:
        folds = np.asarray(folds, dtype=np.int64)
        if folds.shape != (n,):
            raise ValueError("folds must have one entry per sample")
        nfolds = int(folds.max()) + 1
    else:
        if nfolds > n:
            raise ValueError("nfolds is too large for the number of samples")
        folds = rng.integers(0, nfolds, size=n)

    # without an explicit workdir the fold filesets are scratch: delete
    # each fold's repack once consumed (nfolds x dataset-size of
    # leaked temp files otherwise -- ~1 TB for 10-fold CV on a 100 GB
    # biobank .bed); an explicit workdir keeps them for inspection
    cleanup = workdir is None
    if cleanup:
        workdir = tempfile.mkdtemp(prefix="cv_scca_")
    else:
        os.makedirs(workdir, exist_ok=True)
    base = os.path.basename(ds.bed_path)[:-4]

    stand_x = scca_kwargs.get("stand_x", "binom2")
    op_opts = dict(
        streaming=scca_kwargs.get("streaming", "auto"),
        memory_mb=scca_kwargs.get("memory_mb"),
        block_size=scca_kwargs.get("block_size"),
        dtype=scca_kwargs.get("dtype") or default_dtype(),
        mesh=scca_kwargs.get("mesh"),
    )
    # an explicit device engine cannot serve a streaming request --
    # raise like solo scca() does, BEFORE the kwargs are consumed below
    if (scca_kwargs.get("engine") == "device"
            and (scca_kwargs.get("streaming") is True
                 or scca_kwargs.get("memory_mb") is not None)):
        raise ValueError(
            "engine='device' needs a resident operator; use "
            "engine='host' or engine='auto' with streaming/memory_mb")
    # the residency/blocking requests are CONSUMED by the per-fold
    # operator build above; the inner scca()/scca_grid() calls receive
    # prebuilt operators, whose conflict check rejects these kwargs
    for consumed in ("streaming", "memory_mb", "block_size"):
        scca_kwargs.pop(consumed, None)

    n1, n2 = len(lambda1), len(lambda2)
    xpred = np.full((n, ndim, n1, n2), np.nan)
    ypred = np.full((n, ndim, n1, n2), np.nan)
    nzx = np.zeros((ndim, n1, n2))
    nzy = np.zeros((ndim, n1, n2))
    conv = np.zeros((nfolds, n1, n2), dtype=bool)

    # the CV seed also seeds the inner runs' V0 (init=False path) --
    # without this every inner call fell back to make_gaussian(seed=1)
    # regardless of the user's seed (split_scca's pattern, review r4)
    scca_kwargs.setdefault("seed", seed)
    grid_ok, gkw = grid_fastpath(scca_kwargs, ("stand_x", "stand_y"))

    for fold in range(nfolds):
        train = folds != fold
        test = ~train
        log(f"-> fold {fold + 1}/{nfolds}", verbose=verbose)
        train_idx = np.flatnonzero(train)
        test_idx = np.flatnonzero(test)
        fold_roots = []
        # the whole fold body sits inside the try so a failure at ANY
        # point (repack, open, stats, operator build, solve) still
        # removes the fold's already-written scratch filesets
        try:
            root_tr = subset_samples(
                ds, train_idx,
                os.path.join(workdir, f"{base}_f{fold}_train"))
            fold_roots.append(root_tr)
            ds_tr = PlinkDataset.open(root_tr)
            if test_idx.size:
                root_te = subset_samples(
                    ds, test_idx,
                    os.path.join(workdir, f"{base}_f{fold}_test"))
                fold_roots.append(root_te)
                ds_te = PlinkDataset.open(root_te)
                # raw-dosage test projector (see docstring)
                op_te = build_packed_operator(
                    ds_te, np.zeros(ds_te.n_snps), np.ones(ds_te.n_snps),
                    **op_opts)
            else:
                # an unused fold label (or an unlucky random
                # assignment) leaves this fold's test set empty: train
                # and count like the matrix path (whose xpred[test] is
                # a no-op), skip the projection -- subset_samples
                # rejects empty subsets
                op_te = None
            xm, xs = ds_tr.snp_stats(stand_x)
            op_tr = build_packed_operator(ds_tr, xm, xs, **op_opts)
            if (scca_kwargs.get("engine") == "device"
                    and isinstance(op_tr, StreamingPackedOperator)):
                # AUTO-resolved streaming surfaces the same conflict an
                # explicit request does (solo scca() raises, review r4)
                raise ValueError(
                    "engine='device' needs a resident operator, but "
                    "this dataset auto-streams; use engine='host'/"
                    "'auto'")
            # streaming train operators ride the batched grid too (the
            # host-driven engine shares each staged pass across cells)
            use_grid = grid_ok
            if not use_grid and fold == 0:
                log("cv_scca: sequential per-cell fallback (host engine "
                    "or kwargs outside GRID_COMPAT_KWARGS)",
                    verbose=verbose)

            V0 = None
            if init:
                V0g = rng.standard_normal((Y.shape[1], ndim))
                s0 = scca(op_tr, Y[train], 1e-12, 1e-12, ndim=ndim,
                          V0=V0g, verbose=verbose, **scca_kwargs)
                V0 = s0.V
            if use_grid:
                g = scca_grid(op_tr, Y[train], lambda1, lambda2,
                              ndim=ndim, V0=V0, verbose=verbose, **gkw)
                p = g.U.shape[0]
                C = len(g.lambda1)
                import jax.numpy as jnp

                px = None
                if op_te is not None:
                    px = np.asarray(
                        op_te.prod(jnp.asarray(
                            g.U.reshape(p, ndim * C), op_te.dtype)),
                        dtype=np.float64).reshape(-1, ndim, C)
                for c in range(C):
                    i, j = divmod(c, n2)
                    conv[fold, i, j] = g.converged[c]
                    nzx[:, i, j] += np.count_nonzero(g.U[:, :, c],
                                                     axis=0) / nfolds
                    nzy[:, i, j] += np.count_nonzero(g.V[:, :, c],
                                                     axis=0) / nfolds
                    if g.converged[c] and px is not None:
                        xpred[test, :, i, j] = px[:, :, c]
                        ypred[test, :, i, j] = Y[test] @ g.V[:, :, c]
                continue
            for i, l1 in enumerate(lambda1):
                for j, l2 in enumerate(lambda2):
                    res = scca(op_tr, Y[train], float(l1), float(l2),
                               ndim=ndim, V0=V0, verbose=verbose,
                               **scca_kwargs)
                    conv[fold, i, j] = res.converged
                    nzx[:, i, j] += np.count_nonzero(res.U,
                                                     axis=0) / nfolds
                    nzy[:, i, j] += np.count_nonzero(res.V,
                                                     axis=0) / nfolds
                    if res.converged and op_te is not None:
                        xpred[test, :, i, j] = np.asarray(
                            op_te.prod(res.U), dtype=np.float64)
                        ypred[test, :, i, j] = Y[test] @ res.V
        finally:
            if cleanup:
                # the memmap-backed datasets keep their fds; unlink is
                # safe and bounds the scratch high-water at ONE fold
                for root in fold_roots:
                    for ext in (".bed", ".bim", ".fam"):
                        try:
                            os.remove(root + ext)
                        except OSError:
                            pass

    if cleanup:
        try:
            os.rmdir(workdir)
        except OSError:
            pass
    return _cv_pooled_result(xpred, ypred, lambda1, lambda2, ndim,
                             opt_dim, nzx, nzy, conv, nfolds, folds)
