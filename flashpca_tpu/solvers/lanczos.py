"""Thick-restart Lanczos eigensolver for symmetric PSD operators.

TPU-native replacement for the reference's Spectra
``SymEigsSolver<double, LARGEST_ALGE, Op>(&op, ndim, 2*ndim+1)``
(randompca.cpp:131-142, 173-178).  Same user-facing semantics:

* ``nev`` (= ndim) largest-algebraic eigenpairs of a symmetric operator,
* Krylov subspace of ``ncv = 2*nev + 1`` vectors,
* ``maxiter`` restart cycles, convergence when the Ritz residual
  ``|beta_m * s_mi|`` drops below
  ``max(eps^(2/3) * theta_max, tol * |theta_i|)`` -- Spectra's
  criterion with the roundoff floor scaled by ||A|| (theta_max)
  instead of each pair's own |theta_i|: f32 residuals of SMALL
  eigenvalues bottom out at eps * ||A||, so Spectra's literal
  per-pair floor is unreachable below theta_max * eps^(2/3) (the
  deliberate deviation; see the inline comment at the test).

Implementation is TPU-first rather than a Spectra port:

* The whole Lanczos expansion of one restart cycle (ncv - l matvec +
  full-reorthogonalization steps) runs as ONE jitted ``lax.fori_loop``
  on device -- the host sees a single dispatch per restart cycle, not
  one per step.  This matters enormously when the device is remote
  (dispatch latency) and lets XLA fuse the decode/matvec/orth chain.
* The Krylov basis lives on device as a fixed-shape (n, ncv+1) buffer
  (static shapes for XLA; unused columns are zero and contribute
  nothing to the orthogonalization matmuls).
* Full reorthogonalization (CGS2, two classical Gram-Schmidt sweeps
  against the whole basis) keeps float32 Lanczos numerically sound;
  the (ncv x ncv) projected eigenproblem is solved on the host in
  float64 (it is tiny).
* Thick restart (Wu & Simon): keep ``l`` Ritz pairs plus the residual
  direction, T becomes arrowhead, continue.
* Exact breakdown (invariant subspace) is handled on device by
  splicing in a fresh pseudo-random direction with zero coupling.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from functools import partial
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


@dataclass
class EigshResult:
    eigenvalues: np.ndarray       # (k,) descending, float64
    eigenvectors: jnp.ndarray     # (n, k) device array, operator dtype
    n_restarts: int
    n_ops: int
    converged: bool
    residuals: np.ndarray         # (k,) estimated |beta * s| residual norms
    # per-pair converged-at-exit (resid <= the solver's per-pair
    # threshold); lets callers that solve buffer pairs beyond the
    # requested k distinguish "a requested pair failed" from "only a
    # best-effort buffer pair failed" (models/pca.py)
    conv_mask: np.ndarray | None = None


def save_state(path, vectors, eigenvalues, residuals, converged) -> None:
    """Persist a Ritz panel as an .npz restart checkpoint.

    The reference has no in-run checkpointing (its persistence story is
    artifact-based, SURVEY.md section 5); here the Ritz panel (N x k,
    small) saved after any solve -- converged or not -- warm-starts a
    later run via the solver's ``v0`` panel seed.  ``vectors`` should be
    in SAMPLE space (unpermuted) so the state is independent of the
    operator's padded device layout.

    Multi-host safety and atomicity: see ``utils.state.atomic_savez``.
    """
    from ..utils.state import atomic_savez

    atomic_savez(
        path,
        vectors=np.asarray(vectors, dtype=np.float64),
        eigenvalues=np.asarray(eigenvalues, dtype=np.float64),
        residuals=np.asarray(residuals, dtype=np.float64),
        converged=np.asarray(bool(converged)),
    )


def load_state(path) -> dict:
    """Load a checkpoint written by :func:`save_state`."""
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


@functools.lru_cache(maxsize=32)
def _expand_jit_for(mv, ncv, deflate_tol):
    """Bounded cache of jitted scalar-cycle programs (stable-identity
    mv reuses the compiled program across solves; LRU bounds the global
    footprint -- see block_lanczos._expand_jit_for)."""
    return jax.jit(
        partial(_expand_cycle, mv, ncv=ncv, deflate_tol=deflate_tol),
        static_argnames=("l",),
        donate_argnums=(0,),
    )


def _expand_cycle(matvec, V, key, consts, scale0, l, ncv, deflate_tol):
    """Run Lanczos steps j = l .. ncv-1 on device.

    ``matvec(v, *consts)`` applies the operator (array closures hoisted
    to arguments -- see block_lanczos._hoist).  V: (n, ncv+1) with
    columns 0..l valid (column l is the current starting vector, unit
    norm, orthogonal to the previous columns).  Returns
    (V, alphas, betas) where alphas[j] = <v_j, A v_j> and betas[j] =
    ||residual after step j|| (0 where deflation occurred).

    ``scale0`` seeds the running ||A|| estimate the deflation floor is
    RELATIVE to (theta_max from the previous cycle; 0 on the first).
    An absolute floor (the old max(1.0, |alpha|)) spuriously deflated
    every step of operators with norm below the tolerance, returning
    converged random directions (review r4).
    """
    dtype = V.dtype
    n = V.shape[0]

    def orth(V, w):
        hp = lax.Precision.HIGHEST    # TPU DEFAULT f32 dots lose ~2^-8
        h1 = jnp.dot(V.T, w, precision=hp)
        w = w - jnp.dot(V, h1, precision=hp)
        h2 = jnp.dot(V.T, w, precision=hp)
        w = w - jnp.dot(V, h2, precision=hp)
        return w, h1 + h2

    def body(j, carry):
        V, alphas, betas, anorm = carry
        vj = lax.dynamic_slice(V, (0, j), (n, 1))[:, 0]
        w = matvec(vj, *consts)
        w, h = orth(V, w)
        alpha = h[j]
        beta = jnp.linalg.norm(w)
        # running operator-scale estimate: every |alpha|/beta seen is
        # <= ||A|| (unit vj), and a true invariant subspace leaves
        # beta ~ eps * ||A|| -- scale-free for tiny-norm operators
        anorm = jnp.maximum(anorm, jnp.maximum(jnp.abs(alpha), beta))
        deflated = beta <= deflate_tol * anorm

        def fresh(_):
            r = jax.random.normal(jax.random.fold_in(key, j), (n,), dtype)
            r, _ = orth(V, r)
            return r / jnp.linalg.norm(r)

        vnext = lax.cond(
            deflated, fresh, lambda _: w / beta, operand=None)
        beta_out = jnp.where(deflated, jnp.zeros((), dtype), beta)
        V = lax.dynamic_update_slice(V, vnext[:, None], (0, j + 1))
        alphas = alphas.at[j].set(alpha)
        betas = betas.at[j].set(beta_out)
        return V, alphas, betas, anorm

    alphas = jnp.zeros(ncv, dtype)
    betas = jnp.zeros(ncv, dtype)
    V, alphas, betas, _ = lax.fori_loop(
        l, ncv, body,
        (V, alphas, betas, jnp.asarray(scale0, dtype)))
    # ONE stacked (2, ncv) output so the restart loop pays a single
    # device->host transfer per cycle (see block_lanczos: separate
    # fetches each pay a slow link's per-transfer floor)
    return V, jnp.stack([alphas, betas])


@partial(jax.jit, donate_argnums=(0,))
def _apply_restart(V, S_pad):
    """V_new = V @ S_pad: forms kept Ritz vectors + residual column and
    zeroes the rest in one matmul."""
    return jnp.dot(V, S_pad, precision=jax.lax.Precision.HIGHEST)


def eigsh(
    matvec: Callable,
    n: int,
    nev: int,
    *,
    ncv: int | None = None,
    maxiter: int = 500,
    tol: float = 1e-6,
    dtype=jnp.float32,
    seed: int = 1,
    v0: np.ndarray | None = None,
    operands=(),
) -> EigshResult:
    """Largest-algebraic eigenpairs of the symmetric operator ``matvec``.

    ``matvec`` must be traceable: it maps a device (n,) vector to a
    device (n,) vector (called as ``matvec(v, *operands)`` when
    ``operands`` is given -- big device arrays must come through it,
    see block_lanczos._hoist) and is jitted as part of the per-cycle
    device program.
    """
    if ncv is None:
        ncv = 2 * nev + 1
    ncv = min(ncv, n)
    if nev < 1:
        raise ValueError("nev must be >= 1")
    if maxiter < 1:
        raise ValueError("maxiter must be >= 1")
    if not (nev < ncv <= n):
        raise ValueError(f"need nev < ncv <= n (nev={nev}, ncv={ncv}, n={n})")

    eps = float(np.finfo(np.dtype(dtype).name).eps)
    eps23 = eps ** (2.0 / 3.0)

    rng = np.random.default_rng(seed)
    if v0 is None:
        v0 = rng.standard_normal(n)
    v0 = np.asarray(v0, dtype=np.float64)
    if v0.ndim == 2:
        # a warm-start Ritz PANEL (e.g. a restart checkpoint routed via
        # the block solver's small-problem fallback): seed with the
        # dominant Ritz vector
        v0 = v0[:, 0]
    v0 = v0 / np.linalg.norm(v0)

    key = jax.random.PRNGKey(seed)

    # fixed-shape basis buffer; column ncv holds the in-progress residual
    V = jnp.zeros((n, ncv + 1), dtype=dtype)
    V = V.at[:, 0].set(jnp.asarray(v0, dtype=dtype))

    # hoist array closures of matvec into arguments (a jit CONSTANT
    # device array is materialized on the host -- fatal for multi-GB
    # packed operands; see block_lanczos._hoist)
    if operands:
        mv_pure, consts = matvec, tuple(operands)
    else:
        mv_pure, consts = jax.closure_convert(matvec, jnp.zeros((n,), dtype))

    expand_jit = _expand_jit_for(mv_pure, ncv, 10.0 * eps)

    def expand(V, key, consts, l, scale0):
        return expand_jit(V, key, consts, scale0, l=l)

    nops = 0
    l = 0  # number of kept Ritz vectors after restart (0 on first cycle)
    theta_kept = np.zeros(0)
    b_coupling = np.zeros(0, dtype=np.float64)

    theta = np.zeros(nev)
    resid = np.full(nev, np.inf)
    S_keep = None
    converged = False
    restart = 0
    best_resid = np.inf
    stall = 0

    for restart in range(maxiter):
        # -- device: Lanczos expansion from column l to ncv-1 ---------------
        key, sub = jax.random.split(key)
        V, ab_d = expand(V, sub, consts, l=l,
                         scale0=(float(np.max(np.abs(theta_kept)))
                                 if theta_kept.size else 0.0))
        nops += ncv - l
        ab = np.asarray(ab_d, dtype=np.float64)  # one fetch: [alphas; betas]
        alphas, betas = ab[0], ab[1]

        # -- host: build T (arrowhead + tridiagonal), solve, test -----------
        T = np.zeros((ncv, ncv), dtype=np.float64)
        if l > 0:
            T[:l, :l] = np.diag(theta_kept)
            T[:l, l] = b_coupling
            T[l, :l] = b_coupling
        T[np.arange(l, ncv), np.arange(l, ncv)] = alphas[l:]
        j = np.arange(l, ncv - 1)
        T[j, j + 1] = T[j + 1, j] = betas[l:ncv - 1]
        beta_last = betas[ncv - 1]

        theta_all, S = np.linalg.eigh(T)        # ascending
        order = np.argsort(theta_all)[::-1]     # largest algebraic first
        theta_all = theta_all[order]
        S = S[:, order]
        res_all = np.abs(beta_last * S[ncv - 1, :])

        theta = theta_all[:nev]
        resid = res_all[:nev]
        # per-pair tolerance, with the roundoff floor scaled by
        # ||A|| ~= theta_max (see block_lanczos.py)
        theta_max = max(abs(theta_all[0]), 1e-300)
        thresh = np.maximum(eps23 * theta_max,
                            tol * np.maximum(np.abs(theta), 1e-300))
        nconv = int(np.sum(resid <= thresh))
        # stagnation at the finite-precision floor counts as converged
        # (clustered spectra; see block_lanczos.eigsh_block)
        rmax = float(resid.max())
        if rmax > 0.9 * best_resid:
            stall += 1
        else:
            stall = 0
        best_resid = min(best_resid, rmax)
        at_floor = rmax <= np.sqrt(eps) * theta_max
        if (nconv >= nev or restart == maxiter - 1
                or (stall >= 8 and at_floor)):
            converged = nconv >= nev or (stall >= 8 and at_floor)
            conv_mask = resid <= thresh
            S_keep = S[:, :nev]
            break

        # -- thick restart ---------------------------------------------------
        l = min(ncv - 1, nev + max(1, (ncv - nev) // 2))
        theta_kept = theta_all[:l]
        b_coupling = beta_last * S[ncv - 1, :l]
        S_pad = np.zeros((ncv + 1, ncv + 1), dtype=np.float64)
        S_pad[:ncv, :l] = S[:, :l]
        S_pad[ncv, l] = 1.0  # residual vector becomes column l
        V = _apply_restart(V, jnp.asarray(S_pad, dtype=dtype))

    # -- Ritz vectors ---------------------------------------------------------
    S_pad = np.zeros((ncv + 1, nev), dtype=np.float64)
    S_pad[:ncv, :] = S_keep
    U = jnp.dot(V, jnp.asarray(S_pad, dtype=dtype),
                precision=jax.lax.Precision.HIGHEST)   # (n, nev)

    return EigshResult(
        eigenvalues=theta.copy(),
        eigenvectors=U,
        n_restarts=restart + 1,
        n_ops=nops,
        converged=converged,
        residuals=resid.copy(),
        conv_mask=conv_mask.copy(),
    )
