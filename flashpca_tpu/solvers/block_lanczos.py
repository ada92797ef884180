"""Thick-restart BLOCK Lanczos eigensolver.

The scalar Lanczos solver (lanczos.py) is data-pass bound on TPU: each
step scans every packed genotype byte to apply ``X X^T`` to ONE vector,
while the fused decode kernels can apply it to a 8-32 column panel for
nearly the same cost (decode bandwidth dominates; the extra MXU columns
are free).  Block Lanczos amortizes each pass over a b-column panel --
the reference anticipates this with its matrix-operand operators
(``perform_op_mat`` / ``perform_op_multi``, svdwide.cpp:71-118,229-275)
and SURVEY.md section 7 calls it out explicitly.

Algorithm (Wu & Simon thick restart, generalized to blocks):

* Krylov basis V of ncv = m*b columns (+1 in-progress panel), built
  panel by panel: W = A Q_t; CGS2 full reorthogonalization against all
  of V (coefficients H_t = V^T A Q_t, exact column blocks of the
  projected matrix T); CholQR2 panel orthonormalization (W = Q_{t+1} R_t,
  R_t = sub-diagonal coupling block of T).
* The whole expansion of one restart cycle runs as ONE jitted
  ``lax.fori_loop`` on device; the host assembles the small symmetric
  T (ncv x ncv), solves it in float64, tests Spectra's convergence
  criterion, and performs the thick restart ``V <- V [S_kept | e_resid]``.
* Residual estimate for Ritz pair i: ``||R_last S[last b rows, i]||``.
* Rank-deficient panels are regularized by a relative jitter on the
  Gram matrix in CholQR (exact breakdowns are measure-zero with a
  random start and full reorthogonalization).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .lanczos import EigshResult, eigsh


def _panel_orth(W, rank_tol, abs_floor2=0.0):
    """Rank-revealing orthonormalization: W = Q R with Q^T Q = I on the
    numerically independent directions and ZERO columns elsewhere.

    Uses the eigendecomposition of the small Gram G = W^T W (b x b):
    Q = W U diag(lam^-1/2) U^T, R = U diag(lam^1/2) U^T (symmetric
    polar-style factor).  Directions with lam below the floor are
    zeroed.  The floor combines a within-panel relative tolerance and
    an ABSOLUTE one (``abs_floor2``, squared-norm scale of the panel
    before orthogonalization): after Krylov-space exhaustion the whole
    residual panel is cancellation noise of magnitude ~eps * ||A Q||,
    and normalizing that noise destroys basis orthogonality -- it must
    become zero columns instead."""
    G = jnp.dot(W.T, W, preferred_element_type=W.dtype,
                precision=lax.Precision.HIGHEST)
    lam, U = jnp.linalg.eigh(G)
    lam = jnp.maximum(lam, 0.0)
    floor = jnp.maximum(rank_tol * jnp.maximum(lam[-1], 1e-300), abs_floor2)
    good = lam > floor
    inv_sqrt = jnp.where(good, 1.0 / jnp.sqrt(jnp.where(good, lam, 1.0)), 0.0)
    sqrt_lam = jnp.where(good, jnp.sqrt(lam), 0.0)
    # NO trailing U^T back-rotation: columns must be exactly orthonormal
    # OR exactly zero (a back-rotation would smear zeroed directions
    # across columns, making V^T V a projector instead of a 0/1
    # diagonal and invalidating the Rayleigh-Ritz eigh(T)).
    Q = W @ (U * inv_sqrt[None, :])
    R = sqrt_lam[:, None] * U.T
    return Q, R


def _expand_cycle_block(matvec, V, l, nsteps, b, jitter):
    """Expand panels t = 0..nsteps-1 starting at column l (static).

    Returns (V, H_all (nsteps, ncv+b, b), R_all (nsteps, b, b))."""
    n, ncvb = V.shape

    def orth2(V, W):
        H1 = jnp.dot(V.T, W, precision=lax.Precision.HIGHEST)
        W = W - jnp.dot(V, H1, precision=lax.Precision.HIGHEST)
        H2 = jnp.dot(V.T, W, precision=lax.Precision.HIGHEST)
        W = W - jnp.dot(V, H2, precision=lax.Precision.HIGHEST)
        return W, H1 + H2

    def body(t, carry):
        V, H_all, R_all = carry
        cs = l + t * b
        Q = lax.dynamic_slice(V, (0, cs), (n, b))
        W = matvec(Q)
        scale2 = jnp.sum(W * W) / b           # pre-orth mean sq col norm
        W, H = orth2(V, W)
        Q1, R1 = _panel_orth(W, jitter, jitter * scale2)
        # Normalizing near-deflated directions amplifies their residual
        # overlap with V by 1/norm -- clean it with one more CGS pass
        # (the removed components are O(eps/norm) of unit vectors whose
        # couplings are O(norm): the T perturbation is O(eps), ignorable).
        Q1 = Q1 - jnp.dot(V, jnp.dot(V.T, Q1,
                                     precision=lax.Precision.HIGHEST),
                          precision=lax.Precision.HIGHEST)
        Qn, R2 = _panel_orth(Q1, jitter)      # renormalize + f32 stability
        R = jnp.dot(R2, R1, precision=lax.Precision.HIGHEST)
        V = lax.dynamic_update_slice(V, Qn, (0, cs + b))
        H_all = H_all.at[t].set(H)
        R_all = R_all.at[t].set(R)
        return V, H_all, R_all

    H_all = jnp.zeros((nsteps, ncvb, b), V.dtype)
    R_all = jnp.zeros((nsteps, b, b), V.dtype)
    return lax.fori_loop(0, nsteps, body, (V, H_all, R_all))


def polish_subspace(matvec, U, *, iters: int = 2):
    """Refine converged Ritz vectors by orthogonal (subspace) iteration
    with a final host-f64 Rayleigh-Ritz.

    After many f32 restart cycles the Krylov basis carries accumulated
    rounding drift; a couple of fresh ``orth(A U)`` sweeps followed by
    one small Rayleigh-Ritz rotation removes it and recovers accuracy
    near the single-matvec f32 noise floor.  Returns (theta, U) with
    theta descending and U exactly renormalized.
    """
    k = U.shape[1]
    rank_tol = (100 * float(np.finfo(np.dtype(U.dtype.name).name).eps)) ** 2

    @jax.jit
    def sweep(U):
        Y = matvec(U)
        Q, _ = _panel_orth(Y, rank_tol)
        return Q

    @jax.jit
    def project(U):
        Y = matvec(U)
        G = jnp.dot(U.T, Y, precision=lax.Precision.HIGHEST)
        return Y, G

    for _ in range(iters):
        U = sweep(U)
    Y, G = project(U)
    G = np.asarray(G, dtype=np.float64)
    G = 0.5 * (G + G.T)
    theta, S = np.linalg.eigh(G)
    order = np.argsort(theta)[::-1][:k]
    theta = theta[order]
    S = S[:, order]
    U = U @ jnp.asarray(S, dtype=U.dtype)
    return theta, U


def eigsh_block(
    matvec,
    n: int,
    nev: int,
    *,
    block: int = 8,
    ncv: int | None = None,
    maxiter: int = 500,
    tol: float = 1e-6,
    dtype=jnp.float32,
    seed: int = 1,
    v0: np.ndarray | None = None,
) -> EigshResult:
    """Largest-algebraic eigenpairs via thick-restart block Lanczos.

    ``matvec`` must accept (n, b) panels and be traceable.  Falls back
    to the scalar solver when the problem is too small for blocking.
    """
    b = int(block)
    if ncv is None:
        # Block Krylov spaces need more room than scalar Lanczos'
        # 2*nev+1 to converge in few data passes; ~4*nev + 2 panels
        # measured best on structured genotype spectra (see tests).
        ncv = b * (-(-(4 * nev) // b)) + 2 * b
        ncv = min(ncv, b * ((n - b) // b))
    ncv = b * (ncv // b) if ncv % b else ncv
    if ncv + b > n or nev + b > ncv or b < 2:
        return eigsh(lambda x: matvec(x[:, None])[:, 0], n, nev,
                     maxiter=maxiter, tol=tol, dtype=dtype, seed=seed,
                     v0=v0)

    eps = float(np.finfo(np.dtype(dtype).name).eps)
    eps23 = eps ** (2.0 / 3.0)
    # relative rank tolerance inside a panel's Gram (squared-norm scale)
    jitter = (100 * eps) ** 2

    rng = np.random.default_rng(seed)
    Q0 = rng.standard_normal((n, b))
    if v0 is not None:
        Q0[:, 0] = np.asarray(v0, dtype=np.float64)
    Q0, _ = np.linalg.qr(Q0)

    V = jnp.zeros((n, ncv + b), dtype=dtype)
    V = V.at[:, :b].set(jnp.asarray(Q0, dtype=dtype))

    expand = jax.jit(
        partial(_expand_cycle_block, matvec, b=b, jitter=jitter),
        static_argnames=("l", "nsteps"),
        donate_argnums=(0,),
    )

    nops = 0
    l = 0
    theta_kept = np.zeros(0)
    theta = np.zeros(nev)
    resid = np.full(nev, np.inf)
    S_keep = None
    converged = False
    restart = 0

    for restart in range(maxiter):
        nsteps = (ncv - l) // b
        V, H_d, R_d = expand(V, l=l, nsteps=nsteps)
        nops += nsteps
        H = np.asarray(H_d, dtype=np.float64)    # (nsteps, ncv+b, b)
        R = np.asarray(R_d, dtype=np.float64)    # (nsteps, b, b)

        # -- assemble symmetric T on host -----------------------------------
        T = np.zeros((ncv, ncv), dtype=np.float64)
        if l > 0:
            T[:l, :l] = np.diag(theta_kept)
        for t in range(nsteps):
            cs = l + t * b
            T[: cs + b, cs: cs + b] = H[t, : cs + b]
            D = T[cs: cs + b, cs: cs + b]
            T[cs: cs + b, cs: cs + b] = 0.5 * (D + D.T)
            T[cs: cs + b, : cs] = T[: cs, cs: cs + b].T
            if t < nsteps - 1:
                T[cs + b: cs + 2 * b, cs: cs + b] = R[t]
                T[cs: cs + b, cs + b: cs + 2 * b] = R[t].T
        R_last = R[nsteps - 1]

        theta_all, S = np.linalg.eigh(T)
        order = np.argsort(theta_all)[::-1]
        theta_all = theta_all[order]
        S = S[:, order]
        res_all = np.linalg.norm(R_last @ S[ncv - b:, :], axis=0)

        theta = theta_all[:nev]
        resid = res_all[:nev]
        # Spectra-style per-pair tolerance, except the roundoff floor
        # scales with ||A|| ~= theta_max (the achievable f32/f64 residual
        # for ANY pair is ~eps * ||A||, not eps * |theta_i|).
        theta_max = max(abs(theta_all[0]), 1e-300)
        thresh = np.maximum(eps23 * theta_max,
                            tol * np.maximum(np.abs(theta), 1e-300))
        nconv = int(np.sum(resid <= thresh))
        if nconv >= nev or restart == maxiter - 1:
            converged = nconv >= nev
            S_keep = S[:, :nev]
            break

        # -- thick restart ---------------------------------------------------
        l = b * min(ncv // b - 1,
                    max(1, -(-(nev + (ncv - nev) // 2) // b)))
        theta_kept = theta_all[:l]
        S_pad = np.zeros((ncv + b, ncv + b), dtype=np.float64)
        S_pad[:ncv, :l] = S[:, :l]
        S_pad[ncv:, l: l + b] = np.eye(b)        # residual panel -> col l
        V = V @ jnp.asarray(S_pad, dtype=dtype)

    S_pad = np.zeros((ncv + b, nev), dtype=np.float64)
    S_pad[:ncv] = S_keep
    U = V @ jnp.asarray(S_pad, dtype=dtype)

    return EigshResult(
        eigenvalues=theta.copy(),
        eigenvectors=U,
        n_restarts=restart + 1,
        n_ops=nops,
        converged=converged,
        residuals=resid.copy(),
    )
