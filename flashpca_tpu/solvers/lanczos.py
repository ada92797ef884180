"""Thick-restart Lanczos eigensolver for symmetric PSD operators.

TPU-native replacement for the reference's Spectra
``SymEigsSolver<double, LARGEST_ALGE, Op>(&op, ndim, 2*ndim+1)``
(randompca.cpp:131-142, 173-178).  Same user-facing semantics:

* ``nev`` (= ndim) largest-algebraic eigenpairs of a symmetric operator,
* Krylov subspace of ``ncv = 2*nev + 1`` vectors,
* ``maxiter`` restart cycles, convergence when the Ritz residual
  ``|beta_m * s_mi|`` drops below ``max(eps^(2/3), tol) * |theta_i|``
  (Spectra's criterion).

Implementation is TPU-first rather than a Spectra port:

* The Krylov basis lives on device as a fixed-shape (n, ncv+1) buffer
  (static shapes for XLA; unused columns are zero and contribute
  nothing to the orthogonalization matmuls).
* Every long-vector operation is a jitted matmul/axpy on device; only
  two scalars (alpha, beta) cross to the host per Lanczos step.
* Full reorthogonalization (CGS2, two classical Gram-Schmidt sweeps
  against the whole basis) keeps float32 Lanczos numerically sound;
  the (ncv x ncv) projected eigenproblem is solved on the host in
  float64.
* Thick restart (Wu & Simon): keep ``l`` Ritz pairs plus the residual
  direction, T becomes arrowhead, continue.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp


@dataclass
class EigshResult:
    eigenvalues: np.ndarray       # (k,) descending, float64
    eigenvectors: jnp.ndarray     # (n, k) device array, operator dtype
    n_restarts: int
    n_ops: int
    converged: bool
    residuals: np.ndarray         # (k,) estimated |beta * s| residual norms


@partial(jax.jit, donate_argnums=(1,))
def _orth_step(V, w):
    """CGS2: orthogonalize w against all columns of V; returns
    (w_orth, alpha_like coefficients h1+h2, beta)."""
    h1 = V.T @ w
    w = w - V @ h1
    h2 = V.T @ w
    w = w - V @ h2
    beta = jnp.linalg.norm(w)
    return w, h1 + h2, beta


@partial(jax.jit, donate_argnums=(0,))
def _set_col(V, v, j):
    return jax.lax.dynamic_update_slice(V, v[:, None], (0, j))


@jax.jit
def _restart_basis(V, S_pad):
    """V_new = V @ S_pad: forms kept Ritz vectors + residual column and
    zeroes the rest in one matmul."""
    return V @ S_pad


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
) -> EigshResult:
    """Largest-algebraic eigenpairs of the symmetric operator ``matvec``.

    ``matvec`` maps a device (n,) vector to a device (n,) vector.
    """
    if ncv is None:
        ncv = 2 * nev + 1
    ncv = min(ncv, n)
    if not (nev < ncv <= n):
        raise ValueError(f"need nev < ncv <= n (nev={nev}, ncv={ncv}, n={n})")

    eps = float(np.finfo(np.dtype(dtype).name).eps)
    eps23 = eps ** (2.0 / 3.0)

    rng = np.random.default_rng(seed)
    if v0 is None:
        v0 = rng.standard_normal(n)
    v0 = np.asarray(v0, dtype=np.float64)
    v0 = v0 / np.linalg.norm(v0)

    # fixed-shape basis buffer; column ncv holds the in-progress residual
    V = jnp.zeros((n, ncv + 1), dtype=dtype)
    V = _set_col(V, jnp.asarray(v0, dtype=dtype), 0)

    T = np.zeros((ncv, ncv), dtype=np.float64)
    nops = 0
    l = 0  # number of kept Ritz vectors after restart (0 on first cycle)
    b_coupling = np.zeros(0, dtype=np.float64)

    theta = np.zeros(nev)
    resid = np.full(nev, np.inf)
    S_keep = None
    converged = False
    restart = 0

    for restart in range(maxiter):
        # -- Lanczos expansion from column l to ncv-1 ------------------------
        beta_last = 0.0
        for j in range(l, ncv):
            vj = V[:, j]
            w = matvec(vj)
            nops += 1
            w, h, beta = _orth_step(V, w)
            alpha = float(h[j])
            T[j, j] = alpha
            if j > l:
                pass  # T[j-1, j] set when beta of previous step known
            if j < ncv - 1:
                T[j, j + 1] = T[j + 1, j] = float(beta)
            beta_last = float(beta)
            if beta_last <= eps * 10 * max(1.0, abs(alpha)):
                # invariant subspace: insert a fresh random direction
                wnew = jnp.asarray(
                    rng.standard_normal(n), dtype=dtype)
                wnew, _, bnew = _orth_step(V, wnew)
                w = wnew
                beta = bnew
                beta_last = 0.0  # exact deflation: no coupling
                if j < ncv - 1:
                    T[j, j + 1] = T[j + 1, j] = 0.0
            V = _set_col(V, (w / beta).astype(dtype), j + 1)

        # couplings from thick restart (arrowhead row/col at index l)
        if l > 0:
            T[:l, :l] = np.diag(theta_kept)
            T[:l, l:] = 0.0
            T[l:, :l] = 0.0
            T[:l, l] = b_coupling
            T[l, :l] = b_coupling
            # re-fill the tridiagonal part computed above stays in place

        # -- projected eigenproblem (host, f64) ------------------------------
        theta_all, S = np.linalg.eigh(T)        # ascending
        order = np.argsort(theta_all)[::-1]     # largest algebraic first
        theta_all = theta_all[order]
        S = S[:, order]
        res_all = np.abs(beta_last * S[ncv - 1, :])

        theta = theta_all[:nev]
        resid = res_all[:nev]
        thresh = np.maximum(eps23, tol) * np.maximum(np.abs(theta), 1e-300)
        nconv = int(np.sum(resid <= thresh))
        if nconv >= nev or restart == maxiter - 1:
            converged = nconv >= nev
            S_keep = S[:, :nev]
            break

        # -- thick restart ---------------------------------------------------
        l = min(ncv - 1, nev + max(1, (ncv - nev) // 2))
        # always keep at least the unconverged leaders + converged pairs
        theta_kept = theta_all[:l]
        b_coupling = beta_last * S[ncv - 1, :l]
        S_pad = np.zeros((ncv + 1, ncv + 1), dtype=np.float64)
        S_pad[:ncv, :l] = S[:, :l]
        S_pad[ncv, l] = 1.0  # residual vector becomes column l
        V = _restart_basis(V, jnp.asarray(S_pad, dtype=dtype))
        T = np.zeros((ncv, ncv), dtype=np.float64)

    # -- Ritz vectors ---------------------------------------------------------
    S_pad = np.zeros((ncv + 1, nev), dtype=np.float64)
    S_pad[:ncv, :] = S_keep
    U = V @ jnp.asarray(S_pad, dtype=dtype)     # (n, nev)

    return EigshResult(
        eigenvalues=theta.copy(),
        eigenvectors=U,
        n_restarts=restart + 1,
        n_ops=nops,
        converged=converged,
        residuals=resid.copy(),
    )
