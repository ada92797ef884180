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

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from ..io.plink import PlinkDataset
from ..ops.operator import DenseOperator, PackedOperator
from ..ops.standardize import standardize
from ..utils.logging import log


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


def _gram_schmidt(vec: np.ndarray, basis: np.ndarray, j: int) -> np.ndarray:
    """Orthogonalize vec against basis[:, :j], one column at a time with
    per-column normalization (randompca.cpp:270-278 order preserved)."""
    for k in range(j):
        col = basis[:, k]
        denom = col @ col
        if denom > 0:
            vec = vec - (vec @ col) * col / denom
    return vec


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
) -> SCCAResult:
    """SCCA of ``X`` (PLINK root/dataset or (N, p) matrix) against the
    (N, k) phenotype matrix ``Y``."""
    Y = np.asarray(Y, dtype=np.float64)
    if Y.ndim == 1:
        Y = Y[:, None]
    Y_std, _, _ = standardize(Y, stand_y)
    n, k = Y_std.shape

    invdiv = 1.0
    if divisor == "n1":
        invdiv = 1.0 / np.sqrt(n - 1.0)
    Y_std = Y_std * invdiv

    if isinstance(X, str):
        X = PlinkDataset.open(X)

    dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    if isinstance(X, PlinkDataset):
        if X.n_samples != n:
            raise ValueError("Y rows must equal the number of samples")
        mean, sd = X.snp_stats(stand_x)
        op = PackedOperator(
            X.read_packed(), mean, sd, n,
            block_size=block_size, dtype=dtype, mesh=mesh,
        )
    else:
        Xm = np.asarray(X, dtype=np.float64)
        if Xm.shape[0] != n:
            raise ValueError("Y rows must equal the number of samples")
        X_std, _, _ = standardize(Xm, stand_x)
        op = DenseOperator(X_std, dtype=dtype)
    p = op.n_snps

    def xt(y_n):  # u-step product: X^T y, scaled
        return np.asarray(
            op.crossprod(jnp.asarray(y_n, dtype=dtype)), dtype=np.float64
        ) * invdiv

    def xv(u_p):  # v-step product: X u, scaled
        return np.asarray(
            op.prod(jnp.asarray(u_p, dtype=dtype)), dtype=np.float64
        ) * invdiv

    if V0 is None:
        V0 = make_gaussian(k, ndim, seed)
    else:
        V0 = np.asarray(V0, dtype=np.float64)
        if V0.shape != (k, ndim):
            raise ValueError(f"V0 must be ({k}, {ndim})")

    V = V0.copy()
    U = np.zeros((p, ndim), dtype=np.float64)
    d = np.zeros(ndim, dtype=np.float64)
    converged = False

    def result(conv):
        Px = xv(U)
        Py = Y_std @ V
        return SCCAResult(U=U, V=V, d=d, Px=Px, Py=Py, converged=conv, V0=V0)

    for j in range(ndim):
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

    return result(True)
