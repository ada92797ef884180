"""Regression: f32 subspace polish must keep VALID small-eigenvalue PCs.

Before review r2 the polish sweep fed Y = A U straight into the
rank-revealing CholQR, whose deficiency floor is relative to the
LARGEST column norm (~theta_max): any component with
theta_i < ~sqrt(4k*eps_f32)*theta_max was zeroed as "deficient" and
silently returned as a zero eigenvector with theta ~ 0 -- a spectrum
spread of only ~200x triggered it.  The fix normalizes columns first.
"""

import numpy as np
import jax.numpy as jnp

from flashpca_tpu.solvers.block_lanczos import eigsh_block, polish_subspace


def _spread_matrix(n=200, d=(1e4, 1e3, 100.0, 10.0, 1.0), seed=3):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    full = np.concatenate([np.asarray(d),
                           np.full(n - len(d), 1e-3)])
    A = (Q * full[None, :]) @ Q.T
    return A, np.asarray(d), Q[:, :len(d)]


def test_polish_keeps_small_eigenvalue_components():
    A, d, Qtrue = _spread_matrix()
    A32 = jnp.asarray(A, jnp.float32)
    k = len(d)

    # start from slightly perturbed true eigenvectors (the converged-
    # solver state polish sees)
    rng = np.random.default_rng(5)
    U0 = Qtrue + 1e-3 * rng.standard_normal(Qtrue.shape)
    U0, _ = np.linalg.qr(U0)
    U0 = jnp.asarray(U0, jnp.float32)

    theta, U = polish_subspace(lambda x: A32 @ x, U0, iters=2)
    U = np.asarray(U, dtype=np.float64)

    # every returned column must be a unit vector (no zeroed columns)
    norms = np.linalg.norm(U, axis=0)
    assert np.all(norms > 0.9), norms
    # eigenvalues recovered across the whole 1e4x spread
    np.testing.assert_allclose(theta, d, rtol=5e-3)
    # each column matches the true eigenvector (sign-invariant)
    for i in range(k):
        c = abs(float(U[:, i] @ Qtrue[:, i]))
        assert c > 0.99, (i, c)


def test_solver_plus_polish_spread_spectrum():
    """End-to-end f32 solve + polish on the same spread spectrum."""
    A, d, Qtrue = _spread_matrix(n=300)
    A32 = jnp.asarray(A, jnp.float32)
    res = eigsh_block(lambda x: A32 @ x, 300, len(d), tol=1e-4,
                      maxiter=300, dtype=jnp.float32)
    lam, U = polish_subspace(lambda x: A32 @ x, res.eigenvectors, iters=2)
    np.testing.assert_allclose(lam, d, rtol=5e-3)
    assert np.all(np.linalg.norm(np.asarray(U), axis=0) > 0.9)
