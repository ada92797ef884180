import numpy as np
import jax.numpy as jnp
import pytest

from flashpca_tpu.solvers.lanczos import eigsh


def _sign_align(A, B):
    """Flip columns of B to match A's signs."""
    s = np.sign(np.sum(A * B, axis=0))
    s[s == 0] = 1.0
    return B * s


def _make_psd(rng, n, p):
    X = rng.normal(size=(n, p))
    return X @ X.T / p


def test_eigsh_matches_numpy_f64(rng):
    n = 120
    A = _make_psd(rng, n, 300)
    Ad = jnp.asarray(A)
    res = eigsh(lambda v: Ad @ v, n, nev=5, tol=1e-10, dtype=jnp.float64)
    w, Q = np.linalg.eigh(A)
    w = w[::-1][:5]
    Q = Q[:, ::-1][:, :5]
    assert res.converged
    np.testing.assert_allclose(res.eigenvalues, w, rtol=1e-10)
    U = np.asarray(res.eigenvectors)
    U = _sign_align(Q, U)
    np.testing.assert_allclose(U, Q, atol=1e-7)


def test_eigsh_needs_restarts(rng):
    # clustered spectrum forces multiple restart cycles
    n = 200
    A = _make_psd(rng, n, 220)
    Ad = jnp.asarray(A)
    res = eigsh(lambda v: Ad @ v, n, nev=8, ncv=12, maxiter=200,
                tol=1e-9, dtype=jnp.float64)
    w = np.linalg.eigvalsh(A)[::-1][:8]
    assert res.converged
    assert res.n_restarts > 1
    np.testing.assert_allclose(res.eigenvalues, w, rtol=1e-8)


def test_eigsh_f32_accuracy(rng):
    n = 150
    A = _make_psd(rng, n, 400)
    Ad = jnp.asarray(A, dtype=jnp.float32)
    res = eigsh(lambda v: Ad @ v, n, nev=4, tol=1e-6, dtype=jnp.float32)
    w, Q = np.linalg.eigh(A)
    w = w[::-1][:4]
    Q = Q[:, ::-1][:, :4]
    np.testing.assert_allclose(res.eigenvalues, w, rtol=1e-4)
    U = _sign_align(Q, np.asarray(res.eigenvectors, dtype=np.float64))
    # sign-aligned correlation > 0.999 (the parity gate)
    corr = np.abs(np.sum(U * Q, axis=0)) / (
        np.linalg.norm(U, axis=0) * np.linalg.norm(Q, axis=0))
    assert (corr > 0.999).all()


def test_eigsh_low_rank_deflation(rng):
    # rank-3 operator with nev=5: exact invariant subspace mid-run
    n = 80
    B = rng.normal(size=(n, 3))
    A = B @ B.T
    Ad = jnp.asarray(A)
    res = eigsh(lambda v: Ad @ v, n, nev=5, tol=1e-9, dtype=jnp.float64)
    w = np.linalg.eigvalsh(A)[::-1][:5]
    np.testing.assert_allclose(res.eigenvalues, w, atol=1e-7 * w[0])


def test_eigsh_v0_deterministic(rng):
    n = 60
    A = _make_psd(rng, n, 100)
    Ad = jnp.asarray(A)
    v0 = rng.normal(size=n)
    r1 = eigsh(lambda v: Ad @ v, n, nev=3, dtype=jnp.float64, v0=v0)
    r2 = eigsh(lambda v: Ad @ v, n, nev=3, dtype=jnp.float64, v0=v0)
    np.testing.assert_array_equal(r1.eigenvalues, r2.eigenvalues)


def test_eigsh_invalid_args(rng):
    with pytest.raises(ValueError):
        eigsh(lambda v: v, 10, nev=5, ncv=5)


def test_block_exhaustion_stress():
    """Regression sweep for the Krylov-exhaustion regime (operator rank
    < ncv): every seed must converge to the exact spectrum -- this
    surface held three distinct bugs (NaN cholesky on zero panels,
    noise-panel normalization destroying basis orthogonality, and
    frozen zero panels faking convergence)."""
    import jax.numpy as jnp
    from flashpca_tpu.solvers.block_lanczos import eigsh_block

    for seed in range(8):
        rng = np.random.default_rng(seed)
        n, p, k = 40, 30, 3
        X = rng.binomial(2, 0.3, size=(n, p)).astype(float)
        sd = np.where(X.std(0) > 0, X.std(0), 1.0)
        Xs = (X - X.mean(0)) / sd
        A = Xs @ Xs.T
        Ad = jnp.asarray(A)
        w_ref = np.linalg.eigvalsh(A)[::-1][:k]
        res = eigsh_block(lambda Q: Ad @ Q, n, k, block=8, maxiter=100,
                          tol=1e-10, dtype=jnp.float64, seed=1)
        assert res.converged, f"seed {seed} did not converge"
        err = np.abs(res.eigenvalues - w_ref).max() / w_ref.max()
        assert err < 1e-9, f"seed {seed}: rel err {err}"


def test_block_warm_start_panel():
    """Warm-starting from previously computed Ritz vectors (the
    checkpoint/restart story) converges in fewer passes."""
    import jax.numpy as jnp
    from flashpca_tpu.solvers.block_lanczos import eigsh_block

    rng = np.random.default_rng(1)
    n = 300
    F = rng.standard_normal((n, 6)) * np.sqrt(np.linspace(20, 5, 6))
    E = rng.standard_normal((n, 800))
    A = np.hstack([F, E]) @ np.hstack([F, E]).T / 800
    Ad = jnp.asarray(A)
    cold = eigsh_block(lambda Q: Ad @ Q, n, 4, block=4, maxiter=200,
                       tol=1e-9, dtype=jnp.float64, seed=1)
    warm = eigsh_block(lambda Q: Ad @ Q, n, 4, block=4, maxiter=200,
                       tol=1e-9, dtype=jnp.float64, seed=2,
                       v0=np.asarray(cold.eigenvectors))
    assert warm.converged
    assert warm.n_ops < cold.n_ops
    np.testing.assert_allclose(warm.eigenvalues, cold.eigenvalues,
                               rtol=1e-8)


def test_block_exhaustion_stress_host_path():
    """The HOST-driven expansion twin (fused=False, the streaming
    operators' driver) through the same Krylov-exhaustion sweep: its
    deflation injection runs a separate jitted step
    (_host_inject_step) that must mirror the fused inject branch --
    scale-consistent deflation floor on the UN-normalized fresh panel,
    merged-panel cleanup, post-merge R (review r4)."""
    import jax.numpy as jnp
    from flashpca_tpu.solvers.block_lanczos import eigsh_block

    for seed in range(8):
        rng = np.random.default_rng(seed)
        n, p, k = 40, 30, 3
        X = rng.binomial(2, 0.3, size=(n, p)).astype(float)
        sd = np.where(X.std(0) > 0, X.std(0), 1.0)
        Xs = (X - X.mean(0)) / sd
        A = Xs @ Xs.T
        Ad = jnp.asarray(A)
        w_ref = np.linalg.eigvalsh(A)[::-1][:k]
        res = eigsh_block(lambda Q: Ad @ Q, n, k, block=8, maxiter=100,
                          tol=1e-10, dtype=jnp.float64, seed=1,
                          fused=False)
        assert res.converged, f"seed {seed} did not converge"
        np.testing.assert_allclose(res.eigenvalues, w_ref,
                                   atol=1e-8 * max(1.0, w_ref[0]))


def test_eigsh_block_rejects_nonpositive_maxiter():
    from flashpca_tpu.solvers.block_lanczos import eigsh_block

    with pytest.raises(ValueError, match="maxiter"):
        eigsh_block(lambda Q: Q, 40, 3, maxiter=0)


def test_eigsh_tiny_norm_operator():
    """A small-norm operator must not be spuriously deflated into
    converged random directions: the deflation floor is relative to a
    running ||A|| estimate, not an absolute 1.0 (review r4)."""
    rng = np.random.default_rng(5)
    n, scale = 60, 1e-8
    A = scale * _make_psd(rng, n, 50)
    Ad = jnp.asarray(A)
    res = eigsh(lambda v: Ad @ v, n, nev=3, tol=1e-9, dtype=jnp.float64)
    w = np.linalg.eigvalsh(A)[::-1][:3]
    np.testing.assert_allclose(res.eigenvalues, w, rtol=1e-7)
    R = A @ np.asarray(res.eigenvectors) - np.asarray(
        res.eigenvectors) * res.eigenvalues[None, :]
    assert np.linalg.norm(R, axis=0).max() < 1e-6 * w[0]


def test_eigsh_invalid_nev_maxiter():
    with pytest.raises(ValueError, match="nev"):
        eigsh(lambda v: v, 10, nev=0)
    with pytest.raises(ValueError, match="maxiter"):
        eigsh(lambda v: v, 10, nev=2, maxiter=0)
