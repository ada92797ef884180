"""Checkpoint/restart surface (VERDICT r1 item 7).

An interrupted (maxiter-limited) run persists its Ritz panel; resuming
from it converges in fewer restarts than a cold run, and a converged
checkpoint can be reloaded/inspected.
"""

import numpy as np
import pytest

from flashpca_tpu.models.pca import pca
from flashpca_tpu.solvers.lanczos import load_state


def test_interrupted_run_saves_state_and_resumes(small_plink, tmp_path):
    root, _ = small_plink
    state = str(tmp_path / "ritz.npz")

    # interrupted run: one restart cycle only -> not converged, but the
    # state must still be written before the error is raised
    with pytest.raises(RuntimeError, match="not successful"):
        pca(root, 3, tol=1e-12, maxiter=1, state_out=state)
    st = load_state(state)
    assert not bool(st["converged"])
    assert st["vectors"].shape[1] == 3

    cold = pca(root, 3, tol=1e-9)
    warm = pca(root, 3, tol=1e-9, state_in=state)
    assert warm.n_restarts <= cold.n_restarts
    np.testing.assert_allclose(warm.values, cold.values, rtol=1e-8)
    for j in range(3):
        c = abs(np.dot(warm.vectors[:, j], cold.vectors[:, j]))
        assert c > 1 - 1e-8


def test_converged_state_roundtrip(small_plink, tmp_path):
    root, _ = small_plink
    state = str(tmp_path / "done.npz")
    res = pca(root, 3, tol=1e-9, state_out=state)
    st = load_state(state)
    assert bool(st["converged"])
    # state stores the raw operator eigenvalues (before the divisor)
    from flashpca_tpu.io.plink import PlinkDataset

    p = PlinkDataset.open(root).n_snps
    np.testing.assert_allclose(st["eigenvalues"], res.values * p,
                               rtol=1e-10)
    # resuming from a converged state reconverges immediately (1 cycle)
    warm = pca(root, 3, tol=1e-9, state_in=state)
    np.testing.assert_allclose(warm.values, res.values, rtol=1e-8)


def test_checkpoint_every_requires_state_out(small_plink):
    root, _ = small_plink
    with pytest.raises(ValueError, match="state_out"):
        pca(root, 2, checkpoint_every=1)


def test_state_dimension_mismatch_raises(small_plink, tmp_path):
    from flashpca_tpu.solvers.lanczos import save_state

    root, _ = small_plink
    state = str(tmp_path / "bad.npz")
    save_state(state, np.zeros((5, 3)), np.zeros(3), np.zeros(3), False)
    with pytest.raises(ValueError, match="restart state"):
        pca(root, 3, state_in=state)


def test_cli_state_flags(small_plink, tmp_path, monkeypatch):
    from flashpca_tpu.cli import main

    root, _ = small_plink
    monkeypatch.chdir(tmp_path)
    state = str(tmp_path / "cli_state.npz")
    assert main(["--bfile", root, "--ndim", "2", "--outstate", state,
                 "--checkpoint-every", "1"]) == 0
    assert bool(load_state(state)["converged"])
    assert main(["--bfile", root, "--ndim", "2", "--instate", state]) == 0


def _slow_problem(rng, n=300, p=250):
    """A multi-restart PCA problem (clustered random-genotype spectrum:
    ~40 thick restarts at k=8, tol=1e-10 in f64)."""
    return rng.binomial(
        2, rng.uniform(0.1, 0.5, p)[None, :], size=(n, p)).astype(float)


def test_mid_run_checkpoints_fire_and_resume(rng, tmp_path):
    """checkpoint_every: the solver hands out the current Ritz panel
    after every R-th restart (mid-run fault tolerance -- survives
    process death, unlike the end-of-solve state write), and a state
    saved from an EARLY mid-run snapshot warm-starts a resume."""
    import jax.numpy as jnp

    from flashpca_tpu.ops.operator import DenseOperator
    from flashpca_tpu.ops.standardize import standardize
    from flashpca_tpu.solvers.block_lanczos import eigsh_block
    from flashpca_tpu.solvers.lanczos import save_state

    X_std, _, _ = standardize(_slow_problem(rng), "binom2")
    op = DenseOperator(X_std, dtype=jnp.float64)
    n = op.n_samples
    mv, ops_ = op.gram_pure()

    snaps = []

    def capture(panel, values, residuals):
        snaps.append((np.asarray(panel), values, residuals))

    cold = eigsh_block(mv, n, 8, maxiter=500, tol=1e-10,
                       dtype=jnp.float64, seed=1, operands=ops_,
                       checkpoint_every=2, checkpoint_fn=capture)
    assert cold.converged
    assert len(snaps) >= 2        # fired during the run, every 2nd restart
    panel0, values0, resid0 = snaps[0]
    assert panel0.shape[0] == n and 8 <= panel0.shape[1] <= 16
    # vectors/values/residuals pair 1:1 (self-consistent state file)
    assert panel0.shape[1] == len(values0) == len(resid0)
    assert np.all(np.diff(values0) <= 1e-9)   # descending Ritz values

    # resume from the FIRST (least-converged) snapshot: strictly fewer
    # restarts than cold, identical eigenpairs
    state = str(tmp_path / "mid.npz")
    save_state(state, panel0, values0, np.full(len(values0), np.inf),
               False)
    st = load_state(state)
    warm = eigsh_block(mv, n, 8, maxiter=500, tol=1e-10,
                       dtype=jnp.float64, seed=1, operands=ops_,
                       v0=st["vectors"])
    assert warm.converged
    assert warm.n_restarts < cold.n_restarts
    np.testing.assert_allclose(warm.eigenvalues, cold.eigenvalues,
                               rtol=1e-9)


def test_pca_checkpoint_every_writes_during_solve(rng, tmp_path,
                                                  monkeypatch):
    """pca(checkpoint_every=R) persists state mid-solve via save_state:
    intermediate writes carry converged=False before the final write."""
    import jax.numpy as jnp

    import flashpca_tpu.solvers.lanczos as lz
    from flashpca_tpu.models.pca import pca

    calls = []
    orig = lz.save_state

    def spy(path, vectors, values, residuals, converged):
        calls.append((np.asarray(vectors).shape, bool(converged)))
        return orig(path, vectors, values, residuals, converged)

    monkeypatch.setattr(lz, "save_state", spy)
    state = str(tmp_path / "during.npz")
    res = pca(_slow_problem(rng), 8, tol=1e-10, dtype=jnp.float64,
              state_out=state, checkpoint_every=3)
    assert res.converged
    assert len(calls) >= 3               # >= 2 mid-run + 1 final
    assert all(not c for _, c in calls[:-1])
    assert calls[-1][1] and calls[-1][0][1] == 8
    assert bool(load_state(state)["converged"])   # final write wins


def test_negative_checkpoint_every_raises(small_plink, tmp_path):
    """A negative interval is almost certainly a typo for a positive
    one; silently disabling checkpointing would betray the fault
    tolerance the caller asked for (review r2)."""
    root, _ = small_plink
    with pytest.raises(ValueError, match="positive"):
        pca(root, 2, checkpoint_every=-5,
            state_out=str(tmp_path / "s.npz"))


def test_cli_checkpoint_every_pca_only(small_plink, tmp_path, monkeypatch):
    """--checkpoint-every outside PCA mode must be rejected, not
    silently dropped (only pca() takes mid-run checkpoints)."""
    from flashpca_tpu.cli import main

    root, _ = small_plink
    monkeypatch.chdir(tmp_path)
    np.savetxt(tmp_path / "pheno.txt",
               np.column_stack([
                   np.arange(21) + 1, np.arange(21) + 1,
                   np.random.default_rng(0).normal(size=(21, 2)),
               ]), fmt="%s")
    state = str(tmp_path / "s.npz")
    # SCCA mode: rejected
    assert main(["--scca", "--bfile", root, "--pheno", "pheno.txt",
                 "--ndim", "1", "--outstate", state, "--notime",
                 "--checkpoint-every", "2"]) == 1
    # negative interval: rejected
    assert main(["--bfile", root, "--ndim", "2", "--outstate", state,
                 "--notime", "--checkpoint-every", "-2"]) == 1
    # without --outstate: rejected
    assert main(["--bfile", root, "--ndim", "2", "--notime",
                 "--checkpoint-every", "2"]) == 1


def test_scalar_fallback_warns_checkpoints_off(rng):
    """The small-problem scalar fallback takes no mid-run checkpoints;
    a caller who requested them must get a RuntimeWarning, not silent
    loss of the promised fault tolerance (review r2)."""
    import warnings

    from flashpca_tpu.solvers.block_lanczos import eigsh_block

    n = 12
    A = rng.normal(size=(n, n))
    A = A @ A.T
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        res = eigsh_block(lambda Q: A @ Q, n, 2, block=8, tol=1e-8,
                          dtype=np.float64, checkpoint_every=1,
                          checkpoint_fn=lambda *a: None)
    assert any("checkpoint" in str(x.message) for x in w)
    assert res.converged


def test_mesh_streaming_resume_from_unsharded_state(small_plink, tmp_path):
    """Topology-changed restart: a Ritz panel checkpointed by a plain
    single-device run warm-starts a SNP-sharded bounded-memory run (the
    reverse of test_mesh_modes' mesh->unsharded resume, composed with
    streaming) -- after an outage the replacement fleet need not match
    the shape of the run that wrote the checkpoint."""
    import jax
    from jax.sharding import Mesh

    root, _ = small_plink
    state = str(tmp_path / "ritz.npz")
    with pytest.raises(RuntimeError, match="not successful"):
        pca(root, 3, tol=1e-12, maxiter=1, state_out=state)
    assert not bool(load_state(state)["converged"])

    mesh = Mesh(np.array(jax.devices("cpu")[:4]), ("snps",))
    warm = pca(root, 3, tol=1e-9, streaming=True, memory_mb=1,
               mesh=mesh, state_in=state)
    ref = pca(root, 3, tol=1e-9)                 # resident oracle
    np.testing.assert_allclose(warm.values, ref.values, rtol=1e-7)
    for j in range(3):
        c = abs(np.dot(np.asarray(warm.vectors[:, j]),
                       np.asarray(ref.vectors[:, j])))
        assert c > 1 - 1e-7


def test_streaming_checkpoint_resume_composition(small_plink, tmp_path):
    """Checkpoints compose with the streaming (bounded-memory)
    operator: an interrupted streaming run persists its Ritz panel and
    a streaming resume converges to the resident-path answer -- the
    fault-tolerance story a biobank --memory run actually needs."""
    root, _ = small_plink
    state = str(tmp_path / "stream_ritz.npz")

    with pytest.raises(RuntimeError, match="not successful"):
        pca(root, 3, tol=1e-12, maxiter=1, streaming=True, memory_mb=1,
            state_out=state)
    st = load_state(state)
    assert not bool(st["converged"])
    assert st["vectors"].shape[1] == 3

    warm = pca(root, 3, tol=1e-9, streaming=True, memory_mb=1,
               state_in=state)
    ref = pca(root, 3, tol=1e-9)                 # resident oracle
    np.testing.assert_allclose(warm.values, ref.values, rtol=1e-7)
    for j in range(3):
        c = abs(np.dot(warm.vectors[:, j], ref.vectors[:, j]))
        assert c > 1 - 1e-7
