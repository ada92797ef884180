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
    assert main(["--bfile", root, "--ndim", "2", "--outstate", state]) == 0
    assert bool(load_state(state)["converged"])
    assert main(["--bfile", root, "--ndim", "2", "--instate", state]) == 0
