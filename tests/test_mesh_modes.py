"""Mesh (SNP-sharded) coverage for SCCA/UCCA/check/project.

All four accept ``mesh=``; these tests pin shard-invariance of the full
model outputs on the virtual 8-device CPU mesh (VERDICT r1: the
parameter was forwarded but never tested end-to-end).
"""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from flashpca_tpu.models.check import check
from flashpca_tpu.models.pca import pca
from flashpca_tpu.models.project import project
from flashpca_tpu.models.scca import scca
from flashpca_tpu.models.ucca import ucca


@pytest.fixture(scope="module")
def mesh4():
    return Mesh(np.array(jax.devices("cpu")[:4]), ("snps",))


@pytest.fixture(scope="module")
def pheno(small_plink):
    root, geno = small_plink
    rng = np.random.default_rng(23)
    Y = rng.normal(size=(geno.shape[0], 3))
    Y[:, 0] += 0.5 * np.nan_to_num(geno[:, :2]).sum(axis=1)
    return Y


def test_scca_sharded_matches(small_plink, pheno, mesh4):
    root, _ = small_plink
    rng = np.random.default_rng(4)
    V0 = rng.normal(size=(pheno.shape[1], 2))
    kw = dict(ndim=2, maxiter=1000, tol=1e-9, V0=V0)
    res_1 = scca(root, pheno, 1e-3, 1e-3, **kw)
    res_m = scca(root, pheno, 1e-3, 1e-3, mesh=mesh4, **kw)
    assert res_m.converged == res_1.converged
    np.testing.assert_allclose(res_m.d, res_1.d, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(res_m.U, res_1.U, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(res_m.V, res_1.V, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(res_m.Px, res_1.Px, rtol=1e-7, atol=1e-9)


def test_ucca_sharded_matches(small_plink, pheno, mesh4):
    root, _ = small_plink
    res_1 = ucca(root, pheno)
    res_m = ucca(root, pheno, mesh=mesh4)
    np.testing.assert_allclose(res_m.result, res_1.result,
                               rtol=1e-9, atol=1e-12)


def test_check_sharded_matches(small_plink, mesh4):
    root, _ = small_plink
    res = pca(root, 3, tol=1e-9)
    chk_1 = check(root, res.vectors, res.values)
    chk_m = check(root, res.vectors, res.values, mesh=mesh4)
    np.testing.assert_allclose(chk_m.err, chk_1.err, rtol=1e-8, atol=1e-14)
    assert chk_m.mse < 1e-10


def test_project_sharded_matches(small_plink, mesh4):
    root, _ = small_plink
    res = pca(root, 3, tol=1e-9, do_loadings=True)
    ms = np.column_stack([res.center, res.scale])
    pr_1 = project(root, res.loadings, meansd=ms)
    pr_m = project(root, res.loadings, meansd=ms, mesh=mesh4)
    np.testing.assert_allclose(pr_m.projection, pr_1.projection,
                               rtol=1e-9, atol=1e-12)


def test_pca_mid_run_checkpoint_sharded(mesh4, tmp_path, monkeypatch):
    """checkpoint_every under a mesh: the Ritz panel is replicated
    (psum'd outputs), so the per-checkpoint fetch + unpermute + atomic
    write must work on sharded operators, and the saved state resumes
    shard-invariantly.  (Needs a problem big enough for the BLOCK
    solver -- the small_plink fixture falls back to the scalar path,
    where mid-run checkpoints do not apply.)"""
    import flashpca_tpu.solvers.lanczos as lz
    from flashpca_tpu.io.plink import write_bed
    from flashpca_tpu.solvers.lanczos import load_state

    rng = np.random.default_rng(31)
    # clustered Marchenko-Pastur-ish spectrum: takes several thick
    # restarts at tol=1e-10, so mid-run checkpoints actually fire
    geno = rng.binomial(2, rng.uniform(0.1, 0.5, 152)[None, :],
                        size=(300, 152)).astype(np.float64)
    root = str(tmp_path / "big")
    write_bed(root, geno)

    writes = []
    orig = lz.save_state
    monkeypatch.setattr(
        lz, "save_state",
        lambda *a: (writes.append(bool(a[4])), orig(*a))[1])

    state = str(tmp_path / "mesh_state.npz")
    res = pca(root, 3, tol=1e-10, mesh=mesh4, state_out=state,
              checkpoint_every=1)
    assert len(writes) >= 2 and not writes[0]   # mid-run writes fired
    st = load_state(state)
    assert bool(st["converged"])      # final write wins
    warm = pca(root, 3, tol=1e-10, state_in=state)   # resume UNsharded
    np.testing.assert_allclose(warm.values, res.values, rtol=1e-8)


def test_scca_mesh_resume_from_unsharded_state(small_plink, pheno, mesh4,
                                               tmp_path):
    """Topology-changed SCCA restart: per-dimension checkpoints written
    by an UNsharded run resume onto a SNP-sharded mesh.  The deflation
    state is topology-free (completed U/V columns plus V0), so the
    replacement fleet need not match the run that wrote it."""
    import sys

    scca_mod = sys.modules["flashpca_tpu.models.scca"]
    from flashpca_tpu.models.scca import save_scca_state

    root, _ = small_plink
    rng = np.random.default_rng(7)
    V0 = rng.normal(size=(pheno.shape[1], 2))
    kw = dict(ndim=2, maxiter=1000, tol=1e-9, V0=V0)
    state = str(tmp_path / "scca_unsharded.npz")

    # capture the checkpoint written after each completed dimension
    snaps = []
    orig = save_scca_state

    def spy(path, U, V, d, next_dim, V0_, l1, l2, **ident):
        snaps.append(int(next_dim))
        orig(str(tmp_path / f"snap{next_dim}.npz"),
             U, V, d, next_dim, V0_, l1, l2, **ident)
        return orig(path, U, V, d, next_dim, V0_, l1, l2, **ident)

    scca_mod.save_scca_state, saved = spy, scca_mod.save_scca_state
    try:
        full = scca(root, pheno, 1e-3, 1e-3, state_out=state, **kw)
    finally:
        scca_mod.save_scca_state = saved
    assert full.converged and snaps == [1, 2]

    # resume dim 1 from the post-dim-0 snapshot, now SNP-sharded
    resumed = scca(root, pheno, 1e-3, 1e-3, mesh=mesh4,
                   state_in=str(tmp_path / "snap1.npz"), **kw)
    assert resumed.converged
    np.testing.assert_allclose(resumed.d, full.d, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(resumed.U, full.U, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(resumed.V, full.V, rtol=1e-7, atol=1e-9)


def test_mesh_pallas_products_all_operators(small_plink, mesh4):
    """mesh x Pallas-kernel products (the flagship multi-chip TPU
    configuration, exercised here via interpret mode): the plain-path
    shard_maps need check_vma=False exactly like the ff paths -- a
    pallas_call inside shard_map trips the vma check, and the mesh
    suite otherwise runs the jnp (f64) paths only.  Regression for a
    trace-time ValueError on every product of all three Pallas-capable
    operator classes."""
    import jax.numpy as jnp

    from flashpca_tpu.io.plink import PlinkDataset
    from flashpca_tpu.ops import dense_standardized_np
    from flashpca_tpu.ops.operator import (PackedOperator,
                                           StreamingPackedOperator,
                                           TallPackedOperator)

    root, _ = small_plink
    ds = PlinkDataset.open(root)
    mean, sd = ds.snp_stats("binom2")
    X = dense_standardized_np(ds.read_codes(), mean, sd).T
    rng = np.random.default_rng(3)
    x = rng.standard_normal((ds.n_samples, 2))
    v = rng.standard_normal((ds.n_snps, 2))
    tol = dict(rtol=2e-4, atol=2e-4)   # f32 + interpret-mode kernels

    op = PackedOperator(ds.read_packed(), mean, sd, ds.n_samples,
                        mesh=mesh4, use_pallas="interpret",
                        dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(op.perform_op(x)),
                               X @ (X.T @ x), **tol)
    np.testing.assert_allclose(np.asarray(op.crossprod(x)), X.T @ x, **tol)
    np.testing.assert_allclose(np.asarray(op.prod(v)), X @ v, **tol)
    np.testing.assert_allclose(op.snp_sumsq, (X ** 2).sum(axis=0),
                               rtol=1e-3)

    mesh_s = Mesh(np.array(jax.devices("cpu")[:4]), ("samples",))
    top = TallPackedOperator(ds.read_packed(), mean, sd, ds.n_samples,
                             mesh=mesh_s, use_pallas="interpret",
                             dtype=jnp.float32)
    u = top.unpermute(top.gram_permuted(top.permute(
        jnp.asarray(v, top.dtype))))
    np.testing.assert_allclose(np.asarray(u), X.T @ (X @ v), **tol)
    np.testing.assert_allclose(np.asarray(top.prod(v)), X @ v, **tol)

    sop = StreamingPackedOperator(ds, mean, sd, ds.n_samples,
                                  block_snps=16, mesh=mesh4,
                                  use_pallas="interpret",
                                  dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(sop.perform_op(x)),
                               X @ (X.T @ x), **tol)
    np.testing.assert_allclose(np.asarray(sop.crossprod(x)), X.T @ x, **tol)
    np.testing.assert_allclose(np.asarray(sop.prod(v)), X @ v, **tol)
