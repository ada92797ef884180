"""Batched penalty-grid SCCA (scca_grid) vs per-cell solo runs.

The grid engine must reproduce scca(engine='device') cell for cell:
same U/V/d, same converged flags, including cells that zero-abort at
dimension 0 (penalty too large, randompca.cpp:280-287) or die from
non-convergence mid-grid -- the alive-masking must freeze exactly the
cells a solo run would have stopped.
"""

import numpy as np
import pytest

from flashpca_tpu.models.scca import (make_gaussian, scca, scca_grid,
                                      SCCAGridResult)


@pytest.fixture(scope="module")
def xy():
    rng = np.random.default_rng(777)
    n, p, k = 90, 50, 5
    X = rng.binomial(2, 0.35, size=(n, p)).astype(np.float64)
    Y = rng.normal(size=(n, k))
    Y[:, 0] += 0.5 * X[:, :4].sum(axis=1)
    Y[:, 1] -= 0.3 * X[:, 10:14].sum(axis=1)
    return X, Y


def _solo_cells(X, Y, lam1_c, lam2_c, V0, **kw):
    return [scca(X, Y, float(l1), float(l2), V0=V0, **kw)
            for l1, l2 in zip(lam1_c, lam2_c)]


def _assert_grid_matches_solo(g: SCCAGridResult, solos, atol=1e-10):
    for c, s in enumerate(solos):
        assert bool(g.converged[c]) == s.converged, f"cell {c}"
        np.testing.assert_allclose(g.U[:, :, c], s.U, atol=atol,
                                   err_msg=f"cell {c} U")
        np.testing.assert_allclose(g.V[:, :, c], s.V, atol=atol,
                                   err_msg=f"cell {c} V")
        np.testing.assert_allclose(g.d[:, c], s.d, atol=atol,
                                   err_msg=f"cell {c} d")


def test_grid_matches_solo_runs(xy):
    X, Y = xy
    ndim = 3
    V0 = make_gaussian(Y.shape[1], ndim, 7)
    l1_axis = np.array([1e-6, 2e-2])
    l2_axis = np.array([1e-6, 1e-2, 5e-2])
    kw = dict(ndim=ndim, maxiter=1000, tol=1e-9)
    g = scca_grid(X, Y, l1_axis, l2_axis, V0=V0, **kw)
    assert g.U.shape == (X.shape[1], ndim, 6)
    # row-major cell layout over the cross-product
    np.testing.assert_allclose(g.lambda1, np.repeat(l1_axis, 3))
    np.testing.assert_allclose(g.lambda2, np.tile(l2_axis, 2))
    solos = _solo_cells(X, Y, g.lambda1, g.lambda2, V0, **kw)
    assert all(s.converged for s in solos)
    _assert_grid_matches_solo(g, solos)


def test_grid_zero_abort_cell_matches_solo(xy):
    """A cell whose penalty zeroes U at dim 0 dies exactly like the solo
    run (converged=False, later dimensions untouched) without
    disturbing its neighbours."""
    X, Y = xy
    ndim = 2
    V0 = make_gaussian(Y.shape[1], ndim, 3)
    # lambda1=0.9 soft-thresholds every |u_i| <= 0.9 after unit
    # normalization -> all-zero U at dim 0 -> abort
    lam1 = np.array([1e-6, 0.9])
    lam2 = np.array([1e-6])
    kw = dict(ndim=ndim, maxiter=500, tol=1e-8)
    g = scca_grid(X, Y, lam1, lam2, V0=V0, **kw)
    solos = _solo_cells(X, Y, g.lambda1, g.lambda2, V0, **kw)
    assert solos[0].converged and not solos[1].converged
    _assert_grid_matches_solo(g, solos)
    # the dead cell never ran dim 1
    assert np.all(g.U[:, 1, 1] == 0.0) and np.all(g.n_iters[1:, 1] == 0)


def test_grid_nonconverged_cell_matches_solo(xy):
    """maxiter too small for some cells: they record the last iterate
    and die, matching solo semantics."""
    X, Y = xy
    ndim = 2
    V0 = make_gaussian(Y.shape[1], ndim, 11)
    lam1 = np.array([1e-6, 5e-3])
    lam2 = np.array([1e-6, 5e-3])
    kw = dict(ndim=ndim, maxiter=3, tol=1e-12)
    g = scca_grid(X, Y, lam1, lam2, V0=V0, **kw)
    solos = _solo_cells(X, Y, g.lambda1, g.lambda2, V0, **kw)
    assert not any(s.converged for s in solos)  # tol=1e-12, 3 iters
    _assert_grid_matches_solo(g, solos)


def test_grid_pairs_mode(xy):
    X, Y = xy
    ndim = 2
    V0 = make_gaussian(Y.shape[1], ndim, 5)
    lam1 = np.array([1e-6, 1e-3, 1e-2])
    lam2 = np.array([1e-5, 1e-4, 1e-3])
    kw = dict(ndim=ndim, maxiter=1000, tol=1e-9)
    g = scca_grid(X, Y, lam1, lam2, pairs=True, V0=V0, **kw)
    assert len(g.lambda1) == 3
    solos = _solo_cells(X, Y, lam1, lam2, V0, **kw)
    _assert_grid_matches_solo(g, solos)
    with pytest.raises(ValueError, match="equal length"):
        scca_grid(X, Y, lam1, lam2[:2], pairs=True, V0=V0, **kw)


def test_grid_on_plink_packed(small_plink, rng):
    """Grid over the 2-bit packed operator (with missing genotypes and
    a constant column) matches solo packed runs."""
    root, geno = small_plink
    n = geno.shape[0]
    Y = rng.normal(size=(n, 4))
    ndim = 2
    V0 = rng.normal(size=(4, ndim))
    kw = dict(ndim=ndim, maxiter=1000, tol=1e-9)
    lam1 = np.array([1e-6, 1e-2])
    lam2 = np.array([1e-6])
    g = scca_grid(root, Y, lam1, lam2, V0=V0, **kw)
    solos = _solo_cells(root, Y, g.lambda1, g.lambda2, V0, **kw)
    _assert_grid_matches_solo(g, solos)


def test_grid_sharded_matches_unsharded(small_plink, rng):
    """Grid over a SNP-sharded mesh == single-device grid."""
    import jax
    from jax.sharding import Mesh

    root, geno = small_plink
    n = geno.shape[0]
    Y = rng.normal(size=(n, 3))
    ndim = 2
    V0 = rng.normal(size=(3, ndim))
    kw = dict(ndim=ndim, maxiter=1000, tol=1e-9)
    mesh = Mesh(np.array(jax.devices("cpu")[:4]), ("snps",))
    g1 = scca_grid(root, Y, [1e-6, 1e-3], [1e-6], V0=V0, **kw)
    g2 = scca_grid(root, Y, [1e-6, 1e-3], [1e-6], V0=V0, mesh=mesh, **kw)
    np.testing.assert_allclose(g1.U, g2.U, atol=1e-9)
    np.testing.assert_allclose(g1.V, g2.V, atol=1e-9)
    np.testing.assert_allclose(g1.d, g2.d, atol=1e-9)
    np.testing.assert_array_equal(g1.converged, g2.converged)


def test_grid_on_streaming_operator_matches_solo(small_plink, rng):
    """A streaming operator rides scca_grid's host-batched engine: the
    per-cell results match sequential solo streaming runs, and all
    cells SHARE each staged pass (the host->device upload is
    panel-width independent) instead of re-streaming the data once per
    cell -- the bounded-memory (--memory) analog of the device grid
    engine's shared-pass win."""
    from flashpca_tpu.io import PlinkDataset
    from flashpca_tpu.ops.operator import StreamingPackedOperator

    root, geno = small_plink
    ds = PlinkDataset.open(root)
    mean, sd = ds.snp_stats("binom2")
    n = geno.shape[0]
    Y = rng.normal(size=(n, 3))
    Y[:, 0] += 0.5 * np.nan_to_num(geno[:, :3]).sum(axis=1)
    ndim = 2
    V0 = rng.normal(size=(3, ndim))
    kw = dict(ndim=ndim, maxiter=1000, tol=1e-9)

    import jax.numpy as jnp

    op = StreamingPackedOperator(ds, mean, sd, n, block_snps=16,
                                 cache_mb=0, dtype=jnp.float64)
    g = scca_grid(op, Y, [1e-6, 1e-2], [1e-6, 1e-3], V0=V0, **kw)
    grid_ops = op.nops

    # sequential per-cell runs on a fresh streaming operator
    op2 = StreamingPackedOperator(ds, mean, sd, n, block_snps=16,
                                  cache_mb=0, dtype=jnp.float64)
    solo_ops = 0
    solos = []
    for l1, l2 in zip(g.lambda1, g.lambda2):
        before = op2.nops
        solos.append(scca(op2, Y, float(l1), float(l2), V0=V0, **kw))
        solo_ops += op2.nops - before
    _assert_grid_matches_solo(g, solos, atol=1e-8)
    # shared passes: the grid pays ~max-over-cells iterations of
    # products, the sequential loop pays the sum
    assert grid_ops < solo_ops


def test_grid_streaming_memory_mb_kwarg(small_plink, rng):
    """scca_grid(root, streaming=True, memory_mb=) builds the bounded
    operator itself and matches the resident grid."""
    root, geno = small_plink
    n = geno.shape[0]
    Y = rng.normal(size=(n, 3))
    ndim = 2
    V0 = rng.normal(size=(3, ndim))
    kw = dict(ndim=ndim, maxiter=1000, tol=1e-9)
    g_r = scca_grid(root, Y, [1e-6, 1e-3], [1e-6], V0=V0, **kw)
    g_s = scca_grid(root, Y, [1e-6, 1e-3], [1e-6], V0=V0,
                    streaming=True, memory_mb=1, **kw)
    np.testing.assert_allclose(g_s.U, g_r.U, atol=1e-8)
    np.testing.assert_allclose(g_s.V, g_r.V, atol=1e-8)
    np.testing.assert_allclose(g_s.d, g_r.d, atol=1e-8)
    np.testing.assert_array_equal(g_s.converged, g_r.converged)


def test_grid_v0_validation(xy):
    X, Y = xy
    with pytest.raises(ValueError, match="V0 must be"):
        scca_grid(X, Y, [1e-6], [1e-6], ndim=2,
                  V0=np.zeros((Y.shape[1], 5)))


def test_split_scca_grid_path_matches_sequential(small_plink, tmp_path, rng):
    """split_scca's batched-grid fast path reproduces the sequential
    per-cell loop (forced via engine='host') on the same split."""
    from flashpca_tpu.models.scca_split import split_scca

    root, geno = small_plink
    n = geno.shape[0]
    Y = rng.normal(size=(n, 3))
    Y[:, 0] += 0.7 * np.nan_to_num(geno[:, :4]).sum(axis=1)
    kw = dict(lambda1=[1e-3, 5e-2], lambda2=[1e-4, 1e-2], ndim=2,
              prop_train=0.7, seed=3, maxiter=600, tol=1e-8)
    rg = split_scca(root, Y, workdir=str(tmp_path / "g"), **kw)
    rs = split_scca(root, Y, workdir=str(tmp_path / "s"),
                    engine="host", **kw)
    np.testing.assert_array_equal(rg.converged, rs.converged)
    np.testing.assert_allclose(rg.corr_train, rs.corr_train, atol=1e-8)
    np.testing.assert_allclose(rg.corr_test, rs.corr_test, atol=1e-8)
    np.testing.assert_array_equal(rg.nzero_x, rs.nzero_x)
    np.testing.assert_array_equal(rg.nzero_y, rs.nzero_y)
    assert rg.best_lambda1 == rs.best_lambda1
    assert rg.best_lambda2 == rs.best_lambda2


def test_cv_scca_grid_path_matches_sequential(xy):
    """cv_scca's batched-grid fast path == the sequential per-cell loop
    (forced via engine='host'): same pooled correlations, counts,
    convergence and selected penalties."""
    from flashpca_tpu.models.scca import cv_scca

    X, Y = xy
    kw = dict(lambda1=[1e-6, 2e-2], lambda2=[1e-6, 1e-2], ndim=2,
              nfolds=3, seed=4, maxiter=600, tol=1e-8)
    rg = cv_scca(X, Y, **kw)
    rs = cv_scca(X, Y, engine="host", **kw)
    np.testing.assert_array_equal(rg.converged, rs.converged)
    np.testing.assert_allclose(rg.corr, rs.corr, atol=1e-8)
    np.testing.assert_allclose(rg.nzero_x, rs.nzero_x, atol=1e-9)
    np.testing.assert_allclose(rg.nzero_y, rs.nzero_y, atol=1e-9)
    assert rg.best_lambda1 == rs.best_lambda1
    assert rg.best_lambda2 == rs.best_lambda2


def test_grid_auto_init_matches_solo_auto_init(xy):
    """auto_init seeds the grid with the near-zero-penalty run's V,
    exactly like scca(auto_init=True) at each cell (the shared-V0
    cv.scca convention)."""
    X, Y = xy
    ndim = 2
    kw = dict(ndim=ndim, maxiter=1000, tol=1e-9)
    g = scca_grid(X, Y, [1e-3], [1e-4], auto_init=True, seed=9, **kw)
    s = scca(X, Y, 1e-3, 1e-4, auto_init=True, seed=9, **kw)
    np.testing.assert_allclose(g.V0, s.V0, atol=1e-12)
    np.testing.assert_allclose(g.U[:, :, 0], s.U, atol=1e-10)
    np.testing.assert_allclose(g.d[:, 0], s.d, atol=1e-10)


def test_grid_fastpath_allowlist():
    """grid_fastpath is the ONE definition of grid-compatible scca()
    kwargs shared by cv_scca and split_scca (review r2: two hand-kept
    lists had already diverged): engine gate, caller extras, and the
    engine/streaming/memory_mb drop."""
    from flashpca_tpu.models.scca import grid_fastpath

    ok, gkw = grid_fastpath({"maxiter": 9, "engine": "auto",
                             "streaming": "auto", "memory_mb": 64})
    assert ok and gkw == {"maxiter": 9}

    # host engine and unknown kwargs both force the sequential fallback
    assert not grid_fastpath({"engine": "host"})[0]
    assert not grid_fastpath({"state_out": "x.npz"})[0]

    # caller extras compose on top of the shared core
    assert not grid_fastpath({"stand_x": "binom"})[0]
    ok, gkw = grid_fastpath({"stand_x": "binom"}, ("stand_x", "stand_y"))
    assert ok and gkw == {"stand_x": "binom"}
    ok, gkw = grid_fastpath({"V0": None, "engine": "device"}, ("V0",))
    assert ok and gkw == {"V0": None}


def test_split_scca_streaming_rides_grid(small_plink, tmp_path, rng):
    """split_scca with streaming=True now takes the batched grid path
    (host-driven engine) and matches the resident split."""
    from flashpca_tpu.models.scca_split import split_scca

    root, geno = small_plink
    n = geno.shape[0]
    Y = rng.normal(size=(n, 3))
    Y[:, 0] += 0.6 * np.nan_to_num(geno[:, :4]).sum(axis=1)
    kw = dict(lambda1=[1e-3, 2e-2], lambda2=[1e-4], ndim=2,
              prop_train=0.7, seed=3, maxiter=600, tol=1e-8)
    rr = split_scca(root, Y, workdir=str(tmp_path / "r"), **kw)
    rs = split_scca(root, Y, workdir=str(tmp_path / "s"),
                    streaming=True, memory_mb=1, **kw)
    np.testing.assert_array_equal(rs.converged, rr.converged)
    np.testing.assert_allclose(rs.corr_train, rr.corr_train, atol=1e-7)
    np.testing.assert_allclose(rs.corr_test, rr.corr_test, atol=1e-7)
    assert rs.best_lambda1 == rr.best_lambda1


def _streaming_op_f64(root):
    import jax.numpy as jnp

    from flashpca_tpu.io import PlinkDataset
    from flashpca_tpu.ops.operator import StreamingPackedOperator

    ds = PlinkDataset.open(root)
    mean, sd = ds.snp_stats("binom2")
    return StreamingPackedOperator(ds, mean, sd, ds.n_samples,
                                   block_snps=16, cache_mb=0,
                                   dtype=jnp.float64)


def test_host_grid_zero_abort_cell_matches_device_grid(small_plink, rng):
    """Host-batched engine: a cell whose penalty zeroes U at dim 0 dies
    exactly like the DEVICE grid engine (the grid contract; the
    sequential host solo aborts mid-iteration and leaves the dead
    cell's V at its init, an unobservable difference since dead cells
    are non-converged) without disturbing neighbours."""
    import jax.numpy as jnp

    root, geno = small_plink
    n = geno.shape[0]
    Y = rng.normal(size=(n, 3))
    ndim = 2
    V0 = rng.normal(size=(3, ndim))
    kw = dict(ndim=ndim, maxiter=500, tol=1e-8)
    op = _streaming_op_f64(root)
    g = scca_grid(op, Y, [1e-6, 0.9], [1e-6], V0=V0, **kw)
    g_dev = scca_grid(root, Y, [1e-6, 0.9], [1e-6], V0=V0,
                      dtype=jnp.float64, **kw)
    np.testing.assert_array_equal(g.converged, g_dev.converged)
    assert g.converged[0] and not g.converged[1]
    np.testing.assert_allclose(g.U, g_dev.U, atol=1e-8)
    np.testing.assert_allclose(g.V, g_dev.V, atol=1e-8)
    np.testing.assert_allclose(g.d, g_dev.d, atol=1e-8)
    # the dead cell never ran dim 1
    assert np.all(g.U[:, 1, 1] == 0.0) and np.all(g.n_iters[1:, 1] == 0)


def test_host_grid_nonconverged_cell_matches_solo(small_plink, rng):
    """Host-batched engine: maxiter-starved cells record the last
    iterate and die, matching solo streaming semantics."""
    root, geno = small_plink
    n = geno.shape[0]
    Y = rng.normal(size=(n, 3))
    ndim = 2
    V0 = rng.normal(size=(3, ndim))
    kw = dict(ndim=ndim, maxiter=2, tol=1e-12)
    op = _streaming_op_f64(root)
    g = scca_grid(op, Y, [1e-6, 5e-3], [1e-6], V0=V0, **kw)
    op2 = _streaming_op_f64(root)
    solos = [scca(op2, Y, float(l1), float(l2), V0=V0, **kw)
             for l1, l2 in zip(g.lambda1, g.lambda2)]
    assert not any(s.converged for s in solos)
    _assert_grid_matches_solo(g, solos, atol=1e-8)


def test_split_scca_sharded_matches_unsharded(small_plink, tmp_path, rng):
    """split_scca composes with a SNP mesh: the train/test repacked
    operators shard over the mesh and the grid results match the
    single-device split exactly."""
    import jax
    from jax.sharding import Mesh

    from flashpca_tpu.models.scca_split import split_scca

    root, geno = small_plink
    n = geno.shape[0]
    Y = rng.normal(size=(n, 3))
    Y[:, 0] += 0.5 * np.nan_to_num(geno[:, :4]).sum(axis=1)
    kw = dict(lambda1=[1e-3, 2e-2], lambda2=[1e-4], ndim=2,
              prop_train=0.7, seed=3, maxiter=600, tol=1e-8)
    mesh = Mesh(np.array(jax.devices("cpu")[:4]), ("snps",))
    r1 = split_scca(root, Y, workdir=str(tmp_path / "a"), **kw)
    r2 = split_scca(root, Y, workdir=str(tmp_path / "b"), mesh=mesh, **kw)
    np.testing.assert_array_equal(r1.converged, r2.converged)
    np.testing.assert_allclose(r1.corr_train, r2.corr_train, atol=1e-8)
    np.testing.assert_allclose(r1.corr_test, r2.corr_test, atol=1e-8)
    assert r1.best_lambda1 == r2.best_lambda1


def test_zero_abort_keeps_v_at_init_all_engines(xy):
    """A dim-0 u-zero abort keeps V[:, 0] at its INIT value: the
    reference aborts before the v step (randompca.cpp:280-287).  The
    solo host engine always did this; the device and host-grid engines
    ran one extra v step and stored zeros (review r4).  All three must
    agree."""
    from flashpca_tpu.models.scca import scca

    X, Y = xy
    ndim = 1
    V0 = make_gaussian(Y.shape[1], ndim, 3)
    kw = dict(ndim=ndim, maxiter=500, tol=1e-8, V0=V0)
    host = scca(X, Y, 0.9, 1e-6, engine="host", **kw)
    dev = scca(X, Y, 0.9, 1e-6, engine="device", **kw)
    g = scca_grid(X, Y, [0.9], [1e-6], **kw)
    assert not host.converged and not dev.converged
    assert not g.converged[0]
    # u zeroed everywhere; v frozen at the shared V0 column
    for U_got in (host.U, dev.U, g.U[:, :, 0]):
        np.testing.assert_allclose(np.abs(U_got).max(), 0.0, atol=1e-12)
    np.testing.assert_allclose(host.V[:, 0], V0[:, 0], atol=1e-7)
    np.testing.assert_allclose(dev.V[:, 0], V0[:, 0], atol=1e-7)
    np.testing.assert_allclose(g.V[:, 0, 0], V0[:, 0], atol=1e-7)
