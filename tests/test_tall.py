"""Tall-path operator (X^T X) vs wide path and dense oracle, including
sample-sharded mesh invariance on the virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from flashpca_tpu.io.plink import PlinkDataset, write_bed
from flashpca_tpu.models.pca import pca
from flashpca_tpu.ops import dense_standardized_np
from flashpca_tpu.ops.operator import TallPackedOperator


@pytest.fixture(scope="module")
def tall_plink(tmp_path_factory):
    rng = np.random.default_rng(5)
    n, p = 403, 23  # n >> p
    geno = rng.binomial(
        2, rng.uniform(0.1, 0.5, p)[None, :], size=(n, p)).astype(np.float64)
    geno[rng.uniform(size=(n, p)) < 0.03] = np.nan
    root = str(tmp_path_factory.mktemp("tall") / "tall")
    write_bed(root, geno)
    return root


def test_tall_gram_matches_dense(tall_plink):
    ds = PlinkDataset.open(tall_plink)
    mean, sd = ds.snp_stats("binom2")
    X = dense_standardized_np(ds.read_codes(), mean, sd).T  # (N, p)
    op = TallPackedOperator(ds.read_packed(), mean, sd, ds.n_samples,
                            dtype=jnp.float64)
    rng = np.random.default_rng(0)
    v = rng.standard_normal((ds.n_snps, 2))
    got = np.asarray(op.unpermute(op.gram_permuted(op.permute(
        jnp.asarray(v, op.dtype)))))
    ref = X.T @ (X @ v)
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-9)
    # prod
    y = np.asarray(op.prod(v))
    np.testing.assert_allclose(y, X @ v, rtol=1e-9, atol=1e-9)
    # trace
    np.testing.assert_allclose(op.trace, (X ** 2).sum(), rtol=1e-10)


def test_tall_pca_matches_wide(tall_plink):
    res_w = pca(tall_plink, 4, tol=1e-9, do_loadings=True,
                operator_mode="wide")
    res_t = pca(tall_plink, 4, tol=1e-9, do_loadings=True,
                operator_mode="tall")
    np.testing.assert_allclose(res_t.values, res_w.values, rtol=1e-7)
    np.testing.assert_allclose(res_t.pve, res_w.pve, rtol=1e-7)
    for j in range(4):
        c = abs(np.dot(res_t.vectors[:, j], res_w.vectors[:, j]))
        assert c > 1 - 1e-7, f"vector {j} corr {c}"
        cl = abs(np.dot(res_t.loadings[:, j], res_w.loadings[:, j])) / (
            np.linalg.norm(res_t.loadings[:, j])
            * np.linalg.norm(res_w.loadings[:, j]))
        assert cl > 1 - 1e-7, f"loading {j} corr {cl}"


def test_tall_auto_selected(tall_plink):
    # auto picks tall when n > 2p; results must match dense oracle
    ds = PlinkDataset.open(tall_plink)
    mean, sd = ds.snp_stats("binom2")
    X = dense_standardized_np(ds.read_codes(), mean, sd).T
    w = np.linalg.eigvalsh(X @ X.T / ds.n_snps)[::-1][:4]
    res = pca(tall_plink, 4, tol=1e-9)
    np.testing.assert_allclose(res.values, w, rtol=1e-8)


def test_tall_shard_invariance(tall_plink):
    ds = PlinkDataset.open(tall_plink)
    mean, sd = ds.snp_stats("binom2")
    ref = None
    rng = np.random.default_rng(1)
    v = rng.standard_normal((ds.n_snps, 3))
    for nsh in (1, 2, 4, 8):
        mesh = Mesh(np.array(jax.devices("cpu")[:nsh]), ("samples",))
        op = TallPackedOperator(ds.read_packed(), mean, sd, ds.n_samples,
                                mesh=mesh, dtype=jnp.float64)
        got = np.asarray(op.unpermute(op.gram_permuted(op.permute(
            jnp.asarray(v, op.dtype)))))
        y = np.asarray(op.prod(v))
        t = op.trace
        if ref is None:
            ref = (got, y, t)
        else:
            np.testing.assert_allclose(got, ref[0], rtol=1e-9, atol=1e-9)
            np.testing.assert_allclose(y, ref[1], rtol=1e-9, atol=1e-9)
            np.testing.assert_allclose(t, ref[2], rtol=1e-10)


def test_tall_pallas_interpret_matches(tall_plink):
    """Tall operator with interpreted Pallas kernels == jnp path
    (regression: p_pad must be a 256-multiple or the kernel grid is
    empty and outputs are uninitialized NaNs)."""
    ds = PlinkDataset.open(tall_plink)
    mean, sd = ds.snp_stats("binom2")
    X = dense_standardized_np(ds.read_codes(), mean, sd).T
    op = TallPackedOperator(ds.read_packed(), mean, sd, ds.n_samples,
                            dtype=jnp.float32, use_pallas="interpret")
    assert op.p_pad % 256 == 0
    rng = np.random.default_rng(7)
    v = rng.standard_normal((ds.n_snps, 2))
    got = np.asarray(op.unpermute(op.gram_permuted(op.permute(
        jnp.asarray(v, jnp.float32)))))
    ref = X.T @ (X @ v)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-3)
    y = np.asarray(op.prod(v))
    np.testing.assert_allclose(y, X @ v, rtol=1e-4, atol=1e-3)


def test_tall_sharded_via_pca_with_snps_mesh(tall_plink):
    """pca() must accept a user mesh whose axis is named 'snps' (the CLI
    default) on the tall path -- the tall operator shards the byte axis
    under whatever 1-D axis name the mesh carries (ADVICE r1 high)."""
    mesh = Mesh(np.array(jax.devices("cpu")[:4]), ("snps",))
    res_s = pca(tall_plink, 3, tol=1e-9, operator_mode="tall", mesh=mesh)
    res_r = pca(tall_plink, 3, tol=1e-9, operator_mode="tall")
    np.testing.assert_allclose(res_s.values, res_r.values, rtol=1e-8)
    for j in range(3):
        c = abs(np.dot(res_s.vectors[:, j], res_r.vectors[:, j]))
        assert c > 1 - 1e-8


def test_tall_device_results(tall_plink):
    import jax

    res_d = pca(tall_plink, 3, tol=1e-9, operator_mode="tall",
                do_loadings=True, device_results=True)
    res_h = pca(tall_plink, 3, tol=1e-9, operator_mode="tall",
                do_loadings=True)
    assert isinstance(res_d.vectors, jax.Array)
    assert isinstance(res_d.loadings, jax.Array)
    np.testing.assert_allclose(res_d.values, res_h.values, rtol=1e-10)
    np.testing.assert_allclose(np.abs(np.asarray(res_d.vectors)),
                               np.abs(res_h.vectors), atol=1e-8)


def test_tall_forced_with_streaming_conflicts(tall_plink):
    """operator_mode='tall' has no streaming variant: forcing both must
    be a visible error, not a silent HBM-resident upload."""
    with pytest.raises(ValueError, match="streaming"):
        pca(tall_plink, ndim=2, operator_mode="tall", streaming=True)


def test_tall_streaming_overrides_auto_tall(tall_plink, monkeypatch):
    """Explicit streaming=True on an n > 2p cohort must take the
    streaming wide path (bounded device memory), not auto-tall."""
    import importlib

    from flashpca_tpu.ops.operator import StreamingPackedOperator

    mpca = importlib.import_module("flashpca_tpu.models.pca")

    seen = {}
    orig = mpca._pca_operator

    def spy(op, *a, **kw):
        seen["op"] = op
        return orig(op, *a, **kw)

    monkeypatch.setattr(mpca, "_pca_operator", spy)
    res = pca(tall_plink, ndim=2, streaming=True)
    assert isinstance(seen["op"], StreamingPackedOperator)
    res2 = pca(tall_plink, ndim=2, streaming=False)
    np.testing.assert_allclose(res.values, res2.values, rtol=1e-8)


def test_tall_checkpoint_resume(tall_plink, tmp_path):
    """Checkpoint/resume on the tall path: the persisted Ritz panel
    lives in (unpermuted) SNP space (p-dim vectors, unlike the wide
    path's sample space), so this exercises TallPackedOperator's
    permute_np/unpermute round trip through a real interrupted solve."""
    import pytest

    from flashpca_tpu.models.pca import pca
    from flashpca_tpu.solvers.lanczos import load_state

    state = str(tmp_path / "tall_ritz.npz")
    with pytest.raises(RuntimeError, match="not successful"):
        pca(tall_plink, 3, tol=1e-13, maxiter=1, operator_mode="tall",
            state_out=state)
    st = load_state(state)
    assert not bool(st["converged"])
    ds = PlinkDataset.open(tall_plink)
    assert st["vectors"].shape[0] == ds.n_snps    # SNP space, unpadded

    warm = pca(tall_plink, 3, tol=1e-9, operator_mode="tall",
               state_in=state)
    ref = pca(tall_plink, 3, tol=1e-9, operator_mode="wide")
    np.testing.assert_allclose(warm.values, ref.values, rtol=1e-7)
    for j in range(3):
        c = abs(np.dot(warm.vectors[:, j], ref.vectors[:, j]))
        assert c > 1 - 1e-7
