"""Prebuilt-operator inputs must REJECT conflicting explicit kwargs.

A prebuilt operator fixes dtype/sharding/residency; before review r2
the analysis modes silently dropped a caller's explicit ``dtype=``/
``streaming=``/``mesh=`` when an operator was passed as the data
argument (e.g. ``ucca(op_f32, Y, dtype=jnp.float64)`` returned f32
results with no indication the accuracy knob was ignored).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from flashpca_tpu.io.plink import PlinkDataset
from flashpca_tpu.models.check import check
from flashpca_tpu.models.pca import pca
from flashpca_tpu.models.scca import scca
from flashpca_tpu.models.ucca import ucca
from flashpca_tpu.ops.operator import (PackedOperator,
                                       StreamingPackedOperator)


@pytest.fixture(scope="module")
def ops(small_plink):
    root, _ = small_plink
    ds = PlinkDataset.open(root)
    mean, sd = ds.snp_stats("binom2")
    resident = PackedOperator(ds.read_packed(), mean, sd, ds.n_samples,
                              dtype=jnp.float32)
    streaming = StreamingPackedOperator(ds, mean, sd, ds.n_samples,
                                        dtype=jnp.float32)
    return resident, streaming


@pytest.fixture(scope="module")
def pheno(small_plink):
    root, geno = small_plink
    rng = np.random.default_rng(3)
    return rng.normal(size=(geno.shape[0], 3))


def test_pca_rejects_dtype_conflict(ops):
    resident, _ = ops
    with pytest.raises(ValueError, match="dtype"):
        pca(resident, 2, dtype=jnp.float64)


def test_pca_rejects_forced_streaming_on_resident(ops):
    resident, _ = ops
    with pytest.raises(ValueError, match="streaming"):
        pca(resident, 2, streaming=True)


def test_pca_rejects_disabled_streaming_on_streaming_op(ops):
    _, streaming = ops
    with pytest.raises(ValueError, match="streaming"):
        pca(streaming, 2, streaming=False)


def test_pca_rejects_batch_on_operator(ops):
    resident, _ = ops
    with pytest.raises(ValueError, match="batch"):
        pca(resident, 2, batch=True)


def test_pca_rejects_mesh_conflict(ops):
    import jax
    from jax.sharding import Mesh

    resident, _ = ops
    mesh = Mesh(np.array(jax.devices()[:1]), ("snps",))
    with pytest.raises(ValueError, match="mesh"):
        pca(resident, 2, mesh=mesh)


def test_check_rejects_dtype_conflict(ops, small_plink):
    resident, _ = ops
    evec = np.zeros((resident.n_samples, 2))
    with pytest.raises(ValueError, match="dtype"):
        check(resident, evec, np.ones(2), dtype=jnp.float64)


def test_ucca_rejects_dtype_conflict(ops, pheno):
    resident, _ = ops
    with pytest.raises(ValueError, match="dtype"):
        ucca(resident, pheno, dtype=jnp.float64)


def test_scca_rejects_dtype_conflict(ops, pheno):
    resident, _ = ops
    rng = np.random.default_rng(5)
    V0 = rng.normal(size=(pheno.shape[1], 2))
    with pytest.raises(ValueError, match="dtype"):
        scca(resident, pheno, 1e-3, 1e-3, ndim=2, V0=V0,
             dtype=jnp.float64)


def test_matching_kwargs_still_accepted(ops):
    """Non-conflicting explicit kwargs (same dtype, auto streaming)
    keep working."""
    resident, _ = ops
    res = pca(resident, 2, dtype=jnp.float32, streaming="auto", tol=1e-6)
    assert res.values.shape == (2,)


def test_scca_matrix_rejects_streaming(rng):
    """Dense-matrix X has no streaming path: an explicit bounded-memory
    request must raise, not silently build a resident DenseOperator
    (review r3)."""
    from flashpca_tpu.models.scca import cv_scca, scca

    X = rng.normal(size=(40, 12))
    Y = rng.normal(size=(40, 3))
    with pytest.raises(ValueError, match="streaming"):
        scca(X, Y, 1e-3, 1e-3, ndim=2, stand_x="sd", streaming=True)
    with pytest.raises(ValueError, match="streaming"):
        scca(X, Y, 1e-3, 1e-3, ndim=2, stand_x="sd", memory_mb=64)
    with pytest.raises(ValueError, match="streaming"):
        cv_scca(X, Y, nfolds=2, ndim=2, stand_x="sd", streaming=True)
    with pytest.raises(ValueError, match="streaming"):
        cv_scca(X, Y, nfolds=2, ndim=2, stand_x="sd", memory_mb=64)


def test_prebuilt_rejects_memory_mb_and_block_size(ops):
    """memory_mb/block_size with a prebuilt operator previously vanished
    silently (review r4) -- residency and block geometry are fixed at
    construction, so the request must raise like dtype/mesh/streaming."""
    resident, streaming = ops
    for op in (resident, streaming):
        with pytest.raises(ValueError, match="memory_mb"):
            pca(op, 2, memory_mb=64)
        with pytest.raises(ValueError, match="block_size"):
            pca(op, 2, block_size=8)


def test_flashpca_alias_accepts_prebuilt_operator(ops):
    """The alias's R-default block_size=1000 must not reach the
    prebuilt-operator conflict check (review r4)."""
    from flashpca_tpu.models.pca import flashpca

    resident, _ = ops
    res = flashpca(resident, 2, tol=1e-6)
    assert res.values.shape == (2,)


def test_pca_matrix_rejects_packed_only_kwargs(rng):
    """The dense-matrix path raises on explicit packed-path /
    device-residency requests instead of dropping them (review r4)."""
    X = rng.binomial(2, 0.3, size=(30, 20)).astype(float)
    with pytest.raises(ValueError, match="streaming"):
        pca(X, 2, streaming=True)
    with pytest.raises(ValueError, match="memory_mb|streaming"):
        pca(X, 2, memory_mb=64)
    with pytest.raises(ValueError, match="tall"):
        pca(X, 2, operator_mode="tall")
    with pytest.raises(ValueError, match="device_results"):
        pca(X, 2, device_results=True)


def test_pca_rejects_operator_mode_conflict(ops, small_plink):
    """operator_mode must match the prebuilt operator's class."""
    import jax.numpy as jnp

    from flashpca_tpu.io.plink import PlinkDataset
    from flashpca_tpu.ops.operator import TallPackedOperator

    resident, _ = ops
    with pytest.raises(ValueError, match="operator_mode"):
        pca(resident, 2, operator_mode="tall")
    root, _ = small_plink
    ds = PlinkDataset.open(root)
    mean, sd = ds.snp_stats("binom2")
    tall = TallPackedOperator(ds.read_packed(), mean, sd, ds.n_samples,
                              dtype=jnp.float64)
    with pytest.raises(ValueError, match="operator_mode"):
        pca(tall, 2, operator_mode="wide")
    # matching modes pass through
    assert pca(resident, 2, operator_mode="wide").values.shape == (2,)
