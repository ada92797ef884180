"""Decomposition accuracy checking (--check mode).

Equivalent of ``RandomPCA::check`` (reference: randompca.cpp:627-743):
per-component squared error of ``(X X^T U)/div - U diag(d)``, plus
``mse = sum(err)/(N*K)`` and ``rmse = sqrt(mse)``.

The error reduction runs ON DEVICE and fetches only the (K,) per-
component sums -- never the (N, K) product matrix (device->host links
can be pathologically slow; see CLAUDE.md).  ``data`` may also be a
prebuilt operator and ``evec`` a device array (e.g. the output of
``pca(..., device_results=True)``), so a solve+check pipeline never
downloads anything big.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from ..io.plink import PlinkDataset
from ..ops.operator import (DenseOperator, PackedOperator,
                            StreamingPackedOperator, build_packed_operator,
                            check_operator_conflicts, default_dtype)
from ..ops.standardize import standardize


@dataclass
class CheckResult:
    err: np.ndarray  # (K,) per-component sum squared error
    mse: float
    rmse: float


from ._common import resolve_divisor as _div


def check(
    data,
    evec,
    eval_,
    *,
    stand: str | None = None,
    divisor: str = "p",
    block_size: int | None = None,
    dtype=None,
    mesh=None,
    streaming: bool | str = "auto",
    memory_mb: int | None = None,
    precision: str = "auto",
) -> CheckResult:
    """Check eigenvectors/eigenvalues against the data.

    ``data``: PLINK root / PlinkDataset, numeric (N, p) matrix, or a
    prebuilt Packed/Streaming/Dense operator.
    ``evec``: (N, K) eigenvectors U (numpy or device array).
    ``eval_``: (K,) eigenvalues d (already divided by div, as written
    in eigenvalues.txt).
    ``streaming`` bounds device memory (reference's online check,
    randompca.cpp:663-703); 'auto' streams when data exceeds HBM.

    ``precision``: 'auto' (default) measures an f32 operator's residual
    with the COMPENSATED two-float product (ops/compensated.py) -- the
    f64-grade measurement the reference's pipeline gets for free
    (randompca.cpp:684-697); without it, plain f32 accumulation noise
    (~1e3*eps at biobank contraction lengths) floors the reported mse
    near 1e-8 REGARDLESS of how good the eigenpairs are.  'f32' forces
    the plain measurement; 'compensated' requires the ff path.
    """
    if precision not in ("auto", "f32", "compensated"):
        raise ValueError(f"unknown precision: {precision!r}")
    eval_np = np.asarray(eval_, dtype=np.float64).reshape(-1)
    if not isinstance(evec, jax.Array):
        evec = np.asarray(evec, dtype=np.float64)
    if evec.ndim == 1:
        evec = evec[:, None]            # a single component is a column

    if isinstance(data, str):
        data = PlinkDataset.open(data)
    from ..ops.operator import TallPackedOperator, TallStreamingOperator

    if isinstance(data, (TallPackedOperator, TallStreamingOperator)):
        raise ValueError(
            "check() verifies the WIDE decomposition X X^T U = U d "
            "(randompca.cpp:663-703); a tall operator exposes X^T X -- "
            "pass the PLINK data (or a wide operator) instead"
        )
    if stand is not None and isinstance(
            data, (PackedOperator, StreamingPackedOperator, DenseOperator)):
        raise ValueError(
            "stand= was passed with a prebuilt operator, whose "
            "standardization is baked in; rebuild the operator with "
            "the desired stats"
        )
    stand = stand or "binom2"

    # one validation for dataset and prebuilt-operator inputs alike --
    # BEFORE the full-file stats pass / operator build, so a shape
    # mismatch fails in milliseconds, not after a biobank-scale scan
    n_expected = (data.n_samples
                  if isinstance(data, (PlinkDataset, PackedOperator,
                                       StreamingPackedOperator,
                                       DenseOperator)) else None)
    if n_expected is not None:
        if evec.shape[0] != n_expected:
            raise ValueError(
                "Eigenvector dimension doesn't match data dimension "
                f"(evec.rows = {evec.shape[0]}; N = {n_expected})"
            )
        if eval_np.shape[0] != evec.shape[1]:
            raise ValueError(
                "Eigenvector dimension doesn't match the number of eigenvalues"
            )
        _div(divisor, n_expected, data.n_snps)  # typo fails fast too

    op = None
    if isinstance(data, (PackedOperator, StreamingPackedOperator,
                         DenseOperator)):
        check_operator_conflicts(data, dtype=dtype, mesh=mesh,
                                 streaming=streaming,
                                 memory_mb=memory_mb,
                                 block_size=block_size)
        op = data
    elif isinstance(data, PlinkDataset):
        mean, sd = data.snp_stats(stand)
        dtype = dtype or default_dtype()
        op = build_packed_operator(
            data, mean, sd, streaming=streaming, memory_mb=memory_mb,
            block_size=block_size, dtype=dtype, mesh=mesh,
        )

    if op is not None:
        n, p = op.n_samples, op.n_snps
        K = min(evec.shape[1], eval_np.shape[0])
        U = (evec if isinstance(evec, jax.Array)
             else jnp.asarray(evec, op.dtype))
        div = _div(divisor, n, p)
        use_ff = (np.dtype(op.dtype) == np.dtype(np.float32)
                  and hasattr(op, "perform_op_ff")
                  and precision in ("auto", "compensated"))
        if precision == "compensated" and not use_ff:
            raise ValueError(
                "precision='compensated' needs an f32 operator with a "
                "two-float product path (Packed/Streaming/Dense)"
            )
        if use_ff:
            from ..ops.compensated import residual_sums_ff

            U32 = U[:, :K].astype(jnp.float32)
            hi, lo = op.perform_op_ff(U32)
            # residual measured UNdivided -- (X X^T U) - U * (d * div)
            # in two-float arithmetic -- then rescaled exactly on host
            err = residual_sums_ff(hi, lo, U32, eval_np[:K] * div)
            err = err / (float(div) * float(div))
            mse = float(err.sum() / (n * K))
            return CheckResult(err=err, mse=mse, rmse=float(np.sqrt(mse)))
        XXU = op.perform_op(U)
        # The residual is a near-cancelling subtraction of two O(d)
        # quantities; accumulate it in f64 when the runtime allows
        # (x64 on, e.g. CPU) so the reported err matches the
        # reference's f64 semantics (randompca.cpp:684-697) even for
        # an f32 operator.  On an x64-off TPU the matvec itself is f32
        # and the residual floor is ~eps_f32*d per element -- compare
        # against the scale-free rmse/d_max form there (see bench.py).
        rdt = jnp.float64 if jax.config.jax_enable_x64 else XXU.dtype
        if rdt == jnp.float64 and not isinstance(evec, jax.Array):
            Ur = jnp.asarray(evec, rdt)   # original f64, not the op-dtype cast
        else:
            Ur = U
        D = jnp.asarray(eval_np[:K], rdt)
        R = (XXU[:, :K].astype(rdt) * jnp.asarray(1.0 / div, rdt)
             - Ur[:, :K].astype(rdt) * D[None, :])
        err = np.asarray(jnp.sum(R * R, axis=0), dtype=np.float64)
    else:
        X = np.asarray(data, dtype=np.float64)
        evec_np = np.asarray(evec, dtype=np.float64)
        K = min(evec_np.shape[1], eval_np.shape[0])
        X_std, _, _ = standardize(X, stand)
        n, p = X.shape
        XXU = X_std @ (X_std.T @ evec_np)
        div = _div(divisor, n, p)
        XXU = XXU / div
        UD2 = evec_np[:, :K] * eval_np[None, :K]
        err = ((XXU[:, :K] - UD2) ** 2).sum(axis=0)

    mse = float(err.sum() / (n * K))
    return CheckResult(err=err, mse=mse, rmse=float(np.sqrt(mse)))
