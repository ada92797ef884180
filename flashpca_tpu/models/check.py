"""Decomposition accuracy checking (--check mode).

Equivalent of ``RandomPCA::check`` (reference: randompca.cpp:627-743):
per-component squared error of ``(X X^T U)/div - U diag(d)``, plus
``mse = sum(err)/(N*K)`` and ``rmse = sqrt(mse)``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from ..io.plink import PlinkDataset
from ..ops.operator import PackedOperator, DenseOperator
from ..ops.standardize import standardize


@dataclass
class CheckResult:
    err: np.ndarray  # (K,) per-component sum squared error
    mse: float
    rmse: float


def _div(divisor: str, n: int, p: int) -> float:
    return {"p": float(p), "n1": float(n - 1), "none": 1.0}[divisor]


def check(
    data,
    evec: np.ndarray,
    eval_: np.ndarray,
    *,
    stand: str = "binom2",
    divisor: str = "p",
    block_size: int | None = None,
    dtype=None,
    mesh=None,
) -> CheckResult:
    """Check eigenvectors/eigenvalues against the data.

    ``data``: PLINK root / PlinkDataset or numeric (N, p) matrix.
    ``evec``: (N, K) eigenvectors U.  ``eval_``: (K,) eigenvalues d
    (already divided by div, as written in eigenvalues.txt).
    """
    evec = np.asarray(evec, dtype=np.float64)
    eval_ = np.asarray(eval_, dtype=np.float64).reshape(-1)
    K = min(evec.shape[1], eval_.shape[0])

    if isinstance(data, str):
        data = PlinkDataset.open(data)

    if isinstance(data, PlinkDataset):
        if evec.shape[0] != data.n_samples:
            raise ValueError(
                "Eigenvector dimension doesn't match data dimension "
                f"(evec.rows = {evec.shape[0]}; N = {data.n_samples})"
            )
        if eval_.shape[0] != evec.shape[1]:
            raise ValueError(
                "Eigenvector dimension doesn't match the number of eigenvalues"
            )
        mean, sd = data.snp_stats(stand)
        dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
        op = PackedOperator(
            data.read_packed(), mean, sd, data.n_samples,
            block_size=block_size, dtype=dtype, mesh=mesh,
        )
        n, p = data.n_samples, data.n_snps
        XXU = np.asarray(op.perform_op(jnp.asarray(evec, dtype=dtype)),
                         dtype=np.float64)
    else:
        X = np.asarray(data, dtype=np.float64)
        X_std, _, _ = standardize(X, stand)
        n, p = X.shape
        XXU = X_std @ (X_std.T @ evec)

    div = _div(divisor, n, p)
    XXU = XXU / div
    UD2 = evec[:, :K] * eval_[None, :K]
    err = ((XXU[:, :K] - UD2) ** 2).sum(axis=0)
    mse = float(err.sum() / (n * K))
    return CheckResult(err=err, mse=mse, rmse=float(np.sqrt(mse)))
