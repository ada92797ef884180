"""Projection of new samples onto existing SNP loadings.

Equivalent of ``RandomPCA::project`` (reference: randompca.cpp:745-820)
and the R ``project()`` (flashpcaR/R/project.R:54-164):

``Px[:, i] = X V[:, i] / sqrt(div)`` where X is standardized with the
*stored* per-SNP mean/sd (from a meansd file/array or converted from
MAF), and ``div`` defaults to the number of SNPs.

MAF conversion quirk preserved exactly: ``mean = 2*maf`` and the sd
slot holds the binom2 *variance* ``2*maf*(1-maf)``, not its square root
(randompca.cpp:745-751).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax.numpy as jnp

from ..io.plink import PlinkDataset
from ..io.text import maf2meansd
from ..ops.operator import build_packed_operator, default_dtype
from ..ops.standardize import _inv_sd


@dataclass
class ProjectResult:
    projection: np.ndarray  # (N, k)


from ._common import resolve_divisor as _resolve_div


def project(
    data,
    loadings: np.ndarray,
    *,
    meansd: np.ndarray | None = None,
    maf: np.ndarray | None = None,
    orig_mean: np.ndarray | None = None,
    orig_sd: np.ndarray | None = None,
    divisor: str = "p",
    stand: str = "binom2",
    block_size: int | None = None,
    dtype=None,
    mesh=None,
    ref_alleles: list | None = None,
    snp_ids: list | None = None,
    check_geno: bool = True,
    streaming: bool | str = "auto",
    memory_mb: int | None = None,
) -> ProjectResult:
    """Project samples in ``data`` onto ``loadings`` (p x k).

    ``data``: PLINK root / PlinkDataset (packed path) or an (N, p)
    numeric matrix (R project.R numeric path: scale with orig mean/sd,
    NaN -> 0, then ``X @ loadings / sqrt(div)``).

    Standardization stats resolution order: ``meansd`` (p x 2 array,
    [mean, sd]); ``maf`` (p,) converted via maf2meansd; else stats
    computed from the data itself.
    """
    V = np.asarray(loadings, dtype=np.float64)
    if V.ndim == 1:
        V = V[:, None]

    if meansd is not None and maf is not None:
        raise ValueError("give only one of meansd or maf")

    if isinstance(data, str):
        data = PlinkDataset.open(data)

    if isinstance(data, PlinkDataset):
        if V.shape[0] != data.n_snps:
            raise ValueError(
                f"loadings rows ({V.shape[0]}) != number of SNPs ({data.n_snps})"
            )
        if ref_alleles is not None:
            mism = [
                i for i, a in enumerate(data.ref_alleles) if a != ref_alleles[i]
            ]
            if mism:
                raise ValueError(
                    f"reference alleles mismatch at {len(mism)} SNPs "
                    f"(first at row {mism[0]})"
                )
        if snp_ids is not None and list(data.snp_ids) != list(snp_ids):
            raise ValueError("SNP ids do not match the loadings' SNP ids")

        if maf is not None:
            ms = maf2meansd(np.asarray(maf))
            mean, sd = ms[:, 0], ms[:, 1]
        elif meansd is not None:
            ms = np.asarray(meansd, dtype=np.float64)
            mean, sd = ms[:, 0], ms[:, 1]
        else:
            mean, sd = data.snp_stats(stand)

        dtype = dtype or default_dtype()
        # streaming = the reference's online projection (randompca.cpp:790-820)
        op = build_packed_operator(
            data, mean, sd, streaming=streaming, memory_mb=memory_mb,
            block_size=block_size, dtype=dtype, mesh=mesh,
        )
        div = _resolve_div(divisor, data.n_samples, V.shape[0])
        Px = np.asarray(op.prod(jnp.asarray(V, dtype=dtype)), dtype=np.float64)
        return ProjectResult(projection=Px / np.sqrt(div))

    # numeric-matrix path (flashpcaR/R/project.R:86-93,149-156)
    X = np.array(data, dtype=np.float64, copy=True)
    if X.ndim != 2 or X.shape[1] != V.shape[0]:
        raise ValueError("X columns must match loadings rows")
    if orig_mean is None or orig_sd is None:
        raise ValueError("numeric projection requires orig_mean and orig_sd")
    orig_mean = np.asarray(orig_mean, dtype=np.float64)
    orig_sd = np.asarray(orig_sd, dtype=np.float64)
    inv = _inv_sd(orig_sd)   # same column-zeroing rule as the kernels
    Xs = (X - orig_mean[None, :]) * inv[None, :]
    Xs[np.isnan(Xs)] = 0.0
    div = _resolve_div(divisor, X.shape[0], V.shape[0])
    return ProjectResult(projection=Xs @ V / np.sqrt(div))
