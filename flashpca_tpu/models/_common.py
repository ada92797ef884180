"""Shared small helpers for the analysis models."""

from __future__ import annotations


def resolve_divisor(divisor: str, n: int, p: int) -> float:
    """Eigenvalue divisor (flashpca.cpp:484-500): 'p' (default), 'n1'
    (n - 1), or 'none' (1).  One implementation for pca/project/check
    so the mapping and its error message cannot drift (review r2)."""
    if divisor == "p":
        return float(p)
    if divisor == "n1":
        return float(n - 1)
    if divisor == "none":
        return 1.0
    raise ValueError(f"unknown divisor: {divisor}")


def fetch_global(x, dtype=None):
    """Host numpy view of a possibly process-spanning device array.

    Under multi-controller execution (jax.distributed) the SNP- or
    sample-sharded outputs (loadings, tall-path U) span devices of
    OTHER processes; ``np.asarray`` on such an array raises.  Gather
    the global value first -- every process returns the same full
    array, keeping the controllers in lockstep.  Replicated arrays and
    plain numpy pass straight through."""
    import jax
    import numpy as np

    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        x = multihost_utils.process_allgather(x, tiled=True)
    return np.asarray(x) if dtype is None else np.asarray(x, dtype=dtype)
