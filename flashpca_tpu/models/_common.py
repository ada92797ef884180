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


# fetch_global moved to utils/fetch.py (the operators' lazy reductions
# need it too, and ops cannot import models); re-exported here for the
# existing model-side imports
from ..utils.fetch import fetch_global  # noqa: F401,E402
