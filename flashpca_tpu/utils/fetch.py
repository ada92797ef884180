"""Process-safe device->host fetch (multi-controller aware).

Lives in utils so BOTH the operators (lazy snp_sumsq reductions) and
the analysis models can use it without an ops <-> models import cycle.
"""

from __future__ import annotations


def fetch_global(x, dtype=None):
    """Host numpy view of a possibly process-spanning device array.

    Under multi-controller execution (jax.distributed) the SNP- or
    sample-sharded outputs (loadings, tall-path U, lazy per-SNP
    reductions) span devices of OTHER processes; ``np.asarray`` on such
    an array raises.  Gather the global value first -- every process
    returns the same full array, keeping the controllers in lockstep.
    Replicated arrays and plain numpy pass straight through."""
    import jax
    import numpy as np

    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        x = multihost_utils.process_allgather(x, tiled=True)
    return np.asarray(x) if dtype is None else np.asarray(x, dtype=dtype)
