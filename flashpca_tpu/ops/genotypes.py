"""Device-side packed-genotype decode, TPU-first.

The genotype matrix lives in HBM as the raw PLINK 2-bit bytes, SNP-major
``(p, nbytes)`` uint8 -- 16x smaller than float32, so biobank-scale
shards stay device-resident.  Decoding to standardized float happens
on the fly inside the blocked matvecs.

Sample-deinterleave permutation
-------------------------------
Byte ``b`` packs samples ``4b .. 4b+3`` at bit positions ``2s``.  Rather
than interleave decoded nibbles on device (an awkward layout op for the
VPU), we *permute the sample axis*: the operator works on vectors in
"permuted space" of length ``n4 = 4*nbytes`` where position ``s*nbytes + b``
holds original sample ``4b + s``.  Then segment ``s`` of a permuted
vector lines up with the 2-bit plane ``(byte >> 2s) & 3``, and decode is
four independent shift-mask-scale ops.  Permuting in/out is a cheap
O(N) reshape at the operator boundary.

Standardization uses per-SNP ``(mean, inv_sd)``: a code decodes to
``(dosage - mean) * inv_sd`` for non-missing, 0 for missing, and
``inv_sd = 0`` zeroes near-constant columns -- exactly the reference's
``scaled_geno_lookup`` semantics (data.cpp:299-320).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..io.plink import CODE_IS_NA, CODE_TO_DOSAGE, PACK_DENSITY
from .standardize import VAR_TOL


# -- permutation (jnp, traced) ----------------------------------------------

def permute_samples(x: jnp.ndarray, nbytes: int) -> jnp.ndarray:
    """(N, k) sample-space -> (n4, k) permuted space (zero-padded)."""
    n4 = nbytes * PACK_DENSITY
    n = x.shape[0]
    x2 = x if x.ndim == 2 else x[:, None]
    pad = n4 - n
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    out = x2.reshape(nbytes, PACK_DENSITY, x2.shape[1]).transpose(1, 0, 2)
    out = out.reshape(n4, x2.shape[1])
    return out if x.ndim == 2 else out[:, 0]


def permute_samples_np(x: np.ndarray, nbytes: int) -> np.ndarray:
    """Host-side numpy twin of :func:`permute_samples` -- solver v0
    seeding permutes on host so it costs NO device round trip (a
    device-side permute + fetch is a download on slow links)."""
    n4 = nbytes * PACK_DENSITY
    x2 = np.asarray(x)
    vec = x2.ndim == 1
    if vec:
        x2 = x2[:, None]
    pad = n4 - x2.shape[0]
    if pad:
        x2 = np.pad(x2, ((0, pad), (0, 0)))
    out = x2.reshape(nbytes, PACK_DENSITY, x2.shape[1]).transpose(1, 0, 2)
    out = out.reshape(n4, x2.shape[1])
    return out[:, 0] if vec else out


def unpermute_samples(y: jnp.ndarray, n_samples: int) -> jnp.ndarray:
    """(n4, k) permuted space -> (N, k) sample-space (padding dropped)."""
    y2 = y if y.ndim == 2 else y[:, None]
    n4, k = y2.shape
    nbytes = n4 // PACK_DENSITY
    out = y2.reshape(PACK_DENSITY, nbytes, k).transpose(1, 0, 2).reshape(n4, k)
    out = out[:n_samples]
    return out if y.ndim == 2 else out[:, 0]


def valid_mask_permuted(n_samples: int, nbytes: int, dtype) -> jnp.ndarray:
    """(n4,) 1.0 at positions holding a real sample, 0.0 at byte padding."""
    mask = np.zeros(nbytes * PACK_DENSITY, dtype=np.float64)
    mask[:n_samples] = 1.0
    perm = mask.reshape(nbytes, PACK_DENSITY).T.reshape(-1)
    return jnp.asarray(perm, dtype=dtype)


# -- decode (jnp, traced) ----------------------------------------------------

def decode_standardized(
    packed: jnp.ndarray, mean: jnp.ndarray, invsd: jnp.ndarray, dtype
) -> jnp.ndarray:
    """Packed (m, nbytes) uint8 -> standardized (m, n4) floats, permuted
    sample order.  Missing (code 1) -> 0; inv_sd==0 zeroes the column."""
    segs = []
    mu = mean.astype(dtype)[:, None]
    iv = invsd.astype(dtype)[:, None]
    for s in range(PACK_DENSITY):
        c = (packed >> np.uint8(2 * s)) & np.uint8(3)
        ci = c.astype(jnp.int32)
        dosage = (2 - (ci & 1) - ((ci >> 1) & 1)).astype(dtype)
        notna = (ci != 1).astype(dtype)
        segs.append((dosage - mu) * iv * notna)
    return jnp.concatenate(segs, axis=1)


# -- numpy oracle (tests / host fallbacks) -----------------------------------

def dense_standardized_np(
    codes: np.ndarray, mean: np.ndarray, sd: np.ndarray, dtype=np.float64
) -> np.ndarray:
    """(p, N) standardized matrix from 2-bit codes, streaming-path
    semantics (sd <= VAR_TOL zeroes the column; NA -> 0)."""
    from .standardize import _inv_sd

    inv = _inv_sd(sd)      # THE shared zeroing rule -- never a copy
    dosage = CODE_TO_DOSAGE[codes]
    W = (dosage - mean[:, None]) * inv[:, None]
    W[CODE_IS_NA[codes]] = 0.0
    return W.astype(dtype)
