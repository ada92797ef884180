"""Native C++ .bed kernels (csrc/bedio.cpp) vs the numpy reference path.

Skipped when the library has not been built (``make -C csrc``).
"""

import numpy as np
import pytest

from flashpca_tpu.io import cbed
from flashpca_tpu.io.plink import (
    PlinkDataset,
    codes_to_dosage,
    snp_stats_from_codes,
    unpack_codes,
)
from flashpca_tpu.ops.genotypes import dense_standardized_np
from flashpca_tpu.ops.standardize import VAR_TOL

pytestmark = pytest.mark.skipif(not cbed.available(),
                                reason="libbedio.so not built")


@pytest.fixture(scope="module")
def packed_fixture():
    rng = np.random.default_rng(9)
    p, n = 101, 157  # deliberately not multiples of 4
    nbytes = (n + 3) // 4
    packed = rng.integers(0, 256, size=(p, nbytes), dtype=np.uint8)
    return packed, n


def test_codes(packed_fixture):
    packed, n = packed_fixture
    np.testing.assert_array_equal(
        cbed.codes(packed, n), unpack_codes(packed, n))


def test_dosage(packed_fixture):
    packed, n = packed_fixture
    ref = codes_to_dosage(unpack_codes(packed, n))
    np.testing.assert_array_equal(cbed.dosage(packed, n), ref)


def test_stats(packed_fixture):
    packed, n = packed_fixture
    codes = unpack_codes(packed, n)
    for method in ("binom", "binom2"):
        m_ref, s_ref = snp_stats_from_codes(codes, method)
        m, s = cbed.stats(packed, n, method)
        np.testing.assert_allclose(m, m_ref, rtol=1e-12)
        np.testing.assert_allclose(s, s_ref, rtol=1e-12)


def test_standardize(packed_fixture):
    packed, n = packed_fixture
    codes = unpack_codes(packed, n)
    mean, sd = snp_stats_from_codes(codes, "binom2")
    sd = sd.copy()
    sd[7] = 0.0  # exercise the VAR_TOL zero-column path
    ref = dense_standardized_np(codes, mean, sd)
    got = cbed.standardize(packed, n, mean, sd, VAR_TOL)
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)


def test_dataset_uses_native(small_plink):
    """PlinkDataset results identical whether or not the lib loads."""
    root, _ = small_plink
    ds = PlinkDataset.open(root)
    m1, s1 = ds.snp_stats("binom2")
    codes = unpack_codes(ds.read_packed(), ds.n_samples)
    m2, s2 = snp_stats_from_codes(codes, "binom2")
    np.testing.assert_allclose(m1, m2, rtol=1e-12)
    np.testing.assert_allclose(s1, s2, rtol=1e-12)
