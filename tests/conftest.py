"""Test configuration: run JAX on a virtual 8-device CPU mesh with x64.

Must set env vars before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize registers an 'axon' TPU backend and
# overrides JAX_PLATFORMS; force CPU explicitly for the test suite.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

HM3_ROOT = "/root/reference/HapMap3/data"
HM3_AVAILABLE = os.path.exists(HM3_ROOT + ".bed")


@pytest.fixture()
def rng(request):
    """Per-test deterministic generator: the seed derives from the
    test's nodeid, so every test draws the SAME data whether run alone,
    in a subset, or in the full suite.  (The previous session-scoped
    shared generator made each test's data depend on collection order
    -- a marginal failure was unreproducible in isolation; review r2.)"""
    import zlib

    return np.random.default_rng(zlib.crc32(request.node.nodeid.encode()))


@pytest.fixture(scope="session")
def small_plink(tmp_path_factory):
    """A small synthetic PLINK fileset with missing genotypes."""
    from flashpca_tpu.io.plink import write_bed

    # seed 42 directly (this fixture was the session generator's first
    # consumer, so the fileset's bytes are unchanged by the rng rework)
    rng = np.random.default_rng(42)
    n, p = 61, 37  # deliberately not multiples of 4 / block sizes
    maf = rng.uniform(0.05, 0.5, size=p)
    geno = rng.binomial(2, maf[None, :], size=(n, p)).astype(np.float64)
    miss = rng.uniform(size=(n, p)) < 0.05
    geno[miss] = np.nan
    # one constant column to exercise the VAR_TOL path
    geno[:, 5] = 0.0
    root = str(tmp_path_factory.mktemp("plink") / "toy")
    write_bed(root, geno)
    return root, geno


def pytest_configure(config):
    """Build the optional native .bed kernels before collection so the
    6 csrc-backed tests run by default instead of silently skipping
    (review r3).  A failed build degrades to a LOUD warning; the tests
    then skip as before (the numpy fallback keeps the suite valid)."""
    from flashpca_tpu.io import cbed

    if cbed.available():
        return
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        subprocess.run(
            ["make", "-C", os.path.join(repo, "csrc")],
            check=True, capture_output=True, text=True, timeout=120)
        cbed._TRIED = False   # drop the failed-probe cache: load anew
    except Exception as e:  # noqa: BLE001 -- any build failure is loud
        import warnings

        warnings.warn(
            f"csrc/libbedio.so is not built and `make -C csrc` failed "
            f"({e}); the 6 native-kernel tests will SKIP and the OpenMP "
            "kernels are untested in this run",
            RuntimeWarning)
