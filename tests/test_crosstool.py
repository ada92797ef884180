"""Cross-tool comparison harness regression (HapMap3/run.sh + plot.R analog).

Runs examples/crosstool_comparison.py at reduced size (ndim=20, k=5) as a
subprocess; the script itself asserts the reference acceptance bar
(sign-aligned per-PC correlation > 0.999 against numpy SVD, scipy svds
and torch.pca_lowrank) and exits non-zero on failure.
"""

import os
import subprocess
import sys

import pytest

from tests.conftest import HM3_AVAILABLE

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "examples", "crosstool_comparison.py")


@pytest.mark.skipif(not HM3_AVAILABLE, reason="HapMap3 reference data absent")
def test_crosstool_comparison(tmp_path):
    env = dict(os.environ, FLASHPCA_FORCE_CPU="1")
    out = subprocess.run(
        [sys.executable, SCRIPT, "--ndim", "20", "--kcheck", "5",
         "--outdir", str(tmp_path)],
        env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "PASS" in out.stdout
    assert (tmp_path / "hapmap3.png").exists()
    assert (tmp_path / "hapmap3_pairs.png").exists()
    assert (tmp_path / "correlations.txt").exists()
