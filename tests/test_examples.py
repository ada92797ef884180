"""Smoke tests for the example scripts (flashpcaR vignette analogs).

Each example runs as a real subprocess the way a user would invoke it
(CPU f64 via FLASHPCA_FORCE_CPU; headless matplotlib), so API drift in
the examples fails CI instead of rotting silently.  The crosstool
comparison has its own dedicated test (tests/test_crosstool.py).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd=None):
    env = dict(os.environ)
    env["FLASHPCA_FORCE_CPU"] = "1"
    env["MPLBACKEND"] = "Agg"
    env["PYTHONPATH"] = (REPO + os.pathsep + env["PYTHONPATH"]
                         if env.get("PYTHONPATH") else REPO)
    pr = subprocess.run([sys.executable] + args, env=env, cwd=cwd or REPO,
                        capture_output=True, text=True, timeout=420)
    assert pr.returncode == 0, f"{args} failed:\n{pr.stdout}\n{pr.stderr}"
    return pr.stdout + pr.stderr


@pytest.fixture(scope="module")
def demo(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("demo"))
    _run([os.path.join(REPO, "examples", "make_demo_data.py"), out])
    root = os.path.join(out, "demo")
    assert os.path.exists(root + ".bed")
    return root


def test_vignette_runs(demo):
    out = _run([os.path.join(REPO, "examples", "vignette.py")])
    assert "UCCA" in out


def test_hapmap3_workflow_runs(tmp_path):
    out = _run([
        os.path.join(REPO, "examples", "hapmap3_workflow.py"),
        "/root/reference/HapMap3/data", str(tmp_path / "hm3"),
    ])
    assert "check: mse=" in out


def test_scca_split_workflow_runs(demo, tmp_path):
    out = _run([
        os.path.join(REPO, "examples", "scca_split_workflow.py"),
        demo, demo + ".pheno.txt", str(tmp_path / "split"),
    ])
    assert "test corr" in out
    assert (tmp_path / "split" / "scca_split.png").exists()
