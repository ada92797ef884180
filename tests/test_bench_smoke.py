"""bench.py smoke: the driver-facing benchmark must always produce one
valid JSON line (it is the round's recorded metric -- a broken bench
loses the measurement even when the framework is healthy)."""

import json
import os
import subprocess
import sys


def _run_bench(extra_env):
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = (repo + os.pathsep + env["PYTHONPATH"]
                         if env.get("PYTHONPATH") else repo)
    env.update(extra_env)
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        env=env, capture_output=True, text=True, timeout=420)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected ONE JSON line, got: {out.stdout!r}"
    rec = json.loads(lines[0])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in rec, key
    assert rec["unit"] == "s" and rec["value"] > 0
    return rec, out.stderr


_TINY = {
    "FLASHPCA_FORCE_CPU": "1",
    "FLASHPCA_BENCH_N": "1024",
    "FLASHPCA_BENCH_P": "512",
    "FLASHPCA_BENCH_K": "4",
}


def test_bench_wide_smoke():
    rec, err = _run_bench(_TINY)
    assert rec["metric"].startswith("pca_n1024_p512_k4")
    assert "converged=True" in err


def test_bench_tall_smoke():
    rec, _ = _run_bench({**_TINY, "FLASHPCA_BENCH_MODE": "tall",
                         "FLASHPCA_BENCH_N": "2048",
                         "FLASHPCA_BENCH_P": "256"})
    assert rec["metric"].startswith("pca_tall_")


def test_bench_repeats_reports_min():
    rec, err = _run_bench({**_TINY, "FLASHPCA_BENCH_REPEATS": "2"})
    assert "run 2/2" in err and "min over 2 identical runs" in err


def test_bench_watchdog_emits_json():
    """A starved run must still print ONE parseable JSON line and exit 0
    (BENCH_r03 died rc=124 with nothing on stdout)."""
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = (repo + os.pathsep + env["PYTHONPATH"]
                         if env.get("PYTHONPATH") else repo)
    env.update({**_TINY, "FLASHPCA_BENCH_N": "20000",
                "FLASHPCA_BENCH_P": "4000", "FLASHPCA_BENCH_K": "20",
                "FLASHPCA_BENCH_BUDGET_S": "3"})
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        env=env, capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, out.stdout
    rec = json.loads(lines[0])
    assert rec.get("incomplete") is True or rec["vs_baseline"] > 0
    assert "WATCHDOG" in out.stderr


def test_bench_wide_submetrics():
    """The single JSON line carries the tail's breadth (VERDICT r4
    item 4): check mse + contract bit at minimum on the CPU smoke."""
    rec, _ = _run_bench(_TINY)
    sub = rec.get("submetrics")
    assert sub and "check_mse" in sub and "contract_met" in sub
    assert "n_ops" in sub


def test_bench_oversize_smoke():
    """FLASHPCA_BENCH_MODE=oversize: streaming solve with bounded
    device memory; JSON must carry the mode/packed/staging evidence."""
    rec, err = _run_bench({
        "FLASHPCA_FORCE_CPU": "1",
        "FLASHPCA_BENCH_MODE": "oversize",
        "FLASHPCA_BENCH_N": "1024",
        "FLASHPCA_BENCH_P": "512",
        "FLASHPCA_BENCH_K": "3",
    })
    assert rec["metric"].startswith("pca_oversize_")
    sub = rec["submetrics"]
    for key in ("mode", "packed_gb", "staged_gb", "staged_gbps",
                "upload_gbps", "check_mse", "n_ops"):
        assert key in sub, key
    assert sub["mode"] in ("beyond_hbm", "bounded_memory")


def test_gen_host_packed_parallel_deterministic():
    """The multiprocessing oversize generator: output is a function of
    (seed, n, p, pops) alone -- identical for any worker count -- and
    tiny problems route to the serial generator exactly."""
    import numpy as np
    import bench
    n, p = 4096, 8192  # >= 2*task_rows so the parallel path engages
    a, m1, s1 = bench.gen_host_packed_parallel(
        n, p, np.random.default_rng(5), pops=8, workers=2)
    b, m2, s2 = bench.gen_host_packed_parallel(
        n, p, np.random.default_rng(5), pops=8, workers=3)
    assert a.shape == (p, (n + 3) // 4)
    assert np.array_equal(a, b)
    assert np.allclose(m1, m2) and np.allclose(s1, s2)
    # codes are valid PLINK (never 1 = missing-het slot unused here is
    # allowed; all four 2-bit values decode), stats match the draw
    codes = np.stack([(a[:32] >> (2 * j)) & 3 for j in range(4)],
                     -1).reshape(32, -1)[:, :n]
    dos = np.where(codes == 0, 2.0,
                   np.where(codes == 2, 1.0,
                            np.where(codes == 3, 0.0, np.nan)))
    assert np.nanmax(np.abs(np.nanmean(dos, axis=1) - m1[:32])) < 0.1
    # tiny p: serial fallback, byte-identical to gen_host_packed
    c, _, _ = bench.gen_host_packed_parallel(
        n, 512, np.random.default_rng(5), pops=8, workers=2)
    d, _, _ = bench.gen_host_packed(n, 512, np.random.default_rng(5), pops=8)
    assert np.array_equal(c, d)
