"""True multi-process distributed execution (SURVEY.md section 4.3).

Launches 2 OS processes x 4 virtual CPU devices each via
``jax.distributed.initialize`` (gloo CPU collectives), builds the
8-device global SNP mesh, loads per-host .bed byte ranges, and asserts
the sharded products match the single-process dense oracle exactly.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(root, outdir, mode="full", nproc=2):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_mp_worker.py")

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker sets the platform itself
    # APPEND the repo root (never clobber PYTHONPATH: the environment's
    # sitecustomize rides on it)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = (
        repo + os.pathsep + env["PYTHONPATH"]
        if env.get("PYTHONPATH") else repo)

    procs = [
        subprocess.Popen(
            [sys.executable, worker, root, str(pid), str(nproc),
             str(port), outdir, mode],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(nproc)
    ]
    outs = []
    for pr in procs:
        try:
            out, _ = pr.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for p2 in procs:
                p2.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for pid, (pr, out) in enumerate(zip(procs, outs)):
        assert pr.returncode == 0, f"worker {pid} failed:\n{out}"


def test_two_process_shard_invariance(small_plink, tmp_path):
    root, _ = small_plink
    _run_workers(root, str(tmp_path))

    # single-process dense oracle
    from flashpca_tpu.io.plink import PlinkDataset
    from flashpca_tpu.ops import dense_standardized_np

    ds = PlinkDataset.open(root)
    mean, sd = ds.snp_stats("binom2")
    X = dense_standardized_np(ds.read_codes(), mean, sd).T  # (N, p)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((ds.n_samples, 2))
    v = rng.standard_normal((ds.n_snps, 2))

    d0 = np.load(tmp_path / "worker0.npz")
    d1 = np.load(tmp_path / "worker1.npz")

    ref_y = X @ (X.T @ x)
    ref_w = X @ v
    ref_z = X.T @ x
    for d in (d0, d1):
        np.testing.assert_allclose(d["y"], ref_y, rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(d["w"], ref_w, rtol=1e-9, atol=1e-9)
        # public crossprod wrapper (gathered): exact rows, padding gone
        np.testing.assert_allclose(d["z"], ref_z, rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(float(d["trace"]), (X ** 2).sum(),
                                   rtol=1e-10)

    # assemble the SNP-sharded crossprod from both processes' local
    # shards; together they must tile the padded SNP dim exactly once
    shards = {}
    for d in (d0, d1):
        for key in d.files:
            if key.startswith("z_shard_"):
                start = int(key.split("_")[-1])
                assert start not in shards, "duplicate shard"
                shards[start] = d[key]
    got = np.concatenate([shards[s] for s in sorted(shards)], axis=0)
    assert got.shape[0] >= ds.n_snps
    np.testing.assert_allclose(got[: ds.n_snps], ref_z,
                               rtol=1e-9, atol=1e-9)
    # padding rows (if any) are exactly zero
    assert np.all(got[ds.n_snps:] == 0.0)


def test_two_process_stats_exact_f64_without_x64(small_plink, tmp_path):
    """sharded_snp_stats must return EXACT f64 stats even with x64 off
    (the real-TPU default): the gather ships bit patterns, not device
    f64 arrays that JAX would canonicalize to f32 (review r2)."""
    root, _ = small_plink
    _run_workers(root, str(tmp_path), mode="stats32")

    from flashpca_tpu.io.plink import PlinkDataset

    ds = PlinkDataset.open(root)
    mean, sd = ds.snp_stats("binom2")
    for pid in range(2):
        d = np.load(tmp_path / f"worker{pid}.npz")
        assert d["mean"].dtype == np.float64
        np.testing.assert_array_equal(d["mean"], mean)
        np.testing.assert_array_equal(d["sd"], sd)
