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


@pytest.fixture(scope="module")
def mp_pca_plink(tmp_path_factory):
    """A fileset big enough for the BLOCK solver path (n=300 clears the
    ncv+2b headroom for nev=5(+8 ff buffer) at panel 16)."""
    from flashpca_tpu.io.plink import write_bed

    rng = np.random.default_rng(7)
    n, p = 300, 120
    maf = rng.uniform(0.05, 0.5, size=p)
    geno = rng.binomial(2, maf[None, :], size=(n, p)).astype(np.float64)
    geno[rng.uniform(size=(n, p)) < 0.03] = np.nan
    root = str(tmp_path_factory.mktemp("mp_pca") / "toy300")
    write_bed(root, geno)
    return root, geno


def _pca_oracle(root, k=5):
    from flashpca_tpu.io.plink import PlinkDataset
    from flashpca_tpu.ops import dense_standardized_np

    ds = PlinkDataset.open(root)
    mean, sd = ds.snp_stats("binom2")
    X = dense_standardized_np(ds.read_codes(), mean, sd).T
    lam, V = np.linalg.eigh(X @ X.T / ds.n_snps)
    return lam[::-1][:k], V[:, ::-1][:, :k]


@pytest.mark.parametrize("mode,rtol", [("pca", 1e-9), ("pca32", 2e-5)])
def test_two_process_full_solver(mp_pca_plink, tmp_path, mode, rtol):
    """The FULL pca() path (host-driven restart loop + polish +
    loadings + trace) under 2 controller processes, including a starved
    run that checkpoints then a restart from state_out (VERDICT r2
    next-step #2).  Results must be BIT-IDENTICAL across processes
    (lockstep) and match the f64 dense oracle."""
    root, _ = mp_pca_plink
    out = tmp_path / mode
    out.mkdir()
    _run_workers(root, str(out), mode=mode)

    d0 = np.load(out / "worker0.npz")
    d1 = np.load(out / "worker1.npz")
    # lockstep: every host-side decision fed by replicated device
    # results must have been identical -- outputs agree bit-for-bit
    for key in ("values", "vectors", "loadings", "pve", "trace",
                "projection", "n_ops"):
        np.testing.assert_array_equal(d0[key], d1[key], err_msg=key)

    lam_ref, V_ref = _pca_oracle(root)
    np.testing.assert_allclose(d0["values"], lam_ref, rtol=rtol)
    U = d0["vectors"]
    # sign-align before comparing
    sign = np.sign(np.sum(U * V_ref, axis=0))
    rmse = np.sqrt(np.mean((U * sign[None, :] - V_ref) ** 2))
    assert rmse < (1e-8 if mode == "pca" else 1e-4), rmse


@pytest.mark.parametrize("mode,tol", [("scca", 1e-9), ("scca32", 5e-5)])
def test_two_process_scca(mp_pca_plink, tmp_path, mode, tol):
    """The SCCA device engine under 2 controller processes: per-
    dimension fetched scalars feed host control flow that must stay
    lockstep (bit-identical outputs across processes), and the sharded
    run must match a single-process run on the same V0."""
    root, _ = mp_pca_plink
    out = tmp_path / mode
    out.mkdir()
    _run_workers(root, str(out), mode=mode)

    d0 = np.load(out / "worker0.npz")
    d1 = np.load(out / "worker1.npz")
    for key in ("U", "V", "d", "Px", "Py", "converged"):
        np.testing.assert_array_equal(d0[key], d1[key], err_msg=key)
    assert bool(d0["converged"])

    # single-process oracle with the worker's exact Y/V0 (seed 0)
    from flashpca_tpu.models.scca import scca

    root, geno = mp_pca_plink
    rng = np.random.default_rng(0)
    Y = rng.standard_normal((geno.shape[0], 3))
    V0 = rng.standard_normal((3, 2))
    ref = scca(root, Y, 1e-3, 1e-3, ndim=2, V0=V0, tol=1e-7, maxiter=500)
    np.testing.assert_allclose(d0["d"], ref.d, rtol=tol, atol=tol)
    np.testing.assert_allclose(d0["U"], ref.U, atol=10 * tol)
    np.testing.assert_allclose(d0["V"], ref.V, atol=10 * tol)


def test_two_process_ucca(mp_pca_plink, tmp_path):
    """UCCA under 2 controller processes: its one crossprod pass
    returns a SNP-sharded (p, k+1) block that spans processes --
    fetch_global must gather it (plain np.asarray raised before the
    fix), and results must be bit-identical across controllers and
    match a single-process run."""
    root, geno = mp_pca_plink
    out = tmp_path / "ucca"
    out.mkdir()
    _run_workers(root, str(out), mode="ucca")

    d0 = np.load(out / "worker0.npz")
    d1 = np.load(out / "worker1.npz")
    np.testing.assert_array_equal(d0["result"], d1["result"])

    from flashpca_tpu.models.ucca import ucca

    rng = np.random.default_rng(0)
    Y = rng.standard_normal((geno.shape[0], 3))
    ref = ucca(root, Y)
    np.testing.assert_allclose(d0["result"], ref.result,
                               rtol=1e-9, atol=1e-12)


def test_two_process_check(mp_pca_plink, tmp_path):
    """check() under 2 controller processes: solve + verify on the
    sharded operator; every process must report identical err/mse and
    the f64 residual must sit at solver accuracy."""
    root, _ = mp_pca_plink
    out = tmp_path / "check"
    out.mkdir()
    _run_workers(root, str(out), mode="check")

    d0 = np.load(out / "worker0.npz")
    d1 = np.load(out / "worker1.npz")
    for key in ("err", "mse", "rmse", "values"):
        np.testing.assert_array_equal(d0[key], d1[key], err_msg=key)
    assert float(d0["mse"]) < 1e-12


@pytest.mark.parametrize("mode,rtol", [("tall", 1e-9), ("tall32", 2e-5)])
def test_two_process_tall(mp_pca_plink, tmp_path, mode, rtol):
    """Tall path across 2 controller processes (VERDICT r3 missing #3):
    per-host byte-window .bed loading (sample shards), allgathered
    moments, psum'd p-space gram, and the sample-sharded U = X v tail
    gathered via fetch_global -- bit-identical across processes and
    matching the dense oracle."""
    root, geno = mp_pca_plink
    out = tmp_path / mode
    out.mkdir()
    _run_workers(root, str(out), mode=mode)

    d0 = np.load(out / "worker0.npz")
    d1 = np.load(out / "worker1.npz")
    for key in ("gram", "values", "vectors", "pve", "trace", "n_ops"):
        np.testing.assert_array_equal(d0[key], d1[key], err_msg=key)

    from flashpca_tpu.io.plink import PlinkDataset
    from flashpca_tpu.ops import dense_standardized_np

    ds = PlinkDataset.open(root)
    mean, sd = ds.snp_stats("binom2")
    X = dense_standardized_np(ds.read_codes(), mean, sd).T
    rng = np.random.default_rng(0)
    v = rng.standard_normal((ds.n_snps, 2))
    ref_u = X.T @ (X @ v)
    rel = np.linalg.norm(d0["gram"] - ref_u) / np.linalg.norm(ref_u)
    assert rel < (1e-12 if mode == "tall" else 1e-5), rel

    lam_ref, V_ref = _pca_oracle(root, 4)
    np.testing.assert_allclose(d0["values"], lam_ref, rtol=rtol)
    U = d0["vectors"]
    sign = np.sign(np.sum(U * V_ref, axis=0))
    rmse = np.sqrt(np.mean((U * sign[None, :] - V_ref) ** 2))
    assert rmse < (1e-8 if mode == "tall" else 1e-4), rmse
    np.testing.assert_allclose(float(d0["trace"]),
                               (X ** 2).sum() / ds.n_snps, rtol=1e-10)


def test_two_process_tall_streaming(mp_pca_plink, tmp_path):
    """Tall x streaming x 2 controllers: host-resident packed data
    (shared memmap on every controller), byte-axis blocks staged per
    product onto the process-spanning byte-sharded mesh, psum'd
    p-space gram -- bit-identical across processes and matching the
    dense oracle (the full composition of the r4 TallStreamingOperator
    with the multi-controller runtime)."""
    root, geno = mp_pca_plink
    out = tmp_path / "tallstream"
    out.mkdir()
    _run_workers(root, str(out), mode="tallstream")

    d0 = np.load(out / "worker0.npz")
    d1 = np.load(out / "worker1.npz")
    for key in ("gram", "values", "vectors", "pve", "trace", "n_ops"):
        np.testing.assert_array_equal(d0[key], d1[key], err_msg=key)

    from flashpca_tpu.io.plink import PlinkDataset
    from flashpca_tpu.ops import dense_standardized_np

    ds = PlinkDataset.open(root)
    mean, sd = ds.snp_stats("binom2")
    X = dense_standardized_np(ds.read_codes(), mean, sd).T
    rng = np.random.default_rng(0)
    v = rng.standard_normal((ds.n_snps, 2))
    ref_u = X.T @ (X @ v)
    rel = np.linalg.norm(d0["gram"] - ref_u) / np.linalg.norm(ref_u)
    assert rel < 1e-12, rel

    lam_ref, V_ref = _pca_oracle(root, 4)
    np.testing.assert_allclose(d0["values"], lam_ref, rtol=1e-9)
    U = d0["vectors"]
    sign = np.sign(np.sum(U * V_ref, axis=0))
    rmse = np.sqrt(np.mean((U * sign[None, :] - V_ref) ** 2))
    assert rmse < 1e-8, rmse
    np.testing.assert_allclose(float(d0["trace"]),
                               (X ** 2).sum() / ds.n_snps, rtol=1e-10)
