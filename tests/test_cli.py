import os

import numpy as np
import pytest

from flashpca_tpu.cli import main
from flashpca_tpu.io import read_text
from flashpca_tpu.models.pca import pca


@pytest.fixture()
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def test_cli_pca_outputs(small_plink, workdir):
    root, _ = small_plink
    rc = main(["--bfile", root, "--ndim", "3", "--tol", "1e-9",
               "--outload", "loadings.txt", "--outmeansd", "meansd.txt",
               "--notime", "--shards", "1"])
    assert rc == 0
    for f in ("eigenvalues.txt", "eigenvectors.txt", "pcs.txt", "pve.txt",
              "loadings.txt", "meansd.txt"):
        assert os.path.exists(f), f

    # file format checks
    with open("eigenvectors.txt") as fh:
        header = fh.readline().rstrip("\n").split("\t")
    assert header == ["FID", "IID", "U1", "U2", "U3"]
    with open("pcs.txt") as fh:
        header = fh.readline().rstrip("\n").split("\t")
    assert header == ["FID", "IID", "PC1", "PC2", "PC3"]
    with open("loadings.txt") as fh:
        header = fh.readline().rstrip("\n").split("\t")
    assert header == ["SNP", "RefAllele", "V1", "V2", "V3"]
    with open("meansd.txt") as fh:
        header = fh.readline().rstrip("\n").split("\t")
    assert header == ["SNP", "RefAllele", "Mean", "SD"]

    # values match the library
    res = pca(root, 3, tol=1e-9)
    vals = read_text("eigenvalues.txt", firstcol=1)
    np.testing.assert_allclose(vals[:, 0], res.values, rtol=1e-6)
    evec = read_text("eigenvectors.txt", firstcol=3, skip=1)
    np.testing.assert_allclose(np.abs(evec), np.abs(res.vectors), atol=1e-6)
    pve = read_text("pve.txt", firstcol=1)
    np.testing.assert_allclose(pve[:, 0], res.pve, rtol=1e-6)


def test_cli_check_mode(small_plink, workdir):
    root, _ = small_plink
    assert main(["--bfile", root, "--ndim", "3", "--tol", "1e-10",
                 "--notime", "--shards", "1"]) == 0
    assert main(["--check", "--bfile", root, "--notime", "--shards", "1"]) == 0


def test_cli_project_mode(small_plink, workdir):
    root, _ = small_plink
    assert main(["--bfile", root, "--ndim", "3", "--tol", "1e-10",
                 "--outload", "loadings.txt", "--outmeansd", "meansd.txt",
                 "--notime", "--shards", "1"]) == 0
    rc = main(["--project", "--bfile", root, "--inload", "loadings.txt",
               "--inmeansd", "meansd.txt", "--notime", "--shards", "1"])
    assert rc == 0
    proj = read_text("projection.txt", firstcol=3, skip=1)
    pcs = read_text("pcs.txt", firstcol=3, skip=1)
    np.testing.assert_allclose(proj, pcs, atol=1e-5)


def test_cli_ucca_mode(small_plink, workdir, rng):
    root, _ = small_plink
    from flashpca_tpu.io import PlinkDataset
    ds = PlinkDataset.open(root)
    with open("pheno.txt", "w") as fh:
        for f, i in zip(ds.fam_ids, ds.indiv_ids):
            fh.write(f"{f}\t{i}\t{rng.normal()}\t{rng.normal()}\n")
    rc = main(["--ucca", "--bfile", root, "--pheno", "pheno.txt",
               "--notime", "--shards", "1"])
    assert rc == 0
    with open("ucca.txt") as fh:
        header = fh.readline().rstrip("\n").split("\t")
    assert header == ["SNP", "R", "Fstat", "P"]
    res = read_text("ucca.txt", firstcol=2, skip=1)
    assert res.shape == (ds.n_snps, 3)


def test_cli_scca_mode(small_plink, workdir, rng):
    root, _ = small_plink
    from flashpca_tpu.io import PlinkDataset
    ds = PlinkDataset.open(root)
    with open("pheno.txt", "w") as fh:
        for f, i in zip(ds.fam_ids, ds.indiv_ids):
            vals = "\t".join(str(rng.normal()) for _ in range(3))
            fh.write(f"{f}\t{i}\t{vals}\n")
    rc = main(["--scca", "--bfile", root, "--pheno", "pheno.txt",
               "--ndim", "2", "--lambda1", "1e-3", "--lambda2", "1e-3",
               "--maxiter", "1000", "--save-vinit", "--notime", "--shards", "1"])
    assert rc == 0
    for f in ("eigenvalues.txt", "eigenvectorsX.txt", "eigenvectorsY.txt",
              "pcsX.txt", "pcsY.txt", "scca_v0.txt"):
        assert os.path.exists(f), f
    U = read_text("eigenvectorsX.txt", firstcol=1)
    assert U.shape == (ds.n_snps, 2)


def test_cli_conflicting_modes(small_plink, workdir):
    root, _ = small_plink
    assert main(["--scca", "--ucca", "--bfile", root, "--notime"]) == 1


def test_cli_cca_disabled(small_plink, workdir, capsys):
    """--cca parses but is rejected (flashpca.cpp:142-157)."""
    root, _ = small_plink
    assert main(["--cca", "--bfile", root, "--notime"]) == 1
    assert "CCA is currently disabled" in capsys.readouterr().err
    assert main(["--cca", "--ucca", "--bfile", root, "--notime"]) == 1


def test_cli_project_needs_inload(small_plink, workdir):
    root, _ = small_plink
    assert main(["--project", "--bfile", root, "--notime"]) == 1


def test_cli_memory_blocksize_conflict(small_plink, workdir):
    root, _ = small_plink
    assert main(["--bfile", root, "--memory", "100", "--blocksize", "5",
                 "--notime"]) == 1


def test_cli_missing_bfile(workdir):
    assert main(["--ndim", "3", "--notime"]) == 1


def test_cli_ndim_cap(small_plink, workdir):
    root, _ = small_plink
    assert main(["--bfile", root, "--ndim", "100", "--notime"]) == 1


def test_cli_shards_exceeding_devices(small_plink, workdir, capsys):
    """--shards beyond the device count errors instead of silently
    clamping (the user sized per-device memory on it)."""
    root, _ = small_plink
    assert main(["--bfile", root, "--shards", "999", "--notime"]) == 1
    assert "exceeds" in capsys.readouterr().err


def test_cli_outmeansd_written_for_scca(small_plink, workdir, tmp_path):
    """The reference writes meansd after EVERY mode (flashpca.cpp:867)."""
    import numpy as np
    root, geno = small_plink
    ph = tmp_path / "ph.txt"
    rng = np.random.default_rng(0)
    with open(ph, "w") as fh:
        for i in range(geno.shape[0]):
            fh.write(f"f{i} i{i} {rng.normal():.5f} {rng.normal():.5f}\n")
    assert main(["--scca", "--bfile", root, "--pheno", str(ph),
                 "--ndim", "1", "--lambda1", "1e-3", "--lambda2", "1e-3",
                 "--outmeansd", "msd.txt", "--notime"]) == 0
    assert os.path.exists("msd.txt")
    with open("msd.txt") as fh:
        header = fh.readline()
    assert header.startswith("SNP")


def test_cli_rejects_nonpositive_shards(small_plink, workdir):
    root, _ = small_plink
    assert main(["--bfile", root, "--ndim", "2", "--shards", "0",
                 "--notime"]) == 1


def test_cli_batch_writes_state(small_plink, workdir):
    """--batch must honor --outstate (was silently dropped, review r2)."""
    root, _ = small_plink
    assert main(["--bfile", root, "--ndim", "2", "--batch",
                 "--outstate", "ck.npz", "--notime"]) == 0
    assert os.path.exists("ck.npz")
    assert main(["--bfile", root, "--ndim", "2", "--batch",
                 "--instate", "ck.npz", "--notime"]) == 0


def test_cli_polish_fast(small_plink, workdir):
    """--polish fast runs end-to-end and matches --polish contract to
    the plain-f32 floor (the knob's CLI wiring, cli.py --polish)."""
    root, _ = small_plink
    assert main(["--bfile", root, "--ndim", "3", "--tol", "1e-9",
                 "--polish", "fast", "--suffix", ".fast.txt",
                 "--notime", "--shards", "1"]) == 0
    assert main(["--bfile", root, "--ndim", "3", "--tol", "1e-9",
                 "--suffix", ".contract.txt",
                 "--notime", "--shards", "1"]) == 0
    fast = read_text("eigenvalues.fast.txt", firstcol=1)
    full = read_text("eigenvalues.contract.txt", firstcol=1)
    np.testing.assert_allclose(fast[:, 0], full[:, 0], rtol=1e-6)
    ef = read_text("eigenvectors.fast.txt", firstcol=3, skip=1)
    ec = read_text("eigenvectors.contract.txt", firstcol=3, skip=1)
    np.testing.assert_allclose(np.abs(ef), np.abs(ec), atol=1e-6)


def test_cli_mode_specific_flag_guards(small_plink, workdir, tmp_path):
    """Mode-specific extension flags refuse modes that never read them
    (the --checkpoint-every no-silent-drop rule, review r4); --pheno is
    ignored outside (S)CCA/UCCA like the reference; ndim validates in
    every mode (flashpca.cpp:623-634)."""
    root, geno = small_plink
    # state flags outside pca/scca
    assert main(["--ucca", "--bfile", root, "--pheno", "nope.txt",
                 "--outstate", "s.npz", "--notime"]) == 1
    # opmode outside pca
    assert main(["--check", "--bfile", root, "--opmode", "tall",
                 "--notime"]) == 1
    # polish outside pca
    assert main(["--scca", "--bfile", root, "--pheno", "nope.txt",
                 "--polish", "fast", "--notime"]) == 1
    # a stale --pheno on a PCA command line is ignored (reference
    # flashpca.cpp:585-588 reads it only for CCA modes)
    stale = tmp_path / "stale.txt"
    stale.write_text("f1 i1 0.5\n")       # 1 row != n
    assert main(["--bfile", root, "--ndim", "2", "--pheno", str(stale),
                 "--notime", "--shards", "1"]) == 0
    # ndim cap applies to scca too
    n, p = geno.shape
    too_many = str((min(n, p) - 1) // 2 + 1)
    pheno = tmp_path / "y.txt"
    pheno.write_text("".join(f"f{i} i{i} 0.1 0.2\n" for i in range(n)))
    assert main(["--scca", "--bfile", root, "--pheno", str(pheno),
                 "--ndim", too_many, "--notime"]) == 1
