import numpy as np
import pytest

from flashpca_tpu.io import (
    PlinkDataset,
    read_text,
    read_maf,
    maf2meansd,
    save_text,
    unpack_codes,
    codes_to_dosage,
    write_bed,
    bytes_per_snp,
)


def test_roundtrip_write_read(small_plink):
    root, geno = small_plink
    ds = PlinkDataset.open(root)
    n, p = geno.shape
    assert ds.n_samples == n
    assert ds.n_snps == p
    X = ds.read_matrix(impute_mean=False)
    # read_matrix imputes by default; use codes for NaN-preserving check
    codes = ds.read_codes()
    dosage = codes_to_dosage(codes).T  # (n, p)
    assert dosage.shape == (n, p)
    nan_match = np.isnan(geno) == np.isnan(dosage)
    assert nan_match.all()
    ok = ~np.isnan(geno)
    np.testing.assert_array_equal(geno[ok], dosage[ok])


def test_read_matrix_mean_impute(small_plink):
    root, geno = small_plink
    ds = PlinkDataset.open(root)
    X = ds.read_matrix()
    assert not np.isnan(X).any()
    col = 0
    na = np.isnan(geno[:, col])
    if na.any():
        expected = np.nanmean(geno[:, col])
        np.testing.assert_allclose(X[na, col], expected)


def test_byte_range(small_plink):
    root, geno = small_plink
    ds = PlinkDataset.open(root)
    nb = bytes_per_snp(ds.n_samples)
    lo, hi = ds.byte_range(3, 7)
    assert lo == 3 + 3 * nb
    assert hi == 3 + 7 * nb
    with open(ds.bed_path, "rb") as fh:
        fh.seek(lo)
        raw = np.frombuffer(fh.read(hi - lo), dtype=np.uint8).reshape(4, nb)
    np.testing.assert_array_equal(raw, ds.read_packed(3, 7))


def test_snp_stats_match_reference_formula(small_plink):
    root, geno = small_plink
    ds = PlinkDataset.open(root)
    mean, sd = ds.snp_stats("binom2")
    for j in [0, 5, 11]:
        col = geno[:, j]
        m = np.nanmean(col)
        np.testing.assert_allclose(mean[j], m, rtol=1e-12)
        P = m / 2.0
        np.testing.assert_allclose(sd[j], np.sqrt(2 * P * (1 - P)), rtol=1e-12)
    mean1, sd1 = ds.snp_stats("binom")
    P = mean1 / 2.0
    np.testing.assert_allclose(sd1, np.sqrt(P * (1 - P)), rtol=1e-12)


def test_text_roundtrip(tmp_path):
    M = np.array([[1.234567890123, -2.5e-8], [3.0, 4.5]])
    f = str(tmp_path / "t.txt")
    save_text(M, f, colnames=["FID\tIID", "C1"], rownames=["f1\ti1", "f2\ti2"])
    out = read_text(f, firstcol=3, skip=1)
    np.testing.assert_allclose(out, M, rtol=1e-6)


def test_format_matches_cpp_setprecision():
    from flashpca_tpu.utils.formats import format_g

    assert format_g(0.1234567890123) == "0.1234568"
    assert format_g(1234567.89) == "1234568"
    assert format_g(-2.5e-8) == "-2.5e-08"
    assert format_g(1.0) == "1"


def test_maf_reader(tmp_path):
    snp_ids = ["rs1", "rs2", "rs3"]
    f = str(tmp_path / "test.frq")
    with open(f, "w") as fh:
        fh.write(" CHR  SNP  A1 A2 MAF NCHROBS\n")
        for i, s in enumerate(snp_ids):
            fh.write(f" 1 {s} A C 0.{i+1} 100\n")
    maf = read_maf(f, snp_ids)
    np.testing.assert_allclose(maf, [0.1, 0.2, 0.3])
    ms = maf2meansd(maf)
    np.testing.assert_allclose(ms[:, 0], 2 * maf)
    # sd slot stores the *variance* 2*maf*(1-maf) (reference quirk)
    np.testing.assert_allclose(ms[:, 1], 2 * maf * (1 - maf))
    with pytest.raises(ValueError):
        read_maf(f, ["rs1", "rsX", "rs3"])


def test_read_text_firstcol(tmp_path):
    f = str(tmp_path / "pheno.txt")
    with open(f, "w") as fh:
        fh.write("fam1 id1 1.5 2.5\nfam2 id2 3.5 4.5\n")
    M = read_text(f, firstcol=3)
    np.testing.assert_allclose(M, [[1.5, 2.5], [3.5, 4.5]])


def test_subset_samples_skips_blank_fam_lines(small_plink, tmp_path):
    """A blank line in the .fam must not shift FID/IID pairing
    (sample indices are assigned over non-blank rows)."""
    import shutil
    from flashpca_tpu.io.plink import PlinkDataset, subset_samples

    root, geno = small_plink
    root2 = str(tmp_path / "blanky")
    for ext in (".bed", ".bim"):
        shutil.copyfile(root + ext, root2 + ext)
    lines = [ln for ln in open(root + ".fam").read().splitlines()
             if ln.strip()]
    with open(root2 + ".fam", "w") as fh:
        fh.write(lines[0] + "\n\n")          # blank line after sample 0
        fh.write("\n".join(lines[1:]) + "\n")
    ds = PlinkDataset.open(root2)
    out = subset_samples(ds, [0, 2, 5], str(tmp_path / "sub"))
    got = [ln.split()[:2] for ln in open(out + ".fam").read().splitlines()]
    want = [lines[i].split()[:2] for i in (0, 2, 5)]
    assert got == want


def test_snp_stats_range(small_plink):
    from flashpca_tpu.io.plink import PlinkDataset

    ds = PlinkDataset.open(small_plink[0])
    mean, sd = ds.snp_stats("binom2")
    m2, s2 = ds.snp_stats("binom2", snp_range=(5, 21))
    np.testing.assert_array_equal(m2, mean[5:21])
    np.testing.assert_array_equal(s2, sd[5:21])


def test_padding_bits_ignored(tmp_path):
    """The 2-bit slots beyond sample N in each SNP's last byte are
    padding; corrupting them must not change any result (the operator
    masks them via _valid, the dense loaders clip to N)."""
    import flashpca_tpu as fp

    rng = np.random.default_rng(3)
    g = rng.binomial(2, 0.3, size=(61, 20)).astype(float)  # 61 % 4 == 1
    root = str(tmp_path / "toy")
    write_bed(root, g)
    ds = PlinkDataset.open(root)
    clean = {
        "pca": np.asarray(fp.pca(root, ndim=4, seed=1).values),
        "stats": ds.snp_stats("binom2"),
        "mat": ds.read_matrix(),
        "codes": ds.read_codes(),
    }

    nbytes = bytes_per_snp(61)
    with open(root + ".bed", "rb") as fh:
        raw = bytearray(fh.read())
    for j in range(20):  # set all 3 padding slots of every SNP to 1-bits
        raw[3 + j * nbytes + (nbytes - 1)] |= 0b11111100
    with open(root + ".bed", "wb") as fh:
        fh.write(bytes(raw))

    ds2 = PlinkDataset.open(root)
    assert np.array_equal(
        clean["pca"], np.asarray(fp.pca(root, ndim=4, seed=1).values))
    m2, s2 = ds2.snp_stats("binom2")
    assert np.array_equal(clean["stats"][0], m2)
    assert np.array_equal(clean["stats"][1], s2)
    assert np.array_equal(clean["mat"], ds2.read_matrix())
    assert np.array_equal(clean["codes"], ds2.read_codes())


def test_open_rejects_bim_bed_mismatch(small_plink, tmp_path):
    """A .bim whose SNP count disagrees with the .bed (file size /
    ceil(N/4)) must fail loudly: output writers pair every row with its
    .bim id, so proceeding would silently mislabel results (the
    reference validates nothing here, data.cpp:150-176)."""
    import shutil

    from flashpca_tpu.io.plink import PlinkDataset

    root, _ = small_plink
    bad = str(tmp_path / "mismatch")
    for ext in (".bed", ".bim", ".fam"):
        shutil.copy(root + ext, bad + ext)
    with open(bad + ".bim") as fh:
        lines = fh.readlines()
    with open(bad + ".bim", "w") as fh:
        fh.writelines(lines[:-2])        # drop 2 SNPs from the .bim
    with pytest.raises(ValueError, match="lists .* SNPs but"):
        PlinkDataset.open(bad)


def test_open_warns_on_truncated_bed(small_plink, tmp_path):
    import shutil
    import warnings as _warnings

    from flashpca_tpu.io.plink import PlinkDataset

    root, geno = small_plink
    bad = str(tmp_path / "trunc")
    for ext in (".bed", ".bim", ".fam"):
        shutil.copy(root + ext, bad + ext)
    with open(bad + ".bed", "ab") as fh:
        fh.write(b"\x00\x00\x00\x00\x00")   # partial trailing SNP
    with _warnings.catch_warnings(record=True) as w:
        _warnings.simplefilter("always")
        ds = PlinkDataset.open(bad)
    assert any("trailing bytes" in str(x.message) for x in w)
    assert ds.n_snps == geno.shape[1]


def test_open_rejects_empty_fam(small_plink, tmp_path):
    import shutil

    from flashpca_tpu.io.plink import PlinkDataset

    root, _ = small_plink
    bad = str(tmp_path / "nofam")
    for ext in (".bed", ".bim"):
        shutil.copy(root + ext, bad + ext)
    open(bad + ".fam", "w").close()
    with pytest.raises(RuntimeError, match="no samples"):
        PlinkDataset.open(bad)


def test_open_rejects_empty_bim(small_plink, tmp_path):
    """A zero-SNP .bim next to a non-empty .bed is the most likely
    truncation/corruption shape; it must hit the same count check as a
    partial .bim, not slip past it (review r2)."""
    import shutil

    from flashpca_tpu.io.plink import PlinkDataset

    root, _ = small_plink
    bad = str(tmp_path / "emptybim")
    for ext in (".bed", ".fam"):
        shutil.copy(root + ext, bad + ext)
    open(bad + ".bim", "w").close()
    with pytest.raises(ValueError, match="lists 0 SNPs but"):
        PlinkDataset.open(bad)


def test_io_guards(tmp_path):
    """Malformed-input guards (review r4): non-hard-call dosages,
    id-length mismatches, self-overwriting subsets, truncated .bed,
    individual-major mode byte, short .fam/.bim lines."""
    import pytest

    from flashpca_tpu.io.plink import (BED_MAGIC, PlinkDataset,
                                       subset_samples, write_bed)

    rng = np.random.default_rng(0)
    geno = rng.binomial(2, 0.4, size=(9, 5)).astype(np.float64)
    root = str(tmp_path / "ok")
    write_bed(root, geno)
    ds = PlinkDataset.open(root)

    with pytest.raises(ValueError, match="hard calls"):
        write_bed(str(tmp_path / "f"), geno * 0.5)
    with pytest.raises(ValueError, match="snp_ids"):
        write_bed(str(tmp_path / "f"), geno, snp_ids=["a"])
    with pytest.raises(ValueError, match="fam_ids"):
        write_bed(str(tmp_path / "f"), geno, fam_ids=["a"])
    with pytest.raises(ValueError, match="collides"):
        subset_samples(ds, np.arange(4), root)
    with pytest.raises(ValueError, match="boolean mask"):
        subset_samples(ds, np.ones(4, dtype=bool), str(tmp_path / "s"))
    with pytest.raises(ValueError, match="holds 9 samples"):
        subset_samples(ds, np.array([0, 12]), str(tmp_path / "s"))
    # ds1 == ds2 must not raise on mapped datasets
    ds2 = PlinkDataset.open(root)
    ds.read_packed(); ds2.read_packed()
    assert ds == ds2

    # truncated .bed
    empty = tmp_path / "e.bed"
    empty.write_bytes(b"")
    for ext, content in (("bim", "1\tsnp1\t0\t1\tA\tC\n"),
                         ("fam", "f1\tf1\t0\t0\t0\t-9\n")):
        (tmp_path / f"e.{ext}").write_text(content)
    with pytest.raises(ValueError, match="3-byte"):
        PlinkDataset.open(str(tmp_path / "e"))

    # individual-major mode byte
    im = tmp_path / "im.bed"
    im.write_bytes(BED_MAGIC[:2] + b"\x00" + b"\x00" * 4)
    for ext in ("bim", "fam"):
        import shutil
        shutil.copyfile(tmp_path / f"e.{ext}", tmp_path / f"im.{ext}")
    with pytest.raises(ValueError, match="individual-major"):
        PlinkDataset.open(str(tmp_path / "im"))

    # short metadata lines
    bad = tmp_path / "b"
    import shutil
    shutil.copyfile(root + ".bed", str(bad) + ".bed")
    (tmp_path / "b.bim").write_text("1\tsnp1\t0\t1\tA\n")  # 5 cols
    (tmp_path / "b.fam").write_text("onlyfid\n")
    with pytest.raises(ValueError, match=r"\.fam:1"):
        PlinkDataset.open(str(bad))


def test_text_reader_guards(tmp_path):
    """read_text strictness (review r4): underscore 'numbers' rejected
    like strtod, firstcol beyond the line width errors with context,
    read_maf wraps NA MAFs, save_text validates rownames length."""
    import pytest

    from flashpca_tpu.io.text import read_maf, read_text, save_text

    f = tmp_path / "t.txt"
    f.write_text("a b 1_5\n")
    with pytest.raises(ValueError, match="parsed as a number"):
        read_text(str(f), firstcol=3)
    f.write_text("a b\n")
    with pytest.raises(ValueError, match="firstcol=3"):
        read_text(str(f), firstcol=3)
    frq = tmp_path / "x.frq"
    frq.write_text("CHR SNP A1 A2 MAF NCHROBS\n1 snp1 A C NA 0\n")
    with pytest.raises(ValueError, match="MAF 'NA'"):
        read_maf(str(frq), ["snp1"])
    with pytest.raises(ValueError, match="rownames has"):
        save_text(np.ones((3, 2)), str(tmp_path / "o.txt"),
                  rownames=["r1"])
