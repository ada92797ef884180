import numpy as np
import pytest

from flashpca_tpu.models.pca import pca
from flashpca_tpu.models.project import project
from flashpca_tpu.models.check import check
from flashpca_tpu.io import PlinkDataset, maf2meansd


def test_self_projection_equals_pcs(small_plink):
    """X V / sqrt(p) == U sqrt(d): projecting the training data onto its
    own loadings reproduces the PCs (HapMap3/test_pca.R projection test)."""
    root, _ = small_plink
    res = pca(root, 4, tol=1e-10, do_loadings=True)
    meansd = np.column_stack([res.center, res.scale])
    pr = project(root, res.loadings, meansd=meansd)
    np.testing.assert_allclose(pr.projection, res.projection, atol=1e-8)


def test_projection_maf_path(small_plink):
    """MAF-based projection uses mean=2*maf and the variance-in-sd-slot
    quirk; verify against direct computation."""
    root, _ = small_plink
    ds = PlinkDataset.open(root)
    res = pca(root, 3, tol=1e-10, do_loadings=True)
    maf = res.center / 2.0
    pr = project(root, res.loadings, maf=maf)
    # oracle: standardize with mean=2maf, "sd"=2maf(1-maf) (the variance)
    from flashpca_tpu.ops.genotypes import dense_standardized_np
    ms = maf2meansd(maf)
    W = dense_standardized_np(ds.read_codes(), ms[:, 0], ms[:, 1])
    ref = W.T @ res.loadings / np.sqrt(ds.n_snps)
    np.testing.assert_allclose(pr.projection, ref, atol=1e-8)


def test_projection_numeric_path(rng):
    n, p, k = 40, 30, 3
    X = rng.binomial(2, 0.3, size=(n, p)).astype(float)
    res = pca(X, k, tol=1e-10, do_loadings=True)
    pr = project(X, res.loadings, orig_mean=res.center, orig_sd=res.scale)
    np.testing.assert_allclose(pr.projection, res.projection, atol=1e-8)


def test_projection_ref_allele_mismatch(small_plink):
    root, _ = small_plink
    ds = PlinkDataset.open(root)
    res = pca(root, 2, tol=1e-8, do_loadings=True)
    bad = list(ds.ref_alleles)
    bad[3] = "T"
    with pytest.raises(ValueError, match="alleles mismatch"):
        project(root, res.loadings, meansd=np.column_stack([res.center, res.scale]),
                ref_alleles=bad)


def test_projection_dim_mismatch(small_plink):
    root, _ = small_plink
    with pytest.raises(ValueError, match="loadings rows"):
        project(root, np.ones((5, 2)), meansd=np.ones((5, 2)))


def test_check_good_decomposition(small_plink):
    root, _ = small_plink
    res = pca(root, 4, tol=1e-12)
    c = check(root, res.vectors, res.values)
    assert c.mse < 1e-15
    assert c.rmse < 1e-7
    assert c.err.shape == (4,)


def test_check_bad_decomposition(small_plink):
    root, _ = small_plink
    res = pca(root, 3, tol=1e-12)
    wrong = res.values * 1.5
    c = check(root, res.vectors, wrong)
    assert c.mse > 1e-6


def test_check_matrix_path(rng):
    n, p = 50, 80
    X = rng.binomial(2, 0.4, size=(n, p)).astype(float)
    res = pca(X, 3, tol=1e-12)
    c = check(X, res.vectors, res.values)
    assert c.rmse < 1e-8


def test_check_dim_validation(small_plink):
    root, _ = small_plink
    with pytest.raises(ValueError, match="doesn't match data dimension"):
        check(root, np.ones((5, 2)), np.ones(2))


def test_check_accepts_operator_and_device_evec(small_plink):
    """check() on a prebuilt operator with device-resident eigenvectors
    (the pca(device_results=True) -> check pipeline, nothing big ever
    fetched) == check() via the fileset path."""
    import jax.numpy as jnp
    from flashpca_tpu.ops.operator import PackedOperator

    root, _ = small_plink
    ds = PlinkDataset.open(root)
    mean, sd = ds.snp_stats("binom2")
    op = PackedOperator(ds.read_packed(), mean, sd, ds.n_samples,
                        dtype=jnp.float64)
    res = pca(op, 3, tol=1e-9, device_results=True)
    chk_op = check(op, res.vectors, res.values)
    chk_ds = check(root, np.asarray(res.vectors), res.values)
    np.testing.assert_allclose(chk_op.err, chk_ds.err, rtol=1e-9,
                               atol=1e-18)
    assert chk_op.mse < 1e-10


def test_check_accepts_list_evec(small_plink):
    """Regression: list inputs for evec must still work (the old code
    normalized via np.asarray before touching .shape)."""
    root, _ = small_plink
    res = pca(root, 2, tol=1e-9)
    chk = check(root, [list(r) for r in res.vectors], list(res.values))
    assert chk.mse < 1e-10


def test_check_ucca_project_guards(small_plink, rng):
    """Review-r4 guards: tall operators rejected with clear errors,
    stand with prebuilt operators raises, 1-D evec accepted, stored
    orig_mean/orig_sd honored on the PLINK path, stats-shape errors."""
    import jax.numpy as jnp

    from flashpca_tpu.models.check import check
    from flashpca_tpu.models.pca import pca
    from flashpca_tpu.models.project import project
    from flashpca_tpu.models.ucca import ucca
    from flashpca_tpu.ops.operator import PackedOperator, TallPackedOperator

    root, geno = small_plink
    ds = PlinkDataset.open(root)
    mean, sd = ds.snp_stats("binom2")
    res = pca(root, 2, tol=1e-10)
    tall = TallPackedOperator(ds.read_packed(), mean, sd, ds.n_samples,
                              dtype=jnp.float64)
    wide = PackedOperator(ds.read_packed(), mean, sd, ds.n_samples,
                          dtype=jnp.float64)
    Y = rng.normal(size=(ds.n_samples, 2))

    with pytest.raises(ValueError, match="WIDE"):
        check(tall, res.vectors, res.values)
    with pytest.raises(ValueError, match="wide"):
        ucca(tall, Y)
    with pytest.raises(ValueError, match="stand"):
        check(wide, res.vectors, res.values, stand="binom")
    with pytest.raises(ValueError, match="stand_x"):
        ucca(wide, Y, stand_x="binom")

    # 1-D evec = one component
    c1 = check(root, res.vectors[:, 0], [res.values[0]])
    c2 = check(root, res.vectors[:, :1], res.values[:1])
    np.testing.assert_allclose(c1.mse, c2.mse)

    # PLINK projection with STORED stats must use them (previously
    # silently recomputed from the new cohort)
    pr_stored = project(root, res.loadings if res.loadings is not None
                        else pca(root, 2, tol=1e-10,
                                 do_loadings=True).loadings,
                        orig_mean=mean, orig_sd=sd)
    V = pca(root, 2, tol=1e-10, do_loadings=True).loadings
    pr_meansd = project(root, V, meansd=np.column_stack([mean, sd]))
    np.testing.assert_allclose(pr_stored.projection, pr_meansd.projection,
                               rtol=1e-12)
    with pytest.raises(ValueError, match="together"):
        project(root, V, orig_mean=mean)
    with pytest.raises(ValueError, match="meansd has shape"):
        project(root, V, meansd=np.column_stack([mean, sd])[:-1])
    with pytest.raises(ValueError, match="ref_alleles has"):
        project(root, V, ref_alleles=["A"])
    with pytest.raises(ValueError, match="unknown divisor"):
        check(root, res.vectors, res.values, divisor="n-1")
