import numpy as np
import pytest
from scipy.stats import f as f_dist

from flashpca_tpu.models.ucca import ucca
from flashpca_tpu.ops import standardize


def _lm_oracle(X, Y):
    """Per-SNP r2/F/p from ordinary least squares of x_j ~ Y with
    intercept -- the R `lm()` oracle (HapMap3/test_cca.R, test_ucca.R)."""
    n, k = Y.shape
    D = np.column_stack([np.ones(n), Y])
    out = np.zeros((X.shape[1], 3))
    for j in range(X.shape[1]):
        x = X[:, j]
        beta, *_ = np.linalg.lstsq(D, x, rcond=None)
        fit = D @ beta
        sst = ((x - x.mean()) ** 2).sum()
        ssr = ((x - fit) ** 2).sum()
        # degenerate (constant) column: define r2 = 0 instead of 0/0
        # (the framework standardizes such columns to all-zero, which
        # yields r2 = 0 too) -- keeps the oracle warning-free
        r2 = 1 - ssr / sst if sst > 0 else 0.0
        F = r2 / (1 - r2) * (n - k - 1) / k
        p = f_dist.sf(F, k, n - k - 1)
        out[j] = [np.sqrt(r2), F, p]
    return out


@pytest.fixture(scope="module")
def xy():
    rng = np.random.default_rng(3042)
    n, p, k = 200, 40, 3
    maf = rng.uniform(0.1, 0.5, size=p)
    X = rng.binomial(2, maf[None, :], size=(n, p)).astype(np.float64)
    # phenotypes correlated with some SNPs
    Y = rng.normal(size=(n, k))
    Y[:, 0] += 1.5 * X[:, 0]
    Y[:, 1] += 1.2 * X[:, 1]
    return X, Y


def test_ucca_matrix_matches_lm(xy):
    X, Y = xy
    res = ucca(X, Y)
    # oracle on the standardized X (binom2), standardized Y (sd)
    Xs, _, _ = standardize(X, "binom2")
    Ys, _, _ = standardize(Y, "sd")
    ref = _lm_oracle(Xs, Ys)
    np.testing.assert_allclose(res.r, ref[:, 0], rtol=1e-6)
    np.testing.assert_allclose(res.fstat, ref[:, 1], rtol=1e-6)
    np.testing.assert_allclose(res.pval, ref[:, 2], rtol=1e-5, atol=1e-12)


def test_ucca_plink_matches_matrix(small_plink, rng):
    root, geno = small_plink
    n = geno.shape[0]
    Y = rng.normal(size=(n, 2))
    res_pl = ucca(root, Y)
    # matrix path with *streaming* standardization semantics: use the
    # packed-decoded values
    from flashpca_tpu.io import PlinkDataset
    from flashpca_tpu.ops.genotypes import dense_standardized_np
    ds = PlinkDataset.open(root)
    mean, sd = ds.snp_stats("binom2")
    W = dense_standardized_np(ds.read_codes(), mean, sd)
    Ys, _, _ = standardize(Y, "sd")
    ref = _lm_oracle(W.T, Ys)
    ok = sd > 1e-9  # constant column: r2 undefined, matches ref behavior
    np.testing.assert_allclose(res_pl.r[ok], ref[ok, 0], rtol=1e-5)
    np.testing.assert_allclose(res_pl.fstat[ok], ref[ok, 1], rtol=1e-5)


def test_ucca_significant_snps_detected(xy):
    X, Y = xy
    res = ucca(X, Y)
    # SNPs 0 and 1 drive phenotypes; they must be the most significant
    top2 = set(np.argsort(res.pval)[:2])
    assert top2 == {0, 1}


def test_ucca_output_shape(xy):
    X, Y = xy
    res = ucca(X, Y)
    assert res.result.shape == (X.shape[1], 3)
    assert ((res.pval >= 0) & (res.pval <= 1)).all()


def test_ucca_accepts_prebuilt_operator(small_plink, rng):
    import jax.numpy as jnp
    from flashpca_tpu.io.plink import PlinkDataset
    from flashpca_tpu.ops.operator import PackedOperator

    root, geno = small_plink
    ds = PlinkDataset.open(root)
    mean, sd = ds.snp_stats("binom2")
    op = PackedOperator(ds.read_packed(), mean, sd, ds.n_samples,
                        dtype=jnp.float64)
    Y = rng.normal(size=(ds.n_samples, 3))
    res_op = ucca(op, Y)
    res_ds = ucca(root, Y)
    np.testing.assert_allclose(res_op.result, res_ds.result,
                               rtol=1e-10, atol=1e-12)


def test_ucca_accepts_dense_operator(xy):
    """DenseOperator is admitted by ucca's operator branch and must
    produce the same moments path (snp_sumsq regression)."""
    import jax.numpy as jnp
    from flashpca_tpu.ops.operator import DenseOperator

    X, Y = xy
    Xs, _, _ = standardize(X.copy(), "binom2")
    res_op = ucca(DenseOperator(Xs, dtype=jnp.float64), Y)
    res_mx = ucca(X, Y)
    np.testing.assert_allclose(res_op.result, res_mx.result,
                               rtol=1e-9, atol=1e-12)
