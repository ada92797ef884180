import numpy as np
import pytest

from flashpca_tpu.ops import standardize, scale2, VAR_TOL


def _oracle_binom(X, mult):
    """Independent reimplementation of Price 2006 eqn 3 semantics."""
    X = X.astype(np.float64)
    out = np.empty_like(X)
    means, sds = [], []
    for j in range(X.shape[1]):
        col = X[:, j]
        ok = ~np.isnan(col)
        m = col[ok].mean()
        P = m / 2
        s = np.sqrt(mult * P * (1 - P))
        means.append(m)
        sds.append(s)
        if s > VAR_TOL:
            out[:, j] = np.where(ok, (col - m) / s, 0.0)
        else:
            out[:, j] = np.where(ok, m, 0.0)
    return out, np.array(means), np.array(sds)


@pytest.mark.parametrize("method,mult", [("binom", 1.0), ("binom2", 2.0)])
def test_binom_methods(rng, method, mult):
    X = rng.binomial(2, 0.3, size=(50, 20)).astype(np.float64)
    X[rng.uniform(size=X.shape) < 0.1] = np.nan
    S, mean, sd = standardize(X, method)
    S2, m2, s2 = _oracle_binom(X, mult)
    np.testing.assert_allclose(S, S2, atol=1e-12)
    np.testing.assert_allclose(mean, m2)
    np.testing.assert_allclose(sd, s2)


def test_sd_method_matches_numpy(rng):
    X = rng.normal(size=(40, 8))
    S, mean, sd = standardize(X, "sd")
    np.testing.assert_allclose(mean, X.mean(0), atol=1e-12)
    np.testing.assert_allclose(sd, X.std(0, ddof=1), atol=1e-12)
    np.testing.assert_allclose(S, (X - X.mean(0)) / X.std(0, ddof=1), atol=1e-12)


def test_sd_method_with_missing(rng):
    X = rng.normal(size=(40, 4))
    X[3, 0] = np.nan
    X[10, 2] = np.nan
    S, mean, sd = standardize(X, "sd")
    col = X[:, 0]
    ok = ~np.isnan(col)
    np.testing.assert_allclose(mean[0], col[ok].mean())
    np.testing.assert_allclose(sd[0], col[ok].std(ddof=1))
    assert S[3, 0] == 0.0  # NaN -> 0 after scaling


def test_none_and_center(rng):
    X = rng.normal(size=(30, 5))
    X[2, 1] = np.nan
    Sn, mn, sn = standardize(X, "none")
    assert (sn == 1).all()
    np.testing.assert_allclose(Sn[2, 1], np.nanmean(X[:, 1]))  # impute only
    ok = ~np.isnan(X)
    np.testing.assert_array_equal(Sn[ok], X[ok])

    Sc, mc, sc = standardize(X, "center")
    assert (sc == 1).all()
    assert Sc[2, 1] == 0.0
    np.testing.assert_allclose(Sc[0, 0], X[0, 0] - np.nanmean(X[:, 0]))


def test_constant_column_kept_at_mean():
    # Batch path: sd <= VAR_TOL columns are set to their mean
    # (reference util.cpp:139-147), unlike the streaming path which
    # zeroes them.
    X = np.full((10, 2), 2.0)
    X[:, 1] = [0, 1] * 5
    S, mean, sd = standardize(X, "binom2")
    np.testing.assert_allclose(S[:, 0], 2.0)  # mean == 2, sd == 0


def test_scale2_alias(rng):
    X = rng.binomial(2, 0.4, size=(25, 6)).astype(float)
    S1, c1, s1 = scale2(X, "2")
    S2, c2, s2 = standardize(X, "binom2")
    np.testing.assert_array_equal(S1, S2)
    S3, _, _ = scale2(X, "1")
    S4, _, _ = standardize(X, "binom")
    np.testing.assert_array_equal(S3, S4)


def test_standardize_transpose_matches(rng):
    from flashpca_tpu.ops import standardize, standardize_transpose

    W = rng.binomial(2, 0.3, size=(15, 40)).astype(float)  # (p, N)
    W[2, 5] = np.nan
    for method in ("none", "sd", "binom", "binom2", "center"):
        Xs, m1, s1 = standardize(W.T, method)
        Wt, m2, s2 = standardize_transpose(W, method)
        np.testing.assert_array_equal(Wt, Xs.T)
        np.testing.assert_array_equal(m1, m2)
        np.testing.assert_array_equal(s1, s2)


def test_scale2_matches_r_on_monomorphic(rng):
    """The R oracle (scale2.R) has no VAR_TOL: a constant column
    divides 0/0 -> NaN -> imputed 0, where the C++ standardise sets it
    to its mean.  scale2 follows R; standardize follows C++ (the two
    references disagree, review r4)."""
    X = rng.binomial(2, 0.4, size=(20, 3)).astype(float)
    X[:, 1] = 2.0                         # monomorphic
    S_r, c, s = scale2(X, "2")
    np.testing.assert_allclose(S_r[:, 1], 0.0)          # R semantics
    S_c, _, _ = standardize(X, "binom2")
    np.testing.assert_allclose(S_c[:, 1], 2.0)          # C++ semantics
    # non-degenerate columns stay bit-identical across the two
    np.testing.assert_array_equal(S_r[:, [0, 2]], S_c[:, [0, 2]])
    import pytest
    with pytest.raises(ValueError, match="type"):
        scale2(X, "binom")
