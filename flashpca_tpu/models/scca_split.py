"""SCCA split-validation pipeline.

In-framework equivalent of the reference's ``scca.sh`` + ``scca_pred.R``
workflow (scca.sh:39-85, scca_pred.R:17-84):

1. split samples into train/test (the awk + ``plink --keep`` step,
   scca.sh:42-50 -- here :func:`flashpca_tpu.io.plink.subset_samples`);
2. run SCCA on the training set over a (lambda1, lambda2) grid
   (the GNU-parallel flashpca runs, scca.sh:65-79);
3. standardize the TEST genotypes/phenotypes with the TRAINING
   statistics and project them onto each model's U/V (the ``predict``
   step, scca.sh:81-89, fixing scca_pred.R's "TODO: scale by original
   scaling of Y in training data");
4. score each grid point by the test-set canonical correlations
   ``cor(X_test U_j, Y_test V_j)`` (scca_pred.R:74-80).

Unlike ``cv_scca`` (matrix-only k-fold CV), this pipeline runs on PLINK
filesets end to end, so the genotypes stay 2-bit packed throughout.
"""

from __future__ import annotations

import os
import tempfile
from dataclasses import dataclass

import numpy as np

from ..io.plink import PlinkDataset, subset_samples
from ..ops.operator import (StreamingPackedOperator, build_packed_operator,
                            default_dtype)
from ..ops.standardize import VAR_TOL, standardize
from ..utils.logging import log
from .scca import grid_fastpath, scca, scca_grid



@dataclass
class SplitSCCAResult:
    train_idx: np.ndarray     # sample indices of the training split
    test_idx: np.ndarray
    lambda1: np.ndarray
    lambda2: np.ndarray
    ndim: int
    corr_train: np.ndarray    # (ndim, n1, n2) train canonical corr
    corr_test: np.ndarray     # (ndim, n1, n2) test canonical corr
    nzero_x: np.ndarray       # (ndim, n1, n2) non-zeros in U
    nzero_y: np.ndarray
    converged: np.ndarray     # (n1, n2)
    opt_dim: int
    best_lambda1: float
    best_lambda2: float
    best_corr: float

    def __repr__(self):
        return (f"SplitSCCAResult(best_lambda1={self.best_lambda1:g}, "
                f"best_lambda2={self.best_lambda2:g}, "
                f"best_corr={self.best_corr:.4f})")


def split_scca(
    data,
    Y: np.ndarray,
    lambda1=None,
    lambda2=None,
    *,
    ndim: int = 10,
    prop_train: float = 0.8,
    seed: int = 1,
    opt_dim: int = 1,
    stand_x: str = "binom2",
    stand_y: str = "sd",
    workdir: str | None = None,
    verbose: bool = False,
    **scca_kwargs,
) -> SplitSCCAResult:
    """Train/test split-validation of SCCA penalties on PLINK data.

    ``data``: PLINK root / PlinkDataset.  ``Y``: (N, k) phenotypes in
    .fam order (scca.sh requires the same order, scca.sh:15-17).
    ``workdir``: where the train/test filesets are written (a temp dir
    by default).  Extra kwargs go to :func:`scca` (e.g. ``maxiter``,
    ``tol``, ``mesh``, ``streaming``).
    """
    for bad in ("state_out", "state_in"):
        if bad in scca_kwargs:
            raise ValueError(
                f"{bad} cannot be forwarded to a penalty grid: every "
                "(lambda1, lambda2) cell would overwrite the same file; "
                "checkpoint individual scca() runs instead")
    if isinstance(data, str):
        data = PlinkDataset.open(data)
    Y = np.asarray(Y, dtype=np.float64)
    if Y.ndim == 1:
        Y = Y[:, None]
    n = data.n_samples
    if Y.shape[0] != n:
        raise ValueError("Y rows must match the number of samples")
    if not (0.0 < prop_train < 1.0):
        raise ValueError("prop_train must be in (0, 1)")

    lambda1 = np.atleast_1d(np.asarray(
        lambda1 if lambda1 is not None else np.linspace(1e-3, 5e-3, 5),
        dtype=np.float64))
    lambda2 = np.atleast_1d(np.asarray(
        lambda2 if lambda2 is not None else np.array([1e-5, 1e-4, 1e-3]),
        dtype=np.float64))
    if not (1 <= opt_dim <= ndim):
        raise ValueError("opt_dim must be between 1 and ndim")

    rng = np.random.default_rng(seed)
    train = rng.uniform(size=n) < prop_train     # awk rand() < p split
    if train.all() or not train.any():
        raise ValueError("degenerate train/test split; adjust prop_train")
    train_idx = np.flatnonzero(train)
    test_idx = np.flatnonzero(~train)

    cleanup = workdir is None
    if cleanup:
        workdir = tempfile.mkdtemp(prefix="scca_split_")
    else:
        os.makedirs(workdir, exist_ok=True)
    base = os.path.basename(data.bed_path)[:-4]
    root_train = subset_samples(
        data, train_idx, os.path.join(workdir, base + "_train"))
    ds_train = PlinkDataset.open(root_train)
    root_test = subset_samples(
        data, test_idx, os.path.join(workdir, base + "_test"))
    ds_test = PlinkDataset.open(root_test)

    Y_train = Y[train_idx]
    Y_test = Y[test_idx]
    # training-set standardization stats, applied to BOTH splits
    Yt_std, y_mean, y_sd = standardize(Y_train.copy(), stand_y)
    y_inv = np.where(y_sd > VAR_TOL,
                     1.0 / np.where(y_sd > VAR_TOL, y_sd, 1.0), 0.0)
    Yte_std = (Y_test - y_mean[None, :]) * y_inv[None, :]
    # missing TEST phenotypes impute to the (training) mean = 0 after
    # standardization, like the training side's standardize(); a single
    # propagated NaN otherwise poisons every corr_test cell into a
    # spurious 'no model converged' (review r4)
    Yte_std[np.isnan(Yte_std)] = 0.0
    # test genotypes stay 2-bit packed: an operator built over the TEST
    # fileset with the TRAIN standardization stats projects via prod()
    # (memory bounded like everything else -- never a dense (n, p) X)
    x_mean, x_sd = ds_train.snp_stats(stand_x)
    # honor a caller's dtype/block_size from scca_kwargs: the operators
    # are prebuilt here, and scca()'s conflict check would otherwise
    # reject the forwarded dtype against a default-dtype operator
    op_dtype = scca_kwargs.get("dtype") or default_dtype()
    op_opts = dict(
        streaming=scca_kwargs.get("streaming", "auto"),
        memory_mb=scca_kwargs.get("memory_mb"),
        block_size=scca_kwargs.get("block_size"),
        dtype=op_dtype,
        mesh=scca_kwargs.get("mesh"),
    )
    # an explicit device engine cannot serve a streaming request --
    # raise like solo scca() does, BEFORE the kwargs are consumed below
    if (scca_kwargs.get("engine") == "device"
            and (scca_kwargs.get("streaming") is True
                 or scca_kwargs.get("memory_mb") is not None)):
        raise ValueError(
            "engine='device' needs a resident operator; use "
            "engine='host' or engine='auto' with streaming/memory_mb")
    # the residency/blocking requests are CONSUMED by the operator
    # builds below; the inner scca()/scca_grid() calls receive prebuilt
    # operators, whose conflict check rejects these kwargs
    for consumed in ("streaming", "memory_mb", "block_size"):
        scca_kwargs.pop(consumed, None)
    op_test = build_packed_operator(ds_test, x_mean, x_sd, **op_opts)
    if (scca_kwargs.get("engine") == "device"
            and isinstance(op_test, StreamingPackedOperator)):
        # AUTO-resolved streaming must surface the same conflict an
        # explicit request does (solo scca() raises it, review r4)
        raise ValueError(
            "engine='device' needs a resident operator, but this "
            "dataset auto-streams; use engine='host'/'auto'")
    # ONE train operator for the whole grid: every (l1, l2) cell reuses
    # the stats pass, the device upload, and (via the operator's stable
    # product identities) the compiled SCCA dimension program
    op_train = build_packed_operator(ds_train, x_mean, x_sd, **op_opts)

    n1, n2 = len(lambda1), len(lambda2)
    corr_train = np.full((ndim, n1, n2), np.nan)
    corr_test = np.full((ndim, n1, n2), np.nan)
    nzx = np.zeros((ndim, n1, n2))
    nzy = np.zeros((ndim, n1, n2))
    conv = np.zeros((n1, n2), dtype=bool)

    def _diag_corr(A, B):
        out = np.full(A.shape[1], np.nan)
        for j in range(A.shape[1]):
            a, b = A[:, j], B[:, j]
            if a.std() > 0 and b.std() > 0:
                out[j] = np.corrcoef(a, b)[0, 1]
        return out

    grid_ok, gkw = grid_fastpath(scca_kwargs, ("V0",))
    # streaming train operators ride the batched grid too: scca_grid's
    # host-driven engine shares each staged pass across cells
    use_grid = grid_ok
    if not use_grid:
        log("split_scca: sequential per-cell fallback (host engine or "
            "kwargs outside GRID_COMPAT_KWARGS)", verbose=verbose)
    if use_grid:
        # every grid cell rides the SAME genotype panel pass per
        # iteration (scca_grid): the whole grid costs ~one cell
        gkw.setdefault("seed", seed)
        g = scca_grid(op_train, Y_train, lambda1, lambda2, ndim=ndim,
                      stand_x=stand_x, stand_y=stand_y, verbose=verbose,
                      **gkw)
        p = g.U.shape[0]
        C = len(g.lambda1)
        conv[:] = g.converged.reshape(n1, n2)
        nzx[:] = np.count_nonzero(g.U, axis=0).reshape(ndim, n1, n2)
        nzy[:] = np.count_nonzero(g.V, axis=0).reshape(ndim, n1, n2)
        # train/test projections for ALL converged cells in one panel
        # pass each (invdiv scaling drops out of the correlations)
        px_tr = np.asarray(op_train.prod(g.U.reshape(p, ndim * C)),
                           dtype=np.float64).reshape(-1, ndim, C)
        px_te = np.asarray(op_test.prod(g.U.reshape(p, ndim * C)),
                           dtype=np.float64).reshape(-1, ndim, C)
        for c in range(C):
            i, j = divmod(c, n2)
            if not g.converged[c]:
                continue
            corr_train[:, i, j] = _diag_corr(px_tr[:, :, c],
                                             Yt_std @ g.V[:, :, c])
            corr_test[:, i, j] = _diag_corr(px_te[:, :, c],
                                            Yte_std @ g.V[:, :, c])
    else:
        for i, l1 in enumerate(lambda1):
            for j, l2 in enumerate(lambda2):
                log(f"-> lambda1={l1:g} lambda2={l2:g}", verbose=verbose)
                res = scca(op_train, Y_train, float(l1), float(l2),
                           ndim=ndim, stand_x=stand_x, stand_y=stand_y,
                           seed=seed, verbose=verbose, **scca_kwargs)
                conv[i, j] = res.converged
                nzx[:, i, j] = np.count_nonzero(res.U, axis=0)
                nzy[:, i, j] = np.count_nonzero(res.V, axis=0)
                if not res.converged:
                    continue
                corr_train[:, i, j] = _diag_corr(res.Px, res.Py)
                px_test = np.asarray(op_test.prod(res.U), dtype=np.float64)
                corr_test[:, i, j] = _diag_corr(px_test, Yte_std @ res.V)

    sl = corr_test[opt_dim - 1]
    if np.all(np.isnan(sl)):
        raise RuntimeError("no model converged on any penalty pair")
    best = np.unravel_index(np.nanargmax(sl), sl.shape)
    if cleanup:
        # default-workdir scratch train/test filesets are dataset-scale;
        # remove them on success like cv_scca's fold scratch (review
        # r4; left in place on failure for debugging, and kept whenever
        # the caller named a workdir)
        import shutil

        for dsx in (ds_train, ds_test):
            dsx._mmap = None
        shutil.rmtree(workdir, ignore_errors=True)
    return SplitSCCAResult(
        train_idx=train_idx, test_idx=test_idx,
        lambda1=lambda1, lambda2=lambda2, ndim=ndim,
        corr_train=corr_train, corr_test=corr_test,
        nzero_x=nzx, nzero_y=nzy, converged=conv, opt_dim=opt_dim,
        best_lambda1=float(lambda1[best[0]]),
        best_lambda2=float(lambda2[best[1]]),
        best_corr=float(sl[best]),
    )
