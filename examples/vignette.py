"""flashpca_tpu walkthrough -- the analog of the flashpcaR vignette
(flashpcaR/vignettes/flashpcaR.Rmd): PCA, projection, checking, SCCA
with CV penalty selection, and UCCA, end to end on the bundled demo
data.

Usage: python examples/vignette.py [workdir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _env  # noqa: F401,E402  (repo path + FLASHPCA_FORCE_CPU handling)

import numpy as np

import flashpca_tpu as fp
from flashpca_tpu.io.text import read_text
from examples.make_demo_data import make_demo


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp()
    root, pop = make_demo(workdir)
    Y = read_text(root + ".pheno.txt", firstcol=3)

    # ---- PCA with loadings + stored standardization stats ----------------
    res = fp.pca(root, ndim=5, do_loadings=True)
    print("eigenvalues:", np.round(res.values, 4))
    print("pve:        ", np.round(res.pve, 4))

    # populations separate on the top PCs
    pc1 = res.projection[:, 0]
    means = [pc1[pop == q].mean() for q in range(3)]
    print("PC1 population means:", np.round(means, 3))

    # ---- project new samples (here: the same cohort) ----------------------
    ms = np.column_stack([res.center, res.scale])
    pr = fp.project(root, res.loadings, meansd=ms)
    err = np.abs(pr.projection - res.projection).max()
    print(f"self-projection max |err| vs PCs: {err:.2e}")

    # ---- verify the decomposition (--check) -------------------------------
    ck = fp.check(root, res.vectors, res.values)
    print(f"check mse={ck.mse:.3e} rmse={ck.rmse:.3e}")

    # ---- sparse CCA with k-fold CV penalty selection ----------------------
    # the PLINK path keeps genotypes 2-bit packed through the whole CV
    # (per-fold subset repack + batched penalty grid); pass a dense
    # matrix instead if the data is already in memory
    cv = fp.cv_scca(root, Y, lambda1=np.logspace(-4, -1.2, 4),
                    lambda2=[1e-4, 1e-3], ndim=2, nfolds=4)
    print(cv)
    sc = fp.scca(root, Y, cv.best_lambda1, cv.best_lambda2, ndim=2)
    print("SCCA d:", np.round(sc.d, 4),
          "nonzero U:", np.count_nonzero(sc.U, axis=0))

    # ---- per-SNP multivariate ANOVA (UCCA) --------------------------------
    uc = fp.ucca(root, Y)
    top = np.argsort(uc.pval)[:5]
    print("top UCCA SNPs:", top, "p:", uc.pval[top])


if __name__ == "__main__":
    main()
