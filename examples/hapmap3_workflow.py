"""End-to-end HapMap3 walkthrough (the flashpcaR vignette's flow,
flashpcaR/vignettes/flashpcaR.Rmd, on the thinned HapMap3 fileset).

Usage:  python examples/hapmap3_workflow.py /path/to/HM3_root [outdir]

Covers: streaming PCA, mean/sd + loadings persistence, projection of
the same (or new) samples, decomposition checking, UCCA and SCCA with
a synthetic phenotype, and CV penalty selection.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _env  # noqa: F401,E402  (repo path + FLASHPCA_FORCE_CPU handling)

import flashpca_tpu as fp  # noqa: E402


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else (
        "/root/reference/HapMap3/data")
    outdir = sys.argv[2] if len(sys.argv) > 2 else "."
    os.makedirs(outdir, exist_ok=True)

    # ------------------------------------------------------------------ PCA
    res = fp.pca(root, ndim=10, do_loadings=True)
    print("eigenvalues:", np.round(res.values, 4))
    print("pve        :", np.round(res.pve, 4))

    # persist the "model": loadings + mean/sd (the artifacts --project
    # consumes later; reference README.md:175-191)
    np.savetxt(os.path.join(outdir, "loadings.csv"), res.loadings)
    meansd = np.column_stack([res.center, res.scale])
    np.savetxt(os.path.join(outdir, "meansd.csv"), meansd)

    # ------------------------------------------------------------- project
    pr = fp.project(root, res.loadings, meansd=meansd)
    rmse = np.sqrt(np.mean((pr.projection - res.projection) ** 2))
    print(f"self-projection RMSE vs PCs: {rmse:.2e}")

    # --------------------------------------------------------------- check
    ck = fp.check(root, res.vectors, res.values)
    print(f"check: mse={ck.mse:.3e} rmse={ck.rmse:.3e}")

    # ---------------------------------------------------- UCCA w/ phenotype
    ds = fp.PlinkDataset.open(root)
    rng = np.random.default_rng(1)
    Y = res.projection[:, :2] + 0.5 * rng.standard_normal(
        (ds.n_samples, 2))  # phenotype correlated with structure
    uc = fp.ucca(root, Y)
    top = np.argsort(uc.pval)[:5]
    print("UCCA top-5 SNPs:", [ds.snp_ids[i] for i in top])

    # ---------------------------------------------------------------- SCCA
    sc = fp.scca(root, Y, lambda1=1e-3, lambda2=1e-3, ndim=2)
    print("SCCA d:", np.round(sc.d, 4),
          "non-zeros:", int(np.count_nonzero(sc.U[:, 0])))


if __name__ == "__main__":
    main()
