"""SCCA penalty tuning by train/test split validation -- the in-framework
equivalent of the reference's scca.sh + scca_pred.R pipeline
(/root/reference/scca.sh:39-85, scca_pred.R:17-84).

Usage:
    python examples/scca_split_workflow.py <plink_root> <pheno.txt> [outdir]

The phenotype file is FID IID pheno1 pheno2 ... in .fam order, exactly
like the reference pipeline requires (scca.sh:13-17).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _env  # noqa: F401,E402  (repo path + FLASHPCA_FORCE_CPU handling)

import flashpca_tpu as fp
from flashpca_tpu.io.text import read_text
from flashpca_tpu.plots import plot_split_scca, plot_split_scca_sparsity


def main():
    root = sys.argv[1]
    pheno = sys.argv[2]
    outdir = sys.argv[3] if len(sys.argv) > 3 else "."

    Y = read_text(pheno, firstcol=3)
    # the reference's grids (scca.sh:22-27)
    lambda1 = np.unique(np.concatenate([
        np.arange(1.1e-3, 5.0e-3, 2e-4), [4.4e-3, 4.6e-3, 4.8e-3,
                                          5.1e-3, 5.2e-3]]))
    lambda2 = np.array([1e-5, 1e-4, 1e-3])

    ndim = min(10, Y.shape[1])   # at most as many dims as phenotypes
    res = fp.split_scca(
        root, Y, lambda1, lambda2, ndim=ndim, prop_train=0.8, seed=1,
        workdir=outdir, verbose=True, maxiter=500, tol=1e-6,
    )
    print(res)
    print(f"best lambda1={res.best_lambda1:g} lambda2={res.best_lambda2:g} "
          f"test corr={res.best_corr:.4f}")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(11, 4.5))
    plot_split_scca(res, ax=axes[0])
    plot_split_scca_sparsity(res, ax=axes[1])
    fig.tight_layout()
    fig.savefig(f"{outdir}/scca_split.png", dpi=150)
    print(f"wrote {outdir}/scca_split.png")


if __name__ == "__main__":
    main()
