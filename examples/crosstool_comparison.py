"""Cross-tool PCA comparison on HapMap3 — analog of HapMap3/run.sh + plot.R.

The reference validates flashpca's k=100 HapMap3 PCA against two external
tools (EIGENSOFT smartpca and shellfish) plus R's exact ``prcomp``
(/root/reference/HapMap3/run.sh:8-36, plot.R:44-128), then plots pairwise
per-PC scatter panels with correlation annotations and the PC1/PC2
population-structure figure (the FlashPCA2 paper's Figure 1a/1b).

Those external binaries don't exist here; the same validation runs against
three *independent in-env implementations*:

  - numpy full SVD            (the exact oracle, ``prcomp`` analog)
  - scipy.sparse.linalg.svds  (implicitly-restarted Lanczos, RSpectra/
                               smartpca analog)
  - torch.pca_lowrank         (randomized PCA, shellfish analog)

All four decompose the same Price-2006-standardized matrix (plot.R:16-21),
and the script asserts the reference harness's acceptance bar: sign-aligned
per-PC correlation > 0.999 for the top k=10 PCs against the deterministic
tools (exact SVD and svds; the seeded randomized torch path is reported
informationally -- its own tail-PC accuracy is the limiting factor).

Outputs (in --outdir, default /tmp/crosstool_out):
  hapmap3.png        PC1 vs PC2 colored by HapMap3 population (Figure 1a)
  hapmap3_pairs.png  PC1 across the four tools, pairwise panels (Figure 1b)
  correlations.txt   per-PC cross-tool correlation table, k=10

Run: FLASHPCA_FORCE_CPU=1 python examples/crosstool_comparison.py
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _env  # noqa: F401,E402  (repo path + FLASHPCA_FORCE_CPU handling)

import flashpca_tpu as fp
from flashpca_tpu.ops import dense_standardized_np

HAPMAP3 = "/root/reference/HapMap3"

# Validated categorical palette (8 fixed-order hues); populations beyond
# eight reuse hues but stay identifiable through the marker shape, so
# identity is never carried by color alone.
PALETTE = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100",
           "#e87ba4", "#008300", "#4a3aa7", "#e34948"]
MARKERS = ["o", "s", "^", "D", "v", "P", "X", "*", "<", ">", "p"]


def aligned_corr(a, b):
    """|cor| per matching column, sign-invariant (plot.R panel.cor analog)."""
    a = a - a.mean(axis=0)
    b = b - b.mean(axis=0)
    num = np.sum(a * b, axis=0)
    den = np.sqrt(np.sum(a * a, axis=0) * np.sum(b * b, axis=0))
    return np.abs(num / den)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ndim", type=int, default=100)
    ap.add_argument("--kcheck", type=int, default=10)
    ap.add_argument("--outdir", default="/tmp/crosstool_out")
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    root = os.path.join(HAPMAP3, "data")
    ds = fp.PlinkDataset.open(root)
    print(f"data: {ds.n_samples} samples x {ds.n_snps} SNPs")

    # Price 2006 standardization (binom), like plot.R:15-21.
    mean, sd = ds.snp_stats("binom")
    X = dense_standardized_np(ds.read_codes(), mean, sd)  # (p, n) f64
    X = np.ascontiguousarray(X.T)                             # (n, p)

    # 1) flashpca_tpu (the system under test), same standardization.
    res = fp.pca(root, ndim=args.ndim, stand="binom", tol=1e-6,
                 maxiter=500, verbose=False)
    pcs_fp = np.asarray(res.projection, dtype=np.float64)

    # 2) Exact oracle: full SVD (prcomp analog, plot.R:30).
    U, s, _ = np.linalg.svd(X, full_matrices=False)
    pcs_svd = U[:, :args.ndim] * s[:args.ndim]

    # 3) Iterative Krylov: scipy svds (RSpectra/smartpca analog).
    from scipy.sparse.linalg import svds

    U2, s2, _ = svds(X, k=args.ndim)
    order = np.argsort(s2)[::-1]
    pcs_svds = U2[:, order] * s2[order]

    # 4) Randomized PCA: torch.pca_lowrank (shellfish analog).  Seeded:
    # its random range-finder would otherwise make this harness flaky.
    import torch

    torch.manual_seed(1)
    U3, s3, _ = torch.pca_lowrank(
        torch.from_numpy(X), q=args.ndim + 10, center=False, niter=7)
    pcs_torch = (U3[:, :args.ndim] * s3[:args.ndim]).numpy()

    k = args.kcheck
    tools = {"flashpca_tpu": pcs_fp, "svd": pcs_svd,
             "svds": pcs_svds, "torch": pcs_torch}
    names = list(tools)

    lines = [f"sign-aligned |cor| per PC (k={k})"]
    worst_vs_oracle = 1.0
    for a in range(len(names)):
        for b in range(a + 1, len(names)):
            c = aligned_corr(tools[names[a]][:, :k], tools[names[b]][:, :k])
            lines.append(f"{names[a]:>13s} vs {names[b]:<13s} "
                         + " ".join(f"{v:.6f}" for v in c))
            # the hard gate covers the deterministic exact/Krylov tools;
            # the randomized torch path is reported informationally (its
            # own tail-PC accuracy is the limiting factor, not ours)
            if ("flashpca_tpu" in (names[a], names[b])
                    and "torch" not in (names[a], names[b])):
                worst_vs_oracle = min(worst_vs_oracle, float(c.min()))
    # eigenvalue agreement (plot.R:120-127): squared singular values / p
    d_fp = np.asarray(res.values)[:k]
    d_svd = (s[:k] ** 2) / ds.n_snps
    lines.append("eigenvalues flashpca vs svd rel err: "
                 f"{np.max(np.abs(d_fp - d_svd) / d_svd):.3e}")
    report = "\n".join(lines)
    print(report)
    with open(os.path.join(args.outdir, "correlations.txt"), "w") as fh:
        fh.write(report + "\n")

    bar = 0.999  # reference acceptance: sign-aligned correlation > 0.999
    if worst_vs_oracle <= bar:
        raise SystemExit(
            f"FAIL: worst |cor| vs other tools {worst_vs_oracle:.6f} <= {bar}")
    print(f"PASS: worst flashpca_tpu-vs-tool |cor| {worst_vs_oracle:.6f} > {bar}")

    plot(ds, pcs_fp, tools, k, args.outdir)


def plot(ds, pcs_fp, tools, k, outdir):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    # population labels (plot.R:33-37)
    pops = {}
    with open(os.path.join(HAPMAP3, "relationships_w_pops_121708.txt")) as fh:
        next(fh)
        for ln in fh:
            f = ln.split()
            pops[f[1]] = f[6]
    lab = np.array([pops.get(i, "?") for i in ds.indiv_ids])
    levels = sorted(set(lab))

    # Figure 1a analog: PC1 vs PC2 colored by population.
    fig, ax = plt.subplots(figsize=(6.2, 5.6))
    for i, lv in enumerate(levels):
        m = lab == lv
        ax.scatter(pcs_fp[m, 0], pcs_fp[m, 1], s=14,
                   color=PALETTE[i % len(PALETTE)],
                   marker=MARKERS[i % len(MARKERS)],
                   linewidths=0, alpha=0.85, label=lv)
    ax.set_xlabel("PC1")
    ax.set_ylabel("PC2")
    ax.set_title(f"HapMap3 population structure (flashpca_tpu, k={k})")
    ax.legend(ncol=2, fontsize=8, frameon=False)
    for s_ in ("top", "right"):
        ax.spines[s_].set_visible(False)
    fig.tight_layout()
    fig.savefig(os.path.join(outdir, "hapmap3.png"), dpi=150)
    plt.close(fig)

    # Figure 1b analog: PC1 pairwise across tools, |cor| annotated.
    names = list(tools)
    nt = len(names)
    fig, axes = plt.subplots(nt, nt, figsize=(2.1 * nt, 2.1 * nt))
    for a in range(nt):
        for b in range(nt):
            ax = axes[a, b]
            x, y = tools[names[b]][:, 0], tools[names[a]][:, 0]
            if a == b:
                ax.text(0.5, 0.5, names[a], ha="center", va="center",
                        transform=ax.transAxes)
            elif a < b:  # upper: scatter
                ax.scatter(x, y, s=4, color=PALETTE[0], linewidths=0,
                           alpha=0.6)
            else:  # lower: correlation (plot.R panel.cor)
                c = aligned_corr(x[:, None], y[:, None])[0]
                ax.text(0.5, 0.5, f"{c:.4f}", ha="center", va="center",
                        fontsize=12, transform=ax.transAxes)
            ax.set_xticks([])
            ax.set_yticks([])
    fig.suptitle("PC1 across tools (sign-aligned |cor| in lower panels)")
    fig.tight_layout()
    fig.savefig(os.path.join(outdir, "hapmap3_pairs.png"), dpi=150)
    plt.close(fig)
    print(f"wrote {outdir}/hapmap3.png, hapmap3_pairs.png")


if __name__ == "__main__":
    main()
