"""Generate the bundled demo PLINK fileset (deterministic).

The analog of flashpcaR's bundled ``inst/extdata/data_chr1`` (a 957 x
1,128 PLINK fileset used by its vignettes and unit tests): a small
synthetic cohort with population structure, missing genotypes, and a
few monomorphic SNPs, written as demo.{bed,bim,fam} next to this file.

Usage: python examples/make_demo_data.py [outdir]
"""

import os
import sys

import numpy as np

import _env  # noqa: F401  (repo path + FLASHPCA_FORCE_CPU handling)


def make_demo(outdir: str, n: int = 300, p: int = 600, seed: int = 11):
    from flashpca_tpu.io.plink import write_bed

    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_pops = 3
    pop = rng.integers(0, n_pops, size=n)
    base = rng.uniform(0.05, 0.5, size=p)
    shift = rng.normal(0, 0.08, size=(n_pops, p))
    freq = np.clip(base[None, :] + shift, 0.01, 0.99)   # (pops, p)
    geno = rng.binomial(2, freq[pop]).astype(np.float64)
    geno[rng.uniform(size=(n, p)) < 0.02] = np.nan       # 2% missing
    geno[:, :3] = 0.0                                    # monomorphic SNPs
    root = os.path.join(outdir, "demo")
    write_bed(root, geno,
              snp_ids=[f"rs{j+1}" for j in range(p)],
              fam_ids=[f"POP{pop[i]}_IND{i+1}" for i in range(n)])
    # phenotypes correlated with the genotypes (for SCCA/UCCA demos)
    B = rng.normal(size=(p, 4)) * (rng.uniform(size=(p, 4)) < 0.05)
    Y = np.nan_to_num(geno) @ B + rng.normal(size=(n, 4))
    with open(root + ".pheno.txt", "w") as fh:
        for i in range(n):
            vals = "\t".join(f"{v:.6g}" for v in Y[i])
            fh.write(f"POP{pop[i]}_IND{i+1}\tPOP{pop[i]}_IND{i+1}\t{vals}\n")
    return root, pop


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(__file__)
    root, _ = make_demo(out)
    print(f"wrote {root}.bed/.bim/.fam/.pheno.txt")
