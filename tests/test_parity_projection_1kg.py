"""Cross-dataset projection parity: PCA on the HapMap3 thinned set,
then project the 1000 Genomes samples with the STORED mean/sd -- the
reference's own integration scenario (HapMap3/test_pca.R:167-208).
The oracle standardizes 1KG with HM3's mean/sd in f64 and applies the
loadings directly."""

import numpy as np
import pytest

from tests.conftest import HM3_AVAILABLE

HM3 = "/root/reference/HapMap3/HM3_thinned_autosomal_overlap"
KG = ("/root/reference/HapMap3/"
      "1kg.ref.phase1_release_v3.20101123_thinned_autosomal_overlap")

import os

pytestmark = pytest.mark.skipif(
    not (os.path.exists(HM3 + ".bed") and os.path.exists(KG + ".bed")),
    reason="HapMap3/1KG thinned data missing")


def test_project_1kg_onto_hm3_pcs():
    from flashpca_tpu.io import PlinkDataset
    from flashpca_tpu.models.pca import pca
    from flashpca_tpu.models.project import project
    from flashpca_tpu.ops import dense_standardized_np

    res = pca(HM3, 5, tol=1e-8, do_loadings=True)

    kg = PlinkDataset.open(KG)
    hm3 = PlinkDataset.open(HM3)
    assert kg.n_snps == hm3.n_snps
    # SNP identity must line up for projection to be meaningful
    assert kg.snp_ids[:50] == hm3.snp_ids[:50]

    meansd = np.column_stack([res.center, res.scale])
    pr = project(KG, res.loadings, meansd=meansd)

    # f64 oracle with the STORED HM3 stats
    W = dense_standardized_np(kg.read_codes(), res.center, res.scale)
    Px_ref = W.T @ res.loadings / np.sqrt(hm3.n_snps)
    assert pr.projection.shape == (kg.n_samples, 5)
    rmse = np.sqrt(np.mean((pr.projection - Px_ref) ** 2, axis=0))
    assert (rmse < 1e-6).all(), rmse

    # self-projection reproduces the training PCs (test_pca.R:167-177)
    pr_self = project(HM3, res.loadings, meansd=meansd)
    rmse_self = np.sqrt(
        np.mean((pr_self.projection - res.projection) ** 2, axis=0))
    assert (rmse_self < 1e-6).all(), rmse_self
