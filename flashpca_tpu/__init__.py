"""flashpca_tpu: TPU-native biobank-scale genotype PCA / SCCA / UCCA.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
gabraham/flashpca (FlashPCA2): memory-bounded partial PCA of PLINK
.bed genotype data via a matrix-free standardized-genotype operator
and a thick-restart Lanczos eigensolver, plus projection of new
samples, decomposition checking, sparse CCA, and per-SNP multivariate
ANOVA (UCCA).
"""

__version__ = "0.4.2"

from .io import PlinkDataset
from .ops import standardize, scale2, PackedOperator, DenseOperator
from .ops.operator import (StreamingPackedOperator, TallPackedOperator,
                           TallStreamingOperator)
from .models import (
    pca, flashpca, PCAResult,
    project, ProjectResult,
    check, CheckResult,
    ucca, UccaResult,
    scca, SCCAResult,
)
from .models.scca import (cv_scca, CVSCCAResult, save_scca_state,
                          load_scca_state, scca_grid, SCCAGridResult)
from .models.scca_split import split_scca, SplitSCCAResult
from .solvers.lanczos import eigsh
from .solvers.block_lanczos import eigsh_block
from . import plots  # matplotlib itself loads lazily inside plots
