from .pca import pca, flashpca, PCAResult
from .project import project, ProjectResult
from .check import check, CheckResult
from .ucca import ucca, wilks, UccaResult
from .scca import (scca, SCCAResult, soft_thresh, norm_thresh,
                   make_gaussian, save_scca_state, load_scca_state,
                   scca_grid, SCCAGridResult)
from .scca_split import split_scca, SplitSCCAResult
