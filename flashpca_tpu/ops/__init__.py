from .standardize import (
    standardize,
    standardize_transpose,
    scale2,
    lookup_tables,
    VAR_TOL,
    METHOD_CODES,
)
from .genotypes import (
    permute_samples,
    unpermute_samples,
    decode_standardized,
    dense_standardized_np,
    valid_mask_permuted,
)
from .operator import (
    PackedOperator,
    DenseOperator,
    StreamingPackedOperator,
    TallPackedOperator,
    TallStreamingOperator,
    build_packed_operator,
    resolve_streaming,
    check_operator_conflicts,
    default_dtype,
)
