from .dist import (
    init_distributed,
    load_sharded_packed,
    plan_row_shards,
    shard_byte_ranges,
    sharded_operator,
    snp_mesh,
)

__all__ = [
    "init_distributed",
    "load_sharded_packed",
    "plan_row_shards",
    "shard_byte_ranges",
    "sharded_operator",
    "snp_mesh",
]
