from .sharded import (
    DATA_AXIS,
    make_mesh,
    make_sharded_objective,
    pad_to_shards,
    shard_batch,
    sharded_log_evidence,
)

__all__ = [
    "DATA_AXIS",
    "make_mesh",
    "make_sharded_objective",
    "pad_to_shards",
    "shard_batch",
    "sharded_log_evidence",
]
