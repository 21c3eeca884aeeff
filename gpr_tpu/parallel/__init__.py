from .sharded import (
    DATA_AXIS,
    sharded_log_evidence_tsqr,
    sharded_predict_means,
    sharded_predict_variances,
    make_mesh,
    make_sharded_objective,
    pad_to_shards,
    shard_batch,
    sharded_log_evidence,
)

__all__ = [
    "DATA_AXIS",
    "sharded_log_evidence_tsqr",
    "sharded_predict_means",
    "sharded_predict_variances",
    "make_mesh",
    "make_sharded_objective",
    "pad_to_shards",
    "shard_batch",
    "sharded_log_evidence",
]
