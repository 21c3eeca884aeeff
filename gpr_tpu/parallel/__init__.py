from .classify_sharded import (
    sharded_classify_log_evidence,
    sharded_classify_predict,
)
from .mesh2d import (
    MODEL_AXIS,
    fit_sharded_2d,
    make_mesh_2d,
    sharded_log_evidence_2d,
)
from .sharded import (
    DATA_AXIS,
    sharded_log_evidence_tsqr,
    sharded_predict_means,
    sharded_predict_variances,
    make_mesh,
    make_sharded_objective,
    pad_to_shards,
    shard_batch,
    fit_restarts_sharded,
    fit_sharded,
    probe_starts_sharded,
    sharded_log_evidence,
    sharded_pitc_log_evidence,
    sharded_warped_log_evidence,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh_2d",
    "sharded_log_evidence_2d",
    "sharded_log_evidence_tsqr",
    "sharded_predict_means",
    "sharded_predict_variances",
    "make_mesh",
    "make_sharded_objective",
    "pad_to_shards",
    "shard_batch",
    "fit_restarts_sharded",
    "fit_sharded",
    "fit_sharded_2d",
    "probe_starts_sharded",
    "sharded_classify_log_evidence",
    "sharded_classify_predict",
    "sharded_log_evidence",
    "sharded_pitc_log_evidence",
    "sharded_warped_log_evidence",
]
