from mr_blip_tpu.metrics.span_ops import (
    temporal_iou_paired,
    temporal_iou_cross,
    interpolated_precision_recall,
    average_precision_detection,
    binary_average_precision,
)
from mr_blip_tpu.metrics.moment_retrieval import (
    compute_mr_ap,
    compute_mr_r1,
    eval_moment_retrieval,
    eval_highlight,
    eval_submission,
)
from mr_blip_tpu.metrics.grounded_qa import eval_ground

__all__ = [
    "temporal_iou_paired",
    "temporal_iou_cross",
    "interpolated_precision_recall",
    "average_precision_detection",
    "binary_average_precision",
    "compute_mr_ap",
    "compute_mr_r1",
    "eval_moment_retrieval",
    "eval_highlight",
    "eval_submission",
    "eval_ground",
]
