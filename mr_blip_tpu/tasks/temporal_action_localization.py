"""Temporal action localization task (ANet-style detection).

Counterpart of the reference ``lavis/tasks/temporal_action_localization.py``
+ ``tal_eval.py`` (ANETdetection): the model generates
``[[start, end, "label"], ...]`` strings; evaluation computes per-class
detection AP over IoU thresholds .5:.05:.95 with greedy GT locking and
averages over classes (the ANetDetection protocol).
"""

from __future__ import annotations

import json
import logging
from collections import defaultdict

import numpy as np

from mr_blip_tpu.common import dist as dist_utils
from mr_blip_tpu.common.registry import registry
from mr_blip_tpu.metrics.span_ops import IOU_THDS_DEFAULT, average_precision_detection
from mr_blip_tpu.tasks.base_task import BaseTask
from mr_blip_tpu.text.span_grammar import tal_str_to_list


def anet_detection_eval(results, tiou_thresholds=IOU_THDS_DEFAULT):
    """Per-class detection AP, averaged (ANETdetection, tal_eval.py:120-...).

    Each record: {"qid", "prediction" (TAL string), "target" (TAL string)}.
    Videos are keyed by qid; the i-th predicted window in a record gets
    score 1/(i+1) (generation order = confidence order).
    """
    gt_by_class = defaultdict(list)
    pred_by_class = defaultdict(list)
    for r in results:
        vid = r["qid"]
        for w in tal_str_to_list(r["target"]):
            if w == [-1, -1, -1]:
                continue
            gt_by_class[str(w[2])].append(
                {"video-id": vid, "t-start": w[0], "t-end": w[1]}
            )
        for i, w in enumerate(tal_str_to_list(r["prediction"])):
            if w == [-1, -1, -1]:
                continue
            pred_by_class[str(w[2])].append(
                {"video-id": vid, "t-start": w[0], "t-end": w[1],
                 "score": 1.0 / (i + 1)}
            )

    classes = sorted(gt_by_class)
    if not classes:
        return {"mAP": 0.0, "mAP_per_thd": [0.0] * len(tiou_thresholds)}
    ap = np.zeros((len(classes), len(tiou_thresholds)))
    for ci, c in enumerate(classes):
        ap[ci] = average_precision_detection(
            gt_by_class[c], pred_by_class.get(c, []),
            tiou_thresholds=tiou_thresholds, sort_by_score=True,
        )
    map_per_thd = ap.mean(axis=0)
    return {
        "mAP": float(map_per_thd.mean() * 100),
        "mAP_per_thd": [float(x * 100) for x in map_per_thd],
        "num_classes": len(classes),
    }


@registry.register_task("temporal_action_localization")
class TALTask(BaseTask):
    def valid_step(self, model, samples):
        results = []
        outputs = model.generate(samples)
        for i, (a, q, p, rp, d) in enumerate(
            zip(outputs["answer"], outputs["qid"], outputs["prediction"],
                outputs["raw_prediction"], outputs["duration"])
        ):
            results.append(
                {
                    "qid": str(q),
                    "raw_prediction": rp,
                    "prediction": p,
                    "target": a,
                    "duration": d,
                }
            )
        return results

    def after_evaluation(self, val_result, split_name, epoch, **kwargs):
        eval_result_file = self.save_result(
            result=val_result,
            result_dir=registry.get_path("result_dir"),
            filename="{}_epoch{}".format(split_name, epoch),
        )
        return self._report_metrics(
            eval_result_file=eval_result_file, split_name=split_name
        )

    @dist_utils.main_process
    def _report_metrics(self, eval_result_file, split_name):
        results = json.load(open(eval_result_file))
        metrics = anet_detection_eval(results)
        metrics["agg_metrics"] = metrics["mAP"]
        metrics["total"] = len(results)
        logging.info(metrics)
        return metrics
