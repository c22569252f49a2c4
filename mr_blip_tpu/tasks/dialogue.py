"""Video-grounded dialogue task (reference ``lavis/tasks/dialogue.py``).

The reference's live metric is validation loss: ``valid_step`` evaluates the
model loss per batch and ``after_evaluation`` reports the mean as
``agg_metrics`` (dialogue.py:51-65; its COCO-caption rescoring path is dead
code guarded behind report_metric and an undefined helper).
"""

from __future__ import annotations

import numpy as np

from mr_blip_tpu.common.registry import registry
from mr_blip_tpu.tasks.base_task import BaseTask


@registry.register_task("dialogue")
class DialogueTask(BaseTask):
    def __init__(self, num_beams=3, max_len=30, min_len=1, evaluate=False,
                 report_metric=True):
        super().__init__()
        self.num_beams = num_beams
        self.max_len = max_len
        self.min_len = min_len
        self.evaluate = evaluate
        self.report_metric = report_metric

    @classmethod
    def setup_task(cls, cfg=None, **kwargs):
        run_cfg = cfg.run_cfg if cfg is not None else {}
        return cls(
            num_beams=run_cfg.get("num_beams", 3),
            max_len=run_cfg.get("max_len", 30),
            min_len=run_cfg.get("min_len", 1),
            evaluate=run_cfg.get("evaluate", False),
            report_metric=run_cfg.get("report_metric", True),
        )

    def valid_step(self, model, samples):
        return [float(model(samples)["loss"])]

    def after_evaluation(self, val_result, split_name, epoch, **kwargs):
        if self.report_metric:
            return {"agg_metrics": float(np.mean(val_result))}
        return {"agg_metrics": 0.0}
