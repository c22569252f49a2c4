"""Image/video-text retrieval task (reference ``lavis/tasks/retrieval.py``).

Two-stage LAVIS protocol: rank by the contrastive similarity matrix, then
(optionally) rerank the top-k candidates with the ITM head.  Reports
R@1/5/10 and median rank in both directions.
"""

from __future__ import annotations

import logging

import numpy as np

from mr_blip_tpu.common import dist as dist_utils
from mr_blip_tpu.common.registry import registry
from mr_blip_tpu.metrics.caption_metrics import retrieval_metrics
from mr_blip_tpu.tasks.base_task import BaseTask


@registry.register_task("retrieval")
class RetrievalTask(BaseTask):
    def __init__(self, k_test: int = 128):
        super().__init__()
        self.k_test = k_test

    @classmethod
    def setup_task(cls, cfg=None, **kwargs):
        run_cfg = cfg.run_cfg if cfg is not None else {}
        return cls(k_test=run_cfg.get("k_test", 128))

    def evaluation(self, model, data_loader, **kwargs):
        """Score the full gallery: model must expose
        ``compute_sim_matrix(data_loader, k_test)`` returning either one
        (N_img, N_txt) matrix or an (i2t, t2i) pair of reranked matrices
        (the ITM-rerank protocol)."""
        from mr_blip_tpu.tasks.captioning import _tokenizer_is_fallback

        self._tokenizer_fallback = _tokenizer_is_fallback(model)
        sims = model.compute_sim_matrix(data_loader, k_test=self.k_test)
        i2t_gt = getattr(data_loader.dataset, "i2t_gt", None) if hasattr(
            data_loader, "dataset"
        ) else None
        if isinstance(sims, tuple):
            i2t, t2i = sims
            return {"sims": np.asarray(i2t), "sims_t2i": np.asarray(t2i),
                    "i2t_gt": i2t_gt}
        return {"sims": np.asarray(sims), "i2t_gt": i2t_gt}

    def after_evaluation(self, val_result, split_name, epoch, **kwargs):
        return self._report_metrics(val_result, split_name)

    @dist_utils.main_process
    def _report_metrics(self, val_result, split_name):
        metrics = retrieval_metrics(
            val_result["sims"], val_result.get("i2t_gt"),
            score_matrix_t2i=val_result.get("sims_t2i"),
        )
        metrics["agg_metrics"] = metrics["r_mean"]
        if getattr(self, "_tokenizer_fallback", False):
            # hash-bucket offline tokenizer: scores are smoke values only
            metrics["tokenizer_fallback"] = True
        logging.info(metrics)
        return metrics
