"""Iteration-based runner (reference ``lavis/runners/runner_iter.py:25-153``).

Training is split into inner epochs of ``iters_per_inner_epoch`` steps;
checkpoints and validation are keyed by the global iteration count.
"""

from __future__ import annotations

import logging

from mr_blip_tpu.common.registry import registry
from mr_blip_tpu.runners.runner_base import RunnerBase


@registry.register_runner("runner_iter")
class RunnerIter(RunnerBase):
    def __init__(self, cfg, task, model, datasets, job_id):
        super().__init__(cfg, task, model, datasets, job_id)
        self.start_iters = 0
        self.max_iters = int(self.run_cfg.get("max_iters", -1))
        assert self.max_iters > 0, "max_iters must be provided for runner_iter."
        self.iters_per_inner_epoch = int(
            self.run_cfg.get("iters_per_inner_epoch", -1)
        )
        assert self.iters_per_inner_epoch > 0, (
            "iters_per_inner_epoch must be provided for runner_iter."
        )

    @property
    def max_epoch(self):
        return int(self.max_iters / self.iters_per_inner_epoch)

    @property
    def cur_epoch(self):
        try:
            return self.train_loader.epoch
        except AttributeError:
            return 0

    def _progress(self, cur_iters):
        return "{}_iters={}".format(self.cur_epoch, cur_iters)

    def train_epoch(self, epoch):
        start_iters = epoch * self.iters_per_inner_epoch
        logging.info(
            "Start training, max_iters=%d, in total %d inner epochs.",
            self.max_iters, self.max_epoch,
        )
        return self.task.train_iters(
            epoch=epoch,
            start_iters=start_iters,
            iters_per_inner_epoch=self.iters_per_inner_epoch,
            model=self.model,
            data_loader=self.train_loader,
            train_ctx=self.train_ctx,
            lr_scheduler=self.lr_scheduler,
            log_freq=self.log_freq,
            accum_grad_iters=int(self.run_cfg.get("accum_grad_iters", 1)),
        )
