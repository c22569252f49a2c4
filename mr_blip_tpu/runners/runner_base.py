"""RunnerBase: epoch-driven training/eval orchestration.

Counterpart of the reference ``lavis/runners/runner_base.py:38-658``:
lazy-built optimizer/scheduler/dataloaders, epoch loop with per-split
validation, best-checkpoint selection by ``agg_metrics``, trainable-only
parameter checkpoints, and resume.  DDP wrapping is replaced by a (dp, tp)
mesh: params replicated, batch dp-sharded, one jitted donated train step.
"""

from __future__ import annotations

import datetime
import json
import logging
import os
import time
from pathlib import Path

import jax
import numpy as np

from mr_blip_tpu.common import dist as dist_utils
from mr_blip_tpu.common.preempt import TrainingPreempted
from mr_blip_tpu.common.registry import registry
from mr_blip_tpu.datasets.base_dataset import ConcatDataset
from mr_blip_tpu.datasets.loader import DataLoader, IterLoader, MultiIterLoader, PrefetchLoader
from mr_blip_tpu.parallel.mesh import make_mesh, pad_batch_to_multiple, replicate, shard_batch
from mr_blip_tpu.runners.train_state import (
    TrainState,
    make_optimizer,
    make_train_step,
    trainable_param_count,
)


class TrainCtx:
    """Holds the TrainState and the jitted step; the task calls step(batch)."""

    def __init__(self, model, state, step_fn, mesh, rng):
        self.model = model
        self.state = state
        self._step_fn = step_fn
        self.mesh = mesh
        self.rng = rng
        self._lr = 0.0

    def set_lr(self, lr: float):
        self._lr = float(lr)

    @property
    def lr(self):
        return self._lr

    def step(self, batch) -> float:
        if self.mesh is not None:
            # the cached encoder rel-pos bias (leading dim 1) is a
            # broadcast operand: replicated, never dp-padded/sharded
            enc_bias = batch.pop("enc_bias", None)
            batch, _ = pad_batch_to_multiple(batch, self.mesh.shape["dp"])
            batch = shard_batch(batch, self.mesh)
            if enc_bias is not None:
                batch["enc_bias"] = replicate(enc_bias, self.mesh)
            with jax.set_mesh(self.mesh):
                self.state, loss = self._step_fn(
                    self.state, batch, self._lr, self.rng
                )
            self.model.params = self.state.params
            return float(loss)
        self.state, loss = self._step_fn(self.state, batch, self._lr, self.rng)
        # Keep the model wrapper's params in sync for eval-time generate.
        self.model.params = self.state.params
        return float(loss)


@registry.register_runner("runner_base")
class RunnerBase:
    def __init__(self, cfg, task, model, datasets, job_id):
        self.config = cfg
        self.job_id = job_id
        self.task = task
        self.datasets = datasets
        self.model = model

        self._train_ctx = None
        self._dataloaders = None
        self._lr_sched = None
        self._orbax_ckptr = None
        self._mesh = None
        self.start_epoch = 0

        self.setup_output_dir()

    # ----------------------------------------------------------- properties
    @property
    def run_cfg(self):
        return self.config.run_cfg

    @property
    def mesh(self):
        if self._mesh is None and jax.device_count() > 1:
            tp = int(self.run_cfg.get("tp", 1))
            self._mesh = make_mesh(tp=tp)
        return self._mesh

    @property
    def use_dist_eval_sampler(self):
        return self.run_cfg.get("use_dist_eval_sampler", True)

    @property
    def train_ctx(self) -> TrainCtx:
        if self._train_ctx is None:
            mask = self.model.trainable_mask()
            trainable, total = trainable_param_count(self.model.params, mask)
            logging.info(
                "trainable params: %.2fM / %.2fM total",
                trainable / 1e6, total / 1e6,
            )
            tx = make_optimizer(
                weight_decay=float(self.run_cfg.get("weight_decay", 0.05)),
                beta1=float(self.run_cfg.get("beta1", 0.9)),
                beta2=float(self.run_cfg.get("beta2", 0.999)),
                accum_grad_iters=int(self.run_cfg.get("accum_grad_iters", 1)),
                trainable_mask=mask,
                max_grad_norm=self.run_cfg.get("max_grad_norm"),
            )
            params = self.model.params
            if self.mesh is not None:
                if self.mesh.shape["tp"] > 1:
                    from mr_blip_tpu.parallel.sharding_rules import shard_params

                    params = shard_params(params, self.mesh)
                else:
                    params = replicate(params, self.mesh)
            state = TrainState.create(params, tx)
            step_fn = make_train_step(
                self.model._loss_fn, donate=True, trainable_mask=mask
            )
            rng = jax.random.PRNGKey(int(self.run_cfg.get("seed", 42)))
            self._train_ctx = TrainCtx(self.model, state, step_fn, self.mesh, rng)
        return self._train_ctx

    @property
    def lr_scheduler(self):
        if self._lr_sched is None:
            lr_sched_cls = registry.get_lr_scheduler_class(self.run_cfg.lr_sched)
            self._lr_sched = lr_sched_cls(
                max_epoch=self.max_epoch,
                min_lr=float(self.run_cfg.get("min_lr", 0)),
                init_lr=float(self.run_cfg.init_lr),
                decay_rate=self.run_cfg.get("lr_decay_rate", 1),
                warmup_start_lr=float(self.run_cfg.get("warmup_lr", -1)),
                warmup_steps=int(self.run_cfg.get("warmup_steps", 0)),
            )
        return self._lr_sched

    @property
    def max_epoch(self):
        return int(self.run_cfg.max_epoch)

    @property
    def log_freq(self):
        return int(self.run_cfg.get("log_freq", 50))

    @property
    def valid_splits(self):
        return self.run_cfg.get("valid_splits", [])

    @property
    def test_splits(self):
        return self.run_cfg.get("test_splits", [])

    @property
    def train_splits(self):
        return self.run_cfg.get("train_splits", [])

    @property
    def evaluate_only(self):
        return bool(self.run_cfg.get("evaluate", False))

    @property
    def dataloaders(self):
        if self._dataloaders is None:
            self._dataloaders = self.create_loaders()
        return self._dataloaders

    @property
    def train_loader(self):
        return self.dataloaders["train"]

    def setup_output_dir(self):
        output_dir = Path(self.run_cfg.get("output_dir", "output")) / self.job_id
        result_dir = output_dir / "result"
        output_dir.mkdir(parents=True, exist_ok=True)
        result_dir.mkdir(parents=True, exist_ok=True)
        registry.register_path("result_dir", str(result_dir))
        registry.register_path("output_dir", str(output_dir))
        self.result_dir = result_dir
        self.output_dir = output_dir

    # ------------------------------------------------------------- loaders
    def create_loaders(self):
        """Flatten {dataset: {split: ds}} into per-split loaders.

        Multiple train datasets become a MultiIterLoader with
        ``train_dataset_ratios``; eval splits shard across processes like
        DistributedSampler (runner_base.py:176-277,491-570).
        """
        run = self.run_cfg
        rank, world = dist_utils.get_rank(), dist_utils.get_world_size()
        num_workers = int(run.get("num_workers", 2))

        split_datasets = {}
        for ds_name, splits in self.datasets.items():
            for split, ds in splits.items():
                split_datasets.setdefault(split, []).append(ds)

        loaders = {}
        for split, ds_list in split_datasets.items():
            is_train = split in self.train_splits or split == "train"
            bsz = int(
                run.get("batch_size_train" if is_train else "batch_size_eval", 1)
            )
            if is_train:
                sub_loaders = [
                    IterLoader(
                        DataLoader(
                            ds, batch_size=bsz, shuffle=True, drop_last=True,
                            num_workers=num_workers, rank=rank, world_size=world,
                            seed=int(run.get("seed", 42)),
                        )
                    )
                    for ds in ds_list
                ]
                if len(sub_loaders) == 1:
                    loaders[split] = sub_loaders[0]
                else:
                    ratios = run.get("train_dataset_ratios")
                    loaders[split] = MultiIterLoader(sub_loaders, ratios)
            else:
                ds = ds_list[0] if len(ds_list) == 1 else ConcatDataset(ds_list)
                loaders[split] = PrefetchLoader(
                    DataLoader(
                        ds, batch_size=bsz, shuffle=False, drop_last=False,
                        num_workers=num_workers,
                        rank=rank if self.use_dist_eval_sampler else 0,
                        world_size=world if self.use_dist_eval_sampler else 1,
                    )
                )
        return loaders

    @property
    def iters_per_epoch(self):
        cfg_val = self.run_cfg.get("iters_per_epoch")
        if cfg_val:
            return int(cfg_val)
        train = self.train_loader
        try:
            return len(train)
        except TypeError:
            raise ValueError(
                "iters_per_epoch must be set when the train loader has no length"
            )

    # -------------------------------------------------------------- train
    def train(self):
        start_time = time.time()
        best_agg_metric = 0
        best_epoch = 0
        self.log_config()
        from mr_blip_tpu.common import tracking

        tracking.init(
            project=self.run_cfg.get("wandb_project", "mr_blip_tpu"),
            name=self.run_cfg.get("wandb_name", self.job_id),
            config=self.config.to_dict(),
            out_dir=str(self.output_dir),
            enabled=bool(self.run_cfg.get("wandb", True)),
        )

        for cur_epoch in range(self.start_epoch, self.max_epoch):
            if not self.evaluate_only:
                logging.info("Start training epoch %d", cur_epoch)
                try:
                    train_stats = self.train_epoch(cur_epoch)
                except TrainingPreempted as e:
                    # state is whole-step consistent (the guard fires only
                    # at step boundaries); save for resume and re-raise for
                    # the entry point to exit within the grace window
                    self.save_preemption_checkpoint(cur_epoch)
                    raise e
                self.log_stats(split_name="train", stats=train_stats)

            if len(self.valid_splits) > 0 and not self.evaluate_only:
                for split_name in self.valid_splits:
                    logging.info("Evaluating on %s.", split_name)
                    val_log = self.eval_epoch(
                        split_name=split_name, cur_epoch=cur_epoch
                    )
                    if val_log is not None and dist_utils.is_main_process():
                        from mr_blip_tpu.common import tracking

                        tracker = tracking.get()
                        if tracker is not None:
                            tracker.log(
                                {f"eval/{k}": v for k, v in val_log.items()
                                 if isinstance(v, (int, float))}
                            )
                        assert "agg_metrics" in val_log, (
                            "No agg_metrics found in validation log."
                        )
                        agg_metrics = val_log["agg_metrics"]
                        if agg_metrics > best_agg_metric and split_name == "val":
                            best_epoch, best_agg_metric = cur_epoch, agg_metrics
                            self._save_checkpoint(cur_epoch, is_best=True)
                        val_log.update({"best_epoch": best_epoch})
                        self.log_stats(val_log, split_name)
            elif not self.evaluate_only:
                self._save_checkpoint(cur_epoch, is_best=False)

            if self.evaluate_only:
                break
            dist_utils.barrier()

        # final test with the best checkpoint
        test_epoch = "best" if len(self.valid_splits) > 0 else cur_epoch
        self.evaluate(cur_epoch=test_epoch, skip_reload=self.evaluate_only)

        total_time = time.time() - start_time
        logging.info(
            "Training time %s", str(datetime.timedelta(seconds=int(total_time)))
        )

    def train_epoch(self, epoch):
        loader = self.train_loader
        if hasattr(loader, "set_epoch"):
            loader.set_epoch(epoch)
        return self.task.train_epoch(
            epoch=epoch,
            model=self.model,
            data_loader=loader,
            train_ctx=self.train_ctx,
            lr_scheduler=self.lr_scheduler,
            log_freq=self.log_freq,
            accum_grad_iters=int(self.run_cfg.get("accum_grad_iters", 1)),
        )

    def evaluate(self, cur_epoch="best", skip_reload=False):
        test_logs = {}
        if len(self.test_splits) > 0:
            for split_name in self.test_splits:
                test_logs[split_name] = self.eval_epoch(
                    split_name=split_name, cur_epoch=cur_epoch,
                    skip_reload=skip_reload,
                )
            return test_logs

    def eval_epoch(self, split_name, cur_epoch, skip_reload=False):
        data_loader = self.dataloaders.get(split_name)
        assert data_loader is not None, f"no loader for split {split_name}"

        if not skip_reload and cur_epoch == "best":
            self._reload_best_model()

        # Mesh-sharded eval: generate uses every local chip (reference runs
        # eval 8-way data-parallel via DistributedSampler,
        # runner_base.py:522-531; here GSPMD shards the eval batch).
        if (
            self.mesh is not None
            and hasattr(self.model, "set_mesh")
            and getattr(self.model, "mesh", None) is None
        ):
            self.model.set_mesh(self.mesh)

        self.task.before_evaluation(model=self.model, dataset=None)
        results = self.task.evaluation(self.model, data_loader)
        if results is not None:
            return self.task.after_evaluation(
                val_result=results, split_name=split_name, epoch=cur_epoch
            )

    # -------------------------------------------------------- checkpointing
    def _trainable_only(self, params):
        """Strip frozen params (reference keeps only requires_grad=True,
        runner_base.py:572-600)."""
        mask = self.model.trainable_mask(params)
        flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
        flat_m = dict(jax.tree_util.tree_flatten_with_path(mask)[0])
        kept = {}
        for path, leaf in flat_p:
            if flat_m[path]:
                kept["/".join(str(getattr(p, "key", p)) for p in path)] = np.asarray(leaf)
        return kept

    def _save_checkpoint(self, cur_epoch, is_best=False):
        if not dist_utils.is_main_process():
            return
        if self.run_cfg.get("use_orbax", False):
            return self._save_checkpoint_orbax(cur_epoch, is_best)
        from flax import serialization

        params = self.train_ctx.state.params
        save_obj = {
            "model": self._trainable_only(params),
            "config": self.config.to_dict(),
            "epoch": cur_epoch,
        }
        name = "checkpoint_{}.msgpack".format("best" if is_best else cur_epoch)
        path = os.path.join(self.output_dir, name)
        logging.info("Saving checkpoint at epoch %s to %s.", cur_epoch, path)
        with open(path, "wb") as f:
            f.write(serialization.msgpack_serialize(save_obj))
        self._write_resume_state(cur_epoch)

    def _write_resume_state(self, cur_epoch, epoch_complete=True):
        """Full state for resume: params + optimizer moments + step counter,
        matching the reference's model+optimizer+scaler+epoch resume
        (reference runner_base.py:622-644) — dropping Adam state silently
        re-runs warmup on a resumed schedule. ``epoch_complete=False``
        (preemption mid-epoch) makes resume re-run ``cur_epoch`` instead of
        starting at ``cur_epoch + 1``."""
        from flax import serialization

        resume_path = os.path.join(self.output_dir, "resume_state.msgpack")
        state = self.train_ctx.state
        resume_obj = {
            "params": serialization.to_state_dict(state.params),
            "opt_state": serialization.to_state_dict(state.opt_state),
            "step": int(state.step),
            "epoch": cur_epoch,
            "epoch_complete": epoch_complete,
        }
        with open(resume_path, "wb") as f:
            f.write(serialization.msgpack_serialize(resume_obj))
        return resume_path

    def save_preemption_checkpoint(self, cur_epoch):
        """Resume state at the preemption step boundary (rank 0), then
        drain async orbax writes so nothing is lost to the grace window.

        Resume semantics (epoch granularity, like the reference's
        runner_base.py:622-644 resume): the interrupted epoch RE-RUNS from
        its first batch. The LR schedule does NOT drift — lr is computed
        from (cur_epoch, inner_step) (common/optims.py), so every batch
        re-trains at the lr it would have had. What the re-run does cost:
        the first K batches' updates are applied twice (with Adam moments
        warm from the preempted pass), and the optax step count keeps
        increasing, which only affects Adam bias correction (negligible
        outside the first ~100 steps). Exact-batch resume would need the
        loader's RNG/iterator state checkpointed too; documented trade-off.
        """
        path = None
        if dist_utils.is_main_process():
            path = self._write_resume_state(cur_epoch, epoch_complete=False)
            logging.warning(
                "preemption checkpoint written to %s (resume with "
                "run.resume_ckpt_path to re-run epoch %d)", path, cur_epoch,
            )
        self.finalize_checkpoints()
        return path

    def _save_checkpoint_orbax(self, cur_epoch, is_best=False):
        """Orbax checkpoint (sharded arrays supported). With
        ``run.orbax_async`` the save overlaps the next epoch's compute; the
        shared checkpointer serializes in-flight saves and is drained at
        runner teardown."""
        import orbax.checkpoint as ocp

        name = "orbax_{}".format("best" if is_best else cur_epoch)
        path = (self.output_dir / name).absolute()
        if self._orbax_ckptr is None:
            self._orbax_ckptr = ocp.StandardCheckpointer()
        self._orbax_ckptr.save(
            path,
            {"model": self._trainable_only(self.train_ctx.state.params),
             "epoch": cur_epoch},
            force=True,
        )
        if not self.run_cfg.get("orbax_async", False):
            self._orbax_ckptr.wait_until_finished()
        logging.info("orbax checkpoint saved to %s%s", path,
                     " (async)" if self.run_cfg.get("orbax_async") else "")

    def finalize_checkpoints(self):
        """Drain pending async orbax saves (call before process exit)."""
        if self._orbax_ckptr is not None:
            self._orbax_ckptr.wait_until_finished()

    def _restore_orbax(self, name="orbax_best"):
        """Restore trainable params from an orbax directory (multi-host
        safe: every process restores its addressable shards)."""
        import orbax.checkpoint as ocp

        path = (self.output_dir / name).absolute()
        if not path.exists():
            return False
        restored = ocp.StandardCheckpointer().restore(path)
        from flax import traverse_util

        flat = traverse_util.flatten_dict(restored["model"], sep="/")
        self.model.params = self._restore_trainable(self.model.params, flat)
        if self._train_ctx is not None:
            self._train_ctx.state = self._train_ctx.state.replace(
                params=self.model.params
            )
        logging.info("orbax checkpoint restored from %s", path)
        return True

    def _restore_trainable(self, params, flat_saved):
        from flax import traverse_util

        flat_p = traverse_util.flatten_dict(params, sep="/")
        restored = 0
        for key, val in flat_saved.items():
            if key in flat_p:
                flat_p[key] = jax.numpy.asarray(val, dtype=flat_p[key].dtype)
                restored += 1
        logging.info("restored %d trainable tensors", restored)
        return traverse_util.unflatten_dict(flat_p, sep="/")

    def _reload_best_model(self):
        from flax import serialization

        if self.run_cfg.get("use_orbax", False) and self._restore_orbax():
            return
        path = os.path.join(self.output_dir, "checkpoint_best.msgpack")
        if not os.path.exists(path):
            logging.warning("no best checkpoint found at %s", path)
            return
        with open(path, "rb") as f:
            obj = serialization.msgpack_restore(f.read())
        self.model.params = self._restore_trainable(self.model.params, obj["model"])
        if self._train_ctx is not None:
            self._train_ctx.state = self._train_ctx.state.replace(
                params=self.model.params
            )

    def load_checkpoint(self, path):
        """Resume: restores params, optimizer state (Adam moments + accum
        counters), step, and start_epoch (reference runner_base.py:622-644
        restores model+optimizer+scaler+epoch)."""
        from flax import serialization

        with open(path, "rb") as f:
            obj = serialization.msgpack_restore(f.read())
        if "params" in obj:
            self.model.params = serialization.from_state_dict(
                self.model.params, obj["params"]
            )
            if self._train_ctx is not None:
                self._train_ctx.state = self._train_ctx.state.replace(
                    params=self.model.params
                )
        elif "model" in obj:
            self.model.params = self._restore_trainable(self.model.params, obj["model"])
        if "opt_state" in obj and not self.evaluate_only:
            ctx = self.train_ctx  # builds the optimizer lazily if needed
            # train_ctx.state.params may predate the param restore above
            ctx.state = ctx.state.replace(params=self.model.params)
            restored_opt = serialization.from_state_dict(
                ctx.state.opt_state, obj["opt_state"]
            )
            ctx.state = ctx.state.replace(
                opt_state=restored_opt,
                step=jax.numpy.asarray(int(obj.get("step", 0)), jax.numpy.int32),
            )
        # epoch_complete=False (preemption mid-epoch): re-run that epoch
        self.start_epoch = int(obj.get("epoch", -1)) + int(
            bool(obj.get("epoch_complete", True))
        )
        logging.info("Resume checkpoint loaded from %s (epoch %d)", path,
                     self.start_epoch)

    # -------------------------------------------------------------- logging
    @dist_utils.main_process
    def log_stats(self, stats, split_name):
        if isinstance(stats, dict):
            log_stats = {**{f"{split_name}_{k}": v for k, v in stats.items()}}
            with open(os.path.join(self.output_dir, "log.txt"), "a") as f:
                f.write(json.dumps(log_stats, default=float) + "\n")

    @dist_utils.main_process
    def log_config(self):
        with open(os.path.join(self.output_dir, "log.txt"), "a") as f:
            f.write(json.dumps(self.config.to_dict(), indent=4, default=str) + "\n")
