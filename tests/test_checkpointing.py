"""Checkpoint save / best-reload / resume roundtrips through the runner."""

import numpy as np
import pytest

from mr_blip_tpu.common.config import Config
from mr_blip_tpu.common.registry import registry


@pytest.fixture()
def runner(tmp_path):
    import mr_blip_tpu  # registers
    from mr_blip_tpu import tasks
    from mr_blip_tpu.datasets.synthetic import make_mr_annotations

    data = tmp_path / "data"
    make_mr_annotations(str(data), n_train=4, n_val=2, n_test=2,
                        n_video_frames=10, fps=5.0, height=48, width=64)
    cfg = Config(
        cfg_path="configs/projects/train/tiny_synthetic.yaml",
        options=[
            f"datasets.qvh.build_info.annotations.train.storage={data}/train.json",
            f"datasets.qvh.build_info.annotations.val.storage={data}/val.json",
            f"datasets.qvh.build_info.annotations.test.storage={data}/test.json",
            f"run.output_dir={tmp_path}/out", "run.num_workers=1",
            "run.batch_size_train=2", "run.batch_size_eval=2",
        ],
    )
    task = tasks.setup_task(cfg)
    datasets = task.build_datasets(cfg)
    model = task.build_model(cfg)
    runner_cls = registry.get_runner_class("runner_base")
    return runner_cls(cfg=cfg, job_id="ckpt_test", task=task, model=model,
                      datasets=datasets)


class TestCheckpointing:
    def test_save_and_reload_roundtrip(self, runner):
        import jax

        ctx = runner.train_ctx  # build state
        runner._save_checkpoint(cur_epoch=0, is_best=True)
        path = runner.output_dir / "checkpoint_best.msgpack"
        assert path.exists()

        # perturb trainable params, then reload best -> values restored
        def perturb(pth, leaf):
            if "lora_a" in str(pth):
                return leaf + 1.0
            return leaf

        orig = runner.model.params
        runner.model.params = jax.tree_util.tree_map_with_path(perturb, orig)
        runner._reload_best_model()

        flat_o = dict(jax.tree_util.tree_leaves_with_path(orig))
        flat_n = dict(jax.tree_util.tree_leaves_with_path(runner.model.params))
        for k in flat_o:
            if "lora_a" in str(k):
                np.testing.assert_allclose(
                    np.asarray(flat_n[k]), np.asarray(flat_o[k]), atol=1e-6
                )

    def test_trainable_only_checkpoint_is_small(self, runner):
        _ = runner.train_ctx
        runner._save_checkpoint(cur_epoch=0, is_best=False)
        ckpt = runner.output_dir / "checkpoint_0.msgpack"
        resume = runner.output_dir / "resume_state.msgpack"
        # trainable-only ckpt strips frozen ViT/T5 base: much smaller
        assert ckpt.stat().st_size < resume.stat().st_size / 2

    def test_resume_sets_start_epoch(self, runner):
        _ = runner.train_ctx
        runner._save_checkpoint(cur_epoch=3, is_best=False)
        runner.load_checkpoint(str(runner.output_dir / "resume_state.msgpack"))
        assert runner.start_epoch == 4

    def test_resume_restores_optimizer_state(self, runner):
        """Train a few steps, save, resume into a fresh runner-like state:
        Adam moments and the step counter must round-trip (reference resumes
        model+optimizer+scaler+epoch, runner_base.py:622-644)."""
        import jax
        import jax.numpy as jnp

        ctx = runner.train_ctx
        loader = iter(runner.train_loader)
        task = runner.task
        ctx.set_lr(1e-3)
        for _ in range(2):
            samples = next(loader)
            task.train_step(ctx, samples)
        runner._save_checkpoint(cur_epoch=0, is_best=False)
        saved_state = ctx.state

        # wipe: fresh optimizer state + perturbed params
        from mr_blip_tpu.runners import TrainState

        ctx.state = TrainState.create(
            jax.tree.map(lambda x: x * 0 + 1.0, saved_state.params),
            saved_state.tx,
        )
        runner.load_checkpoint(str(runner.output_dir / "resume_state.msgpack"))

        assert int(runner.train_ctx.state.step) == int(saved_state.step) != 0
        flat_s = jax.tree_util.tree_leaves_with_path(saved_state.opt_state)
        flat_r = dict(jax.tree_util.tree_leaves_with_path(runner.train_ctx.state.opt_state))
        restored_nonzero = 0
        for k, v in flat_s:
            got = flat_r[k]
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(v), atol=1e-6,
                err_msg=f"opt_state leaf {k} not restored",
            )
            if np.asarray(v).size and np.any(np.asarray(v) != 0):
                restored_nonzero += 1
        assert restored_nonzero > 0  # Adam moments actually carried data
        flat_p = dict(jax.tree_util.tree_leaves_with_path(saved_state.params))
        flat_pr = dict(jax.tree_util.tree_leaves_with_path(runner.train_ctx.state.params))
        for k, v in flat_p.items():
            np.testing.assert_allclose(
                np.asarray(flat_pr[k]), np.asarray(v), atol=1e-6
            )


class TestOrbaxCheckpoint:
    def test_orbax_save(self, runner):
        _ = runner.train_ctx
        runner.run_cfg["use_orbax"] = True
        runner._save_checkpoint(cur_epoch=1, is_best=False)
        import orbax.checkpoint as ocp

        path = (runner.output_dir / "orbax_1").absolute()
        assert path.exists()
        restored = ocp.StandardCheckpointer().restore(path)
        assert restored["epoch"] == 1
        assert any("lora_a" in k for k in restored["model"])

    def test_orbax_async_save_and_restore(self, runner):
        """Async orbax save drains at finalize; best-reload restores from
        the orbax dir when use_orbax is on."""
        import jax
        import numpy as np

        _ = runner.train_ctx
        runner.run_cfg["use_orbax"] = True
        runner.run_cfg["orbax_async"] = True
        runner._save_checkpoint(cur_epoch=0, is_best=True)
        runner.finalize_checkpoints()
        assert (runner.output_dir / "orbax_best").exists()

        orig = runner.model.params

        def perturb(pth, leaf):
            return leaf + 1.0 if "lora_a" in str(pth) else leaf

        runner.model.params = jax.tree_util.tree_map_with_path(perturb, orig)
        runner._reload_best_model()
        flat_o = dict(jax.tree_util.tree_leaves_with_path(orig))
        flat_n = dict(jax.tree_util.tree_leaves_with_path(runner.model.params))
        for k in flat_o:
            if "lora_a" in str(k):
                np.testing.assert_allclose(
                    np.asarray(flat_n[k]), np.asarray(flat_o[k]), atol=1e-6
                )
