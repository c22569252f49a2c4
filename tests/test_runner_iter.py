"""RunnerIter: iteration-keyed checkpoints + divisibility validation
(reference lavis/runners/runner_iter.py:25-153)."""

import pytest

from mr_blip_tpu.common.config import Config
from mr_blip_tpu.common.registry import registry


def _cfg(tmp_path, data, **run_overrides):
    opts = [
        f"datasets.qvh.build_info.annotations.train.storage={data}/train.json",
        f"datasets.qvh.build_info.annotations.val.storage={data}/val.json",
        f"datasets.qvh.build_info.annotations.test.storage={data}/test.json",
        f"run.output_dir={tmp_path}/out", "run.num_workers=0",
        "run.batch_size_train=2", "run.batch_size_eval=2",
        "run.runner=runner_iter", "run.wandb=False",
    ] + [f"run.{k}={v}" for k, v in run_overrides.items()]
    return Config(cfg_path="configs/projects/train/tiny_synthetic.yaml",
                  options=opts)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    from mr_blip_tpu.datasets.synthetic import make_mr_annotations

    data = tmp_path_factory.mktemp("iter_synth")
    make_mr_annotations(str(data), n_train=4, n_val=2, n_test=2,
                        n_video_frames=8, fps=4.0, height=48, width=64)
    return data


def _build(cfg):
    import mr_blip_tpu  # noqa: F401  (registers)
    from mr_blip_tpu import tasks

    task = tasks.setup_task(cfg)
    datasets = task.build_datasets(cfg)
    model = task.build_model(cfg)
    cls = registry.get_runner_class("runner_iter")
    return cls(cfg=cfg, job_id="iter_test", task=task, model=model,
               datasets=datasets)


class TestRunnerIter:
    def test_non_divisible_max_iters_rejected(self, synth, tmp_path):
        cfg = _cfg(tmp_path, synth, max_iters=5, iters_per_inner_epoch=2)
        with pytest.raises(ValueError, match="not a multiple"):
            _build(cfg)

    def test_iteration_keyed_checkpoints(self, synth, tmp_path):
        cfg = _cfg(tmp_path, synth, max_iters=4, iters_per_inner_epoch=2)
        runner = _build(cfg)
        assert runner.max_epoch == 2
        runner.train()
        out = runner.output_dir
        # best checkpoint selected by val agg_metrics, keyed by iters in log
        import json
        log_lines = []
        for line in (out / "log.txt").read_text().splitlines():
            try:
                log_lines.append(json.loads(line))
            except json.JSONDecodeError:
                continue  # log_config writes the config as indented JSON
        val_logs = [l for l in log_lines
                    if isinstance(l, dict) and any(k.startswith("val_") for k in l)]
        assert val_logs and "val_best_iters" in val_logs[-1]
        # val result files carry the iteration-keyed progress string
        results = list((out / "result").glob("val_*iters=*.json"))
        assert results, list((out / "result").iterdir())

    def test_checkpoints_keyed_by_iters_without_val(self, synth, tmp_path):
        """No valid split -> checkpoint per inner epoch named by global
        iteration count (reference runner_iter.py:121-124)."""
        cfg = _cfg(tmp_path, synth, max_iters=4, iters_per_inner_epoch=2)
        cfg.run_cfg["valid_splits"] = []
        cfg.run_cfg["test_splits"] = []
        runner = _build(cfg)
        runner.train()
        out = runner.output_dir
        assert (out / "checkpoint_2.msgpack").exists()
        assert (out / "checkpoint_4.msgpack").exists()
