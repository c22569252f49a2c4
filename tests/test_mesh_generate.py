"""Mesh-sharded generate / eval (VERDICT r2 missing #2).

On the 8-virtual-device CPU mesh: sharded beam-search generate must produce
IDENTICAL predictions to single-device, for dp-only and dp x tp meshes
(reference parity: 8-way DistributedSampler eval, runner_base.py:522-531).
"""

import jax
import numpy as np
import pytest

from mr_blip_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def _samples(b, t=2, img=28, seed=0):
    rng = np.random.default_rng(seed)
    durations = np.full((b,), 30.0)
    return {
        "video": rng.standard_normal((b, t, img, img, 3)).astype(np.float32),
        "timestamps": np.stack(
            [np.linspace(0.0, d, t, endpoint=False) for d in durations]
        ),
        "duration": durations,
        "query_id": [f"q{i}" for i in range(b)],
        "video_prompt_end": ["<extra_id_0>"] * b,
        "query_prompt": [f"Query: action {i}\n" for i in range(b)],
        "task_prompt": [
            "Given the video and the query, find the relevant windows.\nRelevant windows: "
        ] * b,
        "relevant_windows": ["[[1, 2]]"] * b,
    }


def _model():
    from mr_blip_tpu.models.blip2_mr import BLIP2_MR

    return BLIP2_MR(
        img_size=28, vit_model="tiny", t5_model="tiny", task="lora",
        num_beams=2, max_new_tokens=8, compute_dtype="float32",
    )


class TestMeshGenerate:
    def test_dp_generate_identical(self):
        model = _model()
        samples = _samples(b=8)
        base = model.generate(samples)

        model.set_mesh(make_mesh(dp=8, tp=1))
        sharded = model.generate(samples)
        assert sharded["raw_prediction"] == base["raw_prediction"]
        assert sharded["prediction"] == base["prediction"]
        assert sharded["qid"] == base["qid"]

    def test_dp_generate_with_padding(self):
        """Batch not divisible by dp: padded rows computed then dropped."""
        model = _model()
        samples = _samples(b=5, seed=3)
        base = model.generate(samples)
        model.set_mesh(make_mesh(dp=8, tp=1))
        sharded = model.generate(samples)
        assert len(sharded["raw_prediction"]) == 5
        assert sharded["raw_prediction"] == base["raw_prediction"]

    def test_dp_tp_generate_identical(self):
        """dp=4 x tp=2: Megatron-sharded T5 matmuls under beam search."""
        model = _model()
        samples = _samples(b=4, seed=5)
        base = model.generate(samples)
        model.set_mesh(make_mesh(dp=4, tp=2))
        sharded = model.generate(samples)
        assert sharded["raw_prediction"] == base["raw_prediction"]

    def test_eval_epoch_mesh_matches_single_device(self, tmp_path):
        """Runner eval under a mesh == single-device eval, prediction for
        prediction (the VERDICT 'done' criterion)."""
        from mr_blip_tpu.common.config import Config
        from mr_blip_tpu import tasks
        from mr_blip_tpu.common.registry import registry
        from mr_blip_tpu.datasets.synthetic import make_mr_annotations

        data = tmp_path / "data"
        make_mr_annotations(str(data), n_train=2, n_val=3, n_test=2,
                            n_video_frames=6, fps=3.0, height=48, width=64)

        def build(out_name):
            cfg = Config(
                cfg_path="configs/projects/train/tiny_synthetic.yaml",
                options=[
                    f"datasets.qvh.build_info.annotations.train.storage={data}/train.json",
                    f"datasets.qvh.build_info.annotations.val.storage={data}/val.json",
                    f"datasets.qvh.build_info.annotations.test.storage={data}/test.json",
                    f"run.output_dir={tmp_path}/{out_name}", "run.num_workers=0",
                    "run.batch_size_eval=3", "run.evaluate=True",
                    "run.wandb=False",
                ],
            )
            task = tasks.setup_task(cfg)
            datasets = task.build_datasets(cfg)
            model = task.build_model(cfg)
            cls = registry.get_runner_class("runner_base")
            return cls(cfg=cfg, job_id=out_name, task=task, model=model,
                       datasets=datasets)

        # single-device: call task.evaluation directly (no mesh set on the
        # model, bypassing eval_epoch's mesh wiring)
        r1 = build("single")
        results_single = r1.task.evaluation(r1.model, r1.dataloaders["val"])

        r2 = build("meshed")
        assert r2.mesh is not None  # 8 virtual devices -> auto mesh
        r2.model.set_mesh(r2.mesh)
        results_mesh = r2.task.evaluation(r2.model, r2.dataloaders["val"])

        assert [r["prediction"] for r in results_mesh] == [
            r["prediction"] for r in results_single
        ]
        assert [r["raw_prediction"] for r in results_mesh] == [
            r["raw_prediction"] for r in results_single
        ]
