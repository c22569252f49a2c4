"""Train -> task-metric convergence (VERDICT r2 next-round #4).

Overfits the tiny flagship on 8 synthetic clips and asserts the VAL
R1@0.5 *metric* (not just the loss) beats the untrained baseline — the
cheapest offline full-loop coherence proof: a sign error in loss masking
or an off-by-one target shift keeps loss falling while the metric never
moves (reference hot loop moment_retrieval.py:154-257).
"""

import numpy as np
import pytest

from mr_blip_tpu.common.config import Config
from mr_blip_tpu.common.registry import registry
from mr_blip_tpu.text.span_grammar import moment_str_to_list

pytestmark = pytest.mark.slow


def _r1_at_05(results):
    hits = 0
    for r in results:
        gt = moment_str_to_list(r["target"]) if isinstance(r["target"], str) \
            else r["target"]
        pred = moment_str_to_list(r["prediction"])
        best = 0.0
        for p in pred:
            if p == [-1, -1]:
                continue
            for g in gt:
                inter = max(0.0, min(p[1], g[1]) - max(p[0], g[0]))
                union = max(p[1], g[1]) - min(p[0], g[0])
                if union > 0:
                    best = max(best, inter / union)
        hits += best >= 0.5
    return hits / max(len(results), 1)


def _valid_fraction(results):
    return np.mean(
        [moment_str_to_list(r["prediction"]) != [[-1, -1]] for r in results]
    )


@pytest.mark.parametrize("int8_vit", [False, True],
                         ids=["bf16_vit", "int8_frozen_vit"])
def test_overfit_improves_r1(tmp_path, int8_vit):
    """int8_frozen_vit: the same convergence proof through the W8A8
    quantized frozen ViT (model.int8_vit in a train config) — evidence the
    +20% int8-ViT train mode still trains the task, not just the loss."""
    import mr_blip_tpu  # noqa: F401
    from mr_blip_tpu import tasks
    from mr_blip_tpu.datasets.synthetic import make_mr_annotations

    data = tmp_path / "data"
    make_mr_annotations(str(data), n_train=8, n_val=2, n_test=2,
                        n_video_frames=8, fps=4.0, height=48, width=64)
    cfg = Config(
        cfg_path="configs/projects/train/tiny_synthetic.yaml",
        options=(["model.int8_vit=True"] if int8_vit else []) + [
            f"datasets.qvh.build_info.annotations.train.storage={data}/train.json",
            # overfit check: validate on the training clips
            f"datasets.qvh.build_info.annotations.val.storage={data}/train.json",
            f"datasets.qvh.build_info.annotations.test.storage={data}/train.json",
            f"run.output_dir={tmp_path}/out", "run.num_workers=0",
            "run.batch_size_train=4", "run.batch_size_eval=4",
            "run.init_lr=3e-3", "run.min_lr=3e-3", "run.warmup_steps=4",
            "run.max_epoch=70", "run.wandb=False",
            "model.max_new_tokens=16",
        ],
    )
    task = tasks.setup_task(cfg)
    datasets = task.build_datasets(cfg)
    model = task.build_model(cfg)
    runner = registry.get_runner_class("runner_base")(
        cfg=cfg, job_id="conv", task=task, model=model, datasets=datasets
    )

    loader = runner.dataloaders["val"]
    res0 = task.evaluation(runner.model, loader)
    r1_untrained = _r1_at_05(res0)
    valid_untrained = _valid_fraction(res0)

    best_r1, best_valid = 0.0, 0.0
    for ep in range(70):
        runner.train_epoch(ep)
        if ep >= 29 and ep % 5 == 4:
            res = task.evaluation(runner.model, loader)
            best_r1 = max(best_r1, _r1_at_05(res))
            best_valid = max(best_valid, float(_valid_fraction(res)))
            if best_r1 > r1_untrained and best_valid > 0.5:
                break

    # the untrained tiny model emits <unk> noise -> no valid spans, R1 = 0
    assert r1_untrained == 0.0
    assert best_r1 > r1_untrained, (
        f"R1@0.5 never improved: untrained {r1_untrained}, best {best_r1}"
    )
    # grammar learned: most predictions parse as spans
    assert best_valid > 0.5, best_valid
    assert best_valid > valid_untrained
