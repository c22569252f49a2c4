"""Tests for auxiliary components: simple metrics, validator, preprocess,
tracking, FMR model, TAL metrics."""

import json
import subprocess
import sys

import numpy as np
import pytest

from mr_blip_tpu.metrics.simple import compute_IoU, r1_and_mIoU
from mr_blip_tpu.common.config_validator import create_runner_config_validator


class TestSimpleMetrics:
    def test_compute_iou(self):
        assert compute_IoU([0, 10], [0, 10]) == 1.0
        assert compute_IoU([0, 5], [5, 10]) == 0.0
        assert compute_IoU([0, 10], [5, 15]) == pytest.approx(5 / 15)

    def test_r1_and_miou(self):
        sub = [
            {"pred_relevant_windows": [[0, 10]], "relevant_windows": [[0, 10]]},
            {"pred_relevant_windows": [[-1, -1]], "relevant_windows": [[0, 10]]},
            {"pred_relevant_windows": [[0, 6]], "relevant_windows": [[0, 10], [20, 30]]},
        ]
        r1, r1_avg, mIoU, invalid = r1_and_mIoU(sub)
        assert invalid == 1
        # video 1: iou 1.0; video 3: ious [0.6, 0] -> r1@0.5 = 0.5
        assert r1["0.5"] == pytest.approx((1.0 + 0.5) / 3)
        assert mIoU == pytest.approx((1.0 + 0.6 + 0.0) / 3)

    def test_matches_reference_impl(self, reference_root):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "ref_metrics_own", reference_root / "lavis" / "tasks" / "metrics_own.py"
        )
        ref = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref)

        rng = np.random.default_rng(0)
        sub = []
        for _ in range(40):
            n_pred, n_gt = rng.integers(1, 4), rng.integers(1, 4)
            mk = lambda n: [
                sorted([float(rng.integers(0, 50)), float(rng.integers(1, 60))])
                for _ in range(n)
            ]
            sub.append(
                {"pred_relevant_windows": mk(n_pred), "relevant_windows": mk(n_gt)}
            )
        sub[3]["pred_relevant_windows"] = [[-1, -1]]
        got = r1_and_mIoU(sub)
        want = ref.r1_and_mIoU(sub)
        assert got[0] == want[0]
        assert got[1] == pytest.approx(want[1])
        assert got[2] == pytest.approx(want[2])
        assert got[3] == want[3]


class TestTALMetrics:
    @staticmethod
    def _report(results, tmp_path, classes=None):
        """Run TALTask._report_metrics over a result file (full reference
        flow: parse -> validate vs class table -> ANETdetection -> dict)."""
        import json as _json

        from mr_blip_tpu.common.registry import registry
        from mr_blip_tpu.tasks.temporal_action_localization import TALTask

        classes_path = None
        if classes is not None:
            classes_path = str(tmp_path / "classes.txt")
            with open(classes_path, "w") as f:
                f.write("\n".join(classes))
        f = tmp_path / "res.json"
        f.write_text(_json.dumps(results))
        registry.register_path("output_dir", str(tmp_path))
        task = TALTask(classes_path=classes_path)
        return task._report_metrics(str(f), "val")

    def test_perfect_detection(self, tmp_path):
        results = [
            {"qid": "v1", "prediction": '[[0, 10, "run"]]', "target": '[[0, 10, "run"]]'},
            {"qid": "v2", "prediction": '[[5, 9, "jump"]]', "target": '[[5, 9, "jump"]]'},
        ]
        m = self._report(results, tmp_path)
        assert m["agg_metrics"] == pytest.approx(1.0)
        assert m["r1"]["0.5"] == pytest.approx(1.0)
        assert m["mAP"]["0.95"] == pytest.approx(1.0)
        assert m["invalid_predictions"] == 0

    def test_wrong_class_scores_zero(self, tmp_path):
        results = [
            {"qid": "v1", "prediction": '[[0, 10, "walk"]]', "target": '[[0, 10, "run"]]'},
        ]
        m = self._report(results, tmp_path)
        assert m["agg_metrics"] == 0.0

    def test_class_table_mismatch_counted(self, tmp_path):
        """Labels outside the class table are replaced by the reference's
        mismatch literal and counted (temporal_action_localization.py:168-172)."""
        results = [
            {"qid": "v1", "prediction": '[[0, 10, "moonwalk"]]', "target": '[[0, 10, "run"]]'},
            {"qid": "v2", "prediction": '[[5, 9, "run"]]', "target": '[[5, 9, "run"]]'},
        ]
        m = self._report(results, tmp_path, classes=["run", "jump"])
        assert m["class_label_mismatch"] == 1

    def test_invalid_predictions_fraction(self, tmp_path):
        results = [
            {"qid": "v1", "prediction": "garbage", "target": '[[0, 10, "run"]]'},
            {"qid": "v2", "prediction": '[[5, 9, "run"]]', "target": '[[5, 9, "run"]]'},
        ]
        m = self._report(results, tmp_path)
        assert m["invalid_predictions"] == pytest.approx(0.5)

    def test_recall_at_1_partial(self, tmp_path):
        """Two GT segments, only one matched by the top-1x predictions."""
        results = [
            {"qid": "v1",
             "prediction": '[[0, 10, "run"], [50, 60, "run"]]',
             "target": '[[0, 10, "run"], [90, 99, "run"]]'},
        ]
        m = self._report(results, tmp_path)
        assert 0.0 < m["r1"]["0.5"] <= 0.5 + 1e-9


class TestConfigValidator:
    def test_valid_config_passes(self):
        v = create_runner_config_validator()
        v.validate({
            "task": "moment_retrieval", "lr_sched": "linear_warmup_cosine_lr",
            "init_lr": 3e-4, "max_epoch": 50, "evaluate": False,
            "train_splits": ["train"],
        })

    def test_bad_choice_raises(self):
        v = create_runner_config_validator()
        with pytest.raises(ValueError):
            v.validate({"task": "nonexistent_task"})

    def test_bad_type_raises(self):
        v = create_runner_config_validator()
        with pytest.raises(ValueError):
            v.validate({"max_epoch": "fifty"})


class TestDataPreprocess:
    def test_qvh_conversion(self, tmp_path):
        raw = [
            {"qid": 1, "vid": "abc_1", "duration": 150, "query": "a person",
             "relevant_windows": [[0, 10]], "relevant_clip_ids": [0],
             "saliency_scores": [[1, 2, 3]]},
        ]
        inp = tmp_path / "raw.jsonl"
        inp.write_text("\n".join(json.dumps(r) for r in raw))
        out = tmp_path / "out.json"
        r = subprocess.run(
            [sys.executable, "scripts/data_preprocess.py", "qvh",
             "--input", str(inp), "--output", str(out)],
            capture_output=True, text=True,
        )
        assert r.returncode == 0, r.stderr
        recs = json.loads(out.read_text())
        assert recs[0]["video"] == "abc_1"
        assert recs[0]["relevant_windows"] == [[0, 10]]
        assert "saliency_scores" in recs[0]

    def test_charades_conversion(self, tmp_path):
        inp = tmp_path / "raw.txt"
        inp.write_text("VID01 2.5 9.0##a person opens a door\n")
        durs = tmp_path / "durs.json"
        durs.write_text(json.dumps({"VID01": 30.5}))
        out = tmp_path / "out.json"
        r = subprocess.run(
            [sys.executable, "scripts/data_preprocess.py", "charades",
             "--input", str(inp), "--durations", str(durs), "--output", str(out)],
            capture_output=True, text=True,
        )
        assert r.returncode == 0, r.stderr
        recs = json.loads(out.read_text())
        assert recs[0]["relevant_windows"] == [[2.5, 9.0]]
        assert recs[0]["duration"] == 30.5

    def test_anet_conversion(self, tmp_path):
        inp = tmp_path / "raw.json"
        inp.write_text(json.dumps({
            "v_xyz": {"duration": 120.0, "timestamps": [[0, 30], [50, 90]],
                      "sentences": ["first thing", "second thing"]},
        }))
        out = tmp_path / "out.json"
        r = subprocess.run(
            [sys.executable, "scripts/data_preprocess.py", "anet",
             "--input", str(inp), "--output", str(out)],
            capture_output=True, text=True,
        )
        assert r.returncode == 0, r.stderr
        recs = json.loads(out.read_text())
        assert len(recs) == 2
        assert recs[1]["relevant_windows"] == [[50, 90]]


class TestTracking:
    def test_jsonl_events(self, tmp_path):
        from mr_blip_tpu.common import tracking

        tr = tracking.Tracker("p", "n", {"a": 1}, str(tmp_path))
        tr.log({"train/loss": 1.0})
        tr.log_table("t", ["c1"], [[1], [2]])
        tr.finish()
        lines = [json.loads(l) for l in (tmp_path / "events.jsonl").read_text().splitlines()]
        types = [l["type"] for l in lines]
        assert types == ["config", "metrics", "table", "finish"]


class TestCaptionMetrics:
    def test_bleu_perfect_and_zero(self):
        from mr_blip_tpu.metrics.caption_metrics import corpus_bleu

        preds = ["a cat sits on the mat today fine"]
        refs = [["a cat sits on the mat today fine"]]
        assert corpus_bleu(preds, refs) == pytest.approx(100.0)
        assert corpus_bleu(["totally wrong words here now"], refs) == 0.0

    def test_cider_orders_by_quality(self):
        from mr_blip_tpu.metrics.caption_metrics import cider_d

        refs = [["a cat sits on the mat"], ["a dog runs in the park"]]
        good = cider_d(["a cat sits on the mat", "a dog runs in the park"], refs)
        bad = cider_d(["something unrelated", "also unrelated"], refs)
        assert good > bad >= 0.0

    def test_retrieval_identity(self):
        from mr_blip_tpu.metrics.caption_metrics import retrieval_metrics

        sims = np.eye(10) + 0.01 * np.random.default_rng(0).random((10, 10))
        m = retrieval_metrics(sims)
        assert m["txt_r1"] == 100.0
        assert m["img_r1"] == 100.0

    def test_retrieval_multi_caption_gt(self):
        from mr_blip_tpu.metrics.caption_metrics import retrieval_metrics

        # 2 images x 4 texts; image i matches texts 2i, 2i+1
        sims = np.array([[0.1, 0.9, 0.0, 0.0], [0.0, 0.0, 0.8, 0.2]])
        m = retrieval_metrics(sims, i2t_gt={0: [0, 1], 1: [2, 3]})
        assert m["txt_r1"] == 100.0


class TestImageProcessors:
    def test_randaugment_blip_recipe(self):
        import numpy as np

        from mr_blip_tpu.processors.randaugment import BLIP_AUGS, RandomAugment

        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (48, 48, 3)).astype(np.uint8)
        aug = RandomAugment(2, 5, augs=BLIP_AUGS,
                            rng=np.random.default_rng(1))
        out = aug(img)
        assert out.shape == img.shape and out.dtype == np.uint8
        # every op individually runs and preserves shape/dtype
        from mr_blip_tpu.processors.randaugment import FUNC_DICT, LEVELED

        r = np.random.default_rng(2)
        for name, fn in FUNC_DICT.items():
            o = fn(img, r, 5) if name in LEVELED else fn(img, r)
            assert np.asarray(o).shape == img.shape, name

    def test_blip_image_train_eval(self):
        import numpy as np

        from mr_blip_tpu.common.registry import registry

        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (64, 80, 3)).astype(np.uint8)
        train = registry.get_processor_class("blip_image_train")(
            image_size=32, seed=0)
        eval_p = registry.get_processor_class("blip_image_eval")(image_size=32)
        a = train(img)
        b = eval_p(img)
        assert a.shape == b.shape == (32, 32, 3)
        assert np.isfinite(a).all() and np.isfinite(b).all()

    def test_clip_image_processors(self):
        import numpy as np

        from mr_blip_tpu.common.registry import registry

        rng = np.random.default_rng(4)
        img = rng.integers(0, 256, (50, 90, 3)).astype(np.uint8)
        train = registry.get_processor_class("clip_image_train")(
            image_size=32, seed=0)
        eval_p = registry.get_processor_class("clip_image_eval")(image_size=32)
        assert train(img).shape == (32, 32, 3)
        # shorter-side resize + center crop handles non-square inputs
        assert eval_p(img).shape == (32, 32, 3)

    def test_alpro_video_processors(self):
        import numpy as np

        from mr_blip_tpu.common.registry import registry

        train = registry.get_processor_class("alpro_video_train")(
            image_size=32, n_frms=3, seed=0)
        eval_p = registry.get_processor_class("alpro_video_eval")(
            image_size=32, n_frms=3)
        uri = "synthetic://12x48x64@6.0#1"
        ft, _, _ = train(uri)
        fe, _, _ = eval_p(uri)
        assert ft.shape == (3, 32, 32, 3)
        assert fe.shape == (3, 32, 32, 3)
        assert np.isfinite(ft).all()

    def test_gpt_processors(self):
        import numpy as np

        from mr_blip_tpu.common.registry import registry

        dlg = registry.get_processor_class("gpt_dialogue")(max_turns=2)
        out = dlg({
            "dialog": [{"question": "q1", "answer": "a1"},
                       {"question": "q2", "answer": "a2"},
                       {"question": "q3", "answer": "a3"}],
            "question": "what now",
            "answer": "this",
        })
        assert out["response"] == "this"
        assert "q1" not in out["text_input"]  # capped to last 2 turns
        assert "q2" in out["text_input"] and "what now" in out["text_input"]

        vf = registry.get_processor_class("gpt_video_ft")(visual_ft_max_len=4)
        feats = vf(np.ones((9, 8)))
        assert feats.shape == (4, 8)


class TestOpenEndedVQATasks:
    def _run(self, task_name, answers, gts, tmp_path):
        import numpy as np

        import mr_blip_tpu  # noqa: F401
        from mr_blip_tpu.common.registry import registry

        class FakeModel:
            def predict_answers(self, samples):
                return answers

        registry.register_path("result_dir", str(tmp_path))
        task = registry.get_task_class(task_name)()
        samples = {
            "question_id": list(range(len(answers))),
            "answers": gts,
        }
        rows = task.valid_step(FakeModel(), samples)
        return task.after_evaluation(rows, "val", 0)

    def test_vqa_consensus(self, tmp_path):
        m = self._run(
            "vqa", ["cat", "dog"],
            [["cat"] * 10, ["bird"] * 10], tmp_path)
        assert m["acc"] == 50.0

    def test_gqa_exact_match(self, tmp_path):
        m = self._run("gqa", ["The Cat!", "dog"],
                      [["cat"], ["bird"]], tmp_path)
        assert m["acc"] == 50.0  # normalization maps "The Cat!" -> "cat"

    def test_aokvqa_min_match_rule(self, tmp_path):
        # one match of 3 -> 1/3 credit; full matches -> 1.0
        m = self._run("aok_vqa", ["cat", "dog"],
                      [["cat", "feline", "kitty"], ["dog", "dog", "dog"]],
                      tmp_path)
        assert abs(m["acc"] - (100.0 * (1 / 3 + 1.0) / 2)) < 1e-6
