"""Bit-exact differential regression of the MR scorers against the reference.

The reference golden fixture (sample_val_preds.jsonl) lacks its ground-truth
file (data/annotations/QVH/highlight_val_release.jsonl is not shipped), so we
go one better: load the reference's own pure-numpy scorer modules directly
from the mounted reference tree and require bit-exact agreement with our
implementation on randomized synthetic submissions — covering both the
offline QVH mode (scored AP + length ranges + highlights) and the in-train
mode (unscored AP, R1-avg/mIoU/invalid counts).
"""

import importlib.util
import json
import sys
import types

import numpy as np
import pytest

from mr_blip_tpu.metrics.moment_retrieval import eval_submission, load_jsonl


def _load_module(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_standalone(reference_root):
    # standalone_eval/eval.py does `from standalone_eval.utils import ...`
    pkg = types.ModuleType("standalone_eval")
    pkg.__path__ = [str(reference_root / "standalone_eval")]
    sys.modules["standalone_eval"] = pkg
    _load_module(reference_root / "standalone_eval" / "utils.py", "standalone_eval.utils")
    return _load_module(reference_root / "standalone_eval" / "eval.py", "standalone_eval.eval")


@pytest.fixture(scope="module")
def ref_intrain(reference_root):
    # lavis/tasks/mr_eval.py only needs lavis.tasks.mr_utils (numpy/sklearn);
    # stub the package chain to avoid importing torch-laden lavis/__init__.
    for name in ("lavis", "lavis.tasks"):
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = []
            sys.modules[name] = pkg
    _load_module(reference_root / "lavis" / "tasks" / "mr_utils.py", "lavis.tasks.mr_utils")
    return _load_module(reference_root / "lavis" / "tasks" / "mr_eval.py", "lavis.tasks.mr_eval")


def _synth_qvh(rng, n_queries=60, with_saliency=True):
    """Random QVH-style submission + ground truth."""
    submission, gt = [], []
    for qid in range(n_queries):
        duration = float(rng.choice([60, 90, 126, 150]))
        n_clips = int(duration / 2)
        n_pred = rng.integers(1, 6)
        preds = []
        for _ in range(n_pred):
            st = float(rng.integers(0, int(duration) - 2))
            ed = float(rng.integers(int(st) + 2, int(duration) + 1))
            preds.append([st, ed, float(np.round(rng.random(), 4))])
        n_gt = rng.integers(1, 4)
        gts = []
        for _ in range(n_gt):
            st = float(rng.integers(0, int(duration) - 2))
            ed = float(rng.integers(int(st) + 2, int(duration) + 1))
            gts.append([st, ed])
        rec_s = {"qid": qid, "pred_relevant_windows": preds}
        rec_g = {"qid": qid, "relevant_windows": gts, "duration": duration}
        if with_saliency:
            n_rel = rng.integers(1, min(6, n_clips))
            rel_ids = sorted(rng.choice(n_clips, size=n_rel, replace=False).tolist())
            rec_g["relevant_clip_ids"] = rel_ids
            rec_g["saliency_scores"] = rng.integers(0, 5, size=(n_rel, 3)).tolist()
            rec_s["pred_saliency_scores"] = rng.standard_normal(n_clips).tolist()
        submission.append(rec_s)
        gt.append(rec_g)
    return submission, gt


def _synth_intrain(rng, n_queries=50):
    """Random in-train merged results: spans only, GT embedded, some invalid."""
    results = []
    for qid in range(n_queries):
        duration = float(rng.integers(20, 150))
        if rng.random() < 0.1:
            preds = [[-1, -1]]
        else:
            preds = []
            for _ in range(rng.integers(1, 4)):
                st = float(rng.integers(0, int(duration) - 1))
                ed = float(rng.integers(int(st) + 1, int(duration) + 1))
                preds.append([st, ed])
        gts = []
        for _ in range(rng.integers(1, 3)):
            st = float(rng.integers(0, int(duration) - 1))
            ed = float(rng.integers(int(st) + 1, int(duration) + 1))
            gts.append([st, ed])
        results.append(
            {"qid": f"q{qid}", "pred_relevant_windows": preds, "relevant_windows": gts}
        )
    return results


def _canon(obj):
    return json.loads(json.dumps(obj, default=float))


def test_qvh_mode_matches_reference_bit_exact(ref_standalone):
    rng = np.random.default_rng(0)
    submission, gt = _synth_qvh(rng)
    want = _canon(ref_standalone.eval_submission(
        _canon(submission), _canon(gt), verbose=False))
    got = _canon(eval_submission(
        _canon(submission), _canon(gt), verbose=False, mode="qvh"))
    assert got == want


def test_qvh_mode_no_saliency_matches_reference(ref_standalone):
    rng = np.random.default_rng(1)
    submission, gt = _synth_qvh(rng, n_queries=30, with_saliency=False)
    want = _canon(ref_standalone.eval_submission(
        _canon(submission), _canon(gt), verbose=False))
    got = _canon(eval_submission(
        _canon(submission), _canon(gt), verbose=False, mode="qvh"))
    assert got == want


def test_intrain_mode_matches_reference_bit_exact(ref_intrain):
    rng = np.random.default_rng(2)
    results = _synth_intrain(rng)
    want = _canon(ref_intrain.eval_submission(
        _canon(results), _canon(results), verbose=False))
    got = _canon(eval_submission(
        _canon(results), _canon(results), verbose=False, mode="intrain"))
    assert got == want


def test_intrain_scorer_smoke():
    # Hand-checkable example for the in-train mode (runs without the reference).
    submission = [
        {
            "qid": "q0",
            "pred_relevant_windows": [[0.0, 10.0]],
            "relevant_windows": [[0.0, 10.0]],
        },
        {
            "qid": "q1",
            "pred_relevant_windows": [[-1, -1]],
            "relevant_windows": [[5.0, 15.0]],
        },
    ]
    result = eval_submission(submission, submission, verbose=False, mode="intrain")
    brief = result["brief"]
    # q0 is a perfect hit at every threshold, q1 invalid: R1@x = 50 for all x.
    assert brief["MR-full-R1@0.5"] == 50.0
    assert brief["MR-full-R1@0.7"] == 50.0
    assert brief["MR-full-invalid_pred_num"] == 1
    # mIoU: q0 IoU=1.0; q1 paired IoU of [-1,-1] vs [5,15] = 0 -> mean 0.5
    assert abs(brief["MR-full-mIoU"] - 0.5) < 1e-9
    # all four range names alias the full set in intrain mode
    assert result["short"]["MR-R1"] == result["full"]["MR-R1"]
