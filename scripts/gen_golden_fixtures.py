"""Generate self-contained golden metric fixtures from the reference scorer.

The reference ships a committed regression pair
(``standalone_eval/sample_val_preds.jsonl`` +
``sample_val_preds_metrics_raw.json``) but not the ground-truth file it was
scored against, so it cannot be replayed. This script builds our own
replayable triple: a deterministic synthetic submission + ground truth
(same generators as tests/test_metrics_golden.py) scored by the
**reference's own pure-numpy scorer** loaded from the mounted tree
(``/root/reference/standalone_eval/eval.py`` and
``lavis/tasks/mr_eval.py``). The outputs are committed under
``tests/data/golden/`` so the bit-exact metric-contract test runs without
the reference mount.

Rerun (requires the mount):  python scripts/gen_golden_fixtures.py
"""

import importlib.util
import json
import os
import pathlib
import sys
import types

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
REFERENCE = pathlib.Path(os.environ.get("MRBLIP_REFERENCE", "/root/reference"))
OUT = REPO / "tests" / "data" / "golden"

sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def _load_module(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _canon(obj):
    return json.loads(json.dumps(obj, default=float))


def main():
    if not REFERENCE.exists():
        raise SystemExit(f"reference not mounted at {REFERENCE}")

    # Reference standalone (offline QVH) scorer.
    pkg = types.ModuleType("standalone_eval")
    pkg.__path__ = [str(REFERENCE / "standalone_eval")]
    sys.modules["standalone_eval"] = pkg
    _load_module(REFERENCE / "standalone_eval" / "utils.py",
                 "standalone_eval.utils")
    ref_standalone = _load_module(REFERENCE / "standalone_eval" / "eval.py",
                                  "standalone_eval.eval")

    # Reference in-train scorer (numpy/sklearn only; stub the package chain
    # so importing mr_eval does not pull the torch-laden lavis/__init__).
    for name in ("lavis", "lavis.tasks"):
        if name not in sys.modules:
            p = types.ModuleType(name)
            p.__path__ = []
            sys.modules[name] = p
    _load_module(REFERENCE / "lavis" / "tasks" / "mr_utils.py",
                 "lavis.tasks.mr_utils")
    ref_intrain = _load_module(REFERENCE / "lavis" / "tasks" / "mr_eval.py",
                               "lavis.tasks.mr_eval")

    # Same generators the differential test uses (imported, not duplicated).
    from test_metrics_golden import _synth_intrain, _synth_qvh

    OUT.mkdir(parents=True, exist_ok=True)

    def dump_jsonl(path, records):
        with open(path, "w") as f:
            f.writelines(json.dumps(r) + "\n" for r in records)

    # QVH mode, with saliency/highlight fields (seed 0 = the live test's).
    sub, gt = _synth_qvh(np.random.default_rng(0))
    sub, gt = _canon(sub), _canon(gt)
    expected = _canon(ref_standalone.eval_submission(sub, gt, verbose=False))
    dump_jsonl(OUT / "qvh_submission.jsonl", sub)
    dump_jsonl(OUT / "qvh_gt.jsonl", gt)
    json.dump(expected, open(OUT / "qvh_expected.json", "w"), indent=1)

    # QVH mode without saliency (seed 1 = the live no-saliency test's).
    sub2, gt2 = _synth_qvh(np.random.default_rng(1), n_queries=30,
                           with_saliency=False)
    sub2, gt2 = _canon(sub2), _canon(gt2)
    expected2 = _canon(ref_standalone.eval_submission(sub2, gt2,
                                                      verbose=False))
    dump_jsonl(OUT / "qvh_nosal_submission.jsonl", sub2)
    dump_jsonl(OUT / "qvh_nosal_gt.jsonl", gt2)
    json.dump(expected2, open(OUT / "qvh_nosal_expected.json", "w"), indent=1)

    # In-train mode (seed 2 = the live in-train test's).
    results = _canon(_synth_intrain(np.random.default_rng(2)))
    expected3 = _canon(ref_intrain.eval_submission(results, results,
                                                   verbose=False))
    dump_jsonl(OUT / "intrain_results.jsonl", results)
    json.dump(expected3, open(OUT / "intrain_expected.json", "w"), indent=1)

    # Grounded-QA mode (seed 3 = the live test's): score with the
    # reference's eval_ground (lavis/tasks/vqa.py:768-860), ast-extracted
    # because vqa.py's top-level imports are torch/wandb-laden.
    from test_metrics_golden import _synth_gqa, load_ref_ground
    ref_ground = load_ref_ground(REFERENCE)
    gqa = _canon(_synth_gqa(np.random.default_rng(3)))
    expected4 = _canon(ref_ground["eval_ground"](gqa))
    dump_jsonl(OUT / "gqa_results.jsonl", gqa)
    json.dump(expected4, open(OUT / "gqa_expected.json", "w"), indent=1)

    print(f"wrote fixtures to {OUT}")
    print("qvh brief:", json.dumps(expected["brief"]))
    print("intrain brief:", json.dumps(expected3["brief"]))
    print("gqa:", json.dumps(expected4))


if __name__ == "__main__":
    main()
