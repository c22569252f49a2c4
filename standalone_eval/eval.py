"""Offline QVHighlights scorer CLI (pure CPU).

Drop-in equivalent of the reference ``standalone_eval/eval.py`` CLI:

    python standalone_eval/eval.py --submission_path preds.jsonl \
        --gt_path gt.jsonl --save_path metrics.json [--not_verbose]

Scores moment retrieval (R1@IoU, mAP by GT-window length range) and, when
``pred_saliency_scores`` are present, highlight detection (HL-Hit1, HL-mAP).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mr_blip_tpu.metrics.moment_retrieval import eval_submission, load_jsonl


def eval_main():
    parser = argparse.ArgumentParser(
        description="Moments and Highlights Evaluation Script"
    )
    parser.add_argument("--submission_path", type=str, help="path to generated prediction file")
    parser.add_argument("--gt_path", type=str, help="path to GT file")
    parser.add_argument("--save_path", type=str, help="path to save the results")
    parser.add_argument("--not_verbose", action="store_true")
    args = parser.parse_args()

    verbose = not args.not_verbose
    submission = load_jsonl(args.submission_path)
    gt = load_jsonl(args.gt_path)
    results = eval_submission(submission, gt, verbose=verbose, mode="qvh")
    if verbose:
        print(json.dumps(results, indent=4))

    with open(args.save_path, "w") as f:
        f.write(json.dumps(results, indent=4))


if __name__ == "__main__":
    eval_main()
