#!/usr/bin/env bash
python evaluate.py --cfg-path configs/projects/eval/mixed_eval_charades.yaml "$@"
