#!/usr/bin/env bash
python evaluate.py --cfg-path configs/projects/eval/qvh.yaml "$@"
