#!/usr/bin/env bash
python evaluate.py --cfg-path configs/projects/eval/nextQA.yaml "$@"
