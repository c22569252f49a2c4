#!/usr/bin/env bash
# Multi-host: set COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID per host.
python train.py --cfg-path configs/projects/train/charades.yaml "$@"
