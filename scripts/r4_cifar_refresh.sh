#!/bin/bash
# Round-4 CIFAR-track refresh: regenerate the quantized artifacts from the
# SAME committed fp32 checkpoint with the round-4 sub-byte recipe (measured
# int4 guard + layer-local AdaRound), then evaluate the full matrix at
# n=10,240 and rebuild the report. int8 tiers are bit-identical to round 3
# (same deterministic calibration); only the sub-byte rows change.
set -e
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
BASE="--save-dir runs/r3_cifar/saved --results-dir runs/r3_cifar/results \
 --synthetic-train-size 12800 --synthetic-test-size 10240 --batch-size 128"
echo "=== quantize (guard + layer-local adaround) $(date +%T)"
python -m quantnet quantize $BASE --observer histogram --skip-first-layer \
  --int4-guard 50 --adaround-steps 400
echo "=== evaluate $(date +%T)"
python -m quantnet evaluate $BASE
echo "=== report $(date +%T)"
python -m quantnet report $BASE
echo "=== done $(date +%T)"
