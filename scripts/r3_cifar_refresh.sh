#!/bin/bash
# Round-3 CIFAR-track artifact refresh: rerun ONLY the QAT finetune with the
# stabilized trainer (grad clip 1.0 + HIGHEST-precision fq islands,
# docs/PERF.md "QAT stabilization"), then evaluate/bench/report the full
# 9-scheme matrix at n=10,240.  PTQ artifacts in runs/r3_cifar/saved are
# untouched (generated this morning by the same code path).
set -e
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
BASE="--save-dir runs/r3_cifar/saved --results-dir runs/r3_cifar/results \
 --synthetic-train-size 12800 --synthetic-test-size 10240 --batch-size 128"
echo "=== qat (stabilized) $(date +%T)"
python -m quantnet qat $BASE --observer histogram --skip-first-layer \
  --epochs 2 --lr 0.01 --grad-clip-norm 1.0
echo "=== evaluate $(date +%T)"
python -m quantnet evaluate $BASE
echo "=== bench $(date +%T)"
python -m quantnet bench $BASE --batch-sizes 1,32,1024
echo "=== report $(date +%T)"
python -m quantnet report $BASE
echo "=== done $(date +%T)"
