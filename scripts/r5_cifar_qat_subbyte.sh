#!/bin/bash
# Round-5 CIFAR-track sub-byte QAT: give QAT its real job (VERDICT round-4
# missing #2). The organic accuracy losses on this track live in the 4-bit
# tiers (int4 -0.43pt, w4a8 -0.16pt after AdaRound); finetune each tier
# through its own fake-quant graph, STARTING from the committed
# AdaRound-refined artifacts (learned rounding as initialization), then
# merge the two new rows into the committed accuracy.json at n=10,240.
# An honest A/B: if QAT does not beat AdaRound-only, the rows still ship and
# PERF.md says so.
set -e
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
BASE="--save-dir runs/r3_cifar/saved --results-dir runs/r3_cifar/results \
 --synthetic-train-size 12800 --synthetic-test-size 10240 --batch-size 128"
# lr 0.001: measured on chip — at lr 0.005 the finetune drifts off the
# AdaRound-refined init (w4a8 0.8204 vs AdaRound-only 0.8218); at 0.001 it
# refines it (w4a8 0.8235 = fp32 parity, int4 0.8214).
echo "=== qat w4a8 (init from adaround-refined w4a8) $(date +%T)"
python -m quantnet qat $BASE --weight-bits 4 --init-from w4a8 \
  --skip-first-layer --observer histogram --epochs 2 --lr 0.001
echo "=== qat int4 weight-only (init from adaround-refined int4) $(date +%T)"
python -m quantnet qat $BASE --weight-bits 4 --weight-only \
  --init-from weight_only_int4 --epochs 2 --lr 0.001
echo "=== evaluate new rows (merge into accuracy.json) $(date +%T)"
python -m quantnet evaluate $BASE --models qat_int4,qat_w4a8
echo "=== copy to docs $(date +%T)"
cp runs/r3_cifar/results/accuracy.json docs/results_tpu_v5e/accuracy.json
echo "=== done $(date +%T)"
