#!/bin/bash
# (a) reverse-over-forward gradient penalty vs baseline, with/without the
# fused edge-tail kernel; (b) repeated interleaved infer runs to settle the
# v4 fused-generator question (first sweep was polluted by a concurrent
# process on the relay).
cd /root/repo
LOG=experiments/bench_logs/fwdrev_sweep.log
: > $LOG
for args in "--mode train --batch 512 --compute-dtype bfloat16 --gp-mode fwdrev" \
            "--mode train --batch 512 --compute-dtype bfloat16 --gp-mode fwdrev --fused-mlp" \
            "--mode infer --batch 512 --compute-dtype bfloat16 --use-pallas" \
            "--mode infer --batch 512 --compute-dtype bfloat16" \
            "--mode infer --batch 512 --compute-dtype bfloat16 --use-pallas" \
            "--mode infer --batch 512 --compute-dtype bfloat16"; do
  echo "=== bench.py $args ===" >> $LOG
  timeout 1500 python bench.py $args >> $LOG 2>&1
  echo "exit=$?" >> $LOG
done
echo "SWEEP DONE" >> $LOG
