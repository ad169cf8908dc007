#!/bin/bash
cd /root/repo
LOG=experiments/bench_logs/infer_sweep.log
: > $LOG
for args in "--mode infer --batch 512 --compute-dtype bfloat16" \
            "--mode infer --batch 512 --compute-dtype bfloat16 --use-pallas" \
            "--mode infer --batch 512 --compute-dtype float32" \
            "--mode infer --batch 512 --compute-dtype float32 --use-pallas" \
            "--mode infer --batch 2048 --compute-dtype bfloat16" \
            "--mode infer --batch 2048 --compute-dtype bfloat16 --use-pallas"; do
  echo "=== bench.py $args ===" >> $LOG
  timeout 1500 python bench.py $args >> $LOG 2>&1
  echo "exit=$?" >> $LOG
done
echo "SWEEP DONE" >> $LOG
