#!/bin/bash
# Sequential TPU bench sweep: remat on/off x batch sizes (one process at a time)
cd /root/repo
LOG=experiments/bench_logs/remat_sweep.log
: > $LOG
for args in "--batch 512 --compute-dtype bfloat16 --remat" \
            "--batch 512 --compute-dtype bfloat16" \
            "--batch 1024 --compute-dtype bfloat16 --remat" \
            "--batch 512 --compute-dtype float32 --remat" \
            "--batch 1024 --compute-dtype bfloat16"; do
  echo "=== bench.py $args ===" >> $LOG
  timeout 1500 python bench.py $args >> $LOG 2>&1
  echo "exit=$?" >> $LOG
done
echo "SWEEP DONE" >> $LOG
