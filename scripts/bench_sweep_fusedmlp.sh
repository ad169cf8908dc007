#!/bin/bash
# Train-step sweep for the fused LN->MLP->LN edge-tail kernel, plus a
# clean re-confirmation of the v4 fused-generator inference win (the
# first sweep shared the relay with a stray parity script).
cd /root/repo
LOG=experiments/bench_logs/fusedmlp_sweep.log
: > $LOG
for args in "--mode train --batch 512 --compute-dtype bfloat16" \
            "--mode train --batch 512 --compute-dtype bfloat16 --fused-mlp" \
            "--mode train --batch 512 --compute-dtype bfloat16 --fused-mlp --remat" \
            "--mode train --batch 512 --compute-dtype float32 --fused-mlp" \
            "--mode infer --batch 512 --compute-dtype bfloat16 --use-pallas" \
            "--mode infer --batch 512 --compute-dtype bfloat16"; do
  echo "=== bench.py $args ===" >> $LOG
  timeout 1500 python bench.py $args >> $LOG 2>&1
  echo "exit=$?" >> $LOG
done
echo "SWEEP DONE" >> $LOG
