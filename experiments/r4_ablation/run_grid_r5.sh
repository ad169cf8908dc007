#!/bin/bash
# Round-5 completion of the ablation grid (round-4 VERDICT task 4):
# the two remaining one-knob runs, sequential (one TPU process at a time),
# then trajectory extraction.  gp20 + glr2x already ran (see README.md).
set -e
cd /root/repo
bash experiments/r4_ablation/run_one.sh gp5 --lambda_gp 5 \
  > experiments/r4_ablation/gp5/train.log 2>&1
python experiments/r4_ablation/extract_traj.py \
  experiments/r4_ablation/gp5/train.log experiments/r4_ablation/gp5/traj.json
bash experiments/r4_ablation/run_one.sh dwide --d_head_mult 4 \
  > experiments/r4_ablation/dwide/train.log 2>&1
python experiments/r4_ablation/extract_traj.py \
  experiments/r4_ablation/dwide/train.log experiments/r4_ablation/dwide/traj.json
echo "grid complete"
