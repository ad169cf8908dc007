#!/bin/bash
# One-knob-at-a-time oscillation ablation at the r3_quality 300k config
# (VERDICT r3 item 7).  Baseline = the committed r3_quality run itself
# (300k corpus, batch 128, g_lr=d_lr=1e-5, lambda_gp 10, d_head 16);
# each run here changes exactly one knob for ~11.7k steps (5 epochs),
# sampling every 500 iters so the validity/uniqueness trajectory is
# directly comparable to r3_quality/train.log.
#   usage: run_one.sh <name> [extra train.py flags...]
set -e
name=$1; shift
cd /root/repo
echo "t_launch $(date +%s)"
exec python train.py --submodel DrugGEN \
  --raw_file data/chembl_frag_300k.smi \
  --drug_raw_file data/akt1_drugs_2607.smi \
  --batch_size 128 --epoch 5 \
  --log_sample_step 500 \
  --compute_dtype bfloat16 --fused_mlp \
  --set_seed --seed 42 \
  --exp_name "abl_${name}" \
  --log_dir "experiments/r4_ablation/${name}/logs" \
  --sample_dir "experiments/r4_ablation/${name}/samples" \
  --model_save_dir "experiments/r4_ablation/${name}/models" \
  "$@"
