#!/bin/bash
# r4_scale: the reference's training regime at reference scale
# (1,588,865-molecule corpus x 10 epochs, batch 128, lr 1e-5 — reference
# README.md:141-145, train.py:410-433 defaults) on one relay-attached TPU
# chip, bf16 + fused_mlp + pipelined host loop (r3-proven fast path).
# Cold start (vocab + featurize + cache) is measured by the t_* stamps.
cd /root/repo
echo "t_launch $(date +%s)"
exec python train.py --submodel DrugGEN --resume \
  --raw_file data/chembl_frag_1m6.smi \
  --drug_raw_file data/akt1_drugs_2607.smi \
  --batch_size 128 --epoch 10 \
  --compute_dtype bfloat16 --fused_mlp \
  --set_seed --seed 42 \
  --exp_name r4_scale \
  --log_dir experiments/r4_scale/logs \
  --sample_dir experiments/r4_scale/samples \
  --model_save_dir experiments/r4_scale/models
