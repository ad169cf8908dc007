#!/bin/bash
# r5_scale: the COMPLETE reference training regime, unattended
# (round-4 VERDICT task 1): 1,588,865-molecule corpus x 10 epochs, batch
# 128, lr 1e-5 (reference README.md:141-145, train.py:410-433 defaults) =
# 124,060 steps on one relay-attached TPU chip, bf16 + fused_mlp +
# pipelined host loop, under the full round-5 robustness stack:
#   - numerics ladder (gp_f32=auto -> f32_stats=auto -> f32_full=auto):
#     self-escalating precision on the first non-finite loss window
#   - apply_if_all_finite full-transition optimizer barrier (default on)
#   - relay-death watchdog (scripts/train_watchdog.py): kills the exact
#     process group on stall and relaunches with --resume (exact
#     bit-identical continuation)
# Zero manual state surgery permitted: every incident must be handled by
# machinery and logged in watchdog.jsonl.
cd /root/repo
mkdir -p experiments/r5_scale/logs
exec python scripts/train_watchdog.py \
  --watch 'experiments/r5_scale/logs/*.jsonl' \
  --watch 'experiments/r5_scale/models/*/state_*.msgpack' \
  --stall_timeout 1200 --startup_timeout 3600 \
  --incident_log experiments/r5_scale/watchdog.jsonl \
  --child_log experiments/r5_scale/train.log \
  -- python train.py --submodel DrugGEN --resume \
  --raw_file data/chembl_frag_1m6.smi \
  --drug_raw_file data/akt1_drugs_2607.smi \
  --batch_size 128 --epoch 10 \
  --compute_dtype bfloat16 --fused_mlp \
  --set_seed --seed 42 \
  --exp_name r5_scale \
  --log_dir experiments/r5_scale/logs \
  --sample_dir experiments/r5_scale/samples \
  --model_save_dir experiments/r5_scale/models
