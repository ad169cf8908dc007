#!/bin/bash
# Post-training pipeline for the completed 124k-step run:
# quality-aware selection sweep over ALL cadence checkpoints (round-5
# funnel: IntDiv/QED/SA terms in the screen itself) -> exact-10k de novo
# set -> offline battery vs the corpus-scale reference sets.
set -e
cd /root/repo
M=/root/repo/experiments/r5_scale/models/r5_scale_DrugGEN_glr1e-05_dlr1e-05_dim128_depth1_heads8_batch128_epoch10_datasetchembl_frag_1m645_dropout0.0/
python scripts/select_checkpoint.py --model_dir $M \
  --inf_smiles data/chembl_frag_1m6.smi --train_smiles data/chembl_frag_1m6.smi \
  --train_drug_smiles data/akt1_drugs_2607.smi \
  --sample_num 1024 --inf_batch_size 256 \
  --compute_dtype bfloat16 --fused_mlp \
  --finalists 8 --finalist_samples 8192 \
  --output experiments/r5_scale/selection.json \
  2>&1 | tee experiments/r5_scale/selection.log
