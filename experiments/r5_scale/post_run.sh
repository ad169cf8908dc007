#!/bin/bash
# Post-training pipeline for the completed 124k-step run:
#   1. quality-aware selection sweep over ALL cadence checkpoints
#      (round-5 funnel: IntDiv/QED/SA terms in the screen itself)
#   2. stage the winning checkpoint as DrugGEN-G.ckpt
#   3. exact-10k de novo set (engine tops up through correction dedup)
#   4. offline battery vs the corpus-scale reference sets
# One TPU process at a time (relay constraint).
set -e
cd /root/repo
R=experiments/r5_scale
M=$R/models/r5_scale_DrugGEN_glr1e-05_dlr1e-05_dim128_depth1_heads8_batch128_epoch10_datasetchembl_frag_1m645_dropout0.0

python scripts/select_checkpoint.py --model_dir $M \
  --inf_smiles data/chembl_frag_1m6.smi --train_smiles data/chembl_frag_1m6.smi \
  --train_drug_smiles data/akt1_drugs_2607.smi \
  --sample_num 1024 --inf_batch_size 256 \
  --compute_dtype bfloat16 --fused_mlp \
  --finalists 8 --finalist_samples 8192 \
  --output $R/selection.json \
  2>&1 | tee $R/selection.log

BEST=$(python -c "
import json
d = json.load(open('$R/selection.json'))
rows = d.get('finalists') or d['ranked']
print(rows[0]['ckpt'])")
echo "selected checkpoint: $BEST"
mkdir -p $R/selected
cp "$M/$BEST" $R/selected/DrugGEN-G.ckpt

python inference.py --submodel DrugGEN \
  --inference_model $R/selected --sample_num 10000 --inf_batch_size 256 \
  --inf_smiles data/chembl_frag_1m6.smi --train_smiles data/chembl_frag_1m6.smi \
  --train_drug_smiles data/akt1_drugs_2607.smi \
  --compute_dtype bfloat16 --fused_mlp \
  --output_dir $R/inference \
  2>&1 | tee $R/inference.log

python evaluate.py \
  --gen $R/inference/DrugGEN/inference_drugs.csv \
  --ref1 data/chembl_frag_1m6.smi \
  --ref2 data/akt1_drugs_2607.smi \
  --ref1-sample 10000 \
  --output $R/results_denovo_10k \
  2>&1 | tee $R/eval.log
