#!/bin/bash
# AKT1 + CDK2 released-set batteries with corpus-scale ref1 (re-run under
# the parallel+cached canonical-set path; eval 1 already committed).
set -e
cd /root/repo
REFDIR=/root/reference/results/generated_molecules
python evaluate.py --platform cpu --n-jobs 2 \
  --gen $REFDIR/DrugGEN_generated_molecules_AKT1.csv \
  --ref1 data/chembl_frag_1m6.smi --ref1-sample 10000 \
  --ref2 data/akt1_drugs_2607.smi \
  --output results_parity_akt1_10k \
  2>&1 | tee experiments/r4_evals/akt1_fullref.log
python evaluate.py --platform cpu --n-jobs 2 \
  --gen $REFDIR/DrugGEN_generated_molecules_CDK2.csv \
  --ref1 data/chembl_frag_1m6.smi --ref1-sample 10000 \
  --output results_parity_cdk2_10k \
  2>&1 | tee experiments/r4_evals/cdk2_fullref.log
echo "ALL EVALS DONE"
