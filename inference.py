#!/usr/bin/env python
"""Inference CLI.

Drop-in analogue of the reference ``inference.py`` command line
(reference inference.py:293-325) on the TPU-native framework.

Example:
    python inference.py --submodel DrugGEN \\
        --inference_model experiments/models/<run> \\
        --inf_smiles data/chembl_test.smi \\
        --train_smiles data/chembl_train.smi \\
        --train_drug_smiles data/akt_train.smi --sample_num 100
"""

from druggen_tpu.config import parse_inference_args
from druggen_tpu.infer.engine import InferenceEngine


def main(argv=None):
    cfg = parse_inference_args(argv)
    engine = InferenceEngine(cfg)
    return engine.run()


if __name__ == "__main__":
    main()
