#!/usr/bin/env python
"""Training CLI.

Drop-in analogue of the reference ``train.py`` command line (same flags,
same derivation rules — reference train.py:400-462) on the TPU-native
framework.

Example:
    python train.py --raw_file data/chembl_train.smi \\
        --drug_raw_file data/akt_train.smi --submodel DrugGEN \\
        --batch_size 128 --epoch 10
"""

from druggen_tpu.config import parse_train_args
from druggen_tpu.train.trainer import Trainer


def main(argv=None):
    cfg = parse_train_args(argv)
    trainer = Trainer(cfg)
    trainer.train()


if __name__ == "__main__":
    main()
