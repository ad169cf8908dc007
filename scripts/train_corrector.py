#!/usr/bin/env python
"""Train the neural SMILES corrector on a corpus.

The reference ships pretrained corrector weights (PAPYRUS_200, downloaded
by setup.sh); this script trains our JAX re-implementation from scratch on
synthetic corruption pairs over any SMILES corpus.

Usage:
    python scripts/train_corrector.py --smiles data/chembl_train.smi \\
        --out experiments/corrector --steps 2000
    # then: export DRUGGEN_CORRECTOR_CKPT=experiments/corrector
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--smiles", help=".smi corpus (default: built-in)")
    p.add_argument("--out", default="experiments/corrector")
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--max-len", type=int, default=202)
    p.add_argument("--hid", type=int, default=256)
    p.add_argument("--layers", type=int, default=3)
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    if args.smiles:
        from druggen_tpu.chem.vocab import read_smiles_file

        corpus = read_smiles_file(args.smiles)
    else:
        from druggen_tpu.data.corpus import (
            DRUGLIKE_SMILES,
            TARGET_SMILES,
            generate_corpus,
        )

        corpus = DRUGLIKE_SMILES + TARGET_SMILES + generate_corpus(400)

    from druggen_tpu.infer.seq2seq import train_corrector

    corrector = train_corrector(corpus, steps=args.steps, batch=args.batch,
                                lr=args.lr, hid=args.hid,
                                n_layers=args.layers, max_len=args.max_len)
    corrector.save(args.out)
    print(f"corrector saved to {args.out}")
    print("enable with: export DRUGGEN_CORRECTOR_CKPT=" + args.out)


if __name__ == "__main__":
    main()
