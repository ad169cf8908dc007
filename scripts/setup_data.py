#!/usr/bin/env python
"""Data setup + verification.

The reference's ``setup.sh`` downloads ChEMBL/AKT1/CDK2 corpora, encoders
and pretrained weights from Google Drive and verifies the layout
(``setup.sh:33-172``).  Offline, this script:

1. writes the built-in corpora (or splits a user-provided .smi) into the
   reference's expected ``data/`` layout,
2. pre-builds the vocabulary and dense caches,
3. verifies everything loads (the setup-verification capability).

Usage:
    python scripts/setup_data.py                       # built-in corpora
    python scripts/setup_data.py --chembl my.smi --drug akt.smi
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# The reference's published asset folder (setup.sh:68: ChEMBL/AKT1/CDK2
# corpora, encoders/decoders, released checkpoints).
DRIVE_FOLDER_ID = "1k-amlOwNQEWGx751MtWZc4SbZCUs8iqK"


def try_download(data_dir: str) -> bool:
    """Attempt the reference's Google Drive asset pull (setup.sh:33-99).

    Mirrors setup.sh's own ladder: gdown if importable, plain HTTPS reach
    check otherwise, and — exactly like the reference (setup.sh:89,166) —
    fall back to printed manual-download instructions when neither works
    (e.g. this egress-blocked environment).  Returns True if assets
    landed."""
    url = f"https://drive.google.com/drive/folders/{DRIVE_FOLDER_ID}"
    try:
        import gdown  # the reference pip-installs this (setup.sh:43-45)
    except ImportError:
        gdown = None
    if gdown is not None:
        tmp = os.path.join(data_dir, "_drive_tmp")
        try:
            gdown.download_folder(id=DRIVE_FOLDER_ID, output=tmp,
                                  quiet=False, use_cookies=False)
            return True
        except Exception as e:
            print(f"gdown download failed: {e}")
    else:
        # connectivity probe only — a Drive *folder* cannot be fetched
        # with plain urllib (the listing is JS-rendered), so without
        # gdown the honest outcome is the manual path
        try:
            import urllib.request

            urllib.request.urlopen(url, timeout=10)
            print("network reachable, but the gdown package is required "
                  "to pull a Drive folder (reference setup.sh:43-45)")
        except Exception as e:
            print(f"no network egress ({type(e).__name__}) — offline mode")
    print("Manual download (reference setup.sh fallback):\n"
          f"1. Visit {url}\n"
          f"2. Download the folder and extract into {data_dir}/\n"
          "3. Re-run this script to verify the layout")
    return False


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default="data")
    p.add_argument("--chembl", help="training .smi (default: built-in)")
    p.add_argument("--drug", help="target/drug .smi (default: built-in)")
    p.add_argument("--max-atom", type=int, default=45)
    p.add_argument("--n-generated", type=int, default=500,
                   help="extra procedurally generated molecules")
    p.add_argument("--download", action="store_true",
                   help="attempt the reference's Google Drive asset pull "
                        "first (setup.sh:33-99); falls back to the "
                        "built-in corpora offline")
    args = p.parse_args()

    if args.download:
        os.makedirs(args.data_dir, exist_ok=True)
        try_download(args.data_dir)

    from druggen_tpu.chem.vocab import get_vocab, read_smiles_file
    from druggen_tpu.data.corpus import (
        DRUGLIKE_SMILES,
        TARGET_SMILES,
        generate_corpus,
        write_corpus,
    )
    from druggen_tpu.data.dataset import load_dataset

    os.makedirs(args.data_dir, exist_ok=True)
    if args.chembl:
        chembl_path = args.chembl
    else:
        chembl_path = os.path.join(args.data_dir, "chembl_train.smi")
        corpus = DRUGLIKE_SMILES + generate_corpus(args.n_generated, seed=1)
        write_corpus(chembl_path, corpus)
        # test split for inference parity with the reference's chembl_test
        test_path = os.path.join(args.data_dir, "chembl_test.smi")
        write_corpus(test_path, corpus[: max(len(corpus) // 10, 10)])
        print(f"wrote {chembl_path} ({len(corpus)} molecules) + test split")
    if args.drug:
        drug_path = args.drug
    else:
        drug_path = os.path.join(args.data_dir, "akt_train.smi")
        write_corpus(drug_path, TARGET_SMILES)
        print(f"wrote {drug_path} ({len(TARGET_SMILES)} molecules)")

    print("building vocabulary...")
    vocab = get_vocab(chembl_path, drug_path, args.max_atom,
                      cache_dir=os.path.join(args.data_dir, "vocab"))
    print(f"vocab: {vocab.m_dim} atom types, {vocab.b_dim} bond types")

    print("building dense caches...")
    problems = []
    d1 = d2 = ()
    try:
        d1 = load_dataset(chembl_path, vocab, args.max_atom, args.data_dir)
        d2 = load_dataset(drug_path, vocab, args.max_atom, args.data_dir)
        print(f"caches: {len(d1)} training molecules, {len(d2)} drug molecules")
    except ValueError as e:  # "no molecules survived filtering"
        problems.append(f"cache build failed: {e}")

    # verification pass (reference setup.sh:140-160)
    for path in (chembl_path, drug_path):
        if not os.path.exists(path):
            problems.append(f"missing {path}")
    if len(d1) == 0 or len(d2) == 0:
        problems.append("empty dataset after filtering")
    if problems:
        print("SETUP FAILED:")
        for pr in problems:
            print(" -", pr)
        sys.exit(1)
    print("Setup complete and verified.")


if __name__ == "__main__":
    main()
