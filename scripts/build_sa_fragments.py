#!/usr/bin/env python
"""Build the SA-score fragment-frequency table.

RDKit's contrib ``sascorer`` (the reference's SA source,
``/root/reference/inference.py:19-21,265``) ships a PubChem-derived
fragment-score pickle that is not redistributable offline.  This script
builds the equivalent table — log-scaled Morgan-environment frequencies —
from the *real* molecule corpora staged in ``data/`` (the reference's
released de novo sets + the AKT1 bioactive set), and writes it to
``data/cache/sa_fragments.npz`` where ``chem.descriptors.sa_score`` picks
it up automatically.

Scoring follows sascorer's construction: environments are binned by
frequency, the score is ``log10`` of the count percentile relative to the
most common environments, clipped to [-4, 4].
"""

from __future__ import annotations

import argparse
import math
import os
import sys
from collections import Counter

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from druggen_tpu.chem.descriptors import _morgan_identifiers  # noqa: E402
from druggen_tpu.chem.smiles import mol_from_smiles  # noqa: E402
from druggen_tpu.chem.vocab import read_smiles_file  # noqa: E402


def build(smiles: list[str]) -> dict[int, float]:
    counts: Counter[int] = Counter()
    n_ok = 0
    for smi in smiles:
        m = mol_from_smiles(smi)
        if m is None:
            continue
        n_ok += 1
        counts.update(_morgan_identifiers(m))
    print(f"{n_ok} molecules, {len(counts)} distinct environments")
    # log-scaled relative frequency, centered so a mean-frequency
    # environment scores +1 (sascorer's published table has typical
    # drug-like environments scoring ~+1..+2 and the rare tail negative;
    # unknown environments score -4 at lookup, as in sascorer)
    mean = sum(counts.values()) / len(counts)
    table = {}
    for ident, c in counts.items():
        score = math.log10(c / mean) + 1.0
        table[ident] = max(min(score, 4.0), -4.0)
    return table


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/cache/sa_fragments.npz")
    ap.add_argument("--inputs", nargs="*", default=[
        "data/denovo_20k.smi", "data/akt1_drugs_2607.smi",
        "data/akt1_drugs.smi"])
    args = ap.parse_args()

    smiles: list[str] = []
    for path in args.inputs:
        if os.path.exists(path):
            smiles.extend(read_smiles_file(path))
            print(f"{path}: {len(smiles)} total")
    table = build(smiles)
    ids = np.array(list(table.keys()), dtype=np.uint64)
    scores = np.array([table[i] for i in ids], dtype=np.float32)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(args.out, ids=ids, scores=scores)
    print(f"wrote {args.out}: {len(ids)} entries, "
          f"{os.path.getsize(args.out)/1e6:.2f} MB")


if __name__ == "__main__":
    main()
