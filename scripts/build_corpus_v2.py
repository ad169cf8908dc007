#!/usr/bin/env python
"""Build a fragment-recombination training corpus from real molecules.

Replaces the round-2 procedural corpus (measured chemically narrow — see
data/fragmenter.py docstring) with crossover products of the reference's
released de novo molecules.  Runs one worker per CPU with disjoint seeds
and merges/dedupes.

    python scripts/build_corpus_v2.py --n 150000 --out data/chembl_frag_150k.smi
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from multiprocessing import Pool

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from druggen_tpu.chem.vocab import read_smiles_file  # noqa: E402
from druggen_tpu.data.fragmenter import build_corpus  # noqa: E402


def _worker(args):
    parents, n, seed, include_parents, guard = args
    return build_corpus(parents, n, seed=seed,
                        include_parents=include_parents,
                        progress_every=25_000,
                        roundtrip_guard=guard)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=150_000)
    ap.add_argument("--out", default="data/chembl_frag_150k.smi")
    ap.add_argument("--parents", default="data/denovo_20k.smi")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--jobs", type=int, default=os.cpu_count() or 1)
    ap.add_argument("--no-roundtrip-guard", action="store_true",
                    help="skip the defensive child re-parse (~30%% faster; "
                         "the dataset featurizer re-parses and filters "
                         "anyway)")
    args = ap.parse_args()

    parents = read_smiles_file(args.parents)
    print(f"{len(parents)} parents from {args.parents}")
    t0 = time.time()
    per = -(-int(args.n * 1.05) // args.jobs)  # 5% slack for cross-worker dups
    jobs = [(parents, per, args.seed + k, k == 0,
             not args.no_roundtrip_guard) for k in range(args.jobs)]
    if args.jobs == 1:
        chunks = [_worker(jobs[0])]
    else:
        with Pool(args.jobs) as pool:
            chunks = pool.map(_worker, jobs)
    seen: set[str] = set()
    out: list[str] = []
    for chunk in chunks:
        for smi in chunk:
            if smi not in seen:
                seen.add(smi)
                out.append(smi)
            if len(out) >= args.n:
                break
        if len(out) >= args.n:
            break
    if len(out) < args.n:
        raise RuntimeError(f"only {len(out)} unique after merge")
    with open(args.out, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {args.out}: {len(out)} molecules in {time.time()-t0:.0f}s")


if __name__ == "__main__":
    main()
