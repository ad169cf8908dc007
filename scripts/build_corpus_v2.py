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
    ap.add_argument("--inject_ref12", type=int, default=0, metavar="K",
                    help="append K copies of the rare-element supplement "
                         "(Ca/K/As molecules — reference README.md:141-145 "
                         "atom types the recombination pool lacks) so a "
                         "--vocab_ref12 model sees every atom type during "
                         "training; K>1 repeats the set to raise its "
                         "sampling weight")
    args = ap.parse_args()

    parents = read_smiles_file(args.parents)
    print(f"{len(parents)} parents from {args.parents}")
    t0 = time.time()
    # 12% slack: cross-worker duplication measured at ~7% on a 1.6M build
    # (the 5% slack of the first version fell short there)
    per = -(-int(args.n * 1.12) // args.jobs)
    seen: set[str] = set()
    out: list[str] = []

    def merge(chunks) -> int:
        produced = 0
        for chunk in chunks:
            for smi in chunk:
                produced += 1
                if smi not in seen and len(out) < args.n:
                    seen.add(smi)
                    out.append(smi)
        return produced

    def run_jobs(jobs):
        if len(jobs) == 1:
            return [_worker(jobs[0])]
        with Pool(len(jobs)) as pool:
            return pool.map(_worker, jobs)

    jobs = [(parents, per, args.seed + k, k == 0,
             not args.no_roundtrip_guard) for k in range(args.jobs)]
    produced = merge(run_jobs(jobs))
    print(f"pass 1: {produced} produced, {len(out)} unique "
          f"({1 - len(out)/max(produced,1):.1%} cross-worker dup)")
    # top-up passes with fresh seeds until the target is met — never
    # discard completed work over a slack misestimate
    next_seed = args.seed + 1000
    while len(out) < args.n:
        missing = args.n - len(out)
        per = -(-int(missing * 1.3) // args.jobs)
        jobs = [(parents, per, next_seed + k, False,
                 not args.no_roundtrip_guard) for k in range(args.jobs)]
        next_seed += args.jobs
        before = len(out)
        merge(run_jobs(jobs))
        print(f"top-up (seed {next_seed - args.jobs}): now {len(out)} unique")
        if len(out) == before:
            # zero-progress pass: the parent pool cannot produce args.n
            # unique molecules — rerunning with fresh seeds would loop
            # forever, so fail loudly with what exists
            raise RuntimeError(
                f"top-up pass added no new unique molecules "
                f"({len(out)}/{args.n}); the parent pool is exhausted — "
                f"lower --n or provide more parents")
    if args.inject_ref12 > 0:
        from druggen_tpu.data.corpus import REF12_SUPPLEMENT

        out.extend(REF12_SUPPLEMENT * args.inject_ref12)
        print(f"injected rare-element supplement: "
              f"{len(REF12_SUPPLEMENT)} molecules x {args.inject_ref12}")
    with open(args.out, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {args.out}: {len(out)} molecules in {time.time()-t0:.0f}s")


if __name__ == "__main__":
    main()
