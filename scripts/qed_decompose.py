#!/usr/bin/env python
"""Per-descriptor QED decomposition for the released 10k sets (r3 VERDICT
item 5: diagnose the CDK2 QED overshoot with a *verified* mechanism).

QED = exp(mean_k w_k * ln d_k(x_k)) over the eight descriptors
(Bickerton 2012; reference calls RDKit QED at
``/root/reference/inference.py:264``).  A mean-QED delta between our
evaluator and the paper's RDKit numbers must come through the d_k terms,
so for each set this script reports

- the mean of each raw descriptor x_k,
- the mean of each weighted log-desirability w_k*ln d_k (the exact
  additive decomposition of ln QED),
- both, stratified by bracket-atom content (``[`` in SMILES) — the
  round-3 suspicion was bracket-rich molecules,

plus the overall QED.  Comparing the AKT1 set (where our QED matches the
paper: 0.518 vs ~0.52) against CDK2 (0.569 vs ~0.54) localizes which
descriptor behaves differently on the CDK2 chemotypes.
"""

from __future__ import annotations

import argparse
import json
import math
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from druggen_tpu.chem.descriptors import (  # noqa: E402
    _ADS_PARAMS,
    _QED_WEIGHTS,
    _ads,
    qed,
    qed_properties,
)
from druggen_tpu.chem.smiles import mol_from_smiles  # noqa: E402


def read_set(path: str) -> list[str]:
    out = []
    with open(path) as f:
        header = f.readline()
        has_id = "," in header and "SMILES" in header
        if not has_id:
            f.seek(0)
        for line in f:
            line = line.strip()
            if not line:
                continue
            out.append(line.split(",")[-1] if has_id else line.split()[0])
    return out


def decompose(smiles: list[str]) -> dict:
    rows = []
    for smi in smiles:
        m = mol_from_smiles(smi)
        if m is None:
            continue
        props = qed_properties(m)
        wlogd = {k: w * math.log(_ads(props[k], _ADS_PARAMS[k]))
                 for k, w in _QED_WEIGHTS.items()}
        rows.append((("[" in smi), props, wlogd, qed(m)))
    keys = list(_QED_WEIGHTS)

    def agg(sel):
        if not sel:
            return None
        return {
            "n": len(sel),
            "qed_mean": sum(r[3] for r in sel) / len(sel),
            "x_mean": {k: sum(r[1][k] for r in sel) / len(sel)
                       for k in keys},
            "wlogd_mean": {k: sum(r[2][k] for r in sel) / len(sel)
                           for k in keys},
        }

    return {
        "all": agg(rows),
        "bracket": agg([r for r in rows if r[0]]),
        "plain": agg([r for r in rows if not r[0]]),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--akt1", default="/root/reference/results/"
                    "generated_molecules/DrugGEN_generated_molecules_AKT1.csv")
    ap.add_argument("--cdk2", default="/root/reference/results/"
                    "generated_molecules/DrugGEN_generated_molecules_CDK2.csv")
    ap.add_argument("--out", default="experiments/r4_qed/decompose.json")
    args = ap.parse_args()

    res = {}
    for name, path in (("AKT1", args.akt1), ("CDK2", args.cdk2)):
        res[name] = decompose(read_set(path))
        a = res[name]["all"]
        print(f"\n== {name}: n={a['n']} QED={a['qed_mean']:.4f} ==")
        print(f"{'k':7s} {'x_mean':>9s} {'w*ln d':>9s} "
              f"{'x(brkt)':>9s} {'x(plain)':>9s} {'wld(brkt)':>10s} "
              f"{'wld(plain)':>10s}")
        b, p = res[name]["bracket"], res[name]["plain"]
        for k in a["x_mean"]:
            print(f"{k:7s} {a['x_mean'][k]:9.3f} {a['wlogd_mean'][k]:9.4f} "
                  f"{(b['x_mean'][k] if b else float('nan')):9.3f} "
                  f"{(p['x_mean'][k] if p else float('nan')):9.3f} "
                  f"{(b['wlogd_mean'][k] if b else float('nan')):10.4f} "
                  f"{(p['wlogd_mean'][k] if p else float('nan')):10.4f}")
        if b and p:
            print(f"bracket n={b['n']} QED={b['qed_mean']:.4f}   "
                  f"plain n={p['n']} QED={p['qed_mean']:.4f}")

    import os

    os.makedirs(args.out.rsplit("/", 1)[0], exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print(f"\nwritten {args.out}")


if __name__ == "__main__":
    main()
