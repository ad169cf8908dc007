#!/usr/bin/env python
"""Docking-result summarizer.

The reference evaluates de novo molecules with an external AutoDock
protocol and ships the resulting score CSVs
(``results/docking/*.csv``; headline numbers = mean of the top-10%
scores, ``results/README.md:3`` / BASELINE.md).  Docking itself is an
external tool; this script reproduces the *analysis*: per-set score
statistics, top-K% means, and a side-by-side table.

Usage:
    python scripts/docking_report.py results/docking/*.csv
    python scripts/docking_report.py --top-frac 0.1 a.csv b.csv
"""

import argparse
import csv
import json
import os
import sys


def read_scores(path: str) -> list[float]:
    """Parse docking CSVs: uses the first numeric-looking column among
    common score headers, else the last column."""
    scores = []
    with open(path, newline="") as f:
        reader = csv.reader(f)
        header = next(reader, None)
        score_idx = None
        if header:
            lowered = [h.strip().lower() for h in header]
            for cand in ("docking score", "docking_score", "score",
                         "affinity", "binding_energy"):
                if cand in lowered:
                    score_idx = lowered.index(cand)
                    break
        for row in reader:
            if not row:
                continue
            cells = row if score_idx is None else [row[score_idx]]
            for cell in (reversed(cells) if score_idx is None else cells):
                try:
                    scores.append(float(cell))
                    break
                except ValueError:
                    continue
    return scores


def summarize(scores: list[float], top_frac: float) -> dict:
    if not scores:
        return {"n": 0}
    s = sorted(scores)  # docking: more negative = better
    k = max(int(len(s) * top_frac), 1)
    top = s[:k]
    return {
        "n": len(s),
        "mean": sum(s) / len(s),
        "best": s[0],
        "worst": s[-1],
        f"top{int(top_frac * 100)}pct_n": k,
        f"top{int(top_frac * 100)}pct_mean": sum(top) / k,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("csvs", nargs="+")
    p.add_argument("--top-frac", type=float, default=0.1)
    p.add_argument("--json-out")
    args = p.parse_args()

    report = {}
    for path in args.csvs:
        name = os.path.splitext(os.path.basename(path))[0]
        stats = summarize(read_scores(path), args.top_frac)
        report[name] = stats
        pretty = {k: (round(v, 3) if isinstance(v, float) else v)
                  for k, v in stats.items()}
        print(f"{name}: {pretty}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(report, f, indent=2)
    return report


if __name__ == "__main__":
    main()
