#!/usr/bin/env python
"""Extract the train-time sampling trajectory (validity/uniqueness/novelty
per cadence event) from a trainer log into JSON rows.

The trainer prints a metric line at every ``log_sample_step`` cadence
followed by ``samples saved at epoch E iteration I`` (reference cadence,
train.py:330-360); pairing the two gives the trajectory used by the
oscillation ablation (VERDICT r3 item 7).

    python experiments/r4_ablation/extract_traj.py <train.log> [out.json]
"""
import json
import re
import sys


def extract(path):
    rows, pending = [], None
    metric_re = re.compile(
        r"Validity: ([\d.]+), Uniqueness: ([\d.]+), Novelty: ([\d.]+)")
    saved_re = re.compile(r"samples saved at epoch (\d+) iteration (\d+)")
    with open(path) as f:
        for line in f:
            m = metric_re.search(line)
            if m:
                pending = tuple(float(g) for g in m.groups())
                continue
            s = saved_re.search(line)
            if s and pending is not None:
                rows.append({
                    "epoch": int(s.group(1)), "iter": int(s.group(2)),
                    "validity": pending[0], "uniqueness": pending[1],
                    "novelty": pending[2]})
                pending = None
    # global step assumes constant steps/epoch (true for drop-last batching)
    if rows:
        per_epoch = max(r["iter"] for r in rows) + 1
        for r in rows:
            r["step"] = r["epoch"] * per_epoch + r["iter"]
    return rows


if __name__ == "__main__":
    rows = extract(sys.argv[1])
    out = sys.argv[2] if len(sys.argv) > 2 else None
    text = json.dumps(rows, indent=0)
    if out:
        with open(out, "w") as f:
            f.write(text + "\n")
    print(f"{len(rows)} cadence events"
          + (f" -> {out}" if out else ""))
    if not out:
        print(text)
