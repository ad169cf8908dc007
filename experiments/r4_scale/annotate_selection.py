#!/usr/bin/env python
"""Annotate selection.json rows with GLOBAL training steps.

Two processes wrote cadence checkpoints under different name schemes
(see models/*/PROVENANCE.md): the old-code resumed run (mtimes
00:41-01:31, epoch counter restarted at step 32,000) and the
exact-continuation run (globally correct names).  Mapping is by file
mtime; the two surviving original-run files (3-6188, 3-7188) are
globally named already.
"""
import glob
import json
import os
import re
import sys

RESUMED_WINDOW = ("00:20", "01:33")  # local HH:MM on 2026-08-21


def global_step(model_dir: str, name: str) -> int:
    m = re.match(r"(\d+)-(\d+)-G\.ckpt$", name)
    e, i = int(m.group(1)), int(m.group(2))
    base = (e - 1) * 12406 + i
    mt = os.path.getmtime(os.path.join(model_dir, name))
    import time

    hhmm = time.strftime("%H:%M", time.localtime(mt))
    day = time.strftime("%d", time.localtime(mt))
    if day == "21" and RESUMED_WINDOW[0] <= hhmm <= RESUMED_WINDOW[1]:
        return 32000 + base
    return base


def main():
    sel_path = sys.argv[1] if len(sys.argv) > 1 else "experiments/r4_scale/selection.json"
    with open(sel_path) as f:
        sel = json.load(f)
    md = sel["model_dir"] if os.path.isdir(sel["model_dir"]) else glob.glob(
        "experiments/r4_scale/models/*/")[0]
    for section in ("rows", "ranked", "finalists"):
        for r in sel.get(section) or []:
            r["global_step"] = global_step(md, r["ckpt"])
    with open(sel_path, "w") as f:
        json.dump(sel, f, indent=1)
    rows = sorted(sel["rows"], key=lambda r: r["global_step"])
    for r in rows:
        print(f"{r['global_step']:>7} {r['ckpt']:>16} v={r['validity']:.3f} "
              f"u={r['uniqueness']:.3f} n={r['novelty']:.3f} s={r['score']:.3f}")


if __name__ == "__main__":
    main()
