#!/usr/bin/env python
"""Training supervisor: relay-death watchdog with automatic exact resume.

The round-4 reference-scale run (experiments/r4_scale/README.md) was frozen
twice by relay outages: the trainer's windowed loss fetch blocks forever on
a dead connection (zero CPU, no step progress), and recovery was a human
noticing, killing the process, and rerunning with ``--resume``.  The exact
resume continuation (trainer.py ``_work_items(start_step=...)``,
bit-identical to an unbroken run) makes that recovery safe to automate —
this tool is the automation (SURVEY.md §5 failure-detection row; the
reference itself has no recovery machinery at all, train.py:296-297 is a
manual epoch/iter flag).

Mechanism: launch the training command in its own session (``setsid``
semantics via ``start_new_session``), watch the run's progress artifacts
(log JSONL + checkpoint mtimes) and the child's stdout, and if nothing
moves for ``--stall_timeout`` seconds, kill the child's EXACT process group
and relaunch.  The training command must contain ``--resume`` so every
relaunch continues from the newest full-state checkpoint.

Timeouts are sized for the relay: remote compiles take 2-10+ min
(CLAUDE.md), and a numerics-ladder escalation mid-run recompiles too, so
the default stall timeout is 20 min and the startup grace (cold start +
first compile) 60 min.

Every event is appended to ``--incident_log`` as JSONL
({ts, event, detail}) — the run's incident record.

Usage:
    python scripts/train_watchdog.py \
        --watch 'experiments/r5_scale/logs/*.jsonl' \
        --watch 'experiments/r5_scale/models/*/state_*.msgpack' \
        --incident_log experiments/r5_scale/watchdog.jsonl \
        --child_log experiments/r5_scale/train.log \
        -- python train.py --resume ...
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import signal
import subprocess
import sys
import time


def log_event(path: str, event: str, detail: str) -> None:
    rec = {"ts": time.time(),
           "iso": time.strftime("%Y-%m-%dT%H:%M:%S"),
           "event": event, "detail": detail}
    with open(path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(f"[watchdog {rec['iso']}] {event}: {detail}", flush=True)


def newest_mtime(patterns: list[str], extra_paths: list[str]) -> float:
    best = 0.0
    for pat in patterns:
        for p in glob.glob(pat):
            try:
                best = max(best, os.path.getmtime(p))
            except OSError:
                pass
    for p in extra_paths:
        try:
            best = max(best, os.path.getmtime(p))
        except OSError:
            pass
    return best


def kill_group(proc: subprocess.Popen, incident_log: str) -> None:
    """Terminate the child's exact process group (never by pattern)."""
    try:
        pgid = os.getpgid(proc.pid)
    except ProcessLookupError:
        return
    for sig, grace in ((signal.SIGTERM, 30), (signal.SIGKILL, 15)):
        try:
            os.killpg(pgid, sig)
        except ProcessLookupError:
            return
        deadline = time.time() + grace
        while time.time() < deadline:
            if proc.poll() is not None:
                return
            time.sleep(1)
    log_event(incident_log, "kill_failed",
              f"process group {pgid} survived SIGKILL")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        usage="%(prog)s [options] -- CMD ...",
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--watch", action="append", default=[],
                   help="glob of progress artifacts (repeatable); their "
                        "newest mtime is the liveness signal")
    p.add_argument("--stall_timeout", type=float, default=1200,
                   help="seconds without progress before the child is "
                        "killed and relaunched (default 20 min — must "
                        "exceed a relay recompile)")
    p.add_argument("--startup_timeout", type=float, default=3600,
                   help="grace after each (re)launch before the stall "
                        "timer arms (cold start + first compile)")
    p.add_argument("--poll", type=float, default=15)
    p.add_argument("--max_restarts", type=int, default=20)
    p.add_argument("--min_runtime", type=float, default=120,
                   help="two consecutive non-zero exits faster than this "
                        "abort the watchdog (config error, not an outage)")
    p.add_argument("--incident_log", default="watchdog_incidents.jsonl")
    p.add_argument("--child_log", default=None,
                   help="file the child's stdout+stderr are appended to "
                        "(its mtime also counts as progress)")
    p.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="training command after '--'")
    args = p.parse_args(argv)

    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        p.error("no training command given (put it after '--')")
    if "--resume" not in cmd:
        p.error("the training command must include --resume so relaunches "
                "continue from the newest checkpoint")
    os.makedirs(os.path.dirname(os.path.abspath(args.incident_log)),
                exist_ok=True)

    extra = [args.child_log] if args.child_log else []
    restarts = 0
    fast_failures = 0
    log_event(args.incident_log, "watchdog_start",
              f"cmd={' '.join(cmd)} stall_timeout={args.stall_timeout}s "
              f"startup_timeout={args.startup_timeout}s")

    while True:
        if args.child_log:
            out = open(args.child_log, "ab", buffering=0)
        else:
            out = None
        t_launch = time.time()
        proc = subprocess.Popen(
            cmd, stdout=out if out else None,
            stderr=subprocess.STDOUT if out else None,
            start_new_session=True)
        log_event(args.incident_log, "launched",
                  f"pid={proc.pid} attempt={restarts + 1}")
        baseline = newest_mtime(args.watch, extra)
        last_progress = time.time()
        armed = False

        while True:
            rc = proc.poll()
            if rc is not None:
                break
            time.sleep(args.poll)
            m = newest_mtime(args.watch, extra)
            if m > baseline:
                baseline = m
                last_progress = time.time()
                armed = True
            grace = (args.stall_timeout if armed
                     else args.startup_timeout)
            ref = last_progress if armed else t_launch
            if time.time() - ref > grace:
                log_event(args.incident_log, "stall",
                          f"no progress for {time.time() - ref:.0f}s "
                          f"(armed={armed}) — killing process group "
                          f"{proc.pid}")
                kill_group(proc, args.incident_log)
                rc = proc.poll()
                break

        if out:
            out.close()
        runtime = time.time() - t_launch
        if rc == 0:
            log_event(args.incident_log, "complete",
                      f"training exited 0 after {runtime:.0f}s "
                      f"({restarts} restarts over the run)")
            return 0
        if rc is not None and rc != 0 and runtime < args.min_runtime:
            fast_failures += 1
            if fast_failures >= 2:
                log_event(args.incident_log, "abort",
                          f"two consecutive exits (rc={rc}) within "
                          f"{args.min_runtime}s — config error, giving up")
                return 1
        else:
            fast_failures = 0
        restarts += 1
        if restarts > args.max_restarts:
            log_event(args.incident_log, "abort",
                      f"exceeded max_restarts={args.max_restarts}")
            return 1
        log_event(args.incident_log, "restart",
                  f"rc={rc} runtime={runtime:.0f}s — relaunching with "
                  f"--resume (restart {restarts}/{args.max_restarts})")
        time.sleep(5)


if __name__ == "__main__":
    sys.exit(main())
