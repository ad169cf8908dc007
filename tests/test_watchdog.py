"""Training-watchdog behavior (round-5: automatic relay-death recovery).

Runs scripts/train_watchdog.py against a scripted fake trainer: the first
launch hangs without progress (a dead-relay stand-in), the second makes
progress and completes — the watchdog must kill exactly the first child's
process group, relaunch with --resume intact, and exit 0 on completion.
"""

import json
import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WATCHDOG = os.path.join(REPO, "scripts", "train_watchdog.py")


def test_stall_kill_restart_complete(tmp_path):
    marker = tmp_path / "attempts"
    progress = tmp_path / "progress.jsonl"
    child = tmp_path / "fake_trainer.py"
    child.write_text(textwrap.dedent(f"""
        import os, sys, time
        m = {str(repr(str(marker)))}
        n = 0
        if os.path.exists(m):
            n = int(open(m).read())
        open(m, "w").write(str(n + 1))
        if n == 0:
            time.sleep(600)       # dead relay: no progress, ever
        # second attempt: make progress, then finish cleanly
        for i in range(3):
            with open({str(repr(str(progress)))}, "a") as f:
                f.write("step\\n")
            time.sleep(0.2)
        sys.exit(0)
    """))
    incidents = tmp_path / "wd.jsonl"
    rc = subprocess.run(
        [sys.executable, WATCHDOG,
         "--watch", str(progress),
         "--stall_timeout", "6", "--startup_timeout", "6",
         "--poll", "1", "--max_restarts", "3", "--min_runtime", "1",
         "--incident_log", str(incidents),
         "--child_log", str(tmp_path / "child.log"),
         "--", sys.executable, str(child), "--resume"],
        timeout=120).returncode
    assert rc == 0
    events = [json.loads(l)["event"] for l in open(incidents)]
    assert "stall" in events          # first attempt detected as hung
    assert "restart" in events        # exact-group kill + relaunch
    assert events[-1] == "complete"   # second attempt finished
    assert marker.read_text() == "2"  # exactly two launches


def test_requires_resume_flag(tmp_path):
    proc = subprocess.run(
        [sys.executable, WATCHDOG, "--incident_log",
         str(tmp_path / "w.jsonl"), "--", "true"],
        capture_output=True, text=True, timeout=60)
    assert proc.returncode != 0
    assert "--resume" in proc.stderr
