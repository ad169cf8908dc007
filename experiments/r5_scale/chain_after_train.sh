#!/bin/bash
# Fire the post-run pipeline as soon as the watchdog records completion
# (exactly one TPU process at a time: training, then selection/10k/eval).
cd /root/repo
W=experiments/r5_scale/watchdog.jsonl
while true; do
  if grep -q '"event": "complete"' "$W" 2>/dev/null; then
    echo "training complete at $(date +%s) — starting post_run" \
      >> experiments/r5_scale/chain.log
    bash experiments/r5_scale/post_run.sh \
      >> experiments/r5_scale/chain.log 2>&1
    echo "post_run finished rc=$? at $(date +%s)" \
      >> experiments/r5_scale/chain.log
    exit 0
  fi
  if grep -q '"event": "abort"' "$W" 2>/dev/null; then
    echo "watchdog aborted — no post_run" >> experiments/r5_scale/chain.log
    exit 1
  fi
  sleep 30
done
