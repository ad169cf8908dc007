#!/bin/bash
# Batch-size scaling curve for the headline WGAN-GP step (round-4 VERDICT
# task 8: spend the perf round on a new axis).  Runs bench.py at the
# round-4 feature set (bf16 + fused_mlp + finite barrier; gp_f32/f32_stats
# measurable via flags) across growing batch sizes on the real chip.
# One process at a time — concurrent TPU processes serialize/hang through
# the relay.
#   usage: bash scripts/batch_scaling_bench.sh [out.jsonl] [extra bench flags]
set -e
cd /root/repo
out=${1:-experiments/r5_perf/batch_scaling.jsonl}
shift || true
mkdir -p "$(dirname "$out")"
: > "$out"
for b in 768 1024 1536 2048; do
  echo "=== batch $b ===" >&2
  python bench.py --batch "$b" "$@" | tail -1 >> "$out"
done
cat "$out"
