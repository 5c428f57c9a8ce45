#!/bin/bash
# Round-5 chip queue, phase A (strictly serial, single tunnel client):
#   1. gates_ab_probe.py  — VERDICT r4 item 2: interleaved A/B of the
#      current kernel-gate defaults vs the round-2 gate set, to recover
#      or attribute the -8% headline trend.
#   2. bench.py (full budget) — validates the lifted composite compile,
#      the drift probes, and produces a committed six-scenario artifact.
# Usage: nohup bash benchmarks/chip_queue_r5a.sh &
# Keep the HOST idle while this runs (slope windows corrupt under load).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chipq
mkdir -p "$LOG"
note() { echo "$(date -u '+%m-%d %H:%M:%S') $*" >> "$LOG/queue.log"; }

while true; do
  if timeout -k 30 240 python -c \
    "import jax; jax.devices(); import jax.numpy as jnp; assert int((jnp.arange(4)+1).sum())==10" \
    > "$LOG/probe5a.log" 2>&1; then
    note "tunnel UP (r5a)"
    break
  fi
  note "tunnel down (r5a probe failed)"
  sleep 540
done

note "gates_ab_probe start"
LATTISENSE_PROBE_ITERS=32 timeout -k 30 4500 \
  python benchmarks/gates_ab_probe.py \
  > "$LOG/gates_ab.log" 2> "$LOG/gates_ab.err"
note "gates_ab_probe exit $?"

note "ntt_rows_probe start"
timeout -k 30 2400 python benchmarks/ntt_rows_probe.py \
  > "$LOG/ntt_rows.log" 2> "$LOG/ntt_rows.err"
note "ntt_rows_probe exit $?"

note "bench.py (r5a validation) start"
LATTISENSE_BENCH_BUDGET=4200 LATTISENSE_BENCH_ALARM=5400 \
  timeout -k 30 5500 python bench.py \
  > "$LOG/bench_r5a.jsonl" 2> "$LOG/bench_r5a.err"
note "bench.py (r5a) exit $?"
note "MARKER-R5A-DONE"
