#!/bin/bash
# Round-4 chip queue, phase C: waits for the full-profile bootstrap run
# (marker "btp full2 exit" in /tmp/chipq/queue.log), then:
#   1. bootstrap toy --batch 8 — bootstrap THROUGHPUT (ops/s): vmapped
#      segments amortize per-segment fixed costs across the batch
#   2. bench.py — final six-scenario artifact for the round
# Strictly serial, single tunnel client. Usage: nohup bash ... &
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chipq
mkdir -p "$LOG"
note() { echo "$(date -u '+%m-%d %H:%M:%S') $*" >> "$LOG/queue.log"; }

# NOTE the waiting message must NOT contain the gate marker: an earlier
# revision logged "waiting for '<marker>'" and the gate grep matched its
# own note immediately — two tunnel clients, and the weaker one died
# RESOURCE_EXHAUSTED (tunnel-discipline notes).
note "r4c queue armed (pid $$), waiting for the full-profile run"
# Gate on the marker run_full_btp.sh actually writes (advisor r4: the
# earlier MARKER-BTPFULL2-EXIT string had no producer — the gate never
# fired). Anchored so a partial mention can't satisfy it.
while ! grep -q "MARKER-FULLBTP-DONE" "$LOG/queue.log" 2>/dev/null; do
  sleep 180
done
sleep 60
while true; do
  if timeout -k 30 240 python -c \
    "import jax; jax.devices(); import jax.numpy as jnp; assert int((jnp.arange(4)+1).sum())==10" \
    > "$LOG/probe3.log" 2>&1; then
    note "tunnel UP (r4c)"
    break
  fi
  note "tunnel down (r4c probe failed)"
  sleep 540
done

note "bootstrap_chip toy --batch 8 start"
timeout -k 30 10800 python benchmarks/bootstrap_chip.py toy --batch 8 \
  > "$LOG/btp_toy_b8.log" 2> "$LOG/btp_toy_b8.err"
note "bootstrap_chip toy --batch 8 exit $?"

note "bench.py (final) start"
LATTISENSE_BENCH_BUDGET=3000 LATTISENSE_BENCH_ALARM=3300 \
  timeout -k 30 3600 python bench.py > "$LOG/bench_final.json" 2> "$LOG/bench_final.err"
note "bench.py (final) exit $?"

note "r4c queue done"
