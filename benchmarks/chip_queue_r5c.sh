#!/bin/bash
# Round-5 chip queue, phase C: toy-profile bootstrap re-timing after the
# round-5 EvalMod cuts (VERDICT r4 item 4: staged evalmod_b/g/e + unused
# giant trimmed + leaf steering cut = 44 -> 36 mult+rescale chains in
# the cheb, const-lifting default ON for every profile):
#   1. bootstrap_chip.py toy            — ms/op + per-segment table
#   2. bootstrap_chip.py toy --batch 8  — throughput (ops/s/chip)
# Usage: nohup bash benchmarks/chip_queue_r5c.sh &
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chipq
mkdir -p "$LOG"
note() { echo "$(date -u '+%m-%d %H:%M:%S') $*" >> "$LOG/queue.log"; }

note "r5c queue armed (pid $$), waiting for phase B"
while ! grep -q "MARKER-R5B-DONE" "$LOG/queue.log" 2>/dev/null; do
  sleep 120
done

while true; do
  if timeout -k 30 240 python -c \
    "import jax; jax.devices(); import jax.numpy as jnp; assert int((jnp.arange(4)+1).sum())==10" \
    > "$LOG/probe5c.log" 2>&1; then
    note "tunnel UP (r5c)"
    break
  fi
  note "tunnel down (r5c probe failed)"
  sleep 540
done

note "bootstrap_chip toy start"
timeout -k 30 10800 python benchmarks/bootstrap_chip.py toy --segtable \
  > "$LOG/btp_toy_r5.log" 2> "$LOG/btp_toy_r5.err"
note "bootstrap_chip toy exit $?"

note "bootstrap_chip toy --batch 8 start"
timeout -k 30 10800 python benchmarks/bootstrap_chip.py toy --batch 8 \
  > "$LOG/btp_toy_b8_r5.log" 2> "$LOG/btp_toy_b8_r5.err"
note "bootstrap_chip toy --batch 8 exit $?"
note "MARKER-R5C-DONE"
