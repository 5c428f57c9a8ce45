#!/bin/bash
# Round-5 chip queue, phase B: the full n=2^16 bootstrap per-segment
# isolated chip timing (VERDICT r4 item 1b). Waits for phase A, then:
#   bootstrap_chip.py full --isolated
# First ~50 min is host keygen + walk (tunnel idle; cached for re-runs),
# then per-segment staging/compile/slope on the chip. The EvalMod
# sub-segment split (evalmod_b/g/e) is what makes the full-size compile
# feasible — the fused EvalMod OOM-killed the remote compile helper on
# the round-4-end attempt (/tmp/chipq/btp_full_iso.err).
# Usage: nohup bash benchmarks/chip_queue_r5b.sh &
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chipq
mkdir -p "$LOG"
note() { echo "$(date -u '+%m-%d %H:%M:%S') $*" >> "$LOG/queue.log"; }

note "r5b queue armed (pid $$), waiting for phase A"
while ! grep -q "MARKER-R5A-DONE" "$LOG/queue.log" 2>/dev/null; do
  sleep 120
done

while true; do
  if timeout -k 30 240 python -c \
    "import jax; jax.devices(); import jax.numpy as jnp; assert int((jnp.arange(4)+1).sum())==10" \
    > "$LOG/probe5b.log" 2>&1; then
    note "tunnel UP (r5b)"
    break
  fi
  note "tunnel down (r5b probe failed)"
  sleep 540
done

note "bootstrap_chip full --isolated start"
LATTISENSE_BTP_ISO_REPS=3 timeout -k 60 21000 \
  python benchmarks/bootstrap_chip.py full --isolated \
  > "$LOG/btp_full_iso5.log" 2> "$LOG/btp_full_iso5.err"
note "bootstrap_chip full --isolated exit $?"
note "MARKER-R5B-DONE"
