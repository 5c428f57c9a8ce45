#!/bin/bash
# Round-5 chip queue, phase D: retry of the full n=2^16 isolated run
# (phase B died to an operator signal mid-evalmod_b), then the toy
# re-timing that phase C would have done. Strictly serial.
# Usage: nohup bash benchmarks/chip_queue_r5d.sh &
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chipq
mkdir -p "$LOG"
note() { echo "$(date -u '+%m-%d %H:%M:%S') $*" >> "$LOG/queue.log"; }

while true; do
  if timeout -k 30 240 python -c \
    "import jax; jax.devices(); import jax.numpy as jnp; assert int((jnp.arange(4)+1).sum())==10" \
    > "$LOG/probe5d.log" 2>&1; then
    note "tunnel UP (r5d)"
    break
  fi
  note "tunnel down (r5d probe failed)"
  sleep 540
done

note "bootstrap_chip full --isolated (retry) start"
LATTISENSE_BTP_ISO_REPS=3 timeout -k 60 21000 \
  python benchmarks/bootstrap_chip.py full --isolated \
  > "$LOG/btp_full_iso5d.log" 2> "$LOG/btp_full_iso5d.err"
note "bootstrap_chip full --isolated (retry) exit $?"

note "bootstrap_chip toy start (r5d)"
timeout -k 30 10800 python benchmarks/bootstrap_chip.py toy --segtable \
  > "$LOG/btp_toy_r5.log" 2> "$LOG/btp_toy_r5.err"
note "bootstrap_chip toy exit $?"

note "bootstrap_chip toy --batch 8 start (r5d)"
timeout -k 30 10800 python benchmarks/bootstrap_chip.py toy --batch 8 \
  > "$LOG/btp_toy_b8_r5.log" 2> "$LOG/btp_toy_b8_r5.err"
note "bootstrap_chip toy --batch 8 exit $?"
note "MARKER-R5D-DONE"
