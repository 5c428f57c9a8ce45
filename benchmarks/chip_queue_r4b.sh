#!/bin/bash
# Round-4 follow-on chip queue: waits for chip_queue.sh's serial run to
# finish (single-client tunnel discipline — a second python process
# touching axon kills the in-flight run), then:
#
#   1. benchmarks/invmb_ab_probe.py — interleaved headline A/B of the
#      mul-before-sub GS inverse butterfly (VERDICT r4 item 3)
#   2. benchmarks/bootstrap_chip.py full --segtable — the reference FULL
#      profile (n=2^16, 25 limbs) per-segment chip table (VERDICT r4
#      item 2, second half; ~1 h host keygen before first device contact)
#
# Logs under /tmp/chipq/. Usage: nohup bash benchmarks/chip_queue_r4b.sh &
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chipq
mkdir -p "$LOG"
note() { echo "$(date -u '+%m-%d %H:%M:%S') $*" >> "$LOG/queue.log"; }

note "r4b queue armed (pid $$), waiting for 'queue done'"
while ! grep -q "queue done" "$LOG/queue.log" 2>/dev/null; do
  sleep 120
done

# settle + health probe (the tunnel can wedge after a long run)
sleep 60
while true; do
  if timeout -k 30 240 python -c \
    "import jax; jax.devices(); import jax.numpy as jnp; assert int((jnp.arange(4)+1).sum())==10" \
    > "$LOG/probe2.log" 2>&1; then
    note "tunnel UP (r4b)"
    break
  fi
  note "tunnel down (r4b probe failed)"
  sleep 540
done

note "bootstrap_chip toy (encode_const fix) start"
timeout -k 30 10800 python benchmarks/bootstrap_chip.py toy --segtable \
  > "$LOG/btp_toy2.log" 2> "$LOG/btp_toy2.err"
note "bootstrap_chip toy exit $?"

note "invmb_ab_probe start"
LATTISENSE_PROBE_ITERS=64 timeout -k 30 5400 python benchmarks/invmb_ab_probe.py \
  > "$LOG/invmb.log" 2> "$LOG/invmb.err"
note "invmb_ab_probe exit $?"

note "bootstrap_chip full start"
timeout -k 30 16200 python benchmarks/bootstrap_chip.py full --segtable \
  > "$LOG/btp_full.log" 2> "$LOG/btp_full.err"
note "bootstrap_chip full exit $?"

note "r4b queue done"
