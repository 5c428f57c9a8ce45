#!/bin/bash
# Full-profile (n=2^16) bootstrap chip run — STRICTLY single-client:
# run only when nothing else touches the tunnel (check `ps` first).
# Gate-marker discipline: the waiting/arming notes below deliberately do
# NOT contain the completion marker string (see tunnel-discipline notes:
# a self-matching gate fired a second client into a running measurement
# and the weaker client died RESOURCE_EXHAUSTED).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chipq
mkdir -p "$LOG"
note() { echo "$(date -u '+%m-%d %H:%M:%S') $*" >> "$LOG/queue.log"; }

note "full-btp runner armed"
while true; do
  if timeout -k 30 240 python -c \
    "import jax; jax.devices(); import jax.numpy as jnp; assert int((jnp.arange(4)+1).sum())==10" \
    > "$LOG/probe4.log" 2>&1; then
    note "tunnel UP (full-btp)"
    break
  fi
  note "tunnel down (full-btp probe failed)"
  sleep 540
done

timeout -k 30 21600 python benchmarks/bootstrap_chip.py full --segtable \
  > "$LOG/btp_full3.log" 2> "$LOG/btp_full3.err"
note "MARKER-FULLBTP-DONE rc $?"
