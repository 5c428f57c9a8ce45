#!/bin/bash
# Serial chip-measurement queue with tunnel-wait.
#
# The single-chip axon tunnel is single-client and can wedge for 30+ min
# after contention (NOTES.md round-2 session 4); this runner polls health
# with a hard-killed probe every ~9 min and, once the backend answers,
# runs the queued measurements STRICTLY serially (one python process per
# program — overlapping remote compiles degrade both):
#
#   1. benchmarks/ntt32_probe.py     — radix-4 vs radix-2 kernel A/B
#      (VERDICT r3 item 3: the inverse-NTT gap)
#   2. benchmarks/bootstrap_chip.py toy --segtable — n=8192 bootstrap
#      chip timing + per-segment table (VERDICT r3 item 2)
#   3. bench.py                      — driver-format scenario confirm
#
# Logs under /tmp/chipq/. Usage: nohup bash benchmarks/chip_queue.sh &
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chipq
mkdir -p "$LOG"
note() { echo "$(date -u '+%m-%d %H:%M:%S') $*" >> "$LOG/queue.log"; }

note "queue armed (pid $$)"
while true; do
  # -k: the observed hang is inside the PJRT C init where SIGTERM is
  # never serviced — force SIGKILL if the probe outlives the timeout
  if timeout -k 30 240 python -c \
    "import jax; jax.devices(); import jax.numpy as jnp; assert int((jnp.arange(4)+1).sum())==10" \
    > "$LOG/probe.log" 2>&1; then
    note "tunnel UP"
    break
  fi
  note "tunnel down (probe timed out/failed)"
  sleep 540
done

note "r4_ab_probe (headline radix A/B) start"
timeout -k 30 3600 python benchmarks/r4_ab_probe.py \
  > "$LOG/r4_ab.log" 2> "$LOG/r4_ab.err"
note "r4_ab_probe exit $?"

note "ntt32_probe (isolated radix A/B) start"
LATTISENSE_PROBE_ITERS=150 LATTISENSE_PROBE_REPS=3 \
  timeout -k 30 3600 python benchmarks/ntt32_probe.py --no-perm \
  > "$LOG/ntt_r4.log" 2> "$LOG/ntt_r4.err"
note "ntt32_probe exit $?"

note "bootstrap_chip toy start"
timeout -k 30 10800 python benchmarks/bootstrap_chip.py toy --segtable \
  > "$LOG/btp_toy.log" 2> "$LOG/btp_toy.err"
note "bootstrap_chip toy exit $?"

note "bench.py start"
LATTISENSE_BENCH_BUDGET=3000 LATTISENSE_BENCH_ALARM=3300 \
  timeout -k 30 3600 python bench.py > "$LOG/bench.json" 2> "$LOG/bench.err"
note "bench.py exit $?"

note "queue done"
