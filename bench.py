"""Headline benchmark: BFV mult_relin throughput per chip.

Measurement definition parity with the reference
(examples/benchmark_cpu/benchmark_cpu.cpp:27-51): n=16384, t=65537,
level 3, N_OP independent mult+relinearize operations, ops/s from
wall-clock ns. The reference publishes no numbers (BASELINE.md), so
``vs_baseline`` reports the speedup over this machine's single-thread
NumPy golden engine executing the identical operation — an honest
same-host stand-in for the reference's CPU path (which delegates the same
math to Lattigo's Go kernels).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np


def main():
    import lattisense_tpu  # noqa: F401  (x64)
    import jax
    from lattisense_tpu.params import BfvParams
    from lattisense_tpu.runtime import BfvContext
    from lattisense_tpu.parallel.batch import (bfv_mult_relin, key_tree,
                                               make_batched_step)

    level = 3
    params = BfvParams.create(16384)
    ctx = BfvContext.create_random_context(params, seed=7)
    eng = ctx.engine

    batch = int(os.environ.get('LATTISENSE_BENCH_BATCH', '32'))
    rng = np.random.default_rng(0)
    msgs = rng.integers(0, params.t, (2 * batch, params.n), dtype=np.uint64)
    cts = [ctx.encrypt(ctx.encode(m, level)) for m in msgs]
    # stage inputs on device once — the measurement is the compute path,
    # not host->device transfer (the reference's CArgument marshaling is
    # likewise outside its ns timer)
    a = jax.device_put(np.stack([c.data for c in cts[:batch]]))
    b = jax.device_put(np.stack([c.data for c in cts[batch:]]))
    keys = jax.device_put(key_tree(ctx))

    fn = make_batched_step(eng, bfv_mult_relin, level, n_inputs=2)
    np.asarray(fn(a, b, keys))                           # compile + warmup

    def run_chained(iters):
        """Chained dependencies + a real output fetch: on remote-tunnel
        backends block_until_ready alone does not await execution."""
        x = a
        t0 = time.perf_counter_ns()
        for _ in range(iters):
            x = fn(x, b, keys)
        np.asarray(x[0, 0, 0, :4])
        return (time.perf_counter_ns() - t0) / 1e9

    run_chained(2)                                       # warm path
    k = 8
    t_k, t_2k = run_chained(k), run_chained(2 * k)
    per_call = (t_2k - t_k) / k                          # slope: strips fixed overhead
    device_ops_s = batch / per_call

    # single-thread NumPy golden engine on the same op (host baseline proxy)
    a0 = cts[0]
    b0 = cts[batch]
    eng.relinearize(np, eng.mult(np, a0, b0), ctx.rlk)   # warm caches
    t0 = time.perf_counter_ns()
    host_iters = 2
    for _ in range(host_iters):
        eng.relinearize(np, eng.mult(np, a0, b0), ctx.rlk)
    host_dt = (time.perf_counter_ns() - t0) / 1e9
    host_ops_s = host_iters / host_dt

    print(json.dumps({
        'metric': 'bfv_mult_relin_n16384_L3_ops_per_s_per_chip',
        'value': round(device_ops_s, 3),
        'unit': 'ops/s',
        'vs_baseline': round(device_ops_s / host_ops_s, 3),
    }))


if __name__ == '__main__':
    main()
