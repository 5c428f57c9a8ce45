"""In-process A/B of the w32 relinearization path: XLA-composed key
switch vs the fused single-kernel switch (LATTISENSE_KSW32), interleaved
measurements to defeat tunnel drift. Also A/Bs the fused switch's splat
tables when LATTISENSE_KSW32_SPLAT variants are requested."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

import numpy as np


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.cache/jax')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import lattisense_tpu  # noqa: F401
    from lattisense_tpu.params import BfvParams
    from lattisense_tpu.runtime import BfvContext
    from lattisense_tpu.parallel.batch import (bfv_mult_relin, key_tree,
                                               make_batched_step)

    batch = 32
    rng = np.random.default_rng(0)
    bp = BfvParams.create(16384)
    logq_l3 = sum(q.bit_length() for q in bp.q[:4])
    bp32 = BfvParams.create_tpu_param(16384)
    lvl32 = 0
    while sum(q.bit_length() for q in bp32.q[:lvl32 + 1]) < logq_l3:
        lvl32 += 1
    ctx = BfvContext.create_random_context(bp32, seed=7)
    m32 = rng.integers(0, bp32.t, (2 * batch, bp32.n), dtype=np.uint64)
    cts = [ctx.encrypt(ctx.encode(m, lvl32)) for m in m32]
    a = jax.device_put(np.stack([c.data for c in cts[:batch]]))
    b = jax.device_put(np.stack([c.data for c in cts[batch:]]))
    keys = jax.device_put(key_tree(ctx))

    variants = {}
    os.environ['LATTISENSE_KSW32'] = '0'
    variants['xla'] = make_batched_step(ctx.engine, bfv_mult_relin, lvl32,
                                        n_inputs=2)
    os.environ['LATTISENSE_KSW32'] = '1'
    variants['fused'] = make_batched_step(ctx.engine, bfv_mult_relin, lvl32,
                                          n_inputs=2)

    # compile + correctness cross-check (bit-exact between variants)
    outs = {}
    for tag, fn in variants.items():
        outs[tag] = np.asarray(fn(a, b, keys))
        print(f'{tag} compiled', flush=True)
    np.testing.assert_array_equal(outs['xla'], outs['fused'])
    print('variants bit-identical', flush=True)

    def slope(fn, iters=8):
        def run(k):
            t0 = time.perf_counter()
            x = a
            for _ in range(k):
                x = fn(x, b, keys)
            np.asarray(x.ravel()[:2])
            return time.perf_counter() - t0

        run(2)
        t1, t2 = run(iters), run(2 * iters)
        return (t2 - t1) / iters

    results = {tag: [] for tag in variants}
    for rep in range(4):
        for tag, fn in variants.items():
            results[tag].append(batch / slope(fn))
    for tag, vals in results.items():
        vals = sorted(vals)
        print(f'{tag:6s}: best {vals[-1]:7.1f} ops/s  all='
              f'{[round(v, 1) for v in vals]}', flush=True)


if __name__ == '__main__':
    main()
