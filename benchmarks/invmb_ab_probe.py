"""In-process A/B of the mul-before-sub GS butterfly (LATTISENSE_NTT32_INVMB)
on the HEADLINE pipeline (w32 BFV mult_relin, n=16384).

VERDICT r3 item 3: the inverse NTT runs ~2x the forward kernel and the
headline's BEHZ mult (77% of mult_relin) is dominated by its dual INTTs.
The mul-before-sub variant (ops/ntt_pallas32.py `_gs_d`) replaces the GS
butterfly's serial sub->mul chain with two parallel multiplies on loaded
values — this probe decides it the only decision-grade way: interleaved
same-process headline slopes (tunnel drift defeats cross-process
comparisons; isolated op timings mislead — NOTES.md discipline).

Variant A = default (sub-then-mul), variant B = INVMB. Both compiled in
one process by toggling the module gate (the kernel's vmap cache keys on
it), bit-exactness asserted before timing.
"""

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
    from lattisense_tpu.ops import ntt_pallas32 as k32
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
    outs = {}
    for tag, on in (('base', False), ('invmb', True)):
        k32._INV_MULBEFORE = on
        fn = make_batched_step(ctx.engine, bfv_mult_relin, lvl32,
                               n_inputs=2)
        t0 = time.time()
        outs[tag] = np.asarray(fn(a, b, keys))     # trace + compile here
        print(f'{tag} compiled (+run) in {time.time() - t0:.0f}s',
              flush=True)
        variants[tag] = fn
    np.testing.assert_array_equal(outs['base'], outs['invmb'])
    print('variants bit-identical', flush=True)

    iters = int(os.environ.get('LATTISENSE_PROBE_ITERS', '32'))

    def slope(fn):
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
    for rep in range(5):
        for tag, fn in variants.items():
            results[tag].append(batch / slope(fn))
    for tag, vals in results.items():
        vals = sorted(vals)
        print(f'{tag:5s}: best {vals[-1]:7.1f} ops/s  median '
              f'{vals[len(vals) // 2]:7.1f}  all='
              f'{[round(v, 1) for v in vals]}', flush=True)


if __name__ == '__main__':
    main()
