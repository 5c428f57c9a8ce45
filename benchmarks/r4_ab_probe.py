"""In-process A/B of the radix-4 merged-pass kernels on the HEADLINE
pipeline (w32 BFV mult_relin, n=16384): variant A = round-3 defaults
(radix-2 stages everywhere), variant B = radix-4 in the standalone NTT
kernels + the K3 BEHZ finish + the fused key switch. Interleaved
same-process slopes defeat tunnel drift (NOTES.md measurement
discipline); per-op isolated timings are misleading — only the
end-to-end headline decides (round-1 finding)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

import numpy as np


def _set_r4(on: bool):
    from lattisense_tpu.ops import behz_pallas32 as bz
    from lattisense_tpu.ops import ksw_pallas32 as kw
    from lattisense_tpu.ops import ntt_pallas32 as k32
    k32._R4 = on
    k32._R4_INV = on
    bz._R4_K3 = on
    bz._R4_K1 = on
    bz._k3_consts.cache_clear()
    bz._k1_consts.cache_clear()
    kw._KSW_R4 = on
    kw._ksw_consts.cache_clear()


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
    outs = {}
    for tag, on in (('r2', False), ('r4', True)):
        _set_r4(on)
        fn = make_batched_step(ctx.engine, bfv_mult_relin, lvl32,
                               n_inputs=2)
        t0 = time.time()
        outs[tag] = np.asarray(fn(a, b, keys))     # trace + compile here
        print(f'{tag} compiled (+run) in {time.time() - t0:.0f}s',
              flush=True)
        variants[tag] = fn
    np.testing.assert_array_equal(outs['r2'], outs['r4'])
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
        print(f'{tag:4s}: best {vals[-1]:7.1f} ops/s  median '
              f'{vals[len(vals) // 2]:7.1f}  all='
              f'{[round(v, 1) for v in vals]}', flush=True)


if __name__ == '__main__':
    main()
