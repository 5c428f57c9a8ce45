"""Focused chip probe: the headline w32 BFV mult_relin scenario only
(bench.py scenario definition), plus an optional mult/relin split.
Keep strictly serial on the tunnel."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

import numpy as np


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.cache/jax')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import jax.numpy as jnp
    import lattisense_tpu  # noqa: F401
    from lattisense_tpu.params import BfvParams
    from lattisense_tpu.runtime import BfvContext
    from lattisense_tpu.parallel.batch import (bfv_mult_relin, key_tree,
                                               make_batched_step)

    batch = int(os.environ.get('LATTISENSE_BENCH_BATCH', '32'))
    rng = np.random.default_rng(0)
    bp = BfvParams.create(16384)
    level3 = 3
    logq_l3 = sum(q.bit_length() for q in bp.q[:level3 + 1])
    bp32 = BfvParams.create_tpu_param(16384)
    lvl32 = 0
    while sum(q.bit_length() for q in bp32.q[:lvl32 + 1]) < logq_l3:
        lvl32 += 1
    print(f'# w32 level {lvl32}, batch {batch}', flush=True)
    ctx = BfvContext.create_random_context(bp32, seed=7)
    m32 = rng.integers(0, bp32.t, (2 * batch, bp32.n), dtype=np.uint64)
    cts = [ctx.encrypt(ctx.encode(m, lvl32)) for m in m32]
    a = jax.device_put(np.stack([c.data for c in cts[:batch]]))
    b = jax.device_put(np.stack([c.data for c in cts[batch:]]))
    keys = jax.device_put(key_tree(ctx))

    def slope(fn, *args, iters=8):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:2])

        def run(k):
            t0 = time.perf_counter()
            o = None
            for _ in range(k):
                o = fn(*args)
            np.asarray(jax.tree.leaves(o)[0].ravel()[:2])
            return time.perf_counter() - t0

        run(2)
        t1, t2 = run(iters), run(2 * iters)
        return (t2 - t1) / iters

    fn = make_batched_step(ctx.engine, bfv_mult_relin, lvl32, n_inputs=2)
    t = slope(fn, a, b, keys)
    print(f'mult_relin: {batch / t:8.1f} ops/s  ({t * 1e6 / batch:.1f} us/op)',
          flush=True)

    if os.environ.get('LATTISENSE_PROBE_SPLIT', '0') not in ('', '0'):
        def mult_only(engine, x, y, keys):
            return engine.mult(jnp, x, y).data

        def make_step(stepfn, n_inputs):
            from lattisense_tpu.parallel.batch import make_batched_step as mbs
            return mbs(ctx.engine, stepfn, lvl32, n_inputs=n_inputs)

        from lattisense_tpu.schemes.types import Ciphertext

        fm = make_step(lambda e, x, y, k: e.mult(jnp, x, y), 2)
        t = slope(fm, a, b, keys)
        print(f'mult only : {batch / t:8.1f} ops/s  '
              f'({t * 1e6 / batch:.1f} us/op)', flush=True)

        # relin on a fixed ct3
        ct3 = np.asarray(fm(a, b, keys))

        def relin_step(x3, keys):
            c = Ciphertext(data=x3, level=lvl32)
            return ctx.engine.relinearize(jnp, c, keys['rlk']).data

        fr = jax.jit(jax.vmap(relin_step, in_axes=(0, None)))
        c3 = jax.device_put(ct3)
        t = slope(fr, c3, keys)
        print(f'relin only: {batch / t:8.1f} ops/s  '
              f'({t * 1e6 / batch:.1f} us/op)', flush=True)


if __name__ == '__main__':
    main()
