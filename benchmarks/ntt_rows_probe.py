"""Interleaved in-process sweep of the fused-NTT rows-per-block tile
height (VERDICT r4 item 3: the forward kernel sits 2-3x above its
demonstrated lowering floor; per-grid-step overheads — table pipelining,
relayout fixed costs — amortize with taller tiles, and R=8 was decided
against an OLDER kernel variant before the splat tables landed).

All variants bit-exact by construction (tile height only affects
scheduling); isolated fwd+inv slopes per R, interleaved over reps so
tunnel drift cancels (tunnel-discipline notes).
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
    from lattisense_tpu.core.modring import get_rns_ring, gen_ntt_primes
    from lattisense_tpu.ops import ntt_pallas32 as k32

    n, L, B = 16384, 8, 32
    rows = B * L
    q = gen_ntt_primes(n, 31, L)
    ring = get_rns_ring(tuple(q), n, 32)
    rng = np.random.default_rng(0)
    x = np.stack([np.stack([rng.integers(0, qi, n, dtype=np.uint64)
                            for qi in q]) for _ in range(B)]).astype(np.uint32)
    xd = jax.device_put(x)
    sweep = [int(r) for r in os.environ.get('LATTISENSE_ROWS_SWEEP',
                                            '8,16,32').split(',')]
    iters = int(os.environ.get('LATTISENSE_PROBE_ITERS', '150'))
    reps = int(os.environ.get('LATTISENSE_PROBE_REPS', '3'))

    print(f'# rows-per-block sweep {sweep}, B={B} L={L} n={n} '
          f'({rows} limb-rows), backend={jax.default_backend()}', flush=True)

    fns = {}
    ref = None
    for R in sweep:
        fwd = jax.jit(lambda v, R=R: k32.ntt_fused32(v, ring, R))
        inv = jax.jit(lambda v, R=R: k32.intt_fused32(v, ring, R))
        t0 = time.time()
        y = fwd(xd)
        np.asarray(y.ravel()[:2])
        z = inv(y)
        got = np.asarray(z)
        print(f'R={R}: compiled fwd+inv in {time.time() - t0:.0f}s',
              flush=True)
        np.testing.assert_array_equal(got, x)        # round-trip exact
        if ref is None:
            ref = np.asarray(y)
        else:
            np.testing.assert_array_equal(np.asarray(y), ref)
        fns[R] = (fwd, inv, y)

    def slope(fn, arg):
        def run(k):
            t0 = time.perf_counter()
            o = None
            for _ in range(k):
                o = fn(arg)
            np.asarray(o.ravel()[:2])
            return time.perf_counter() - t0

        run(2)
        for _ in range(4):
            t1, t2 = run(iters), run(2 * iters)
            s = (t2 - t1) / iters
            if s > 0:
                return s
        raise RuntimeError('non-physical slope persisted')

    res = {(R, d): [] for R in sweep for d in ('fwd', 'inv')}
    for rep in range(reps):
        for R, (fwd, inv, y) in fns.items():
            res[(R, 'fwd')].append(slope(fwd, xd))
            res[(R, 'inv')].append(slope(inv, y))
    for (R, d), ts in sorted(res.items()):
        t = min(ts)
        spread = (max(ts) / t - 1) * 100
        print(f'R={R:2d} {d}: {t * 1e6 / rows:7.3f} us/limb-row '
              f'(spread {spread:.0f}%)', flush=True)


if __name__ == '__main__':
    main()
