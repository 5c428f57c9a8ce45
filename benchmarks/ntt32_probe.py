"""Chip probe: w32 fused NTT kernel variants (round-3 roofline push).

Measures the fused forward/inverse at the bench shape (B=32, L=8,
n=16384 -> 256 limb-rows) and prints µs/limb-row for each gated variant.
Keep strictly serial on the tunnel. Usage:
    python benchmarks/ntt32_probe.py [--variants cur,splat,...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

import numpy as np


def timeit(fn, *args, iters=int(os.environ.get('LATTISENSE_PROBE_ITERS',
                                               '10'))):
    """Marginal k-vs-2k slope with a physicality guard (VERDICT r4 item
    10): host load can corrupt a slope into a NEGATIVE time — such a
    reading is re-measured with doubled iters instead of being emitted;
    after 4 attempts the probe refuses loudly rather than print garbage."""
    import jax
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
    for attempt in range(4):
        t1, t2 = run(iters), run(2 * iters)
        slope = (t2 - t1) / iters
        if slope > 0:
            return slope
        print(f'# guard: non-physical slope {slope * 1e3:.3f} ms at '
              f'iters={iters} (host load?) — re-measuring', flush=True)
        iters *= 2
    raise RuntimeError('probe slope stayed non-positive after 4 attempts; '
                       'host too loaded for a decision-grade reading')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=16384)
    ap.add_argument('--limbs', type=int, default=8)
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--rows', type=int, default=8)
    ap.add_argument('--no-perm', action='store_true')
    args = ap.parse_args()

    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.cache/jax')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import lattisense_tpu  # noqa: F401
    from lattisense_tpu.core.modring import get_rns_ring, gen_ntt_primes
    from lattisense_tpu.ops import ntt_pallas32 as k32
    from lattisense_tpu.core import ntt as ntt_mod

    n, L, B = args.n, args.limbs, args.batch
    rows = B * L
    q = gen_ntt_primes(n, 31, L)
    ring = get_rns_ring(tuple(q), n, 32)
    rng = np.random.default_rng(0)
    x = np.stack([np.stack([rng.integers(0, qi, n, dtype=np.uint64)
                            for qi in q]) for _ in range(B)]).astype(np.uint32)
    xd = jax.device_put(x)

    print(f'# shape B={B} L={L} n={n} ({rows} limb-rows), '
          f'backend={jax.default_backend()}', flush=True)

    import jax.numpy as jnp  # noqa: F401

    reps = int(os.environ.get('LATTISENSE_PROBE_REPS', '1'))

    def report(tag, fn, *a):
        for attempt in range(3):
            ts = [timeit(fn, *a) for _ in range(reps)]
            t = min(ts)
            spread = (max(ts) / t - 1) * 100 if reps > 1 else 0.0
            if 0 <= spread <= 100:
                break
            print(f'# guard: spread {spread:.0f}% > 100% for {tag} — '
                  're-measuring', flush=True)
        else:
            print(f'{tag:28s} REFUSED (spread stayed > 100%; host too '
                  'loaded for a decision-grade reading)', flush=True)
            return None
        print(f'{tag:28s} {t * 1e3:8.3f} ms  {t * 1e6 / rows:7.3f} '
              f'us/limb-row  (spread {spread:.0f}%)', flush=True)
        return t

    # current default kernels
    R = args.rows
    splat = os.environ.get('LATTISENSE_NTT32_SPLAT', '1')
    splatb = os.environ.get('LATTISENSE_NTT32_SPLATB', '0')
    tag = f'R={R} splat={splat} splatb={splatb}'
    fwd = jax.jit(lambda v: k32.ntt_fused32(v, ring, R))
    inv = jax.jit(lambda v: k32.intt_fused32(v, ring, R))
    y = fwd(xd)
    # correctness guard on-chip (first 2 limbs to keep fetch small)
    ref = ntt_mod.ntt(np, x[:2].copy(), ring)
    np.testing.assert_array_equal(np.asarray(y[:2]), ref)
    report(f'fwd({tag})', fwd, xd)
    report(f'inv({tag})', inv, y)

    if os.environ.get('LATTISENSE_PROBE_INVMB', '1') not in ('', '0'):
        # mul-before-sub GS inverse (latency-dependency bisect): in-process
        # A/B vs the default sub-then-mul butterfly
        invmb = {}
        for tag, on in (('inv mul-after (dflt)', False),
                        ('inv mul-before', True)):
            k32._INV_MULBEFORE = on
            invmb[tag] = jax.jit(lambda v, _r=R: k32.intt_fused32(v, ring, _r))
            back = invmb[tag](y)
            np.testing.assert_array_equal(np.asarray(back[:2]), x[:2])
        k32._INV_MULBEFORE = False
        for _ in range(2):
            for tag, fn in invmb.items():
                report(tag, fn, y)

    if os.environ.get('LATTISENSE_PROBE_R4', '1') not in ('', '0'):
        # radix-4 merged-stage kernels (VERDICT r3 item 3): interleaved
        # in-process A/B vs the radix-2 defaults
        fwd4 = jax.jit(lambda v: k32.ntt_fused32_r4(v, ring, R))
        inv4 = jax.jit(lambda v: k32.intt_fused32_r4(v, ring, R))
        y4 = fwd4(xd)
        np.testing.assert_array_equal(np.asarray(y4[:2]), ref)
        back4 = inv4(y)
        np.testing.assert_array_equal(np.asarray(back4[:2]), x[:2])
        for _ in range(2):   # interleave to average drift
            report('fwd radix-2', fwd, xd)
            report('fwd radix-4', fwd4, xd)
            report('inv radix-2', inv, y)
            report('inv radix-4', inv4, y)

    if os.environ.get('LATTISENSE_PROBE_RSWEEP', '0') not in ('', '0'):
        # interleaved in-process R sweep (single-shot cross-process
        # readings drift up to 20%; see NOTES round-3)
        fns = {}
        for r in (8, 16, 32):   # block rows must be divisible by 8 (Mosaic)
            fns[f'fwd R={r}'] = (jax.jit(
                lambda v, _r=r: k32.ntt_fused32(v, ring, _r)), xd)
            fns[f'inv R={r}'] = (jax.jit(
                lambda v, _r=r: k32.intt_fused32(v, ring, _r)), y)
        for tag2, (fn, arg) in fns.items():
            np.asarray(jax.tree.leaves(fn(arg))[0].ravel()[:2])  # compile
        for tag2, (fn, arg) in fns.items():
            report(tag2, fn, arg)

    if os.environ.get('LATTISENSE_PROBE_DIAG', '0') not in ('', '0'):
        # D1 diagnostic (TIMING ONLY, wrong math): the inverse stage plan
        # (ascending distances) with the FORWARD's CT butterfly form
        # (multiply-before-add). Separates the two structural differences
        # between fwd (2.4 us/row) and inv (5.2): stage ORDER vs the GS
        # butterfly's mul-after-sub dependency chain.
        import jax.numpy as jnp_
        from jax.experimental import pallas as pl

        def diag_kernel(logn_, rows, perm_in, qn_ref, x_ref, *refs):
            nn = 1 << logn_
            sub = nn // k32.LANES
            limb = pl.program_id(0)
            q = qn_ref[limb, 0]
            v = x_ref[...].reshape(rows, sub, k32.LANES).swapaxes(1, 2)
            si = 0
            tb = 1
            while tb < k32.LANES:
                mb = k32.LANES // (2 * tb)
                w = refs[2 * si][...]
                ws = refs[2 * si + 1][...]
                p = v.reshape(rows, mb, 2 * tb * sub)
                u = p[..., :tb * sub]
                hv = p[..., tb * sub:]
                if w.shape[-1] != tb * sub:
                    hv4 = hv.reshape(rows, mb, tb, sub)
                    b = k32._shoup32(hv4, w[:, :, None, :],
                                     ws[:, :, None, :], q)
                    b = b.reshape(rows, mb, tb * sub)
                else:
                    b = k32._shoup32(hv, w, ws, q)
                v = jnp_.concatenate([k32._addmod32(u, b, q),
                                      k32._submod32(u, b, q)], axis=-1)
                si += 1
                tb *= 2
            v = v.reshape(rows, k32.LANES, sub).swapaxes(1, 2).reshape(
                rows, nn)
            t_ = k32.LANES
            while t_ < nn:
                m = nn // (2 * t_)
                w = refs[2 * si][...]
                ws = refs[2 * si + 1][...]
                p = v.reshape(rows, m, 2 * t_)
                u = p[..., :t_]
                b = k32._shoup32(p[..., t_:], w, ws, q)
                v = jnp_.concatenate([k32._addmod32(u, b, q),
                                      k32._submod32(u, b, q)],
                                     axis=-1).reshape(rows, nn)
                si += 1
                t_ *= 2
            ni = qn_ref[limb, 1]
            ns = qn_ref[limb, 2]
            v = k32._shoup32(v, ni, ns, q)
            refs[-1][...] = v.reshape(rows, nn)

        key = k32._stash(ring)
        logn_, L_, sub_, istages, qn = k32._itables(key, k32._SPLAT)

        def diag_fn(v):
            xr, batch_, batch_p, shape = k32._regroup(v, L_, n, R)
            out = k32._run(diag_kernel, xr, istages, qn, logn=logn_, L=L_,
                           rows_per_block=R, smem_cols=3, perm=False)
            out = out.reshape(L_, batch_p, n)[:, :batch_]
            import jax.numpy as jj
            return jj.moveaxis(out, 0, 1).reshape(shape)

        fd = jax.jit(diag_fn)
        report('DIAG asc+CT-butterfly', fd, y)

    if hasattr(k32, 'ntt_fused32_perm') and not args.no_perm:
        fwdp = jax.jit(lambda v: k32.ntt_fused32_perm(v, ring))
        invp = jax.jit(lambda v: k32.intt_fused32_perm(v, ring))
        yp = fwdp(xd)
        back = invp(yp)
        np.testing.assert_array_equal(np.asarray(back[:2]), x[:2])
        report('fwd(perm-out)', fwdp, xd)
        report('inv(perm-in)', invp, yp)

        rt = jax.jit(lambda v: invp(fwdp(v)))
        rt_std = jax.jit(lambda v: inv(fwd(v)))
        report('roundtrip(std)', rt_std, xd)
        report('roundtrip(perm)', rt, xd)


if __name__ == '__main__':
    main()
