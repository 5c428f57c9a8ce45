"""Fused hybrid key switch for the 32-bit-word engine (Pallas/Mosaic).

One kernel per ciphertext runs the ENTIRE key switch of
core KeySwitcher.switch — digit decomposition, per-digit FastBConv
mod-up, forward NTT of all digit rows, the gadget inner product with the
key, inverse NTT of both output components, the HPS-corrected mod-down,
and (for the CKKS output_ntt contract) the output forward NTT — with
every intermediate resident in VMEM. Replaces the XLA composition used by
relinearize / rotate / key_switch on the w32 path (reference parity:
mega_ag_runners/cpu/mega_ag_executors_cpu.cpp:236,269 executors
delegating to Lattigo's key-switch kernels).

Constants use Shoup (value, companion) pairs; the runtime key is the only
Montgomery multiply. The mod-down overflow v is the u32 fixed-point
estimate (RoundDivP.overflow w32 branch) so the kernel is bit-identical
to the XLA path. Stage tables follow the 2D-fold idiom
(ops/ntt_pallas32.py docstring); the NTT/INTT loops over
digits/components reuse ONE (T, m, width) table set per direction.
"""

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ntt_pallas32 import (_addmod32, _shoup32, _submod32, _stage_plan,
                           _inv_stage_plan)
from .behz_pallas32 import _mont32, _sh32

LANES = 128
MASK16 = 0xFFFF


def _fwd_rows(v, tabs, q3, n, sub):
    """Forward fold-NTT of (rows, n) with per-row primes q3 (rows, 1, 1).
    tabs = [(w_ref, ws_ref), ...] per stage; row count may be a leading
    slice of the tables' row dim."""
    rows = v.shape[0]
    si = 0
    m = 1
    t = n
    while t > LANES:
        t //= 2
        w = tabs[si][0][:rows]
        ws = tabs[si][1][:rows]
        p = v.reshape(rows, m, 2 * t)
        u = p[..., :t]
        b = _shoup32(p[..., t:], w, ws, q3)
        v = jnp.concatenate([_addmod32(u, b, q3), _submod32(u, b, q3)],
                            axis=-1).reshape(rows, n)
        m *= 2
        si += 1
    v = v.reshape(rows, sub, LANES).swapaxes(1, 2)
    tb = LANES
    while tb > 1:
        tb //= 2
        mb = LANES // (2 * tb)
        w = tabs[si][0][:rows]
        ws = tabs[si][1][:rows]
        p = v.reshape(rows, mb, 2 * tb * sub)
        u = p[..., :tb * sub]
        b = _shoup32(p[..., tb * sub:], w, ws, q3)
        v = jnp.concatenate([_addmod32(u, b, q3), _submod32(u, b, q3)],
                            axis=-1)
        si += 1
    return v.reshape(rows, LANES, sub).swapaxes(1, 2).reshape(rows, n)


def _inv_rows(v, tabs, q3, ni, ns, n, sub):
    """Inverse (plain GS, ascending) fold-NTT + n^-1 scale."""
    rows = v.shape[0]
    si = 0
    v = v.reshape(rows, sub, LANES).swapaxes(1, 2)
    tb = 1
    while tb < LANES:
        mb = LANES // (2 * tb)
        w = tabs[si][0][:rows]
        ws = tabs[si][1][:rows]
        p = v.reshape(rows, mb, 2 * tb * sub)
        u = p[..., :tb * sub]
        b = p[..., tb * sub:]
        s = _addmod32(u, b, q3)
        d = _shoup32(_submod32(u, b, q3), w, ws, q3)
        v = jnp.concatenate([s, d], axis=-1)
        si += 1
        tb *= 2
    v = v.reshape(rows, LANES, sub).swapaxes(1, 2).reshape(rows, n)
    t = LANES
    while t < n:
        m = n // (2 * t)
        w = tabs[si][0][:rows]
        ws = tabs[si][1][:rows]
        p = v.reshape(rows, m, 2 * t)
        u = p[..., :t]
        b = p[..., t:]
        s = _addmod32(u, b, q3)
        d = _shoup32(_submod32(u, b, q3), w, ws, q3)
        v = jnp.concatenate([s, d], axis=-1).reshape(rows, n)
        si += 1
        t *= 2
    return _shoup32(v, ni, ns, q3[:, :, 0])


def _fwd_rows4(v, tabs, q3, n, sub, plan):
    """Radix-4 merged-pass forward twin of _fwd_rows (plan from
    ntt_pallas32.expand_fwd_tables4; r4 passes consume three table pairs
    ordered [level-2t, level-t even, level-t odd])."""
    rows = v.shape[0]
    si = 0
    in_t = False
    for kind, m, ts_, transposed in plan:
        if transposed and not in_t:
            v = v.reshape(rows, sub, LANES).swapaxes(1, 2)
            in_t = True
        width = ts_ * sub if transposed else ts_
        if kind == 'r2':
            w, ws = tabs[si][0][:rows], tabs[si][1][:rows]
            si += 1
            p = v.reshape(rows, m, 2 * width)
            u = p[..., :width]
            b = _shoup32(p[..., width:], w, ws, q3)
            v = jnp.concatenate([_addmod32(u, b, q3), _submod32(u, b, q3)],
                                axis=-1)
        else:
            w2, w2s = tabs[si][0][:rows], tabs[si][1][:rows]
            w1a, w1as = tabs[si + 1][0][:rows], tabs[si + 1][1][:rows]
            w1b, w1bs = tabs[si + 2][0][:rows], tabs[si + 2][1][:rows]
            si += 3
            p = v.reshape(rows, m, 4 * width)
            u = p[..., :2 * width]
            b = _shoup32(p[..., 2 * width:], w2, w2s, q3)
            top = _addmod32(u, b, q3)
            bot = _submod32(u, b, q3)
            t0 = top[..., :width]
            t1 = _shoup32(top[..., width:], w1a, w1as, q3)
            b0 = bot[..., :width]
            b1 = _shoup32(bot[..., width:], w1b, w1bs, q3)
            v = jnp.concatenate(
                [_addmod32(t0, t1, q3), _submod32(t0, t1, q3),
                 _addmod32(b0, b1, q3), _submod32(b0, b1, q3)], axis=-1)
        if not transposed:
            v = v.reshape(rows, n)
    return v.reshape(rows, LANES, sub).swapaxes(1, 2).reshape(rows, n)


def _inv_rows4(v, tabs, q3, ni, ns, n, sub, plan):
    """Radix-4 merged-pass inverse twin of _inv_rows (+ n^-1 scale)."""
    rows = v.shape[0]
    si = 0
    in_t = True
    v = v.reshape(rows, sub, LANES).swapaxes(1, 2)
    for kind, m, ts_, transposed in plan:
        if not transposed and in_t:
            v = v.reshape(rows, LANES, sub).swapaxes(1, 2).reshape(rows, n)
            in_t = False
        width = ts_ * sub if transposed else ts_
        if kind == 'r2':
            w, ws = tabs[si][0][:rows], tabs[si][1][:rows]
            si += 1
            p = v.reshape(rows, m, 2 * width)
            u, b = p[..., :width], p[..., width:]
            s = _addmod32(u, b, q3)
            d = _shoup32(_submod32(u, b, q3), w, ws, q3)
            v = jnp.concatenate([s, d], axis=-1)
        else:
            w1a, w1as = tabs[si][0][:rows], tabs[si][1][:rows]
            w1b, w1bs = tabs[si + 1][0][:rows], tabs[si + 1][1][:rows]
            w2, w2s = tabs[si + 2][0][:rows], tabs[si + 2][1][:rows]
            si += 3
            p = v.reshape(rows, m, 4 * width)
            pa, pb = p[..., :width], p[..., width:2 * width]
            pc, pd = p[..., 2 * width:3 * width], p[..., 3 * width:]
            s_ab = _addmod32(pa, pb, q3)
            d_ab = _shoup32(_submod32(pa, pb, q3), w1a, w1as, q3)
            s_cd = _addmod32(pc, pd, q3)
            d_cd = _shoup32(_submod32(pc, pd, q3), w1b, w1bs, q3)
            v = jnp.concatenate(
                [_addmod32(s_ab, s_cd, q3), _addmod32(d_ab, d_cd, q3),
                 _shoup32(_submod32(s_ab, s_cd, q3), w2, w2s, q3),
                 _shoup32(_submod32(d_ab, d_cd, q3), w2, w2s, q3)],
                axis=-1)
        if not transposed:
            v = v.reshape(rows, n)
    return _shoup32(v, ni, ns, q3[:, :, 0])


def _mul32_pair(a, b):
    """Full 32×32→64 product of u32 arrays as (hi, lo) u32."""
    a0 = a & jnp.uint32(MASK16)
    a1 = a >> 16
    b0 = b & jnp.uint32(MASK16)
    b1 = b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    t = (ll >> 16) + (lh & jnp.uint32(MASK16)) + (hl & jnp.uint32(MASK16))
    lo = (ll & jnp.uint32(MASK16)) | (t << 16)
    hi = a1 * b1 + (lh >> 16) + (hl >> 16) + (t >> 16)
    return hi, lo


def _ksw_kernel(logn, L, T, alpha, beta, nfwd, ninv, out_ntt, plans,
                dec_ref, mc_ref, qp_ref, dq_ref, dp_ref, c2_ref,
                x_ref, kd_ref, *refs):
    """One ciphertext's key switch per grid step.

    dec_ref (3, BA, 1): digit-flat src q, qhat_inv(+shoup); padded rows 0
    mc_ref  (2BA, T, 1): mod-up conversion values then Shoup companions
    qp_ref  (4, T, 1): qp primes, pinv, n_inv, n_inv_shoup
    dq_ref  (4, L, 1): q, half_q, Pinv(+shoup)
    dp_ref  (6, α, 1): p, half_p, rd_qhat_inv(+shoup), fx = floor(2^62/p)
    c2_ref  (2α, L, 1): mod-down conversion values then Shoup companions
    kd_ref  (1, β, 2, T, n): key digits (NTT + Montgomery)
    refs: nfwd fwd table pairs, ninv inv table pairs, out (1, 2, L, n).
    """
    n = 1 << logn
    sub = n // LANES
    BA = beta * alpha
    fwd_tabs = [(refs[2 * i], refs[2 * i + 1]) for i in range(nfwd)]
    inv_tabs = [(refs[2 * nfwd + 2 * i], refs[2 * nfwd + 2 * i + 1])
                for i in range(ninv)]
    fwd_plan, inv_plan = plans
    if fwd_plan is not None:
        def fwd_fn(v, tabs, q3):
            return _fwd_rows4(v, tabs, q3, n, sub, fwd_plan)
    else:
        def fwd_fn(v, tabs, q3):
            return _fwd_rows(v, tabs, q3, n, sub)
    if inv_plan is not None:
        def inv_fn(v, tabs, q3, ni, ns):
            return _inv_rows4(v, tabs, q3, ni, ns, n, sub, inv_plan)
    else:
        def inv_fn(v, tabs, q3, ni, ns):
            return _inv_rows(v, tabs, q3, ni, ns, n, sub)
    x = x_ref[0]                                          # (L, n)
    if BA > L:
        x = jnp.concatenate([x, jnp.zeros((BA - L, n), jnp.uint32)], axis=0)
    y = _shoup32(x, dec_ref[1], dec_ref[2], dec_ref[0])   # (BA, n)

    qp = qp_ref[0]
    qp3 = qp[:, :, None]
    qppinv = qp_ref[1]

    # per-digit mod-up + forward NTT (the α·Q_d overflow is absorbed
    # exactly by the gadget)
    digs = []
    for d in range(beta):
        r0 = d * alpha
        ext = _shoup32(y[r0:r0 + 1], mc_ref[r0], mc_ref[BA + r0], qp)
        for j in range(1, alpha):
            r = r0 + j
            ext = _addmod32(ext, _shoup32(y[r:r + 1], mc_ref[r],
                                          mc_ref[BA + r], qp), qp)
        digs.append(fwd_fn(ext, fwd_tabs, qp3))

    qL = dq_ref[0]
    qL3 = qL[:, :, None]
    pq = dp_ref[0]
    outs = []
    for c in range(2):
        acc = _mont32(digs[0], kd_ref[0, 0, c], qp, qppinv)
        for d in range(1, beta):
            acc = _addmod32(acc, _mont32(digs[d], kd_ref[0, d, c], qp,
                                         qppinv), qp)
        v = inv_fn(acc, inv_tabs, qp3, qp_ref[2], qp_ref[3])
        cq = v[:L]
        cp = v[L:]
        # mod-down with the fixed-point HPS overflow correction
        y2 = _shoup32(_addmod32(cp, dp_ref[1], pq), dp_ref[2], dp_ref[3], pq)
        conv = _shoup32(y2[0:1], c2_ref[0], c2_ref[alpha], qL)
        for j in range(1, alpha):
            conv = _addmod32(conv, _shoup32(y2[j:j + 1], c2_ref[j],
                                            c2_ref[alpha + j], qL), qL)
        num = _submod32(_addmod32(cq, dq_ref[1], qL), conv, qL)
        e = _shoup32(num, dq_ref[2], dq_ref[3], qL)
        hi, lo = _mul32_pair(y2[0:1], dp_ref[5][0:1])
        for j in range(1, alpha):
            h2, l2 = _mul32_pair(y2[j:j + 1], dp_ref[5][j:j + 1])
            s = lo + l2
            hi = hi + h2 + (s < lo).astype(jnp.uint32)
            lo = s
        vcorr = hi >> 30                                  # (1, n)
        e = _addmod32(e, vcorr, qL)
        if out_ntt:
            e = fwd_fn(e, fwd_tabs, qL3)
        outs.append(e)

    refs[-1][0] = jnp.stack(outs)


# ---------------------------------------------------------------------------
# host-side constants
# ---------------------------------------------------------------------------

_SW_STASH: dict = {}


def _sw_key(switcher, level):
    key = (switcher.q_moduli, switcher.p_moduli, switcher.n, level)
    _SW_STASH[key] = (switcher,)
    return key


import os as _os

# independent gate: the ksw kernel's stage tables are shared across all
# digit rows (already amortized), so the splat economics differ from the
# standalone NTT kernels — A/B'd separately on chip.
_KSW_SPLAT = _os.environ.get('LATTISENSE_KSW32_SPLAT', '0') not in ('', '0')
# radix-4 merged passes inside the fused switch, gated PER DIRECTION
# (the chip A/B may favor merging only the inverse transforms; natural-
# phase tables are splat under radix-4)
_KSW_R4_FWD = _os.environ.get(
    'LATTISENSE_KSW32_R4_FWD',
    _os.environ.get('LATTISENSE_KSW32_R4',
                    _os.environ.get('LATTISENSE_NTT32_R4', '0'))) \
    not in ('', '0')
_KSW_R4_INV = _os.environ.get(
    'LATTISENSE_KSW32_R4_INV',
    _os.environ.get('LATTISENSE_KSW32_R4',
                    _os.environ.get('LATTISENSE_NTT32_R4_INV',
                                    _os.environ.get('LATTISENSE_NTT32_R4',
                                                    '0')))) \
    not in ('', '0')


def _expand(tbl, plan, logn, sub):
    n = 1 << logn
    out = []
    for m, t, transposed in plan:
        m_orig = n // (2 * t)
        if not transposed:
            # phase-A twiddles are constant over t: compact (m, 1) splat
            # tables + in-kernel lane broadcast (see ntt_pallas32)
            width = 1 if _KSW_SPLAT else t
            idx = np.broadcast_to((m_orig + np.arange(m))[:, None],
                                  (m, width))
        else:
            blk = LANES // (2 * t)
            g = np.arange(m)[:, None, None]
            a = np.arange(sub)[None, None, :]
            idx = np.broadcast_to(m_orig + a * blk + g,
                                  (m, t, sub)).reshape(m, t * sub)
        out.append(np.ascontiguousarray(tbl[:, idx]))
    return out


@functools.lru_cache(maxsize=None)
def _ksw_consts(key):
    sw, = _SW_STASH[key]
    level = key[3]
    ring_qp, qhat_inv, qhat_inv_shoup, src_q, qhat_conv, rd = \
        sw._level_pre(level)
    n = sw.n
    logn = n.bit_length() - 1
    sub = n // LANES
    L = level + 1
    alpha = sw.alpha
    beta = sw.beta(level)
    BA = beta * alpha
    T = L + alpha
    q_m = list(sw.q_moduli[:L])
    p_m = list(sw.p_moduli)
    qp_m = q_m + p_m

    dec = np.stack([src_q.reshape(BA, 1).astype(np.uint32),
                    qhat_inv.reshape(BA, 1).astype(np.uint32),
                    qhat_inv_shoup.reshape(BA, 1).astype(np.uint32)])

    # mod-up conversion: plain values + Shoup; recompute from moduli
    # (qhat_conv holds the Montgomery forms)
    mc_v = np.zeros((BA, T), dtype=np.uint32)
    mc_s = np.zeros((BA, T), dtype=np.uint32)
    for d in range(beta):
        grp = q_m[d * alpha:(d + 1) * alpha]
        Qd = math.prod(grp)
        for j, qi in enumerate(grp):
            h = Qd // qi
            for t, dt in enumerate(qp_m):
                mc_v[d * alpha + j, t] = h % dt
                mc_s[d * alpha + j, t] = _sh32(h % dt, dt)
    mc = np.ascontiguousarray(np.concatenate([mc_v, mc_s])[:, :, None])

    ring = ring_qp
    qp_c = np.stack([np.asarray(qp_m, np.uint32).reshape(-1, 1),
                     np.asarray(ring.pinv, np.uint32).reshape(-1, 1),
                     np.asarray(ring.n_inv, np.uint32).reshape(-1, 1),
                     np.asarray(ring.n_inv_shoup, np.uint32).reshape(-1, 1)])

    P = math.prod(p_m)
    half = P // 2
    pinv_v = [pow(P % q, -1, q) for q in q_m]
    dq_c = np.stack([np.asarray(q_m, np.uint32).reshape(-1, 1),
                     np.asarray([half % q for q in q_m],
                                np.uint32).reshape(-1, 1),
                     np.asarray(pinv_v, np.uint32).reshape(-1, 1),
                     np.asarray([_sh32(v, q) for v, q in zip(pinv_v, q_m)],
                                np.uint32).reshape(-1, 1)])
    rdc = rd.conv
    dp_c = np.stack([np.asarray(p_m, np.uint32).reshape(-1, 1),
                     np.asarray([half % p for p in p_m],
                                np.uint32).reshape(-1, 1),
                     np.asarray(rdc.qhat_inv, np.uint32).reshape(-1, 1),
                     np.asarray(rdc.qhat_inv_shoup, np.uint32).reshape(-1, 1),
                     np.zeros((alpha, 1), np.uint32),
                     np.asarray([(1 << 62) // p for p in p_m],
                                np.uint32).reshape(-1, 1)])
    phat = [P // p for p in p_m]
    c2_v = np.asarray([[phat[j] % q for q in q_m] for j in range(alpha)],
                      dtype=np.uint32)
    c2_s = np.asarray([[_sh32(phat[j] % q, q) for q in q_m]
                       for j in range(alpha)], dtype=np.uint32)
    c2 = np.ascontiguousarray(np.concatenate([c2_v, c2_s])[:, :, None])

    tw = np.asarray(ring.psi_rev, dtype=np.uint32)
    ts = np.asarray(ring.psi_rev_shoup, dtype=np.uint32)
    ti = np.asarray(ring.psi_inv_rev, dtype=np.uint32)
    tis = np.asarray(ring.psi_inv_rev_shoup, dtype=np.uint32)
    from .ntt_pallas32 import expand_fwd_tables4, expand_inv_tables4
    if _KSW_R4_FWD:
        fwd_plan, fwd = expand_fwd_tables4(tw, ts, logn)
    else:
        fwd_plan = None
        fwd = list(zip(_expand(tw, _stage_plan(logn), logn, sub),
                       _expand(ts, _stage_plan(logn), logn, sub)))
    if _KSW_R4_INV:
        inv_plan, inv = expand_inv_tables4(ti, tis, logn)
    else:
        inv_plan = None
        inv = list(zip(_expand(ti, _inv_stage_plan(logn), logn, sub),
                       _expand(tis, _inv_stage_plan(logn), logn, sub)))
    return (logn, L, T, alpha, beta, dec, mc, qp_c, dq_c, dp_c, c2, fwd, inv,
            (fwd_plan, inv_plan))


def _im(*vals):
    return tuple(jnp.int32(v) for v in vals)


_CPARAMS = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024,
                                dimension_semantics=('arbitrary',))


def _ksw_impl(x, key_q, key_p, key, out_ntt):
    (logn, L, T, alpha, beta, dec, mc, qp_c, dq_c, dp_c, c2,
     fwd, inv, plans) = _ksw_consts(key)
    n = 1 << logn
    shape = x.shape
    G = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    xg = x.reshape(G, L, n)
    # key digits over Q_l ∪ P: (β, 2, T, n)
    kd = jnp.concatenate([key_q[:beta, :, :L], key_p[:beta]], axis=2)
    kd = kd[None]

    def full(a):
        return pl.BlockSpec(a.shape, lambda g: _im(*([0] * a.ndim)),
                            memory_space=pltpu.VMEM)

    tab_specs = []
    tab_args = []
    for w, ws in fwd + inv:
        spec = pl.BlockSpec((T,) + w.shape[1:], lambda g: _im(0, 0, 0),
                            memory_space=pltpu.VMEM)
        tab_specs += [spec, spec]
        tab_args += [w, ws]

    x_spec = pl.BlockSpec((1, L, n), lambda g: _im(g, 0, 0),
                          memory_space=pltpu.VMEM)
    kd_spec = pl.BlockSpec(kd.shape, lambda g: _im(0, 0, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 2, L, n), lambda g: _im(g, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    interp = jax.default_backend() == 'cpu'
    f = pl.pallas_call(
        functools.partial(_ksw_kernel, logn, L, T, alpha, beta,
                          len(fwd), len(inv), out_ntt, plans),
        interpret=interp,
        compiler_params=_CPARAMS,
        grid=(G,),
        in_specs=[full(dec), full(mc), full(qp_c), full(dq_c), full(dp_c),
                  full(c2), x_spec, kd_spec] + tab_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((G, 2, L, n), jnp.uint32),
    )
    out = f(dec, mc, qp_c, dq_c, dp_c, c2, xg, kd, *tab_args)
    out = out.reshape(*shape[:-2], 2, L, n)
    return out[..., 0, :, :], out[..., 1, :, :]


_VMAP_CACHE: dict = {}


def ksw_switch32(x, ksk, switcher, level, output_ntt=False):
    """Fused key switch of coeff-domain x (..., L, n) u32 → (e0, e1),
    bit-identical to KeySwitcher.switch."""
    key = _sw_key(switcher, level)
    ck = (key, bool(output_ntt))
    f = _VMAP_CACHE.get(ck)
    if f is None:
        @jax.custom_batching.custom_vmap
        def f(xx, kq, kp):
            return _ksw_impl(xx, kq, kp, key, bool(output_ntt))

        @f.def_vmap
        def _rule(axis_size, in_batched, xb, kq, kp):
            # keys are broadcast (unbatched); x carries the batch axis
            kq0 = kq[0] if in_batched[1] else kq
            kp0 = kp[0] if in_batched[2] else kp
            e0, e1 = _ksw_impl(xb, kq0, kp0, key, bool(output_ntt))
            return (e0, e1), (True, True)

        _VMAP_CACHE[ck] = f
    return f(x, ksk.key_q, ksk.key_p)
