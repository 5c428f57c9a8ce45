"""Fused Pallas NTT: all log2(n) butterfly stages inside one kernel.

Why: under XLA, each butterfly stage's stack/reshape materializes to HBM —
the measured cost is ~50× the single-pass roofline (benchmarks/micro.py
with fetch-forced timing). This kernel keeps the whole transform in VMEM:
one read, one write per row.

TPU constraints shape the design:

- Mosaic rejects u64 at the pallas_call boundary (XLA's X64 rewrite), so
  values cross as u32 (hi, lo) planes and all 64-bit modular arithmetic is
  built from native u32 ops (16-bit-digit widening products).
- Lanes must stay ≥128 wide: stages with butterfly distance t ≥ 128 act on
  a (m, 2, t) view (lane axis = t). For t < 128, the row is viewed as a
  (n/128, 128) tile and transposed so the small distances become sublane
  strides with the lane axis fixed at 128; the twiddles for those stages
  are pre-permuted into the transposed layout on the host. The kernel's
  output therefore comes back in "tile-transposed bit-reversed" order —
  `ntt_fused` undoes the transpose outside so the result is bit-identical
  to core/ntt.ntt.

Grid: one program per (limb, row-block); per-limb constant tables are
selected by the grid index.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
U32 = jnp.uint32
MASK16 = 0xFFFF  # plain int: jnp constants cannot be captured by kernels


# ---------------------------------------------------------------------------
# u64 arithmetic on u32 (hi, lo) pairs — exact, Mosaic-friendly
# ---------------------------------------------------------------------------

def _mul32(a, b):
    """Full 32×32→64 product as (hi, lo) u32 via 16-bit digits."""
    a0 = a & MASK16
    a1 = a >> 16
    b0 = b & MASK16
    b1 = b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    t = (ll >> 16) + (lh & MASK16) + (hl & MASK16)
    lo = (ll & MASK16) | (t << 16)
    hi = hh + (lh >> 16) + (hl >> 16) + (t >> 16)
    return hi, lo


def _add64(ah, al, bh, bl):
    lo = al + bl
    carry = (lo < al).astype(U32)
    return ah + bh + carry, lo


def _sub64(ah, al, bh, bl):
    lo = al - bl
    borrow = (al < bl).astype(U32)
    return ah - bh - borrow, lo


def _geq64(ah, al, bh, bl):
    return (ah > bh) | ((ah == bh) & (al >= bl))


def _addmod64(ah, al, bh, bl, qh, ql):
    sh, sl = _add64(ah, al, bh, bl)
    oh, ol = _sub64(sh, sl, qh, ql)
    ge = _geq64(sh, sl, qh, ql)
    return jnp.where(ge, oh, sh), jnp.where(ge, ol, sl)


def _submod64(ah, al, bh, bl, qh, ql):
    dh, dl = _sub64(ah, al, bh, bl)
    ch, cl = _add64(dh, dl, qh, ql)
    lt = ~_geq64(ah, al, bh, bl)
    return jnp.where(lt, ch, dh), jnp.where(lt, cl, dl)


def _mulhi64(ah, al, bh, bl):
    """Top 64 bits of the 128-bit product, as (hi, lo) u32."""
    h_ll, l_ll = _mul32(al, bl)          # noqa: F841  (l_ll only feeds carries)
    h_lh, l_lh = _mul32(al, bh)
    h_hl, l_hl = _mul32(ah, bl)
    h_hh, l_hh = _mul32(ah, bh)
    # r1 = h_ll + l_lh + l_hl  (carry1 ∈ {0,1,2})
    s = h_ll + l_lh
    c1 = (s < h_ll).astype(U32)
    r1 = s + l_hl
    c1 = c1 + (r1 < s).astype(U32)
    # r2 = h_lh + h_hl + l_hh + c1
    s = h_lh + h_hl
    c2 = (s < h_lh).astype(U32)
    s2 = s + l_hh
    c2 = c2 + (s2 < s).astype(U32)
    r2 = s2 + c1
    c2 = c2 + (r2 < s2).astype(U32)
    r3 = h_hh + c2
    return r3, r2


def _mullo64(ah, al, bh, bl):
    """Low 64 bits of the product as (hi, lo) u32."""
    h_ll, l_ll = _mul32(al, bl)
    r1 = h_ll + al * bh + ah * bl
    return r1, l_ll


def _shoup_mul64(ah, al, wh, wl, sh, sl, qh, ql):
    """a·w mod q with Shoup companion s = floor(w<<64/q); a, w < q < 2^63."""
    eh, el = _mulhi64(ah, al, sh, sl)            # q̂ estimate
    p1h, p1l = _mullo64(ah, al, wh, wl)          # a·w mod 2^64
    p2h, p2l = _mullo64(eh, el, qh, ql)          # q̂·q mod 2^64
    rh, rl = _sub64(p1h, p1l, p2h, p2l)
    oh, ol = _sub64(rh, rl, qh, ql)
    ge = _geq64(rh, rl, qh, ql)
    return jnp.where(ge, oh, rh), jnp.where(ge, ol, rl)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _phase1_kernel(logn, rows, q_ref, xh_ref, xl_ref, twh_ref, twl_ref,
                   tsh_ref, tsl_ref, oh_ref, ol_ref):
    """Stages with butterfly distance t ≥ LANES only (≤ logn−7 unrolled
    stages — the Mosaic real-chip lowering recurses too deep past ~10)."""
    n = 1 << logn
    limb = pl.program_id(0)
    qh = q_ref[limb, 0]
    ql = q_ref[limb, 1]
    vh = xh_ref[...]
    vl = xl_ref[...]
    m = 1
    t = n
    while t > LANES:
        t //= 2
        sh4 = (rows, m, 2, t)
        ph = vh.reshape(sh4)
        plv = vl.reshape(sh4)
        wh = twh_ref[0, 0, m:2 * m].reshape(1, m, 1)
        wl = twl_ref[0, 0, m:2 * m].reshape(1, m, 1)
        swh = tsh_ref[0, 0, m:2 * m].reshape(1, m, 1)
        swl = tsl_ref[0, 0, m:2 * m].reshape(1, m, 1)
        bh, bl = _shoup_mul64(ph[:, :, 1], plv[:, :, 1], wh, wl, swh, swl,
                              qh, ql)
        uh, ul = ph[:, :, 0], plv[:, :, 0]
        s_h, s_l = _addmod64(uh, ul, bh, bl, qh, ql)
        d_h, d_l = _submod64(uh, ul, bh, bl, qh, ql)
        vh = jnp.stack([s_h, d_h], axis=2).reshape(rows, n)
        vl = jnp.stack([s_l, d_l], axis=2).reshape(rows, n)
        m *= 2
    oh_ref[...] = vh
    ol_ref[...] = vl


def _phase2_kernel(logn, rows, q_ref, xh_ref, xl_ref, lth_ref, ltl_ref,
                   lsh_ref, lsl_ref, oh_ref, ol_ref):
    """Tile transpose + the 7 sub-LANES stages."""
    n = 1 << logn
    sub = n // LANES
    limb = pl.program_id(0)
    qh = q_ref[limb, 0]
    ql = q_ref[limb, 1]
    vh = xh_ref[...].reshape(rows, sub, LANES).swapaxes(1, 2)
    vl = xl_ref[...].reshape(rows, sub, LANES).swapaxes(1, 2)
    off = 0
    mb = 1
    tb = LANES
    while tb > 1:
        tb //= 2
        sh5 = (rows, mb, 2, tb, sub)
        ph = vh.reshape(sh5)
        plv = vl.reshape(sh5)
        cnt = mb * sub
        wh = lth_ref[0, 0, off:off + cnt].reshape(1, mb, 1, sub)
        wl = ltl_ref[0, 0, off:off + cnt].reshape(1, mb, 1, sub)
        swh = lsh_ref[0, 0, off:off + cnt].reshape(1, mb, 1, sub)
        swl = lsl_ref[0, 0, off:off + cnt].reshape(1, mb, 1, sub)
        bh, bl = _shoup_mul64(ph[:, :, 1], plv[:, :, 1], wh, wl, swh, swl,
                              qh, ql)
        uh, ul = ph[:, :, 0], plv[:, :, 0]
        s_h, s_l = _addmod64(uh, ul, bh, bl, qh, ql)
        d_h, d_l = _submod64(uh, ul, bh, bl, qh, ql)
        vh = jnp.stack([s_h, d_h], axis=2).reshape(rows, LANES, sub)
        vl = jnp.stack([s_l, d_l], axis=2).reshape(rows, LANES, sub)
        off += cnt
        mb *= 2
    oh_ref[...] = vh.reshape(rows, n)
    ol_ref[...] = vl.reshape(rows, n)


def _ntt_kernel(logn, rows, q_ref, xh_ref, xl_ref, twh_ref, twl_ref,
                tsh_ref, tsl_ref, lth_ref, ltl_ref, lsh_ref, lsl_ref,
                oh_ref, ol_ref):
    n = 1 << logn
    sub = n // LANES                         # tile rows (a axis)
    limb = pl.program_id(0)
    qh = q_ref[limb, 0]
    ql = q_ref[limb, 1]
    vh = xh_ref[...]                         # (rows, n)
    vl = xl_ref[...]

    # phase 1: butterfly distance t >= LANES (lane axis = t slices)
    m = 1
    t = n
    while t > LANES:
        t //= 2
        sh4 = (rows, m, 2, t)
        ph = vh.reshape(sh4)
        plv = vl.reshape(sh4)
        wh = twh_ref[0, 0, m:2 * m].reshape(1, m, 1)
        wl = twl_ref[0, 0, m:2 * m].reshape(1, m, 1)
        swh = tsh_ref[0, 0, m:2 * m].reshape(1, m, 1)
        swl = tsl_ref[0, 0, m:2 * m].reshape(1, m, 1)
        bh, bl = _shoup_mul64(ph[:, :, 1], plv[:, :, 1], wh, wl, swh, swl,
                              qh, ql)
        uh, ul = ph[:, :, 0], plv[:, :, 0]
        s_h, s_l = _addmod64(uh, ul, bh, bl, qh, ql)
        d_h, d_l = _submod64(uh, ul, bh, bl, qh, ql)
        vh = jnp.stack([s_h, d_h], axis=2).reshape(rows, n)
        vl = jnp.stack([s_l, d_l], axis=2).reshape(rows, n)
        m *= 2

    # transpose (rows, sub, LANES) -> (rows, LANES, sub): distances < LANES
    # become sublane strides; lanes stay at `sub` (= n/128 >= 128 for n>=2^14)
    vh = vh.reshape(rows, sub, LANES).swapaxes(1, 2)
    vl = vl.reshape(rows, sub, LANES).swapaxes(1, 2)

    # phase 2: remaining stages over the (former) lane axis, twiddles
    # pre-permuted on the host into the transposed layout
    off = 0
    mb = 1                                   # butterfly groups within LANES
    tb = LANES
    while tb > 1:
        tb //= 2
        sh5 = (rows, mb, 2, tb, sub)
        ph = vh.reshape(sh5)
        plv = vl.reshape(sh5)
        cnt = mb * sub
        wh = lth_ref[0, 0, off:off + cnt].reshape(1, mb, 1, sub)
        wl = ltl_ref[0, 0, off:off + cnt].reshape(1, mb, 1, sub)
        swh = lsh_ref[0, 0, off:off + cnt].reshape(1, mb, 1, sub)
        swl = lsl_ref[0, 0, off:off + cnt].reshape(1, mb, 1, sub)
        bh, bl = _shoup_mul64(ph[:, :, 1], plv[:, :, 1], wh, wl, swh, swl,
                              qh, ql)
        uh, ul = ph[:, :, 0], plv[:, :, 0]
        s_h, s_l = _addmod64(uh, ul, bh, bl, qh, ql)
        d_h, d_l = _submod64(uh, ul, bh, bl, qh, ql)
        vh = jnp.stack([s_h, d_h], axis=2).reshape(rows, LANES, sub)
        vl = jnp.stack([s_l, d_l], axis=2).reshape(rows, LANES, sub)
        off += cnt
        mb *= 2

    oh_ref[...] = vh.reshape(rows, n)
    ol_ref[...] = vl.reshape(rows, n)


# ---------------------------------------------------------------------------
# host-side table preparation
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _tables(ring_key):
    ring, = _RING_STASH[ring_key]
    n = ring.n
    L = len(ring.moduli)
    sub = n // LANES
    logn = n.bit_length() - 1

    def split(a):
        a = np.ascontiguousarray(a, dtype=np.uint64)
        return ((a >> np.uint64(32)).astype(np.uint32),
                (a & np.uint64(0xFFFFFFFF)).astype(np.uint32))

    twh, twl = split(ring.psi_rev)           # (L, n)
    tsh, tsl = split(ring.psi_rev_shoup)

    # late-stage twiddles, permuted into the transposed tile layout:
    # for stage distance t < LANES with m = n/(2t) groups, group index of
    # original element j = a*LANES + b is g = a*(LANES//(2t)) + (b>>log2(2t));
    # in the (b', a) layout the needed array is [gb, a] -> tbl[m + g].
    lt_list, ls_list = [], []
    t = LANES
    while t > 1:
        t //= 2
        m = n // (2 * t)
        mb = LANES // (2 * t)
        a_idx = np.arange(sub)
        gb_idx = np.arange(mb)
        g = a_idx[None, :] * mb + gb_idx[:, None]       # (mb, sub)
        lt_list.append(ring.psi_rev[:, m:].reshape(L, -1)[:, :m][:, g.reshape(-1)]
                       if False else ring.psi_rev[:, m + g.reshape(-1)])
        ls_list.append(ring.psi_rev_shoup[:, m + g.reshape(-1)])
    lt = np.concatenate(lt_list, axis=1)     # (L, sum(mb*sub)) = (L, <n)
    ls = np.concatenate(ls_list, axis=1)
    lth, ltl = split(lt)
    lsh, lsl = split(ls)

    q = np.stack([(np.asarray(ring.q).reshape(-1) >> np.uint64(32)).astype(np.uint32),
                  (np.asarray(ring.q).reshape(-1) & np.uint64(0xFFFFFFFF)).astype(np.uint32)],
                 axis=1)                      # (L, 2)
    return (logn, L, sub, twh, twl, tsh, tsl, lth, ltl, lsh, lsl, q)


_RING_STASH: dict = {}


def _stash(ring):
    key = (tuple(ring.moduli), ring.n)
    _RING_STASH[key] = (ring,)
    return key


@functools.partial(jax.jit, static_argnames=('logn', 'L', 'rows_per_block'))
def _launch(xh, xl, twh, twl, tsh, tsl, lth, ltl, lsh, lsl, q, *,
            logn, L, rows_per_block):
    """Two pallas_calls (phase 1 / transpose+phase 2): one extra HBM round
    trip, but each kernel stays below the stage count where the real-chip
    Mosaic lowering blows its recursion budget."""
    n = 1 << logn
    total_rows = xh.shape[0] // L            # per limb
    grid = (L, total_rows // rows_per_block)
    R = rows_per_block
    lt_n = lth.shape[-1]
    twh, twl, tsh, tsl = (a.reshape(L, 1, n) for a in (twh, twl, tsh, tsl))
    lth, ltl, lsh, lsl = (a.reshape(L, 1, lt_n) for a in (lth, ltl, lsh, lsl))
    interp = jax.default_backend() == 'cpu'

    # Index maps must stay strictly int32 under jax_enable_x64: a traced
    # `//` promotes to int64 and Mosaic's int64->int32 convert lowering
    # self-recurses (lowering.py _convert_helper re-emits the cast), and
    # int literals trace as i64 constants that fail func.return
    # legalization.
    def _im(*vals):
        return tuple(jnp.int32(v) for v in vals)

    def row_spec():
        blocks_per_limb = total_rows // R
        return pl.BlockSpec((R, n),
                            lambda l, r: _im(l * blocks_per_limb + r, 0),
                            memory_space=pltpu.VMEM)

    def tbl_spec(width):
        return pl.BlockSpec((1, 1, width), lambda l, r: _im(l, 0, 0),
                            memory_space=pltpu.VMEM)

    smem_q = pl.BlockSpec((L, 2), lambda l, r: _im(0, 0),
                          memory_space=pltpu.SMEM)

    # the unrolled stages keep many (R, n) temporaries live; allow the
    # kernel the chip's real VMEM instead of the 16M scoped default
    cparams = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024,
                                   dimension_semantics=('arbitrary',
                                                        'arbitrary'))
    mh, ml = pl.pallas_call(
        functools.partial(_phase1_kernel, logn, R),
        interpret=interp,
        compiler_params=cparams,
        grid=grid,
        in_specs=[smem_q, row_spec(), row_spec(),
                  tbl_spec(n), tbl_spec(n), tbl_spec(n), tbl_spec(n)],
        out_specs=[row_spec(), row_spec()],
        out_shape=[jax.ShapeDtypeStruct(xh.shape, jnp.uint32)] * 2,
    )(q, xh, xl, twh, twl, tsh, tsl)

    out_h, out_l = pl.pallas_call(
        functools.partial(_phase2_kernel, logn, R),
        interpret=interp,
        compiler_params=cparams,
        grid=grid,
        in_specs=[smem_q, row_spec(), row_spec(),
                  tbl_spec(lt_n), tbl_spec(lt_n), tbl_spec(lt_n), tbl_spec(lt_n)],
        out_specs=[row_spec(), row_spec()],
        out_shape=[jax.ShapeDtypeStruct(xh.shape, jnp.uint32)] * 2,
    )(q, mh, ml, lth, ltl, lsh, lsl)
    return out_h, out_l


def _ntt_fused_impl(x, ring, rows_per_block: int = 8):
    """Drop-in forward NTT over (..., L, n) u64, bit-identical to
    core.ntt.ntt. Rows are regrouped limb-major for per-limb tables."""
    key = _stash(ring)
    (logn, L, sub, twh, twl, tsh, tsl, lth, ltl, lsh, lsl, q) = _tables(key)
    n = 1 << logn
    shape = x.shape
    batch = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    # (..., L, n) -> (L, batch, n) rows grouped by limb
    xr = jnp.moveaxis(x.reshape(batch, L, n), 1, 0).reshape(L * batch, n)
    pad_rows = (-batch) % rows_per_block
    if pad_rows:
        xr = xr.reshape(L, batch, n)
        xr = jnp.pad(xr, ((0, 0), (0, pad_rows), (0, 0))).reshape(-1, n)
        batch_p = batch + pad_rows
    else:
        batch_p = batch
    xh = (xr >> jnp.uint64(32)).astype(jnp.uint32)
    xl = (xr & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    oh, ol = _launch(xh, xl, jnp.asarray(twh), jnp.asarray(twl),
                     jnp.asarray(tsh), jnp.asarray(tsl), jnp.asarray(lth),
                     jnp.asarray(ltl), jnp.asarray(lsh), jnp.asarray(lsl),
                     jnp.asarray(q), logn=logn, L=L,
                     rows_per_block=rows_per_block)
    out = oh.astype(jnp.uint64) << jnp.uint64(32) | ol.astype(jnp.uint64)
    # undo the kernel's tile transpose: (rows, LANES, sub) -> (rows, sub, LANES)
    out = out.reshape(-1, LANES, sub).swapaxes(1, 2).reshape(-1, n)
    out = out.reshape(L, batch_p, n)[:, :batch]
    return jnp.moveaxis(out, 0, 1).reshape(shape)


# ---------------------------------------------------------------------------
# inverse transform (Gentleman–Sande; mirrors core/ntt.py intt bit-exactly)
# ---------------------------------------------------------------------------

def _itables(ring_key):
    """Inverse twiddles: phase-A (sub-LANES stages, transposed-tile layout,
    consumption order t = 1..LANES/2) and phase-B (t >= LANES, natural
    layout), plus per-limb (q, n^-1, shoup(n^-1)) hi/lo for SMEM."""
    ring, = _RING_STASH[ring_key]
    n = ring.n
    L = len(ring.moduli)
    sub = n // LANES
    logn = n.bit_length() - 1

    def split(a):
        a = np.ascontiguousarray(a, dtype=np.uint64)
        return ((a >> np.uint64(32)).astype(np.uint32),
                (a & np.uint64(0xFFFFFFFF)).astype(np.uint32))

    iwh, iwl = split(ring.psi_inv_rev)       # (L, n) — phase B
    ish, isl = split(ring.psi_inv_rev_shoup)

    lt_list, ls_list = [], []
    t = 1
    while t < LANES:
        m = n // (2 * t)
        mb = LANES // (2 * t)
        a_idx = np.arange(sub)
        gb_idx = np.arange(mb)
        g = a_idx[None, :] * mb + gb_idx[:, None]       # (mb, sub)
        lt_list.append(ring.psi_inv_rev[:, m + g.reshape(-1)])
        ls_list.append(ring.psi_inv_rev_shoup[:, m + g.reshape(-1)])
        t *= 2
    lt = np.concatenate(lt_list, axis=1)
    ls = np.concatenate(ls_list, axis=1)
    ilth, iltl = split(lt)
    ilsh, ilsl = split(ls)

    def cols(a):
        a = np.asarray(a, dtype=np.uint64).reshape(-1)
        return ((a >> np.uint64(32)).astype(np.uint32),
                (a & np.uint64(0xFFFFFFFF)).astype(np.uint32))

    qh, ql = cols(ring.q)
    nih, nil = cols(ring.n_inv)
    nsh, nsl = cols(ring.n_inv_shoup)
    qn = np.stack([qh, ql, nih, nil, nsh, nsl], axis=1)  # (L, 6)
    return (logn, L, sub, iwh, iwl, ish, isl, ilth, iltl, ilsh, ilsl, qn)


def _iphase_a_kernel(logn, rows, qn_ref, xh_ref, xl_ref, lth_ref, ltl_ref,
                     lsh_ref, lsl_ref, oh_ref, ol_ref):
    """GS stages t = 1..LANES/2 on pre-transposed tiles. Both tile
    transposes live OUTSIDE the kernel (host u64 pre-transpose + u32-plane
    transpose between phases): in-kernel Mosaic relayouts measured ~3x
    slower than the XLA transpose."""
    n = 1 << logn
    sub = n // LANES
    limb = pl.program_id(0)
    qh = qn_ref[limb, 0]
    ql = qn_ref[limb, 1]
    vh = xh_ref[...].reshape(rows, LANES, sub)
    vl = xl_ref[...].reshape(rows, LANES, sub)
    off = 0
    tb = 1
    while tb < LANES:
        mb = LANES // (2 * tb)
        sh5 = (rows, mb, 2, tb, sub)
        ph = vh.reshape(sh5)
        plv = vl.reshape(sh5)
        cnt = mb * sub
        wh = lth_ref[0, 0, off:off + cnt].reshape(1, mb, 1, sub)
        wl = ltl_ref[0, 0, off:off + cnt].reshape(1, mb, 1, sub)
        swh = lsh_ref[0, 0, off:off + cnt].reshape(1, mb, 1, sub)
        swl = lsl_ref[0, 0, off:off + cnt].reshape(1, mb, 1, sub)
        uh, ul = ph[:, :, 0], plv[:, :, 0]
        bh, bl = ph[:, :, 1], plv[:, :, 1]
        s_h, s_l = _addmod64(uh, ul, bh, bl, qh, ql)
        dh, dl = _submod64(uh, ul, bh, bl, qh, ql)
        d_h, d_l = _shoup_mul64(dh, dl, wh, wl, swh, swl, qh, ql)
        vh = jnp.stack([s_h, d_h], axis=2).reshape(rows, LANES, sub)
        vl = jnp.stack([s_l, d_l], axis=2).reshape(rows, LANES, sub)
        off += cnt
        tb *= 2
    oh_ref[...] = vh.reshape(rows, n)
    ol_ref[...] = vl.reshape(rows, n)


def _iphase_b_kernel(logn, rows, qn_ref, xh_ref, xl_ref, iwh_ref, iwl_ref,
                     ish_ref, isl_ref, oh_ref, ol_ref):
    """GS stages t = LANES..n/2 (natural layout) + the n^-1 fold."""
    n = 1 << logn
    limb = pl.program_id(0)
    qh = qn_ref[limb, 0]
    ql = qn_ref[limb, 1]
    vh = xh_ref[...]
    vl = xl_ref[...]
    t = LANES
    while t < n:
        m = n // (2 * t)
        sh4 = (rows, m, 2, t)
        ph = vh.reshape(sh4)
        plv = vl.reshape(sh4)
        wh = iwh_ref[0, 0, m:2 * m].reshape(1, m, 1)
        wl = iwl_ref[0, 0, m:2 * m].reshape(1, m, 1)
        swh = ish_ref[0, 0, m:2 * m].reshape(1, m, 1)
        swl = isl_ref[0, 0, m:2 * m].reshape(1, m, 1)
        uh, ul = ph[:, :, 0], plv[:, :, 0]
        bh, bl = ph[:, :, 1], plv[:, :, 1]
        s_h, s_l = _addmod64(uh, ul, bh, bl, qh, ql)
        dh, dl = _submod64(uh, ul, bh, bl, qh, ql)
        d_h, d_l = _shoup_mul64(dh, dl, wh, wl, swh, swl, qh, ql)
        vh = jnp.stack([s_h, d_h], axis=2).reshape(rows, n)
        vl = jnp.stack([s_l, d_l], axis=2).reshape(rows, n)
        t *= 2
    nih = qn_ref[limb, 2]
    nil = qn_ref[limb, 3]
    nsh = qn_ref[limb, 4]
    nsl = qn_ref[limb, 5]
    vh, vl = _shoup_mul64(vh, vl, nih, nil, nsh, nsl, qh, ql)
    oh_ref[...] = vh
    ol_ref[...] = vl


@functools.partial(jax.jit, static_argnames=('logn', 'L', 'rows_per_block'))
def _ilaunch(xh, xl, iwh, iwl, ish, isl, ilth, iltl, ilsh, ilsl, qn, *,
             logn, L, rows_per_block):
    n = 1 << logn
    total_rows = xh.shape[0] // L
    grid = (L, total_rows // rows_per_block)
    R = rows_per_block
    lt_n = ilth.shape[-1]
    iwh, iwl, ish, isl = (a.reshape(L, 1, n) for a in (iwh, iwl, ish, isl))
    ilth, iltl, ilsh, ilsl = (a.reshape(L, 1, lt_n)
                              for a in (ilth, iltl, ilsh, ilsl))
    interp = jax.default_backend() == 'cpu'

    def _im(*vals):
        return tuple(jnp.int32(v) for v in vals)

    def row_spec():
        blocks_per_limb = total_rows // R
        return pl.BlockSpec((R, n),
                            lambda l, r: _im(l * blocks_per_limb + r, 0),
                            memory_space=pltpu.VMEM)

    def tbl_spec(width):
        return pl.BlockSpec((1, 1, width), lambda l, r: _im(l, 0, 0),
                            memory_space=pltpu.VMEM)

    smem_qn = pl.BlockSpec((L, 6), lambda l, r: _im(0, 0),
                           memory_space=pltpu.SMEM)
    cparams = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024,
                                   dimension_semantics=('arbitrary',
                                                        'arbitrary'))
    mh, ml = pl.pallas_call(
        functools.partial(_iphase_a_kernel, logn, R),
        interpret=interp,
        compiler_params=cparams,
        grid=grid,
        in_specs=[smem_qn, row_spec(), row_spec(),
                  tbl_spec(lt_n), tbl_spec(lt_n), tbl_spec(lt_n), tbl_spec(lt_n)],
        out_specs=[row_spec(), row_spec()],
        out_shape=[jax.ShapeDtypeStruct(xh.shape, jnp.uint32)] * 2,
    )(qn, xh, xl, ilth, iltl, ilsh, ilsl)
    # un-transpose between phases in XLA (u32 planes)
    sub = n // LANES
    mh = mh.reshape(-1, LANES, sub).swapaxes(1, 2).reshape(mh.shape[0], n)
    ml = ml.reshape(-1, LANES, sub).swapaxes(1, 2).reshape(ml.shape[0], n)

    out_h, out_l = pl.pallas_call(
        functools.partial(_iphase_b_kernel, logn, R),
        interpret=interp,
        compiler_params=cparams,
        grid=grid,
        in_specs=[smem_qn, row_spec(), row_spec(),
                  tbl_spec(n), tbl_spec(n), tbl_spec(n), tbl_spec(n)],
        out_specs=[row_spec(), row_spec()],
        out_shape=[jax.ShapeDtypeStruct(xh.shape, jnp.uint32)] * 2,
    )(qn, mh, ml, iwh, iwl, ish, isl)
    return out_h, out_l


def _intt_fused_impl(x, ring, rows_per_block: int = 8):
    """Drop-in inverse NTT over (..., L, n) u64, bit-identical to
    core.ntt.intt (input bit-reversed, output natural, scaled by n^-1)."""
    key = _stash(ring)
    (logn, L, sub, iwh, iwl, ish, isl, ilth, iltl, ilsh, ilsl, qn) = \
        _itables(key)
    n = 1 << logn
    shape = x.shape
    batch = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    xr = jnp.moveaxis(x.reshape(batch, L, n), 1, 0).reshape(L * batch, n)
    pad_rows = (-batch) % rows_per_block
    if pad_rows:
        xr = xr.reshape(L, batch, n)
        xr = jnp.pad(xr, ((0, 0), (0, pad_rows), (0, 0))).reshape(-1, n)
        batch_p = batch + pad_rows
    else:
        batch_p = batch
    # pre-transpose tiles for the sub-LANES phase (see _iphase_a_kernel)
    xr = xr.reshape(-1, sub, LANES).swapaxes(1, 2).reshape(-1, n)
    xh = (xr >> jnp.uint64(32)).astype(jnp.uint32)
    xl = (xr & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    oh, ol = _ilaunch(xh, xl, jnp.asarray(iwh), jnp.asarray(iwl),
                      jnp.asarray(ish), jnp.asarray(isl), jnp.asarray(ilth),
                      jnp.asarray(iltl), jnp.asarray(ilsh), jnp.asarray(ilsl),
                      jnp.asarray(qn), logn=logn, L=L,
                      rows_per_block=rows_per_block)
    out = oh.astype(jnp.uint64) << jnp.uint64(32) | ol.astype(jnp.uint64)
    out = out.reshape(L, batch_p, n)[:, :batch]
    return jnp.moveaxis(out, 0, 1).reshape(shape)


# ---------------------------------------------------------------------------
# vmap-aware public entries
# ---------------------------------------------------------------------------
# jax.vmap would call the kernel once per batch element with batch=1 —
# padded to rows_per_block, i.e. up to 8x redundant work (measured 5.7x
# end-to-end regression under the batched bench). The custom_vmap rule
# instead collapses the mapped axis into the kernels' native leading batch
# dims.

_VMAP_CACHE: dict = {}


def _vmap_entry(ring, rows_per_block, impl, tag):
    key = (tuple(ring.moduli), ring.n, rows_per_block, tag)
    f = _VMAP_CACHE.get(key)
    if f is None:
        @jax.custom_batching.custom_vmap
        def f(x):
            return impl(x, ring, rows_per_block)

        @f.def_vmap
        def _rule(axis_size, in_batched, xb):
            return impl(xb, ring, rows_per_block), True

        _VMAP_CACHE[key] = f
    return f


def ntt_fused(x, ring, rows_per_block: int = 8):
    """Drop-in forward NTT over (..., L, n) u64 (vmap-collapsing)."""
    return _vmap_entry(ring, rows_per_block, _ntt_fused_impl, 'fwd')(x)


def intt_fused(x, ring, rows_per_block: int = 8):
    """Drop-in inverse NTT over (..., L, n) u64 (vmap-collapsing;
    bit-reversal-conjugated descending-distance kernels — 1.5x the GS
    formulation on chip)."""
    return _vmap_entry(ring, rows_per_block, _intt_conj_impl, 'cinv')(x)




# ---------------------------------------------------------------------------
# fast inverse: bit-reversal-conjugated GS with DESCENDING distances.
# Measured: Mosaic compiles stage sequences with shrinking butterfly
# distances ~5x faster than growing ones, and the GS/CT butterfly order
# itself is within 7%. The natural GS inverse ascends (t = 1 → n/2), so we
# run P∘GS∘P instead: pairs at descending physical distances, twiddles
# index-permuted per (group, lane) — verified exactly against core intt
# (x = P(conj(P(X))), conj stage T uses W[g,i] = ψ^-1_rev[m_core +
# (brv(g·2T+i) >> (k+1))], k = logn-1-log2(T)).
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _ctables(ring_key):
    ring, = _RING_STASH[ring_key]
    n = ring.n
    L = len(ring.moduli)
    logn = n.bit_length() - 1
    sub = n // LANES

    def split(a):
        a = np.ascontiguousarray(a, dtype=np.uint64)
        return ((a >> np.uint64(32)).astype(np.uint32),
                (a & np.uint64(0xFFFFFFFF)).astype(np.uint32))

    # brv table once
    brv = np.zeros(n, dtype=np.int64)
    for bit in range(logn):
        brv |= ((np.arange(n) >> bit) & 1) << (logn - 1 - bit)

    tinv = np.asarray(ring.psi_inv_rev)            # (L, n)
    tinv_s = np.asarray(ring.psi_inv_rev_shoup)

    def stage_idx(T, transposed):
        T = int(T)
        k = logn - 1 - (T.bit_length() - 1)        # core stage t = 2^k
        m_core = n >> (k + 1)
        if not transposed:
            m = n // (2 * T)
            p = (np.arange(m)[:, None] * 2 * T +
                 np.arange(T)[None, :]).reshape(-1)
        else:
            mb = LANES // (2 * T)
            p = (np.arange(mb)[:, None, None] * 2 * T +
                 np.arange(T)[None, :, None] +
                 np.arange(sub)[None, None, :] * LANES).reshape(-1)
        return m_core + (brv[p] >> (k + 1))

    idx1 = np.concatenate([stage_idx(T, False)
                           for T in (1 << np.arange(logn - 1, 6, -1))])
    idx2 = np.concatenate([stage_idx(T, True)
                           for T in (1 << np.arange(6, -1, -1))])
    w1h, w1l = split(tinv[:, idx1])
    s1h, s1l = split(tinv_s[:, idx1])
    w2h, w2l = split(tinv[:, idx2])
    s2h, s2l = split(tinv_s[:, idx2])

    def cols(a):
        a = np.asarray(a, dtype=np.uint64).reshape(-1)
        return ((a >> np.uint64(32)).astype(np.uint32),
                (a & np.uint64(0xFFFFFFFF)).astype(np.uint32))

    qh, ql = cols(ring.q)
    nih, nil = cols(ring.n_inv)
    nsh, nsl = cols(ring.n_inv_shoup)
    qn = np.stack([qh, ql, nih, nil, nsh, nsl], axis=1)   # (L, 6)
    return (logn, L, sub, w1h, w1l, s1h, s1l, w2h, w2l, s2h, s2l, qn)


def _cinv1_kernel(logn, rows, qn_ref, xh_ref, xl_ref, wh_ref, wl_ref,
                  sh_ref, sl_ref, oh_ref, ol_ref):
    """Conjugated-GS stages, distances n/2 .. LANES (natural layout)."""
    n = 1 << logn
    limb = pl.program_id(0)
    qh = qn_ref[limb, 0]
    ql = qn_ref[limb, 1]
    vh = xh_ref[...]
    vl = xl_ref[...]
    off = 0
    t = n
    while t > LANES:
        t //= 2
        m = n // (2 * t)
        sh4 = (rows, m, 2, t)
        ph = vh.reshape(sh4)
        plv = vl.reshape(sh4)
        cnt = m * t
        wh = wh_ref[0, 0, off:off + cnt].reshape(1, m, t)
        wl = wl_ref[0, 0, off:off + cnt].reshape(1, m, t)
        swh = sh_ref[0, 0, off:off + cnt].reshape(1, m, t)
        swl = sl_ref[0, 0, off:off + cnt].reshape(1, m, t)
        uh, ul = ph[:, :, 0], plv[:, :, 0]
        bh, bl = ph[:, :, 1], plv[:, :, 1]
        s_h, s_l = _addmod64(uh, ul, bh, bl, qh, ql)
        dh, dl = _submod64(uh, ul, bh, bl, qh, ql)
        d_h, d_l = _shoup_mul64(dh, dl, wh, wl, swh, swl, qh, ql)
        vh = jnp.stack([s_h, d_h], axis=2).reshape(rows, n)
        vl = jnp.stack([s_l, d_l], axis=2).reshape(rows, n)
        off += cnt
    oh_ref[...] = vh
    ol_ref[...] = vl


def _cinv2_kernel(logn, rows, qn_ref, xh_ref, xl_ref, wh_ref, wl_ref,
                  sh_ref, sl_ref, oh_ref, ol_ref):
    """Tile transpose + conjugated-GS stages LANES/2 .. 1, then n^-1."""
    n = 1 << logn
    sub = n // LANES
    limb = pl.program_id(0)
    qh = qn_ref[limb, 0]
    ql = qn_ref[limb, 1]
    vh = xh_ref[...].reshape(rows, sub, LANES).swapaxes(1, 2)
    vl = xl_ref[...].reshape(rows, sub, LANES).swapaxes(1, 2)
    off = 0
    tb = LANES
    while tb > 1:
        tb //= 2
        mb = LANES // (2 * tb)
        sh5 = (rows, mb, 2, tb, sub)
        ph = vh.reshape(sh5)
        plv = vl.reshape(sh5)
        cnt = mb * tb * sub
        wh = wh_ref[0, 0, off:off + cnt].reshape(1, mb, tb, sub)
        wl = wl_ref[0, 0, off:off + cnt].reshape(1, mb, tb, sub)
        swh = sh_ref[0, 0, off:off + cnt].reshape(1, mb, tb, sub)
        swl = sl_ref[0, 0, off:off + cnt].reshape(1, mb, tb, sub)
        uh, ul = ph[:, :, 0], plv[:, :, 0]
        bh, bl = ph[:, :, 1], plv[:, :, 1]
        s_h, s_l = _addmod64(uh, ul, bh, bl, qh, ql)
        dh, dl = _submod64(uh, ul, bh, bl, qh, ql)
        d_h, d_l = _shoup_mul64(dh, dl, wh, wl, swh, swl, qh, ql)
        vh = jnp.stack([s_h, d_h], axis=2).reshape(rows, LANES, sub)
        vl = jnp.stack([s_l, d_l], axis=2).reshape(rows, LANES, sub)
        off += cnt
    nih = qn_ref[limb, 2]
    nil = qn_ref[limb, 3]
    nsh = qn_ref[limb, 4]
    nsl = qn_ref[limb, 5]
    vh, vl = _shoup_mul64(vh, vl, nih, nil, nsh, nsl, qh, ql)
    oh_ref[...] = vh.reshape(rows, n)
    ol_ref[...] = vl.reshape(rows, n)


@functools.partial(jax.jit, static_argnames=('logn', 'L', 'rows_per_block'))
def _claunch(xh, xl, w1h, w1l, s1h, s1l, w2h, w2l, s2h, s2l, qn, *,
             logn, L, rows_per_block):
    n = 1 << logn
    total_rows = xh.shape[0] // L
    grid = (L, total_rows // rows_per_block)
    R = rows_per_block
    n1 = w1h.shape[-1]
    n2 = w2h.shape[-1]
    w1h, w1l, s1h, s1l = (a.reshape(L, 1, n1) for a in (w1h, w1l, s1h, s1l))
    w2h, w2l, s2h, s2l = (a.reshape(L, 1, n2) for a in (w2h, w2l, s2h, s2l))
    interp = jax.default_backend() == 'cpu'

    def _im(*vals):
        return tuple(jnp.int32(v) for v in vals)

    def row_spec():
        bpl = total_rows // R
        return pl.BlockSpec((R, n), lambda l, r: _im(l * bpl + r, 0),
                            memory_space=pltpu.VMEM)

    def tbl_spec(width):
        return pl.BlockSpec((1, 1, width), lambda l, r: _im(l, 0, 0),
                            memory_space=pltpu.VMEM)

    smem_qn = pl.BlockSpec((L, 6), lambda l, r: _im(0, 0),
                           memory_space=pltpu.SMEM)
    cparams = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024,
                                   dimension_semantics=('arbitrary',
                                                        'arbitrary'))
    mh, ml = pl.pallas_call(
        functools.partial(_cinv1_kernel, logn, R),
        interpret=interp,
        compiler_params=cparams,
        grid=grid,
        in_specs=[smem_qn, row_spec(), row_spec(),
                  tbl_spec(n1), tbl_spec(n1), tbl_spec(n1), tbl_spec(n1)],
        out_specs=[row_spec(), row_spec()],
        out_shape=[jax.ShapeDtypeStruct(xh.shape, jnp.uint32)] * 2,
    )(qn, xh, xl, w1h, w1l, s1h, s1l)
    oh, ol = pl.pallas_call(
        functools.partial(_cinv2_kernel, logn, R),
        interpret=interp,
        compiler_params=cparams,
        grid=grid,
        in_specs=[smem_qn, row_spec(), row_spec(),
                  tbl_spec(n2), tbl_spec(n2), tbl_spec(n2), tbl_spec(n2)],
        out_specs=[row_spec(), row_spec()],
        out_shape=[jax.ShapeDtypeStruct(xh.shape, jnp.uint32)] * 2,
    )(qn, mh, ml, w2h, w2l, s2h, s2l)
    return oh, ol


@functools.lru_cache(maxsize=None)
def _brv_perm(n: int):
    """Axis permutations realizing brv(a·(n/128) + b) = brv_h(b)·128 +
    brv_7(a) for the two-axis tile view."""
    sub = n // LANES
    h = sub.bit_length() - 1

    def brv(x, bits):
        return int(format(x, f'0{bits}b')[::-1], 2) if bits else 0

    p7 = np.array([brv(i, 7) for i in range(LANES)])
    ph = np.array([brv(i, h) for i in range(sub)])
    return p7, ph


def _brv_apply(x, n):
    """Bit-reversal permutation of the last axis, as ONE transpose: brv
    reverses the bit-axes, so view the axis as (2,)*logn and reverse the
    axis order (XLA lowers this as a tiled relayout, far cheaper than the
    equivalent gathers)."""
    logn = n.bit_length() - 1
    lead = x.shape[:-1]
    k = len(lead)
    x = x.reshape(*lead, *((2,) * logn))
    perm = tuple(range(k)) + tuple(range(k + logn - 1, k - 1, -1))
    return x.transpose(perm).reshape(*lead, n)


def _intt_conj_impl(x, ring, rows_per_block: int = 8):
    """Inverse NTT via bit-reversal conjugation — bit-identical to
    core.ntt.intt, descending-distance kernels."""
    key = _stash(ring)
    (logn, L, sub, w1h, w1l, s1h, s1l, w2h, w2l, s2h, s2l, qn) = \
        _ctables(key)
    n = 1 << logn
    shape = x.shape
    batch = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    xr = jnp.moveaxis(x.reshape(batch, L, n), 1, 0).reshape(L * batch, n)
    xr = _brv_apply(xr, n)                       # P
    pad_rows = (-batch) % rows_per_block
    if pad_rows:
        xr = xr.reshape(L, batch, n)
        xr = jnp.pad(xr, ((0, 0), (0, pad_rows), (0, 0))).reshape(-1, n)
        batch_p = batch + pad_rows
    else:
        batch_p = batch
    xh = (xr >> jnp.uint64(32)).astype(jnp.uint32)
    xl = (xr & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    oh, ol = _claunch(xh, xl, jnp.asarray(w1h), jnp.asarray(w1l),
                      jnp.asarray(s1h), jnp.asarray(s1l), jnp.asarray(w2h),
                      jnp.asarray(w2l), jnp.asarray(s2h), jnp.asarray(s2l),
                      jnp.asarray(qn), logn=logn, L=L,
                      rows_per_block=rows_per_block)
    out = oh.astype(jnp.uint64) << jnp.uint64(32) | ol.astype(jnp.uint64)
    out = out.reshape(-1, LANES, sub).swapaxes(1, 2).reshape(-1, n)
    out = _brv_apply(out, n)                     # P again
    out = out.reshape(L, batch_p, n)[:, :batch]
    return jnp.moveaxis(out, 0, 1).reshape(shape)
