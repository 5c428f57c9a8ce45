"""Fused Pallas NTT for 64-bit words via u32 (hi, lo) planes — fold idiom.

The u64 twin of ops/ntt_pallas32.py: one kernel per direction runs ALL
butterfly stages with the rows resident in VMEM, every stage expressed
with the chip-validated 2D-FOLD idiom (last-axis halves + concatenate —
~7x faster under Mosaic than the reshape+stack butterflies used by the
round-1 kernels in ops/ntt_pallas.py), and every stage's twiddles
PRE-EXPANDED host-side to their exact broadcast shape.

Values are u64 split OUTSIDE the kernel into two u32 planes (Mosaic traps
on i64); each 64-bit modmul is ~24 native multiplies via the 16-bit-digit
Shoup primitives shared with ops/ntt_pallas.py. The split/merge costs two
extra HBM passes per transform (~0.3 us/limb-row) — small against the
XLA path's 16.5 us/limb-row compute cost at the bench shapes.

Forward: CT, natural -> bit-reversed, distances n/2..128 in the natural
layout, one in-VMEM tile transpose, distances 64..1 as lane-block folds,
un-transpose in VMEM. Inverse: plain GS, bit-reversed -> natural,
ASCENDING distances (the fold idiom removes the ascending-sequence
penalty that forced round 1's bit-reversal-conjugated formulation).

Bit-exactness vs core/ntt.py is asserted by tests/test_ntt_pallas.py
(fold-idiom entries); the transform contract (negacyclic, psi_rev tables,
bit-reversed evaluation order) replaces the reference's Lattigo/HEonGPU
NTT kernels (SURVEY.md §2.5).
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ntt_pallas import (_addmod64, _shoup_mul64, _submod64)

LANES = 128
_U64 = np.uint64
_M32 = np.uint64(0xFFFFFFFF)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _fwd_kernel(logn, rows, q_ref, xh_ref, xl_ref, *refs):
    """refs = (wh, wl, sh, sl) per stage, then (oh_ref, ol_ref)."""
    n = 1 << logn
    sub = n // LANES
    limb = pl.program_id(0)
    qh = q_ref[limb, 0]
    ql = q_ref[limb, 1]
    vh = xh_ref[...]
    vl = xl_ref[...]
    si = 0

    def stage(vh, vl, m, width, si):
        wh = refs[4 * si][...]
        wl = refs[4 * si + 1][...]
        sh = refs[4 * si + 2][...]
        sl = refs[4 * si + 3][...]
        ph = vh.reshape(rows, m, 2 * width)
        plo = vl.reshape(rows, m, 2 * width)
        uh, ul = ph[..., :width], plo[..., :width]
        bh, bl = _shoup_mul64(ph[..., width:], plo[..., width:],
                              wh, wl, sh, sl, qh, ql)
        ah, al = _addmod64(uh, ul, bh, bl, qh, ql)
        dh, dl = _submod64(uh, ul, bh, bl, qh, ql)
        return (jnp.concatenate([ah, dh], axis=-1),
                jnp.concatenate([al, dl], axis=-1))

    m = 1
    t = n
    while t > LANES:
        t //= 2
        vh, vl = stage(vh, vl, m, t, si)
        vh = vh.reshape(rows, n)
        vl = vl.reshape(rows, n)
        m *= 2
        si += 1
    vh = vh.reshape(rows, sub, LANES).swapaxes(1, 2)
    vl = vl.reshape(rows, sub, LANES).swapaxes(1, 2)
    tb = LANES
    while tb > 1:
        tb //= 2
        mb = LANES // (2 * tb)
        vh, vl = stage(vh.reshape(rows, mb, 2 * tb * sub),
                       vl.reshape(rows, mb, 2 * tb * sub), mb, tb * sub, si)
        si += 1
    vh = vh.reshape(rows, LANES, sub).swapaxes(1, 2)
    vl = vl.reshape(rows, LANES, sub).swapaxes(1, 2)
    refs[-2][...] = vh.reshape(rows, n)
    refs[-1][...] = vl.reshape(rows, n)


def _inv_kernel(logn, rows, qn_ref, xh_ref, xl_ref, *refs):
    """Plain GS inverse, ascending distances, then the n^-1 scale.
    qn_ref rows: (qh, ql, nih, nil, nsh, nsl)."""
    n = 1 << logn
    sub = n // LANES
    limb = pl.program_id(0)
    qh = qn_ref[limb, 0]
    ql = qn_ref[limb, 1]
    vh = xh_ref[...].reshape(rows, sub, LANES).swapaxes(1, 2)
    vl = xl_ref[...].reshape(rows, sub, LANES).swapaxes(1, 2)
    si = 0

    def stage(vh, vl, m, width, si):
        wh = refs[4 * si][...]
        wl = refs[4 * si + 1][...]
        sh = refs[4 * si + 2][...]
        sl = refs[4 * si + 3][...]
        ph = vh.reshape(rows, m, 2 * width)
        plo = vl.reshape(rows, m, 2 * width)
        uh, ul = ph[..., :width], plo[..., :width]
        bh, bl = ph[..., width:], plo[..., width:]
        ah, al = _addmod64(uh, ul, bh, bl, qh, ql)
        sh2, sl2 = _submod64(uh, ul, bh, bl, qh, ql)
        dh, dl = _shoup_mul64(sh2, sl2, wh, wl, sh, sl, qh, ql)
        return (jnp.concatenate([ah, dh], axis=-1),
                jnp.concatenate([al, dl], axis=-1))

    tb = 1
    while tb < LANES:
        mb = LANES // (2 * tb)
        vh, vl = stage(vh.reshape(rows, mb, 2 * tb * sub),
                       vl.reshape(rows, mb, 2 * tb * sub), mb, tb * sub, si)
        si += 1
        tb *= 2
    vh = vh.reshape(rows, LANES, sub).swapaxes(1, 2).reshape(rows, n)
    vl = vl.reshape(rows, LANES, sub).swapaxes(1, 2).reshape(rows, n)
    t = LANES
    while t < n:
        m = n // (2 * t)
        vh, vl = stage(vh, vl, m, t, si)
        vh = vh.reshape(rows, n)
        vl = vl.reshape(rows, n)
        si += 1
        t *= 2
    nih = qn_ref[limb, 2]
    nil = qn_ref[limb, 3]
    nsh = qn_ref[limb, 4]
    nsl = qn_ref[limb, 5]
    vh, vl = _shoup_mul64(vh, vl, nih, nil, nsh, nsl, qh, ql)
    refs[-2][...] = vh
    refs[-1][...] = vl


# ---------------------------------------------------------------------------
# host-side tables
# ---------------------------------------------------------------------------

_RING_STASH: dict = {}


def _stash(ring):
    key = (tuple(ring.moduli), ring.n)
    _RING_STASH[key] = (ring,)
    return key


def _fwd_plan(logn):
    n = 1 << logn
    plan = []
    t = n
    while t > LANES:
        t //= 2
        plan.append((n // (2 * t), t, False))
    tb = LANES
    while tb > 1:
        tb //= 2
        plan.append((LANES // (2 * tb), tb, True))
    return plan


def _inv_plan(logn):
    plan = []
    tb = 1
    while tb < LANES:
        plan.append((LANES // (2 * tb), tb, True))
        tb *= 2
    n = 1 << logn
    t = LANES
    while t < n:
        plan.append((n // (2 * t), t, False))
        t *= 2
    return plan


def _expand(tbl, logn, sub, plan):
    """Per-stage (L, m, width) expansions of a (L, n) u64 table, split into
    u32 (hi, lo) plane pairs."""
    n = 1 << logn
    out = []
    for m, t, transposed in plan:
        m_orig = n // (2 * t)
        if not transposed:
            idx = np.broadcast_to((m_orig + np.arange(m))[:, None], (m, t))
        else:
            blk = LANES // (2 * t)
            g = np.arange(m)[:, None, None]
            a = np.arange(sub)[None, None, :]
            idx = np.broadcast_to(m_orig + a * blk + g,
                                  (m, t, sub)).reshape(m, t * sub)
        w = tbl[:, idx]
        out.append((np.ascontiguousarray((w >> _U64(32)).astype(np.uint32)),
                    np.ascontiguousarray((w & _M32).astype(np.uint32))))
    return out


@functools.lru_cache(maxsize=None)
def _tables(ring_key):
    ring, = _RING_STASH[ring_key]
    n = ring.n
    L = len(ring.moduli)
    logn = n.bit_length() - 1
    sub = n // LANES
    plan = _fwd_plan(logn)
    tw = _expand(np.asarray(ring.psi_rev, dtype=_U64), logn, sub, plan)
    ts = _expand(np.asarray(ring.psi_rev_shoup, dtype=_U64), logn, sub, plan)
    stages = [(wh, wl, sh, sl) for (wh, wl), (sh, sl) in zip(tw, ts)]
    q = np.asarray(ring.q, dtype=_U64).reshape(L)
    smem = np.stack([(q >> _U64(32)).astype(np.uint32),
                     (q & _M32).astype(np.uint32)], axis=1)      # (L, 2)
    return (logn, L, sub, stages, smem)


@functools.lru_cache(maxsize=None)
def _itables(ring_key):
    ring, = _RING_STASH[ring_key]
    n = ring.n
    L = len(ring.moduli)
    logn = n.bit_length() - 1
    sub = n // LANES
    plan = _inv_plan(logn)
    tw = _expand(np.asarray(ring.psi_inv_rev, dtype=_U64), logn, sub, plan)
    ts = _expand(np.asarray(ring.psi_inv_rev_shoup, dtype=_U64), logn, sub,
                 plan)
    stages = [(wh, wl, sh, sl) for (wh, wl), (sh, sl) in zip(tw, ts)]
    q = np.asarray(ring.q, dtype=_U64).reshape(L)
    ni = np.asarray(ring.n_inv, dtype=_U64).reshape(L)
    ns = np.asarray(ring.n_inv_shoup, dtype=_U64).reshape(L)
    cols = []
    for a in (q, ni, ns):
        cols += [(a >> _U64(32)).astype(np.uint32), (a & _M32).astype(np.uint32)]
    smem = np.stack(cols, axis=1)                                # (L, 6)
    return (logn, L, sub, stages, smem)


# ---------------------------------------------------------------------------
# launcher
# ---------------------------------------------------------------------------

def _im(*vals):
    return tuple(jnp.int32(v) for v in vals)


_CPARAMS = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024,
                                dimension_semantics=('arbitrary',
                                                     'arbitrary'))


def _run(kernel, xh, xl, stage_tabs, smem_tab, *, logn, L, rows_per_block,
         smem_cols):
    n = 1 << logn
    total_rows = xh.shape[0] // L
    R = rows_per_block
    grid = (L, total_rows // R)
    bpl = total_rows // R

    row_spec = pl.BlockSpec((R, n), lambda l, r: _im(l * bpl + r, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((L, smem_cols), lambda l, r: _im(0, 0),
                        memory_space=pltpu.SMEM)
    tab_specs = []
    tab_args = []
    for tabs in stage_tabs:
        m, width = tabs[0].shape[1], tabs[0].shape[2]
        spec = pl.BlockSpec((1, m, width), lambda l, r: _im(l, 0, 0),
                            memory_space=pltpu.VMEM)
        tab_specs += [spec] * 4
        tab_args += list(tabs)

    interp = jax.default_backend() == 'cpu'
    shp = jax.ShapeDtypeStruct(xh.shape, jnp.uint32)
    f = pl.pallas_call(
        functools.partial(kernel, logn, R),
        interpret=interp,
        compiler_params=_CPARAMS,
        grid=grid,
        in_specs=[smem, row_spec, row_spec] + tab_specs,
        out_specs=(row_spec, row_spec),
        out_shape=(shp, shp),
    )
    return f(smem_tab, xh, xl, *tab_args)


# ---------------------------------------------------------------------------
# entries
# ---------------------------------------------------------------------------

def _regroup(x, L, n, rows_per_block):
    shape = x.shape
    batch = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    xr = jnp.moveaxis(x.reshape(batch, L, n), 1, 0)
    pad_rows = (-batch) % rows_per_block
    if pad_rows:
        xr = jnp.pad(xr, ((0, 0), (0, pad_rows), (0, 0)))
    return xr.reshape(-1, n), batch, batch + pad_rows, shape


def _impl(x, ring, rows_per_block, inverse):
    key = _stash(ring)
    logn, L, sub, stages, smem = (_itables if inverse else _tables)(key)
    n = 1 << logn
    xr, batch, batch_p, shape = _regroup(x, L, n, rows_per_block)
    xh = (xr >> _U64(32)).astype(jnp.uint32)
    xl = (xr & _M32).astype(jnp.uint32)
    oh, ol = _run(_inv_kernel if inverse else _fwd_kernel, xh, xl, stages,
                  smem, logn=logn, L=L, rows_per_block=rows_per_block,
                  smem_cols=6 if inverse else 2)
    out = (oh.astype(jnp.uint64) << _U64(32)) | ol.astype(jnp.uint64)
    out = out.reshape(L, batch_p, n)[:, :batch]
    return jnp.moveaxis(out, 0, 1).reshape(shape)


_VMAP_CACHE: dict = {}


def _vmap_entry(ring, rows_per_block, inverse):
    key = (tuple(ring.moduli), ring.n, rows_per_block, inverse)
    f = _VMAP_CACHE.get(key)
    if f is None:
        @jax.custom_batching.custom_vmap
        def f(x):
            return _impl(x, ring, rows_per_block, inverse)

        @f.def_vmap
        def _rule(axis_size, in_batched, xb):
            return _impl(xb, ring, rows_per_block, inverse), True

        _VMAP_CACHE[key] = f
    return f


def ntt_fused64(x, ring, rows_per_block: int = 8):
    """Forward NTT over (..., L, n) u64, bit-identical to core.ntt.ntt."""
    return _vmap_entry(ring, rows_per_block, False)(x)


def intt_fused64(x, ring, rows_per_block: int = 8):
    """Inverse NTT over (..., L, n) u64, bit-identical to core.ntt.intt."""
    return _vmap_entry(ring, rows_per_block, True)(x)
