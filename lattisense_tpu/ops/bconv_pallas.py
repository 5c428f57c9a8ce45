"""Fused Pallas FastBConv: the RNS basis-conversion inner sum in one
kernel, accumulating in VMEM.

Why: BasisConv.convert (core/rns.py) materializes the (..., T, L, n)
``terms`` tensor to HBM — measured as most of the non-NTT cost of BEHZ
multiplication (NOTES.md profile). This kernel reads the L source rows
once, keeps the (R, n) accumulator in VMEM, and writes T output rows:
HBM traffic drops from ~2·T·L·n words to (L + T)·n.

Math (identical to BasisConv.convert, reference analog
fastbconv/SmMRq pipeline of BEHZ): out[t] = Σ_l mont_mul(y[l], C[t, l])
mod d_t with C = [Q/q_l]_{d_t} in Montgomery form. Montgomery REDC on
u32 (hi, lo) pairs mirrors core/u64.py redc exactly, so results are
bit-identical.

Grid: (T, row-blocks); the per-(t, l) constants live in SMEM.
"""

import functools
import weakref

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ntt_pallas import (U32, _add64, _geq64, _mulhi64, _mullo64, _sub64)


def _redc64(hh, hl, lh, ll, qh, ql, pvh, pvl):
    """(hi·2^64 + lo)·2^-64 mod q on u32 pairs (core/u64.py redc)."""
    mh, ml = _mullo64(lh, ll, pvh, pvl)          # m = lo · pinv mod 2^64
    th, tl = _mulhi64(mh, ml, qh, ql)            # hi(m·q)
    sh, sl = _add64(hh, hl, th, tl)
    nz = ((lh | ll) != 0).astype(U32)
    sh, sl = _add64(sh, sl, jnp.zeros_like(nz), nz)
    oh, ol = _sub64(sh, sl, qh, ql)
    ge = _geq64(sh, sl, qh, ql)
    return jnp.where(ge, oh, sh), jnp.where(ge, ol, sl)


def _addmod64_(ah, al, bh, bl, qh, ql):
    sh, sl = _add64(ah, al, bh, bl)
    oh, ol = _sub64(sh, sl, qh, ql)
    ge = _geq64(sh, sl, qh, ql)
    return jnp.where(ge, oh, sh), jnp.where(ge, ol, sl)


def _mont_mul64(ah, al, bh, bl, qh, ql, pvh, pvl):
    hh, hl = _mulhi64(ah, al, bh, bl)
    lh, ll = _mullo64(ah, al, bh, bl)
    return _redc64(hh, hl, lh, ll, qh, ql, pvh, pvl)


def _bconv_kernel(T, L, qd_ref, ch_ref, cl_ref, yh_ref, yl_ref,
                  oh_ref, ol_ref):
    """One grid step per batch block: the (L, R, n) source block is read
    once and all T destination rows are produced from it (the earlier
    (T, batch) grid re-read the source once per destination limb)."""
    yh = [yh_ref[l] for l in range(L)]
    yl = [yl_ref[l] for l in range(L)]
    for t in range(T):
        qh = qd_ref[t, 0]
        ql = qd_ref[t, 1]
        pvh = qd_ref[t, 2]
        pvl = qd_ref[t, 3]
        acc_h = acc_l = None
        for l in range(L):
            ph_, pl_ = _mont_mul64(yh[l], yl[l], ch_ref[t, l], cl_ref[t, l],
                                   qh, ql, pvh, pvl)
            if acc_h is None:
                acc_h, acc_l = ph_, pl_
            else:
                acc_h, acc_l = _addmod64_(acc_h, acc_l, ph_, pl_, qh, ql)
        oh_ref[t] = acc_h
        ol_ref[t] = acc_l


@functools.partial(jax.jit, static_argnames=('L', 'T', 'rows_per_block'))
def _launch(yh, yl, ch, cl, qd, *, L, T, rows_per_block):
    """yh/yl: (L, B, n) u32; out: (T, B, n) u32 pair."""
    B, n = yh.shape[1], yh.shape[2]
    R = rows_per_block
    grid = (B // R,)
    interp = jax.default_backend() == 'cpu'

    def _im(*vals):
        return tuple(jnp.int32(v) for v in vals)

    src_spec = pl.BlockSpec((L, R, n), lambda r: _im(0, r, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((T, R, n), lambda r: _im(0, r, 0),
                            memory_space=pltpu.VMEM)
    smem = lambda w: pl.BlockSpec((T, w), lambda r: _im(0, 0),  # noqa: E731
                                  memory_space=pltpu.SMEM)
    cparams = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024,
                                   dimension_semantics=('arbitrary',))

    oh, ol = pl.pallas_call(
        functools.partial(_bconv_kernel, T, L),
        interpret=interp,
        compiler_params=cparams,
        grid=grid,
        in_specs=[smem(4), smem(L), smem(L), src_spec, src_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((T, B, n), jnp.uint32)] * 2,
    )(qd, ch, cl, yh, yl)
    return oh, ol


def _split64(a):
    a = jnp.asarray(a, dtype=jnp.uint64)
    return ((a >> jnp.uint64(32)).astype(jnp.uint32),
            (a & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32))


def _consts(conv):
    # WeakKeyDictionary: keyed by the BasisConv itself so a GC'd conv can
    # never alias a new object's id and serve stale constants.
    hit = _CONST_CACHE.get(conv)
    if hit is not None:
        return hit
    C = np.asarray(conv.qhat_dst_mont, dtype=np.uint64)          # (T, L)
    ch = (C >> np.uint64(32)).astype(np.uint32)
    cl = (C & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    dq = np.asarray(conv.dst_q, dtype=np.uint64).reshape(-1)
    pv = np.asarray(conv.dst_pinv, dtype=np.uint64).reshape(-1)
    qd = np.stack([(dq >> np.uint64(32)).astype(np.uint32),
                   (dq & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                   (pv >> np.uint64(32)).astype(np.uint32),
                   (pv & np.uint64(0xFFFFFFFF)).astype(np.uint32)], axis=1)
    out = (ch, cl, qd, C.shape[0], C.shape[1])
    _CONST_CACHE[conv] = out
    return out


_CONST_CACHE = weakref.WeakKeyDictionary()


def _bconv_raw_impl(y, ch, cl, qd, T, L, rows_per_block: int = 8):
    """Fused conversion from raw split constants: y (..., L, n) u64 →
    (..., T, n). ch/cl: (T, L) u32 Montgomery-form [Q/q_l]_{d_t} planes;
    qd: (T, 4) u32 [q_hi, q_lo, pinv_hi, pinv_lo].

    rows_per_block must be a multiple of 8 (Mosaic: second-to-last block
    dim divisible by 8)."""
    shape = y.shape
    n = shape[-1]
    batch = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    yb = jnp.moveaxis(y.reshape(batch, L, n), 1, 0)              # (L, B, n)
    pad = (-batch) % rows_per_block
    if pad:
        yb = jnp.pad(yb, ((0, 0), (0, pad), (0, 0)))
    yh, yl = _split64(yb)
    oh, ol = _launch(yh, yl, jnp.asarray(ch), jnp.asarray(cl),
                     jnp.asarray(qd), L=L, T=T,
                     rows_per_block=rows_per_block)
    out = oh.astype(jnp.uint64) << jnp.uint64(32) | ol.astype(jnp.uint64)
    out = out[:, :batch]                                         # (T, B, n)
    return jnp.moveaxis(out, 0, 1).reshape(*shape[:-2], T, n)


def bconv_convert_fused(y, conv, rows_per_block: int = 8):
    """Drop-in for BasisConv.convert on the jax path: y (..., L, n) u64
    decomposed residues → (..., T, n) u64, bit-identical."""
    ch, cl, qd, T, L = _consts(conv)
    return bconv_raw_fused(y, ch, cl, qd, T, L, rows_per_block)


# vmap-aware entry: collapse mapped axes into the kernel's leading batch
# dims instead of one padded batch=1 kernel call per element (see
# ops/ntt_pallas.py rationale).
_RAW_VMAP_CACHE: dict = {}


def _raw_vmap_entry(ch, cl, qd, T, L, rows_per_block):
    key = (ch.tobytes(), qd.tobytes(), T, L, rows_per_block)
    f = _RAW_VMAP_CACHE.get(key)
    if f is None:
        @jax.custom_batching.custom_vmap
        def f(y):
            return _bconv_raw_impl(y, ch, cl, qd, T, L, rows_per_block)

        @f.def_vmap
        def _rule(axis_size, in_batched, yb):
            return _bconv_raw_impl(yb, ch, cl, qd, T, L,
                                   rows_per_block), True

        _RAW_VMAP_CACHE[key] = f
    return f


def bconv_raw_fused(y, ch, cl, qd, T, L, rows_per_block: int = 8):
    """Fused conversion from raw split constants (vmap-collapsing): y
    (..., L, n) u64 → (..., T, n). See _bconv_raw_impl for shapes."""
    return _raw_vmap_entry(ch, cl, qd, T, L, rows_per_block)(y)


def split_consts(C, dst_q, dst_pinv):
    """Host-side split of (T, L) u64 Montgomery constants + (T,) moduli
    into the kernel's u32 planes (for callers with custom constants,
    e.g. the key-switch grouped mod-up)."""
    C = np.asarray(C, dtype=np.uint64)
    ch = (C >> np.uint64(32)).astype(np.uint32)
    cl = (C & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    dq = np.asarray(dst_q, dtype=np.uint64).reshape(-1)
    pv = np.asarray(dst_pinv, dtype=np.uint64).reshape(-1)
    qd = np.stack([(dq >> np.uint64(32)).astype(np.uint32),
                   (dq & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                   (pv >> np.uint64(32)).astype(np.uint32),
                   (pv & np.uint64(0xFFFFFFFF)).astype(np.uint32)], axis=1)
    return ch, cl, qd
