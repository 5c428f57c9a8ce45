"""Fused Pallas NTT for 32-bit words (31-bit prime chains, word_bits=32).

Single-plane u32 twin of ops/ntt_pallas.py: all butterfly stages of a
transform run inside one kernel pair with the rows resident in VMEM. The
u64 kernels emulate every 64-bit modmul from u32 pairs (~24 native
multiplies); here values ARE the machine word, so a Shoup butterfly is 6
native multiplies.

Chip verdict (v5e-lite, 2026-08-17, B=32 L=8 n=16384): bit-exact both
directions, but SLOWER than the XLA w32 path in isolation (fwd 1.45 vs
0.89 ms; inv 2.07 vs 1.27) — with native u32 words XLA's own elementwise
lowering is compute-efficient, and this kernel's per-stage interleave
shuffles dominate (phase1 0.80 ms, phase2 0.56 ms; raw VPU rate would be
~0.16 ms). Gated OFF by default (LATTISENSE_PALLAS32=1 opts in); kept as
the validated Mosaic template for parts where the balance differs.

Structure mirrors ops/ntt_pallas.py (all of whose chip-measured layout
rules carry over):

- forward: CT butterflies, natural-order input -> bit-reversed output,
  descending distances; stages with t >= 128 on the (m, 2, t) view, then
  a tile transpose so t < 128 become sublane strides (output comes back
  tile-transposed; undone outside in XLA).
- inverse: bit-reversal-conjugated GS with DESCENDING distances
  (P . GS . P) — Mosaic compiles shrinking-distance stage sequences ~5x
  faster than growing ones (round-1 finding, NOTES.md).
- index maps strictly int32 under jax_enable_x64; per-limb constants in
  SMEM; vmem_limit raised for the unrolled stage temporaries.

Reference parity: the transform semantics (negacyclic, psi_rev tables,
evaluation order) follow the reference kernels' contract
(/root/reference frontend fhe ops); bit-exactness is asserted against
core/ntt.py in tests/test_word32.py.
"""

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
MASK16 = 0xFFFF


# ---------------------------------------------------------------------------
# native-u32 modular primitives
# ---------------------------------------------------------------------------

def _mulhi32(a, b):
    """High 32 bits of the 64-bit product (u32 inputs) via 16-bit digits."""
    ah = a >> 16
    al = a & MASK16
    bh = b >> 16
    bl = b & MASK16
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    t = (ll >> 16) + (lh & MASK16) + (hl & MASK16)
    return ah * bh + (lh >> 16) + (hl >> 16) + (t >> 16)


def _shoup32(a, w, ws, q):
    """a·w mod q, ws = floor(w·2^32/q); a, w < q < 2^31."""
    e = _mulhi32(a, ws)
    r = a * w - e * q
    return jnp.where(r >= q, r - q, r)


def _addmod32(a, b, q):
    s = a + b                      # < 2q < 2^32: no wrap
    return jnp.where(s >= q, s - q, s)


def _submod32(a, b, q):
    d = a - b                      # wraps when a < b; +q re-centers exactly
    return jnp.where(a >= b, d, d + q)


# ---------------------------------------------------------------------------
# forward kernels (CT, natural -> bit-reversed, descending distances)
# ---------------------------------------------------------------------------

def _phase1_kernel(logn, rows, q_ref, x_ref, tw_ref, ts_ref, o_ref):
    """Stages with butterfly distance t >= LANES (natural layout)."""
    n = 1 << logn
    limb = pl.program_id(0)
    q = q_ref[limb, 0]
    v = x_ref[...]
    m = 1
    t = n
    while t > LANES:
        t //= 2
        p = v.reshape(rows, m, 2, t)
        w = tw_ref[0, 0, m:2 * m].reshape(1, m, 1)
        ws = ts_ref[0, 0, m:2 * m].reshape(1, m, 1)
        b = _shoup32(p[:, :, 1], w, ws, q)
        u = p[:, :, 0]
        v = jnp.stack([_addmod32(u, b, q), _submod32(u, b, q)],
                      axis=2).reshape(rows, n)
        m *= 2
    o_ref[...] = v


def _phase2_kernel(logn, rows, q_ref, x_ref, lt_ref, ls_ref, o_ref):
    """Tile transpose + the 7 sub-LANES stages (twiddles pre-permuted)."""
    n = 1 << logn
    sub = n // LANES
    limb = pl.program_id(0)
    q = q_ref[limb, 0]
    v = x_ref[...].reshape(rows, sub, LANES).swapaxes(1, 2)
    off = 0
    mb = 1
    tb = LANES
    while tb > 1:
        tb //= 2
        p = v.reshape(rows, mb, 2, tb, sub)
        cnt = mb * sub
        w = lt_ref[0, 0, off:off + cnt].reshape(1, mb, 1, sub)
        ws = ls_ref[0, 0, off:off + cnt].reshape(1, mb, 1, sub)
        b = _shoup32(p[:, :, 1], w, ws, q)
        u = p[:, :, 0]
        v = jnp.stack([_addmod32(u, b, q), _submod32(u, b, q)],
                      axis=2).reshape(rows, LANES, sub)
        off += cnt
        mb *= 2
    o_ref[...] = v.reshape(rows, n)


# ---------------------------------------------------------------------------
# host-side tables
# ---------------------------------------------------------------------------

_RING_STASH: dict = {}


def _stash(ring):
    key = (tuple(ring.moduli), ring.n)
    _RING_STASH[key] = (ring,)
    return key


@functools.lru_cache(maxsize=None)
def _tables(ring_key):
    ring, = _RING_STASH[ring_key]
    n = ring.n
    L = len(ring.moduli)
    sub = n // LANES
    logn = n.bit_length() - 1

    tw = np.ascontiguousarray(ring.psi_rev, dtype=np.uint32)        # (L, n)
    ts = np.ascontiguousarray(ring.psi_rev_shoup, dtype=np.uint32)

    # sub-LANES stage twiddles permuted into the transposed tile layout
    # (same derivation as ntt_pallas._tables)
    lt_list, ls_list = [], []
    t = LANES
    while t > 1:
        t //= 2
        m = n // (2 * t)
        mb = LANES // (2 * t)
        g = (np.arange(sub)[None, :] * mb +
             np.arange(mb)[:, None]).reshape(-1)          # (mb*sub,)
        lt_list.append(tw[:, m + g])
        ls_list.append(ts[:, m + g])
    lt = np.concatenate(lt_list, axis=1)
    ls = np.concatenate(ls_list, axis=1)

    q = np.asarray(ring.q, dtype=np.uint32).reshape(L, 1)           # (L, 1)
    return (logn, L, sub, tw, ts, lt, ls, q)


@functools.lru_cache(maxsize=None)
def _ctables(ring_key):
    """Conjugated-inverse twiddles: W[stage pos p] = psi_inv_rev[m_core +
    (brv(p) >> (k+1))] — see ntt_pallas._ctables for the derivation."""
    ring, = _RING_STASH[ring_key]
    n = ring.n
    L = len(ring.moduli)
    logn = n.bit_length() - 1
    sub = n // LANES

    brv = np.zeros(n, dtype=np.int64)
    for bit in range(logn):
        brv |= ((np.arange(n) >> bit) & 1) << (logn - 1 - bit)

    tinv = np.ascontiguousarray(ring.psi_inv_rev, dtype=np.uint32)
    tinv_s = np.ascontiguousarray(ring.psi_inv_rev_shoup, dtype=np.uint32)

    def stage_idx(T, transposed):
        T = int(T)
        k = logn - 1 - (T.bit_length() - 1)
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
    w1 = tinv[:, idx1]
    s1 = tinv_s[:, idx1]
    w2 = tinv[:, idx2]
    s2 = tinv_s[:, idx2]

    qn = np.stack([np.asarray(ring.q, dtype=np.uint32).reshape(-1),
                   np.asarray([r.n_inv for r in ring.rings], dtype=np.uint32),
                   np.asarray([r.n_inv_shoup for r in ring.rings],
                              dtype=np.uint32)], axis=1)            # (L, 3)
    return (logn, L, sub, w1, s1, w2, s2, qn)


# ---------------------------------------------------------------------------
# inverse kernels (bit-reversal-conjugated GS, descending distances)
# ---------------------------------------------------------------------------

def _cinv1_kernel(logn, rows, qn_ref, x_ref, w_ref, s_ref, o_ref):
    """Conjugated-GS stages, distances n/2 .. LANES (natural layout)."""
    n = 1 << logn
    limb = pl.program_id(0)
    q = qn_ref[limb, 0]
    v = x_ref[...]
    off = 0
    t = n
    while t > LANES:
        t //= 2
        m = n // (2 * t)
        p = v.reshape(rows, m, 2, t)
        cnt = m * t
        w = w_ref[0, 0, off:off + cnt].reshape(1, m, t)
        ws = s_ref[0, 0, off:off + cnt].reshape(1, m, t)
        u = p[:, :, 0]
        b = p[:, :, 1]
        s = _addmod32(u, b, q)
        d = _shoup32(_submod32(u, b, q), w, ws, q)
        v = jnp.stack([s, d], axis=2).reshape(rows, n)
        off += cnt
    o_ref[...] = v


def _cinv2_kernel(logn, rows, qn_ref, x_ref, w_ref, s_ref, o_ref):
    """Tile transpose + conjugated-GS stages LANES/2 .. 1, then n^-1."""
    n = 1 << logn
    sub = n // LANES
    limb = pl.program_id(0)
    q = qn_ref[limb, 0]
    v = x_ref[...].reshape(rows, sub, LANES).swapaxes(1, 2)
    off = 0
    tb = LANES
    while tb > 1:
        tb //= 2
        mb = LANES // (2 * tb)
        p = v.reshape(rows, mb, 2, tb, sub)
        cnt = mb * tb * sub
        w = w_ref[0, 0, off:off + cnt].reshape(1, mb, tb, sub)
        ws = s_ref[0, 0, off:off + cnt].reshape(1, mb, tb, sub)
        u = p[:, :, 0]
        b = p[:, :, 1]
        s = _addmod32(u, b, q)
        d = _shoup32(_submod32(u, b, q), w, ws, q)
        v = jnp.stack([s, d], axis=2).reshape(rows, LANES, sub)
        off += cnt
    ni = qn_ref[limb, 1]
    ns = qn_ref[limb, 2]
    v = _shoup32(v, ni, ns, q)
    o_ref[...] = v.reshape(rows, n)


# ---------------------------------------------------------------------------
# launchers
# ---------------------------------------------------------------------------

def _im(*vals):
    # strictly int32 under jax_enable_x64 (Mosaic i64 legalization traps)
    return tuple(jnp.int32(v) for v in vals)


_CPARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024,
                                dimension_semantics=('arbitrary',
                                                     'arbitrary'))


def _specs(L, total_rows, R, n, widths, smem_cols):
    def row_spec():
        bpl = total_rows // R
        return pl.BlockSpec((R, n), lambda l, r: _im(l * bpl + r, 0),
                            memory_space=pltpu.VMEM)

    def tbl_spec(width):
        return pl.BlockSpec((1, 1, width), lambda l, r: _im(l, 0, 0),
                            memory_space=pltpu.VMEM)

    smem = pl.BlockSpec((L, smem_cols), lambda l, r: _im(0, 0),
                        memory_space=pltpu.SMEM)
    return row_spec, tbl_spec, smem


@functools.partial(jax.jit, static_argnames=('logn', 'L', 'rows_per_block'))
def _launch(x, tw, ts, lt, ls, q, *, logn, L, rows_per_block):
    n = 1 << logn
    total_rows = x.shape[0] // L
    grid = (L, total_rows // rows_per_block)
    R = rows_per_block
    lt_n = lt.shape[-1]
    tw, ts = (a.reshape(L, 1, n) for a in (tw, ts))
    lt, ls = (a.reshape(L, 1, lt_n) for a in (lt, ls))
    interp = jax.default_backend() == 'cpu'
    row_spec, tbl_spec, smem = _specs(L, total_rows, R, n, None, 1)

    m = pl.pallas_call(
        functools.partial(_phase1_kernel, logn, R),
        interpret=interp,
        compiler_params=_CPARAMS,
        grid=grid,
        in_specs=[smem, row_spec(), tbl_spec(n), tbl_spec(n)],
        out_specs=row_spec(),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32),
    )(q, x, tw, ts)
    return pl.pallas_call(
        functools.partial(_phase2_kernel, logn, R),
        interpret=interp,
        compiler_params=_CPARAMS,
        grid=grid,
        in_specs=[smem, row_spec(), tbl_spec(lt_n), tbl_spec(lt_n)],
        out_specs=row_spec(),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32),
    )(q, m, lt, ls)


@functools.partial(jax.jit, static_argnames=('logn', 'L', 'rows_per_block'))
def _claunch(x, w1, s1, w2, s2, qn, *, logn, L, rows_per_block):
    n = 1 << logn
    total_rows = x.shape[0] // L
    grid = (L, total_rows // rows_per_block)
    R = rows_per_block
    n1, n2 = w1.shape[-1], w2.shape[-1]
    w1, s1 = (a.reshape(L, 1, n1) for a in (w1, s1))
    w2, s2 = (a.reshape(L, 1, n2) for a in (w2, s2))
    interp = jax.default_backend() == 'cpu'
    row_spec, tbl_spec, smem = _specs(L, total_rows, R, n, None, 3)

    m = pl.pallas_call(
        functools.partial(_cinv1_kernel, logn, R),
        interpret=interp,
        compiler_params=_CPARAMS,
        grid=grid,
        in_specs=[smem, row_spec(), tbl_spec(n1), tbl_spec(n1)],
        out_specs=row_spec(),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32),
    )(qn, x, w1, s1)
    return pl.pallas_call(
        functools.partial(_cinv2_kernel, logn, R),
        interpret=interp,
        compiler_params=_CPARAMS,
        grid=grid,
        in_specs=[smem, row_spec(), tbl_spec(n2), tbl_spec(n2)],
        out_specs=row_spec(),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32),
    )(qn, m, w2, s2)


# ---------------------------------------------------------------------------
# drop-in entries (vmap-collapsing, bit-identical to core/ntt)
# ---------------------------------------------------------------------------

def _regroup(x, L, n, rows_per_block):
    """(..., L, n) -> (L*batch_p, n) limb-major + pad bookkeeping."""
    shape = x.shape
    batch = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    xr = jnp.moveaxis(x.reshape(batch, L, n), 1, 0)
    pad_rows = (-batch) % rows_per_block
    if pad_rows:
        xr = jnp.pad(xr, ((0, 0), (0, pad_rows), (0, 0)))
    return xr.reshape(-1, n), batch, batch + pad_rows, shape


@functools.lru_cache(maxsize=None)
def _brv_perm_axes(logn: int, k: int):
    return tuple(range(k)) + tuple(range(k + logn - 1, k - 1, -1))


def _brv_apply(x, n):
    """Bit-reversal of the last axis as ONE transpose (bit-axes reversal)."""
    logn = n.bit_length() - 1
    lead = x.shape[:-1]
    x = x.reshape(*lead, *((2,) * logn))
    return x.transpose(_brv_perm_axes(logn, len(lead))).reshape(*lead, n)


def _ntt_fused_impl(x, ring, rows_per_block: int = 8):
    key = _stash(ring)
    logn, L, sub, tw, ts, lt, ls, q = _tables(key)
    n = 1 << logn
    xr, batch, batch_p, shape = _regroup(x, L, n, rows_per_block)
    out = _launch(xr, jnp.asarray(tw), jnp.asarray(ts), jnp.asarray(lt),
                  jnp.asarray(ls), jnp.asarray(q), logn=logn, L=L,
                  rows_per_block=rows_per_block)
    # undo the kernel tile transpose
    out = out.reshape(-1, LANES, sub).swapaxes(1, 2).reshape(-1, n)
    out = out.reshape(L, batch_p, n)[:, :batch]
    return jnp.moveaxis(out, 0, 1).reshape(shape)


def _intt_fused_impl(x, ring, rows_per_block: int = 8):
    key = _stash(ring)
    logn, L, sub, w1, s1, w2, s2, qn = _ctables(key)
    n = 1 << logn
    xr, batch, batch_p, shape = _regroup(_brv_apply(x, n), L, n,
                                         rows_per_block)
    out = _claunch(xr, jnp.asarray(w1), jnp.asarray(s1), jnp.asarray(w2),
                   jnp.asarray(s2), jnp.asarray(qn), logn=logn, L=L,
                   rows_per_block=rows_per_block)
    out = out.reshape(-1, LANES, sub).swapaxes(1, 2).reshape(-1, n)
    out = _brv_apply(out, n)
    out = out.reshape(L, batch_p, n)[:, :batch]
    return jnp.moveaxis(out, 0, 1).reshape(shape)


_VMAP_CACHE: dict = {}


def _vmap_entry(ring, rows_per_block, impl, tag):
    # jax.vmap would run the kernel per batch element (8x padding waste);
    # collapse the mapped axis into the kernels' native batch dim instead.
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


def ntt_fused32(x, ring, rows_per_block: int = 8):
    """Forward NTT over (..., L, n) u32, bit-identical to core.ntt.ntt."""
    return _vmap_entry(ring, rows_per_block, _ntt_fused_impl, 'fwd32')(x)


def intt_fused32(x, ring, rows_per_block: int = 8):
    """Inverse NTT over (..., L, n) u32, bit-identical to core.ntt.intt."""
    return _vmap_entry(ring, rows_per_block, _intt_fused_impl, 'inv32')(x)
