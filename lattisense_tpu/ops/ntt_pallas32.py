"""Fused Pallas NTT for 32-bit words (31-bit prime chains, word_bits=32).

Single-plane u32 twin of ops/ntt_pallas.py: ALL butterfly stages of a
transform run inside ONE kernel per direction with the rows resident in
VMEM. Values are the machine word, so a Shoup butterfly is 6 native
multiplies (no u32-pair emulation).

The decisive layout rule (chip-measured 2026-08-17, /tmp idiom sweep):
Mosaic lowers `reshape(R, m, 2, t) + stack(axis=2)` butterflies at
~0.35 Tops/s, but the 2D-FOLD idiom — `reshape(R·m, 2t)` (or
`(R, m, 2t)`), slice the two last-axis halves, `concatenate` them back
on the last axis — at ~2.3 Tops/s, independent of the block count m
(14 stages of 256 limb-rows in 0.34-0.45 ms vs 2.5-3.9 ms). The entire
kernel is therefore expressed with last-axis slices/concats only.

Twiddle residency (round-3, chip-measured 2026-08-19): phase-A (t >= 128)
twiddles are constant over t, so they ship as compact (m, 1) SPLAT tables
and broadcast along lanes in-kernel — fwd 2.92 -> 2.42 us/limb-row
(LATTISENSE_NTT32_SPLAT=0 restores the pre-expanded (m, t) streams).
Two measured NEGATIVE variants, kept for the record: compact phase-B
tables (LATTISENSE_NTT32_SPLATB=1: (m, sub) + an in-kernel 4D reshape)
regress fwd to 3.32 — the reshape relayout tax exceeds the saved
traffic; and the perm-layout pair (ntt_fused32_perm/intt_fused32_perm:
skip the in-kernel un-/re-transpose across pointwise NTT-domain ops)
loses isolated round trips 24.0 vs 7.7 us/limb-row — storing the
transposed view into a (rows, n) out_ref forces a Mosaic relayout that
costs more than the swapaxes it removes.

Structure:

- forward: CT butterflies, natural-order input -> bit-reversed output,
  descending distances. Stages with t >= 128 on the natural (R, n)
  layout; then one in-VMEM tile transpose to (R, LANES, sub) where the
  sub-lane distances t < 128 become lane-block strides of width t*sub
  >= 128; output returned tile-transposed (undone by one XLA relayout
  outside).
- inverse: bit-reversal-conjugated GS with DESCENDING distances
  (P . GS . P, P applied outside as one (2,)*logn axis-reversal
  transpose) — ascending-distance stage sequences compile ~3-5x slower
  in both backends (round-1 finding, NOTES.md).
- per-limb constants in SMEM; index maps strictly int32 under
  jax_enable_x64 (Mosaic i64 legalization traps).

Reference parity: the transform semantics (negacyclic, psi_rev tables,
bit-reversed evaluation order) follow the same contract as core/ntt.py,
which replaces the reference's Lattigo/HEonGPU NTT kernels (SURVEY.md
§2.5); bit-exactness vs core/ntt.py is asserted by tests/test_word32.py.
"""

import functools

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
# kernels (one per direction; all stages + the tile transpose inside)
# ---------------------------------------------------------------------------

def _fwd_kernel(logn, rows, perm_out, q_ref, x_ref, *refs):
    """CT forward, natural input -> bit-reversed output in the transposed
    tile layout. refs = w_0, ws_0, w_1, ws_1, ... one (1, m, t[*sub])
    pre-expanded pair per stage. ``perm_out=True`` keeps the output in the
    transposed tile layout (position b*sub + a holds standard-order
    element a*LANES + b) — skipping the in-kernel un-transpose; pointwise
    NTT-domain consumers don't care about coefficient order and the
    inverse kernel's sub-lane phase WANTS exactly this layout (perm_in),
    so a fwd→pointwise→inv chain saves BOTH relayouts."""
    n = 1 << logn
    sub = n // LANES
    limb = pl.program_id(0)
    q = q_ref[limb, 0]
    v = x_ref[...]
    si = 0
    # phase A: butterfly distance t = n/2 .. 128 on the natural layout
    m = 1
    t = n
    while t > LANES:
        t //= 2
        w = refs[2 * si][...]
        ws = refs[2 * si + 1][...]
        p = v.reshape(rows, m, 2 * t)
        u = p[..., :t]
        b = _shoup32(p[..., t:], w, ws, q)
        v = jnp.concatenate([_addmod32(u, b, q), _submod32(u, b, q)],
                            axis=-1).reshape(rows, n)
        m *= 2
        si += 1
    # tile transpose: index j = a*LANES + b  ->  [b, a]; remaining
    # distances t < 128 become lane strides of width t*sub
    v = v.reshape(rows, sub, LANES).swapaxes(1, 2)
    tb = LANES
    while tb > 1:
        tb //= 2
        mb = LANES // (2 * tb)
        w = refs[2 * si][...]
        ws = refs[2 * si + 1][...]
        p = v.reshape(rows, mb, 2 * tb * sub)
        u = p[..., :tb * sub]
        hv = p[..., tb * sub:]
        if w.shape[-1] != tb * sub:      # compact (m, sub) table: the
            hv = hv.reshape(rows, mb, tb, sub)       # value is constant
            b = _shoup32(hv, w[:, :, None, :],       # over the tb axis
                         ws[:, :, None, :], q).reshape(rows, mb, tb * sub)
        else:
            b = _shoup32(hv, w, ws, q)
        v = jnp.concatenate([_addmod32(u, b, q), _submod32(u, b, q)],
                            axis=-1)
        si += 1
    if not perm_out:
        # undo the tile transpose in VMEM: standard bit-reversed order
        v = v.reshape(rows, LANES, sub).swapaxes(1, 2)
    o_ref = refs[-1]
    o_ref[...] = v.reshape(rows, n)


def _gs_d(u, b, w, ws, q):
    """The GS butterfly's twiddled difference d = w·(u−b).

    Default: sub THEN mul — 1 multiply, but the multiply waits on the
    subtract (a serial dependency absent from the CT forward, whose
    multiply consumes a LOADED slice). LATTISENSE_NTT32_INVMB=1 computes
    w·u − w·b instead: 2 multiplies on loaded/ready values that issue in
    parallel — exact mod q (each Shoup product < q) — to test whether
    the inverse kernel's 2x-over-forward cost is multiply LATENCY, not
    throughput (VERDICT r3 item 3 bisect)."""
    if _INV_MULBEFORE:
        return _submod32(_shoup32(u, w, ws, q), _shoup32(b, w, ws, q), q)
    return _shoup32(_submod32(u, b, q), w, ws, q)


def _inv_kernel(logn, rows, perm_in, qn_ref, x_ref, *refs):
    """Plain GS inverse, bit-reversed input -> natural output, ASCENDING
    distances (the fold idiom removes the old ascending-sequence penalty),
    then the n^-1 scale. Sub-lane distances t < 128 run first in the
    transposed tile layout; no external bit-reversal passes needed.
    ``perm_in=True`` takes input already in the transposed tile layout
    (the fwd kernel's perm_out) and skips the initial transpose."""
    n = 1 << logn
    sub = n // LANES
    limb = pl.program_id(0)
    q = qn_ref[limb, 0]
    if perm_in:
        v = x_ref[...]
    else:
        v = x_ref[...].reshape(rows, sub, LANES).swapaxes(1, 2)
    si = 0
    tb = 1
    while tb < LANES:
        mb = LANES // (2 * tb)
        w = refs[2 * si][...]
        ws = refs[2 * si + 1][...]
        p = v.reshape(rows, mb, 2 * tb * sub)
        u = p[..., :tb * sub]
        b = p[..., tb * sub:]
        s = _addmod32(u, b, q)
        if w.shape[-1] != tb * sub:      # compact (m, sub) table
            dd = _submod32(u, b, q).reshape(rows, mb, tb, sub)
            d = _shoup32(dd, w[:, :, None, :],
                         ws[:, :, None, :], q).reshape(rows, mb, tb * sub)
        else:
            d = _gs_d(u, b, w, ws, q)
        v = jnp.concatenate([s, d], axis=-1)
        si += 1
        tb *= 2
    v = v.reshape(rows, LANES, sub).swapaxes(1, 2).reshape(rows, n)
    t = LANES
    while t < n:
        m = n // (2 * t)
        w = refs[2 * si][...]
        ws = refs[2 * si + 1][...]
        p = v.reshape(rows, m, 2 * t)
        u = p[..., :t]
        b = p[..., t:]
        s = _addmod32(u, b, q)
        d = _gs_d(u, b, w, ws, q)
        v = jnp.concatenate([s, d], axis=-1).reshape(rows, n)
        si += 1
        t *= 2
    ni = qn_ref[limb, 1]
    ns = qn_ref[limb, 2]
    v = _shoup32(v, ni, ns, q)
    o_ref = refs[-1]
    o_ref[...] = v.reshape(rows, n)


# ---------------------------------------------------------------------------
# host-side tables (pre-expanded to the exact in-kernel broadcast shapes)
# ---------------------------------------------------------------------------

_RING_STASH: dict = {}


def _stash(ring):
    key = (tuple(ring.moduli), ring.n)
    _RING_STASH[key] = (ring,)
    return key


def _stage_plan(logn):
    """[(m, t, transposed)] for the fused stage order."""
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


@functools.lru_cache(maxsize=None)
def _tables(ring_key, splat: bool = False, splatb: bool = False):
    """Forward per-stage tables, each expanded to (L, m, width):
    phase A width=t (value psi_rev[m+g], constant over t); phase B
    width=tb*sub (entry [g, jj*sub + a] = psi_rev[m_orig + a*(128/2t) + g],
    m_orig = n/(2t) — derived from the original butterfly block index of
    position a*LANES + g*2t + jj). ``splat=True`` stores phase-A tables as
    (L, m, 1) and lets the kernel broadcast along lanes — the twiddle
    value is constant over t, so the pre-expansion streams n/2 redundant
    words per stage through VMEM."""
    ring, = _RING_STASH[ring_key]
    n = ring.n
    L = len(ring.moduli)
    logn = n.bit_length() - 1
    sub = n // LANES

    tw = np.ascontiguousarray(ring.psi_rev, dtype=np.uint32)        # (L, n)
    ts = np.ascontiguousarray(ring.psi_rev_shoup, dtype=np.uint32)

    stages = []
    for m, t, transposed in _stage_plan(logn):
        if not transposed:
            width = 1 if splat else t
            idx = np.broadcast_to((m + np.arange(m))[:, None], (m, width))
        else:
            m_orig = n // (2 * t)
            blk = LANES // (2 * t)
            g = np.arange(m)[:, None, None]
            a = np.arange(sub)[None, None, :]
            if splatb and t > 1:
                # compact: the value is constant over the t axis
                idx = (m_orig + a * blk + g)[:, 0, :]          # (m, sub)
            else:
                idx = np.broadcast_to(m_orig + a * blk + g,
                                      (m, t, sub)).reshape(m, t * sub)
        stages.append((np.ascontiguousarray(tw[:, idx]),
                       np.ascontiguousarray(ts[:, idx])))
    q = np.asarray(ring.q, dtype=np.uint32).reshape(L, 1)           # (L, 1)
    return (logn, L, sub, stages, q)


def _inv_stage_plan(logn):
    """[(m, t, transposed)] for the inverse: ascending distances."""
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


@functools.lru_cache(maxsize=None)
def _itables(ring_key, splat: bool = False, splatb: bool = False):
    """Inverse (plain GS) per-stage tables: psi_inv_rev[m + g_orig] with
    the same block-index expansion as the forward tables."""
    ring, = _RING_STASH[ring_key]
    n = ring.n
    L = len(ring.moduli)
    logn = n.bit_length() - 1
    sub = n // LANES

    tinv = np.ascontiguousarray(ring.psi_inv_rev, dtype=np.uint32)
    tinv_s = np.ascontiguousarray(ring.psi_inv_rev_shoup, dtype=np.uint32)

    stages = []
    for m, t, transposed in _inv_stage_plan(logn):
        m_orig = n // (2 * t)
        if not transposed:
            width = 1 if splat else t
            idx = np.broadcast_to((m_orig + np.arange(m))[:, None], (m, width))
        else:
            blk = LANES // (2 * t)
            g = np.arange(m)[:, None, None]
            a = np.arange(sub)[None, None, :]
            if splatb and t > 1:
                idx = (m_orig + a * blk + g)[:, 0, :]          # (m, sub)
            else:
                idx = np.broadcast_to(m_orig + a * blk + g,
                                      (m, t, sub)).reshape(m, t * sub)
        stages.append((np.ascontiguousarray(tinv[:, idx]),
                       np.ascontiguousarray(tinv_s[:, idx])))

    qn = np.stack([np.asarray(ring.q, dtype=np.uint32).reshape(-1),
                   np.asarray([r.n_inv for r in ring.rings], dtype=np.uint32),
                   np.asarray([r.n_inv_shoup for r in ring.rings],
                              dtype=np.uint32)], axis=1)            # (L, 3)
    return (logn, L, sub, stages, qn)


# ---------------------------------------------------------------------------
# launchers
# ---------------------------------------------------------------------------

def _im(*vals):
    # strictly int32 under jax_enable_x64 (Mosaic i64 legalization traps)
    return tuple(jnp.int32(v) for v in vals)


_CPARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024,
                                dimension_semantics=('arbitrary',
                                                     'arbitrary'))


def _run(kernel, x, stage_tabs, smem_tab, *, logn, L, rows_per_block,
         smem_cols, perm=False):
    n = 1 << logn
    total_rows = x.shape[0] // L
    R = rows_per_block
    grid = (L, total_rows // R)
    bpl = total_rows // R

    row_spec = pl.BlockSpec((R, n), lambda l, r: _im(l * bpl + r, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((L, smem_cols), lambda l, r: _im(0, 0),
                        memory_space=pltpu.SMEM)
    tab_specs = []
    tab_args = []
    for w, ws in stage_tabs:
        m, width = w.shape[1], w.shape[2]
        spec = pl.BlockSpec((1, m, width), lambda l, r: _im(l, 0, 0),
                            memory_space=pltpu.VMEM)
        tab_specs += [spec, spec]
        tab_args += [w, ws]

    interp = jax.default_backend() == 'cpu'
    f = pl.pallas_call(
        functools.partial(kernel, logn, R, perm),
        interpret=interp,
        compiler_params=_CPARAMS,
        grid=grid,
        in_specs=[smem, row_spec] + tab_specs,
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32),
    )
    return f(smem_tab, x, *tab_args)


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


import os as _os

# Default flipped OFF in round 5: the splat tables + fused key switch
# were round-3-day wins, but the 2026-08-20 remote compiler lowers the
# round-2 gate set 13% FASTER end-to-end (931.6 vs 821.8 ops/s median,
# interleaved same-process A/B, benchmarks/gates_ab_probe.py) and
# compiles it 10x faster (88 s vs 822 s). This also closes the r4
# headline-regression question: the drop was gate-vs-compiler, not chip
# drift. LATTISENSE_NTT32_SPLAT=1 restores.
_SPLAT = _os.environ.get('LATTISENSE_NTT32_SPLAT', '0') not in ('', '0')
_INV_MULBEFORE = _os.environ.get('LATTISENSE_NTT32_INVMB', '0') \
    not in ('', '0')
_SPLATB = _os.environ.get('LATTISENSE_NTT32_SPLATB', '0') not in ('', '0')


def _ntt_fused_impl(x, ring, rows_per_block: int = 8, perm: bool = False):
    key = _stash(ring)
    # tables stay numpy in the cache: converting to jax arrays here would
    # create per-trace constants, and caching those leaks tracers
    logn, L, sub, stages, q = _tables(key, _SPLAT, _SPLATB)
    n = 1 << logn
    xr, batch, batch_p, shape = _regroup(x, L, n, rows_per_block)
    out = _run(_fwd_kernel, xr, stages, q, logn=logn, L=L,
               rows_per_block=rows_per_block, smem_cols=1, perm=perm)
    out = out.reshape(L, batch_p, n)[:, :batch]
    return jnp.moveaxis(out, 0, 1).reshape(shape)


def _intt_fused_impl(x, ring, rows_per_block: int = 8, perm: bool = False):
    key = _stash(ring)
    logn, L, sub, stages, qn = _itables(key, _SPLAT, _SPLATB)
    n = 1 << logn
    xr, batch, batch_p, shape = _regroup(x, L, n, rows_per_block)
    out = _run(_inv_kernel, xr, stages, qn, logn=logn, L=L,
               rows_per_block=rows_per_block, smem_cols=3, perm=perm)
    out = out.reshape(L, batch_p, n)[:, :batch]
    return jnp.moveaxis(out, 0, 1).reshape(shape)


_VMAP_CACHE: dict = {}


def _vmap_entry(ring, rows_per_block, impl, tag, perm=False):
    # jax.vmap would run the kernel per batch element (8x padding waste);
    # collapse the mapped axis into the kernels' native batch dim instead.
    key = (tuple(ring.moduli), ring.n, rows_per_block, tag, perm,
           _INV_MULBEFORE)
    f = _VMAP_CACHE.get(key)
    if f is None:
        @jax.custom_batching.custom_vmap
        def f(x):
            return impl(x, ring, rows_per_block, perm)

        @f.def_vmap
        def _rule(axis_size, in_batched, xb):
            return impl(xb, ring, rows_per_block, perm), True

        _VMAP_CACHE[key] = f
    return f


_R4 = _os.environ.get('LATTISENSE_NTT32_R4', '0') not in ('', '0')
# The inverse gate defaults to the radix-4 kernel independently (merged
# passes halve the materialization points that dominate the ascending-
# distance inverse; chip A/B via benchmarks/ntt32_probe.py decides both).
_R4_INV = _os.environ.get('LATTISENSE_NTT32_R4_INV',
                          _os.environ.get('LATTISENSE_NTT32_R4', '0')) \
    not in ('', '0')


# Default rows-per-block of the fused kernels (grid tile height). 8 was
# the round-2 sweep winner for an earlier kernel variant; larger tiles
# amortize per-grid-step pipeline overhead and relayout fixed costs —
# re-decided by chip A/B (benchmarks/ntt32_probe.py --rows / headline
# A/B) against the current splat-table kernels.
_ROWS = int(_os.environ.get('LATTISENSE_NTT32_ROWS', '8'))


def ntt_fused32(x, ring, rows_per_block: int = 0):
    """Forward NTT over (..., L, n) u32, bit-identical to core.ntt.ntt."""
    rows_per_block = rows_per_block or _ROWS
    if _R4:
        return _vmap_entry(ring, rows_per_block, _ntt_fused_impl4,
                           'fwd32r4')(x)
    return _vmap_entry(ring, rows_per_block, _ntt_fused_impl, 'fwd32')(x)


def intt_fused32(x, ring, rows_per_block: int = 0):
    """Inverse NTT over (..., L, n) u32, bit-identical to core.ntt.intt."""
    rows_per_block = rows_per_block or _ROWS
    if _R4_INV:
        return _vmap_entry(ring, rows_per_block, _intt_fused_impl4,
                           'inv32r4')(x)
    return _vmap_entry(ring, rows_per_block, _intt_fused_impl, 'inv32')(x)


# ---------------------------------------------------------------------------
# permuted-layout entries: NTT domain in the transposed tile layout
# ---------------------------------------------------------------------------
# Position b*sub + a of a perm-layout array holds standard-order element
# a*LANES + b (sub = n/128). fwd(perm_out) skips the in-kernel un-transpose
# and inv(perm_in) skips the in-kernel transpose — a fwd → pointwise → inv
# chain never relayouts. NTT-domain CONSTANTS (keys, pt_mul operands) must
# be permuted once host-side with perm_layout().

def perm_layout(x, n: int):
    """Standard bit-reversed order → transposed tile layout (last axis)."""
    lead = x.shape[:-1]
    return x.reshape(*lead, n // LANES, LANES).swapaxes(-1, -2).reshape(
        *lead, n)


def unperm_layout(x, n: int):
    """Transposed tile layout → standard bit-reversed order (last axis)."""
    lead = x.shape[:-1]
    return x.reshape(*lead, LANES, n // LANES).swapaxes(-1, -2).reshape(
        *lead, n)


def ntt_fused32_perm(x, ring, rows_per_block: int = 8):
    """Forward NTT with perm-layout output: equals
    perm_layout(ntt_fused32(x), n)."""
    return _vmap_entry(ring, rows_per_block, _ntt_fused_impl, 'fwd32',
                       perm=True)(x)


def intt_fused32_perm(x, ring, rows_per_block: int = 8):
    """Inverse NTT taking perm-layout input: intt_fused32_perm(
    ntt_fused32_perm(x)) == x."""
    return _vmap_entry(ring, rows_per_block, _intt_fused_impl, 'inv32',
                       perm=True)(x)


# ---------------------------------------------------------------------------
# radix-4 (two-level merged) kernels — VERDICT r3 item 3 (the inverse gap)
# ---------------------------------------------------------------------------
# Two butterfly levels per fold-idiom pass: the pass count halves (14 -> 8
# at n=16384), and with it the number of per-stage concatenate
# materialization points Mosaic schedules — the prime suspect for the
# inverse kernel's 2x-over-forward cost (the stage multisets are identical
# pairwise, so arithmetic cannot explain it; NOTES.md round-3 item 3).
# Multiply count is unchanged (radix-4 = the same twiddles, reassociated).
# Natural-phase tables are SPLAT-only ((m, 1), the round-3 winner);
# transposed-phase tables stay pre-expanded (compact lost, round-3).
# Gate: LATTISENSE_NTT32_R4=1 (default decided by the chip A/B probe).


def _pair_stages(plan):
    """Greedily pair consecutive same-phase stages: [(a, b)] or [(a,)]."""
    out, i = [], 0
    while i < len(plan):
        if i + 1 < len(plan) and plan[i][2] == plan[i + 1][2]:
            out.append((plan[i], plan[i + 1]))
            i += 2
        else:
            out.append((plan[i],))
            i += 1
    return out


def fwd_stage_block4(v, refs, ri, plan, q, rows, n, sub):
    """Merged-pass CT forward stage block (shared with the K1/ksw
    megakernels): ``v`` (rows, n) natural order; returns (v in the
    TRANSPOSED tile layout (rows, LANES, sub)-flat, next ref index).
    ``q`` broadcastable over (rows, m, width)."""
    in_t = False
    for kind, m, ts, transposed in plan:
        if transposed and not in_t:
            v = v.reshape(rows, sub, LANES).swapaxes(1, 2)
            in_t = True
        width = ts * sub if transposed else ts
        if kind == 'r2':
            w, ws = refs[ri][...], refs[ri + 1][...]
            ri += 2
            p = v.reshape(rows, m, 2 * width)
            u = p[..., :width]
            b = _shoup32(p[..., width:], w, ws, q)
            v = jnp.concatenate([_addmod32(u, b, q), _submod32(u, b, q)],
                                axis=-1)
        else:
            w2, w2s = refs[ri][...], refs[ri + 1][...]
            w1a, w1as = refs[ri + 2][...], refs[ri + 3][...]
            w1b, w1bs = refs[ri + 4][...], refs[ri + 5][...]
            ri += 6
            p = v.reshape(rows, m, 4 * width)
            u = p[..., :2 * width]
            b = _shoup32(p[..., 2 * width:], w2, w2s, q)
            top = _addmod32(u, b, q)
            bot = _submod32(u, b, q)
            t0 = top[..., :width]
            t1 = _shoup32(top[..., width:], w1a, w1as, q)
            b0 = bot[..., :width]
            b1 = _shoup32(bot[..., width:], w1b, w1bs, q)
            v = jnp.concatenate(
                [_addmod32(t0, t1, q), _submod32(t0, t1, q),
                 _addmod32(b0, b1, q), _submod32(b0, b1, q)], axis=-1)
        if not transposed:
            v = v.reshape(rows, n)
    return v, ri


def _fwd_kernel4(logn, rows, plan, q_ref, x_ref, *refs):
    """CT forward with merged (2t, t) passes; natural -> bit-reversed."""
    n = 1 << logn
    sub = n // LANES
    limb = pl.program_id(0)
    q = q_ref[limb, 0]
    v, _ = fwd_stage_block4(x_ref[...], refs, 0, plan, q, rows, n, sub)
    v = v.reshape(rows, LANES, sub).swapaxes(1, 2)
    refs[-1][...] = v.reshape(rows, n)


def inv_stage_block4(v, refs, ri, plan, q, rows, n, sub):
    """Merged-pass GS inverse stage block, shared by _inv_kernel4 and the
    K3 BEHZ megakernel: ``v`` (rows, LANES, sub) in the TRANSPOSED tile
    layout, ``q`` broadcastable over (rows, m, width) (scalar per-limb
    grids, or a (rows, 1, 1) column for per-row-modulus kernels).
    Returns (v natural-order (rows, n), next ref index)."""
    in_t = True
    for kind, m, ts, transposed in plan:
        if not transposed and in_t:
            v = v.reshape(rows, LANES, sub).swapaxes(1, 2).reshape(rows, n)
            in_t = False
        width = ts * sub if transposed else ts
        if kind == 'r2':
            w, ws = refs[ri][...], refs[ri + 1][...]
            ri += 2
            p = v.reshape(rows, m, 2 * width)
            u, b = p[..., :width], p[..., width:]
            s = _addmod32(u, b, q)
            d = _shoup32(_submod32(u, b, q), w, ws, q)
            v = jnp.concatenate([s, d], axis=-1)
        else:
            w1a, w1as = refs[ri][...], refs[ri + 1][...]
            w1b, w1bs = refs[ri + 2][...], refs[ri + 3][...]
            w2, w2s = refs[ri + 4][...], refs[ri + 5][...]
            ri += 6
            p = v.reshape(rows, m, 4 * width)
            pa, pb = p[..., :width], p[..., width:2 * width]
            pc, pd = p[..., 2 * width:3 * width], p[..., 3 * width:]
            s_ab = _addmod32(pa, pb, q)
            d_ab = _shoup32(_submod32(pa, pb, q), w1a, w1as, q)
            s_cd = _addmod32(pc, pd, q)
            d_cd = _shoup32(_submod32(pc, pd, q), w1b, w1bs, q)
            v = jnp.concatenate(
                [_addmod32(s_ab, s_cd, q), _addmod32(d_ab, d_cd, q),
                 _shoup32(_submod32(s_ab, s_cd, q), w2, w2s, q),
                 _shoup32(_submod32(d_ab, d_cd, q), w2, w2s, q)], axis=-1)
        if not transposed:
            v = v.reshape(rows, n)
    return v, ri


def _inv_kernel4(logn, rows, plan, qn_ref, x_ref, *refs):
    """GS inverse with merged (t, 2t) passes; bit-reversed -> natural."""
    n = 1 << logn
    sub = n // LANES
    limb = pl.program_id(0)
    q = qn_ref[limb, 0]
    v = x_ref[...].reshape(rows, sub, LANES).swapaxes(1, 2)
    v, _ = inv_stage_block4(v, refs, 0, plan, q, rows, n, sub)
    ni = qn_ref[limb, 1]
    ns = qn_ref[limb, 2]
    v = _shoup32(v, ni, ns, q)
    refs[-1][...] = v.reshape(rows, n)


def _expand_tr(tw, ts, n, t_idx, g_idx, t_width=None):
    """Transposed-phase table for butterfly distance ``t_idx`` restricted
    to blocks ``g_idx``, expanded to width ``t_width*sub`` (the value is
    constant over the t axis, so a narrower width is a plain truncation)."""
    sub = n // LANES
    t_width = t_idx if t_width is None else t_width
    m_orig = n // (2 * t_idx)
    blk = LANES // (2 * t_idx)
    g = np.asarray(g_idx)[:, None, None]
    a = np.arange(sub)[None, None, :]
    idx = np.broadcast_to(m_orig + a * blk + g,
                          (len(g_idx), t_width, sub)).reshape(
        len(g_idx), t_width * sub)
    return (np.ascontiguousarray(tw[:, idx]), np.ascontiguousarray(ts[:, idx]))


def _expand_nat(tw, ts, idx_vec):
    """Natural-phase SPLAT table (L, m, 1) for twiddle indices idx_vec."""
    idx = np.asarray(idx_vec)[:, None]
    return (np.ascontiguousarray(tw[:, idx]), np.ascontiguousarray(ts[:, idx]))


def expand_fwd_tables4(tw, ts, logn):
    """Forward radix-4 (plan, stages) from stacked psi_rev tables
    (rows, n): plan entries ('r2', m, t, transposed) consume one (w, ws)
    pair; ('r4', m4, t_small, transposed) consume three pairs ordered
    [level-2t, level-t even blocks, level-t odd blocks]."""
    n = 1 << logn
    plan, stages = [], []
    for pair in _pair_stages(_stage_plan(logn)):
        if len(pair) == 1:
            m, t, tr = pair[0]
            plan.append(('r2', m, t, tr))
            if tr:
                stages.append(_expand_tr(tw, ts, n, t, np.arange(m)))
            else:
                stages.append(_expand_nat(tw, ts, m + np.arange(m)))
        else:
            (mA, tA, tr), (mB, tB, _) = pair           # tA = 2*tB
            m4 = mB // 2
            plan.append(('r4', m4, tB, tr))
            if tr:
                stages.append(_expand_tr(tw, ts, n, tA, np.arange(m4)))
                stages.append(_expand_tr(tw, ts, n, tB, 2 * np.arange(m4)))
                stages.append(_expand_tr(tw, ts, n, tB,
                                         2 * np.arange(m4) + 1))
            else:
                m1 = n // (2 * tB)
                stages.append(_expand_nat(tw, ts, m4 + np.arange(m4)))
                stages.append(_expand_nat(tw, ts, m1 + 2 * np.arange(m4)))
                stages.append(_expand_nat(tw, ts,
                                          m1 + 2 * np.arange(m4) + 1))
    return tuple(plan), stages


@functools.lru_cache(maxsize=None)
def _tables4(ring_key):
    """Forward radix-4 plan + tables for one ring (per-limb grids)."""
    ring, = _RING_STASH[ring_key]
    n, L = ring.n, len(ring.moduli)
    logn = n.bit_length() - 1
    sub = n // LANES
    tw = np.ascontiguousarray(ring.psi_rev, dtype=np.uint32)
    ts = np.ascontiguousarray(ring.psi_rev_shoup, dtype=np.uint32)
    plan, stages = expand_fwd_tables4(tw, ts, logn)
    q = np.asarray(ring.q, dtype=np.uint32).reshape(L, 1)
    return (logn, L, sub, plan, stages, q)


def expand_inv_tables4(tinv, tinv_s, logn):
    """Inverse radix-4 (plan, stages) from stacked psi_inv_rev tables
    (rows, n) — rows may be limbs OR the K3 megakernel's concatenated
    multi-ring rows. r4 pairs consume [level-t even, level-t odd,
    level-2t (truncated to t width)]."""
    n = 1 << logn
    plan, stages = [], []
    for pair in _pair_stages(_inv_stage_plan(logn)):
        if len(pair) == 1:
            m, t, tr = pair[0]
            plan.append(('r2', m, t, tr))
            if tr:
                stages.append(_expand_tr(tinv, tinv_s, n, t, np.arange(m)))
            else:
                m_orig = n // (2 * t)
                stages.append(_expand_nat(tinv, tinv_s,
                                          m_orig + np.arange(m)))
        else:
            (mA, tA, tr), (mB, tB, _) = pair           # tB = 2*tA
            m4 = mB
            plan.append(('r4', m4, tA, tr))
            if tr:
                stages.append(_expand_tr(tinv, tinv_s, n, tA,
                                         2 * np.arange(m4)))
                stages.append(_expand_tr(tinv, tinv_s, n, tA,
                                         2 * np.arange(m4) + 1))
                stages.append(_expand_tr(tinv, tinv_s, n, tB,
                                         np.arange(m4), t_width=tA))
            else:
                m1 = n // (2 * tA)
                m2 = n // (4 * tA)
                stages.append(_expand_nat(tinv, tinv_s,
                                          m1 + 2 * np.arange(m4)))
                stages.append(_expand_nat(tinv, tinv_s,
                                          m1 + 2 * np.arange(m4) + 1))
                stages.append(_expand_nat(tinv, tinv_s, m2 + np.arange(m4)))
    return tuple(plan), stages


@functools.lru_cache(maxsize=None)
def _itables4(ring_key):
    """Inverse radix-4 plan + tables for one ring (per-limb grids)."""
    ring, = _RING_STASH[ring_key]
    n, L = ring.n, len(ring.moduli)
    logn = n.bit_length() - 1
    sub = n // LANES
    tinv = np.ascontiguousarray(ring.psi_inv_rev, dtype=np.uint32)
    tinv_s = np.ascontiguousarray(ring.psi_inv_rev_shoup, dtype=np.uint32)
    plan, stages = expand_inv_tables4(tinv, tinv_s, logn)
    qn = np.stack([np.asarray(ring.q, dtype=np.uint32).reshape(-1),
                   np.asarray([r.n_inv for r in ring.rings],
                              dtype=np.uint32),
                   np.asarray([r.n_inv_shoup for r in ring.rings],
                              dtype=np.uint32)], axis=1)
    return (logn, L, sub, plan, stages, qn)


def _ntt_fused_impl4(x, ring, rows_per_block: int = 8, perm: bool = False):
    key = _stash(ring)
    logn, L, sub, plan, stages, q = _tables4(key)
    n = 1 << logn
    xr, batch, batch_p, shape = _regroup(x, L, n, rows_per_block)
    out = _run(_fwd_kernel4, xr, stages, q, logn=logn, L=L,
               rows_per_block=rows_per_block, smem_cols=1, perm=plan)
    out = out.reshape(L, batch_p, n)[:, :batch]
    return jnp.moveaxis(out, 0, 1).reshape(shape)


def _intt_fused_impl4(x, ring, rows_per_block: int = 8, perm: bool = False):
    key = _stash(ring)
    logn, L, sub, plan, stages, qn = _itables4(key)
    n = 1 << logn
    xr, batch, batch_p, shape = _regroup(x, L, n, rows_per_block)
    out = _run(_inv_kernel4, xr, stages, qn, logn=logn, L=L,
               rows_per_block=rows_per_block, smem_cols=3, perm=plan)
    out = out.reshape(L, batch_p, n)[:, :batch]
    return jnp.moveaxis(out, 0, 1).reshape(shape)


def ntt_fused32_r4(x, ring, rows_per_block: int = 8):
    """Radix-4 forward: bit-identical to ntt_fused32."""
    return _vmap_entry(ring, rows_per_block, _ntt_fused_impl4, 'fwd32r4')(x)


def intt_fused32_r4(x, ring, rows_per_block: int = 8):
    """Radix-4 inverse: bit-identical to intt_fused32."""
    return _vmap_entry(ring, rows_per_block, _intt_fused_impl4, 'inv32r4')(x)
