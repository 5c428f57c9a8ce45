"""Vectorized negacyclic NTT/INTT over RNS limb stacks (NumPy / JAX).

Iterative Cooley–Tukey (forward, natural → bit-reversed) and
Gentleman–Sande (inverse, bit-reversed → natural) with merged ψ twiddles,
expressed entirely as reshapes + broadcast elementwise ops — no gathers, so
XLA maps every butterfly stage onto the VPU and fuses the Shoup arithmetic.
log2(n) stages are unrolled at trace time (static shapes).

Arrays are u64 with shape (..., L, n): leading batch dims, L RNS limbs
(one prime per limb, all limbs transformed in parallel), n coefficients.

This replaces the reference's Lattigo/HEonGPU NTT kernels
(SURVEY.md §2.5 "TPU equivalent"); the convention "NTT domain" throughout
the framework means *bit-reversed evaluation order*, matching these kernels.
"""

import os

from . import u64 as _u

_USE_NATIVE = os.environ.get('LATTISENSE_NO_NATIVE', '') in ('', '0')

# Fused Pallas kernels for the device path (opt-in until the real-chip
# Mosaic build is validated end-to-end; bit-identical to the XLA path,
# see ops/ntt_pallas.py and tests/test_ntt_pallas.py).
_USE_PALLAS = (os.environ.get('LATTISENSE_PALLAS_NTT',
                              os.environ.get('LATTISENSE_PALLAS', '0'))
               not in ('', '0'))
_USE_CONJ_INTT = (os.environ.get('LATTISENSE_CONJ_INTT', '0')
                  not in ('', '0'))
# butterfly radix for the XLA device path: merging levels into one pass
# cuts HBM materializations (the device is bandwidth-bound); 4 = two
# levels per pass. LATTISENSE_NTT_RADIX=2 restores the round-1 code.
_RADIX = int(os.environ.get('LATTISENSE_NTT_RADIX', '4'))
# the inverse kernel is only at parity with XLA so far (NOTES.md) — it can
# be disabled independently while the forward stays fused
_USE_PALLAS_INTT = (os.environ.get('LATTISENSE_PALLAS_INTT',
                                   os.environ.get('LATTISENSE_PALLAS_NTT',
                                                  os.environ.get('LATTISENSE_PALLAS', '0')))
                    not in ('', '0'))


def _native():
    if not _USE_NATIVE:
        return None
    from .. import native
    return native if native.available() else None


def _pallas_ok(xp, n, dtype=None):
    if dtype is not None and dtype.itemsize != 8:
        return False  # fused kernels are u64-specific
    return _USE_PALLAS and xp.__name__ != 'numpy' and n >= 256


# u64 fold-idiom kernels (ops/ntt_pallas64f.py): bit-exact on chip but
# LOSE to XLA isolated (fwd 14.8 vs 11.4 us/limb-row, B=32 L=4 n=16384,
# 2026-08-17) — the 16-bit-digit pair emulation is ~2x the op count of
# XLA's own u64 lowering, and the fold idiom's Mosaic rate (~1.3 Tops/s
# here) cannot make that up. Opt-in for experimentation only.
_USE_PALLAS64F = os.environ.get('LATTISENSE_PALLAS64F', '0') not in ('', '0')


# 32-bit-word fused kernels (ops/ntt_pallas32.py): native u32 Shoup
# butterflies with the 2D-FOLD stage idiom (see that module's docstring).
# Chip-measured 2026-08-17 (B=32, L=8, n=16384): fwd 0.68 ms vs XLA 0.76,
# inv 1.05 vs 1.16 isolated — and END-TO-END the w32 mult_relin improves
# 1972 -> 1340 us/op (1.47x; no u32-plane split/merge, so the pallas
# islands' fusion tax does not bite). 'auto' (default) = ON when the
# backend is a real TPU, off elsewhere (CPU interpret mode is slow);
# LATTISENSE_PALLAS32=0/1 forces.
_PALLAS32_ENV = os.environ.get('LATTISENSE_PALLAS32', 'auto')


def _pallas32_ok(xp, n, dtype):
    if dtype.itemsize != 4 or xp.__name__ == 'numpy' or n < 256:
        return False
    if _PALLAS32_ENV == 'auto':
        import jax
        return jax.default_backend() == 'tpu'
    return _PALLAS32_ENV not in ('', '0')


def ntt(xp, x, ring):
    """Forward negacyclic NTT. x: u64 (..., L, n) in [0, q). Output bit-reversed."""
    # coefficient-sharded ring view (parallel/sharded_engine.py): inside a
    # shard_map the transform is the distributed four-step NTT; host (np)
    # paths — encode/keygen at trace time — fall back to the full-n ring
    if getattr(ring, 'dist', None) is not None:
        if xp.__name__ != 'numpy':
            return ring.dist.fwd_body(x)
        ring = ring.host
    if xp.__name__ == 'numpy':
        nat = _native()
        if nat is not None:
            if x.dtype.itemsize == 4:
                # native kernels are u64/R=2^64; residues mod q are
                # word-independent, so cast through the u64 ring.
                import numpy as _np
                from .modring import get_rns_ring as _grr
                r64 = _grr(ring.moduli, ring.n, 64)
                return nat.ntt_forward(x.astype(_np.uint64), r64).astype(x.dtype)
            return nat.ntt_forward(x, ring)
    if getattr(ring, 'moduli', None) is not None:
        from ..ops import ntt_mxu
        if ntt_mxu.enabled(xp, x.shape[-1], x.dtype):
            return ntt_mxu.ntt(xp, x, ring)
        if _pallas32_ok(xp, x.shape[-1], x.dtype):
            from ..ops.ntt_pallas32 import ntt_fused32
            return ntt_fused32(x, ring)
        if (_USE_PALLAS64F and x.dtype.itemsize == 8
                and xp.__name__ != 'numpy' and x.shape[-1] >= 256):
            from ..ops.ntt_pallas64f import ntt_fused64
            return ntt_fused64(x, ring)
    if _pallas_ok(xp, x.shape[-1], x.dtype):
        from ..ops.ntt_pallas import ntt_fused
        return ntt_fused(x, ring)
    n = x.shape[-1]
    L = x.shape[-2]
    batch = x.shape[:-2]
    q = ring.q.reshape(L, 1, 1)
    q4 = ring.q.reshape(L, 1, 1, 1)
    tbl = ring.psi_rev
    tbl_sh = ring.psi_rev_shoup

    t = n
    m = 1
    while m < n:
        if _RADIX >= 4 and 4 * m <= n and xp.__name__ != 'numpy':
            # radix-4: two butterfly levels in ONE pass — the XLA device
            # path is HBM-bound at ~1 materialization per level, so
            # merging levels halves NTT traffic (same multiply count).
            t //= 4
            xv = x.reshape(*batch, L, m, 2, 2, t)
            s1 = tbl[:, m:2 * m].reshape(L, m, 1, 1)
            s1_sh = tbl_sh[:, m:2 * m].reshape(L, m, 1, 1)
            s2 = tbl[:, 2 * m:4 * m].reshape(L, m, 2, 1)
            s2_sh = tbl_sh[:, 2 * m:4 * m].reshape(L, m, 2, 1)
            u_ = xv[..., 0, :, :]                     # (…, L, m, 2, t)
            v = _u.shoup_mul(xp, xv[..., 1, :, :], s1, s1_sh, q4)
            p = _u.addmod(xp, u_, v, q4)              # level A outputs
            r = _u.submod(xp, u_, v, q4)
            # level B: pairs within p (twiddle 2m+2k) and r (2m+2k+1)
            pv = _u.shoup_mul(xp, p[..., 1:2, :], s2[:, :, 0:1], s2_sh[:, :, 0:1], q4)
            rv = _u.shoup_mul(xp, r[..., 1:2, :], s2[:, :, 1:2], s2_sh[:, :, 1:2], q4)
            p0 = p[..., 0:1, :]
            r0 = r[..., 0:1, :]
            out = xp.concatenate([_u.addmod(xp, p0, pv, q4),
                                  _u.submod(xp, p0, pv, q4),
                                  _u.addmod(xp, r0, rv, q4),
                                  _u.submod(xp, r0, rv, q4)], axis=-2)
            x = out.reshape(*batch, L, n)
            m *= 4
            continue
        t //= 2
        xv = x.reshape(*batch, L, m, 2, t)
        s = tbl[:, m:2 * m].reshape(L, m, 1)
        s_sh = tbl_sh[:, m:2 * m].reshape(L, m, 1)
        u_ = xv[..., 0, :]
        v = _u.shoup_mul(xp, xv[..., 1, :], s, s_sh, q)
        hi = _u.addmod(xp, u_, v, q)
        lo = _u.submod(xp, u_, v, q)
        x = xp.stack([hi, lo], axis=-2).reshape(*batch, L, n)
        m *= 2
    return x


def _brv_transpose(xp, x, n):
    """Bit-reversal of the last axis as one (2,)*logn axis-reversal
    transpose (a tiled relayout — far cheaper than a gather on TPU)."""
    logn = n.bit_length() - 1
    lead = x.shape[:-1]
    k = len(lead)
    x = x.reshape(*lead, *((2,) * logn))
    perm = tuple(range(k)) + tuple(range(k + logn - 1, k - 1, -1))
    return x.transpose(perm).reshape(*lead, n)


def _conj_inv_tables(ring):
    """Per-stage twiddles for the bit-reversal-conjugated (descending
    distance) inverse: W_T[l, g, i] = psi_inv_rev[l, m_core +
    (brv(g·2T+i) >> (k+1))], k = logn-1-log2(T). Conjugation turns the
    GS inverse's ASCENDING butterfly distances into descending ones —
    XLA (like Mosaic) runs ascending stage sequences ~3x slower."""
    cache = getattr(ring, '_conj_inv_tables', None)
    if cache is not None:
        return cache
    import numpy as np
    n = ring.n
    logn = n.bit_length() - 1
    brv = np.zeros(n, dtype=np.int64)
    for bit in range(logn):
        brv |= ((np.arange(n) >> bit) & 1) << (logn - 1 - bit)
    tinv = np.asarray(ring.psi_inv_rev)
    tinv_s = np.asarray(ring.psi_inv_rev_shoup)
    tables = {}
    T = n // 2
    while T >= 1:
        k = logn - 1 - (T.bit_length() - 1)
        m_core = n >> (k + 1)
        m = n // (2 * T)
        p = (np.arange(m)[:, None] * 2 * T + np.arange(T)[None, :]).reshape(-1)
        idx = m_core + (brv[p] >> (k + 1))
        L = tinv.shape[0]
        tables[T] = (tinv[:, idx].reshape(L, m, T),
                     tinv_s[:, idx].reshape(L, m, T))
        T //= 2
    ring._conj_inv_tables = tables
    return tables


def intt(xp, x, ring):
    """Inverse negacyclic NTT. Input bit-reversed, output natural, scaled by n^-1."""
    if getattr(ring, 'dist', None) is not None:   # coeff-sharded ring view
        if xp.__name__ != 'numpy':
            return ring.dist.inv_body(x)
        ring = ring.host
    if xp.__name__ == 'numpy':
        nat = _native()
        if nat is not None:
            if x.dtype.itemsize == 4:
                import numpy as _np
                from .modring import get_rns_ring as _grr
                r64 = _grr(ring.moduli, ring.n, 64)
                return nat.ntt_inverse(x.astype(_np.uint64), r64).astype(x.dtype)
            return nat.ntt_inverse(x, ring)
    if getattr(ring, 'moduli', None) is not None:
        from ..ops import ntt_mxu
        if ntt_mxu.enabled(xp, x.shape[-1], x.dtype):
            return ntt_mxu.intt(xp, x, ring)
        if _pallas32_ok(xp, x.shape[-1], x.dtype):
            from ..ops.ntt_pallas32 import intt_fused32
            return intt_fused32(x, ring)
        if (_USE_PALLAS64F and x.dtype.itemsize == 8
                and xp.__name__ != 'numpy' and x.shape[-1] >= 256):
            from ..ops.ntt_pallas64f import intt_fused64
            return intt_fused64(x, ring)
    if _pallas_ok(xp, x.shape[-1], x.dtype) and _USE_PALLAS_INTT:
        from ..ops.ntt_pallas import intt_fused
        return intt_fused(x, ring)
    if (_USE_CONJ_INTT and xp.__name__ != 'numpy' and x.shape[-1] >= 4
            and getattr(ring, 'moduli', None) is not None):
        # 3.5x faster ISOLATED (2.0 vs 7.1 ms at B=32/L=4) but its two P
        # transposes break XLA's cross-op fusion: the full mult_relin
        # bench REGRESSED 359 -> 305 ops/s, so the default stays off.
        # (The ascending formulation's stages fuse with neighboring
        # elementwise ops; its isolated cost overstates its graph cost.)
        return _intt_conj(xp, x, ring)
    n = x.shape[-1]
    L = x.shape[-2]
    batch = x.shape[:-2]
    q = ring.q.reshape(L, 1, 1)
    q4 = ring.q.reshape(L, 1, 1, 1)
    tbl = ring.psi_inv_rev
    tbl_sh = ring.psi_inv_rev_shoup

    t = 1
    m = n // 2
    while m >= 1:
        if _RADIX >= 4 and m >= 2 and xp.__name__ != 'numpy':
            # radix-4 GS: two levels per pass (see forward comment)
            m2 = m // 2
            xv = x.reshape(*batch, L, m2, 2, 2, t)    # (k, j, i, t)
            s1 = tbl[:, m:2 * m].reshape(L, m2, 2, 1)
            s1_sh = tbl_sh[:, m:2 * m].reshape(L, m2, 2, 1)
            s2 = tbl[:, m2:2 * m2].reshape(L, m2, 1, 1)
            s2_sh = tbl_sh[:, m2:2 * m2].reshape(L, m2, 1, 1)
            u_ = xv[..., 0, :]                        # (…, L, m2, 2, t)
            v = xv[..., 1, :]
            h = _u.addmod(xp, u_, v, q4)
            lo1 = _u.shoup_mul(xp, _u.submod(xp, u_, v, q4), s1, s1_sh, q4)
            # level B pairs j=0 with j=1 (for both h and lo1 lanes)
            a0 = xp.stack([h[..., 0, :], lo1[..., 0, :]], axis=-2)
            a1 = xp.stack([h[..., 1, :], lo1[..., 1, :]], axis=-2)
            hi2 = _u.addmod(xp, a0, a1, q4)
            lo2 = _u.shoup_mul(xp, _u.submod(xp, a0, a1, q4), s2, s2_sh, q4)
            x = xp.concatenate([hi2, lo2], axis=-2).reshape(*batch, L, n)
            t *= 4
            m //= 4
            continue
        xv = x.reshape(*batch, L, m, 2, t)
        s = tbl[:, m:2 * m].reshape(L, m, 1)
        s_sh = tbl_sh[:, m:2 * m].reshape(L, m, 1)
        u_ = xv[..., 0, :]
        v = xv[..., 1, :]
        hi = _u.addmod(xp, u_, v, q)
        lo = _u.shoup_mul(xp, _u.submod(xp, u_, v, q), s, s_sh, q)
        x = xp.stack([hi, lo], axis=-2).reshape(*batch, L, n)
        t *= 2
        m //= 2
    q2 = ring.q.reshape(L, 1)
    return _u.shoup_mul(xp, x, ring.n_inv, ring.n_inv_shoup, q2)


def _intt_conj(xp, x, ring):
    """Conjugated inverse for the device path: x = n^-1·P(conj(P(X))),
    stages at DESCENDING distances (see _conj_inv_tables). Bit-identical
    to the ascending GS formulation (all ops exact mod q)."""
    n = x.shape[-1]
    L = x.shape[-2]
    batch = x.shape[:-2]
    q = ring.q.reshape(L, 1, 1)
    tables = _conj_inv_tables(ring)
    x = _brv_transpose(xp, x, n)
    T = n // 2
    while T >= 1:
        m = n // (2 * T)
        xv = x.reshape(*batch, L, m, 2, T)
        w, w_sh = tables[T]
        u_ = xv[..., 0, :]
        v = xv[..., 1, :]
        hi = _u.addmod(xp, u_, v, q)
        lo = _u.shoup_mul(xp, _u.submod(xp, u_, v, q), w, w_sh, q)
        x = xp.stack([hi, lo], axis=-2).reshape(*batch, L, n)
        T //= 2
    x = _brv_transpose(xp, x, n)
    q2 = ring.q.reshape(L, 1)
    return _u.shoup_mul(xp, x, ring.n_inv, ring.n_inv_shoup, q2)
