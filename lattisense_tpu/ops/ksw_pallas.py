"""Fused Pallas key-switch inner product: Σ_β digit_β ⊙ key_β in VMEM.

Why: KeySwitcher.inner_product (schemes/keyswitch.py) materializes the
(..., β, 2, T, n) terms tensor to HBM before the β-sum. This kernel
accumulates per (batch-block, T-block) in VMEM; the only extra traffic is
re-reading the key block once per batch-block.

Math identical to inner_product: out[c, t] = Σ_β mont_mul(d[β, t],
k[β, c, t]) mod q_t, all operands already NTT-domain / Montgomery-form.
Bit-identical (same u32-pair REDC as ops/bconv_pallas.py).

Grid: (batch-blocks, T-blocks of 8); per-t modulus scalars in SMEM.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bconv_pallas import _addmod64_, _mont_mul64

TBLK = 8


def _ksw_kernel(beta, rb, qd_ref, dh_ref, dl_ref, kh_ref, kl_ref,
                oh_ref, ol_ref):
    tb = pl.program_id(1)
    for i in range(TBLK):
        t = tb * TBLK + i
        qh = qd_ref[t, 0]
        ql = qd_ref[t, 1]
        pvh = qd_ref[t, 2]
        pvl = qd_ref[t, 3]
        for c in range(2):
            acc_h = acc_l = None
            for l in range(beta):
                ah = dh_ref[:, l, i, :]              # (rb, n)
                al = dl_ref[:, l, i, :]
                bh = kh_ref[l, c, i, :][None]        # (1, n) key row
                bl = kl_ref[l, c, i, :][None]
                ph_, pl_ = _mont_mul64(ah, al, bh, bl, qh, ql, pvh, pvl)
                if acc_h is None:
                    acc_h, acc_l = ph_, pl_
                else:
                    acc_h, acc_l = _addmod64_(acc_h, acc_l, ph_, pl_,
                                              qh, ql)
            oh_ref[:, c, i, :] = acc_h
            ol_ref[:, c, i, :] = acc_l


@functools.partial(jax.jit,
                   static_argnames=('beta', 'T', 'rows_per_block'))
def _launch(dh, dl, kh, kl, qd, *, beta, T, rows_per_block):
    """dh/dl: (B, β, T, n); kh/kl: (β, 2, T, n); out (B, 2, T, n) pair."""
    B, n = dh.shape[0], dh.shape[-1]
    Rb = rows_per_block
    grid = (B // Rb, T // TBLK)
    interp = jax.default_backend() == 'cpu'

    def _im(*vals):
        return tuple(jnp.int32(v) for v in vals)

    d_spec = pl.BlockSpec((Rb, beta, TBLK, n),
                          lambda b, t: _im(b, 0, t, 0),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((beta, 2, TBLK, n),
                          lambda b, t: _im(0, 0, t, 0),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((Rb, 2, TBLK, n),
                          lambda b, t: _im(b, 0, t, 0),
                          memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((T, 4), lambda b, t: _im(0, 0),
                        memory_space=pltpu.SMEM)
    cparams = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024,
                                   dimension_semantics=('arbitrary',
                                                        'arbitrary'))
    oh, ol = pl.pallas_call(
        functools.partial(_ksw_kernel, beta, Rb),
        interpret=interp,
        compiler_params=cparams,
        grid=grid,
        in_specs=[smem, d_spec, d_spec, k_spec, k_spec],
        out_specs=[o_spec, o_spec],
        out_shape=[jax.ShapeDtypeStruct((B, 2, T, n), jnp.uint32)] * 2,
    )(qd, dh, dl, kh, kl)
    return oh, ol


def _split64(a):
    a = jnp.asarray(a, dtype=jnp.uint64)
    return ((a >> jnp.uint64(32)).astype(jnp.uint32),
            (a & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32))


def _ksw_inner_impl(digits_ntt, kd, q, pinv, rows_per_block: int = 4):
    """Drop-in for the inner_product core: digits (..., β, T, n) u64,
    kd (β, 2, T, n) u64 keys, q/pinv (T, 1) u64 → pair of (..., T, n).

    T is padded to a multiple of 8 (padded moduli = 1: garbage lanes are
    sliced away); the batch is padded to ``rows_per_block``.
    """
    shape = digits_ntt.shape
    beta, T, n = shape[-3], shape[-2], shape[-1]
    batch = int(np.prod(shape[:-3])) if len(shape) > 3 else 1
    d = digits_ntt.reshape(batch, beta, T, n)
    padt = (-T) % TBLK
    q = np.asarray(q, dtype=np.uint64).reshape(-1)
    pv = np.asarray(pinv, dtype=np.uint64).reshape(-1)
    if padt:
        d = jnp.pad(d, ((0, 0), (0, 0), (0, padt), (0, 0)))
        kd = jnp.pad(kd, ((0, 0), (0, 0), (0, padt), (0, 0)))
        q = np.concatenate([q, np.ones(padt, dtype=np.uint64)])
        pv = np.concatenate([pv, np.ones(padt, dtype=np.uint64)])
    padb = (-batch) % rows_per_block
    if padb:
        d = jnp.pad(d, ((0, padb), (0, 0), (0, 0), (0, 0)))
    qd = np.stack([(q >> np.uint64(32)).astype(np.uint32),
                   (q & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                   (pv >> np.uint64(32)).astype(np.uint32),
                   (pv & np.uint64(0xFFFFFFFF)).astype(np.uint32)], axis=1)
    dh, dl = _split64(d)
    kh, kl = _split64(kd)
    oh, ol = _launch(dh, dl, kh, kl, jnp.asarray(qd), beta=beta,
                     T=T + padt, rows_per_block=rows_per_block)
    out = oh.astype(jnp.uint64) << jnp.uint64(32) | ol.astype(jnp.uint64)
    out = out[:batch, :, :T]                       # (B, 2, T, n)
    acc = out.reshape(*shape[:-3], 2, T, n)
    return acc[..., 0, :, :], acc[..., 1, :, :]


# vmap-aware entry (see ops/ntt_pallas.py rationale): the mapped axis
# collapses into the kernel's leading batch dims; the key operand stays
# unmapped (vmap in_axes=None broadcasts it).
_VMAP_CACHE: dict = {}


def ksw_inner_fused(digits_ntt, kd, q, pinv, rows_per_block: int = 4):
    """Drop-in for the gadget inner product core (vmap-collapsing)."""
    key = (tuple(np.asarray(q, dtype=np.uint64).reshape(-1).tolist()),
           rows_per_block)
    f = _VMAP_CACHE.get(key)
    if f is None:
        @jax.custom_batching.custom_vmap
        def f(d, k):
            return _ksw_inner_impl(d, k, q, pinv, rows_per_block)

        @f.def_vmap
        def _rule(axis_size, in_batched, db, kb):
            assert not in_batched[1], 'mapped key operand unsupported'
            return _ksw_inner_impl(db, kb, q, pinv, rows_per_block), \
                (True, True)

        _VMAP_CACHE[key] = f
    return f(digits_ntt, kd)
