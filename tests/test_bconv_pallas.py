"""Fused FastBConv kernel: bit-exactness vs core BasisConv.convert
(interpret mode on CPU; same kernel lowers to Mosaic on chip)."""

import numpy as np
import jax.numpy as jnp

import lattisense_tpu  # noqa: F401
from lattisense_tpu.core.modring import gen_ntt_primes
from lattisense_tpu.core.rns import BasisConv
from lattisense_tpu.ops.bconv_pallas import bconv_convert_fused


def test_bconv_fused_bitexact():
    n, L, T, B = 2048, 3, 4, 2
    src = gen_ntt_primes(n, 55, L)
    dst = gen_ntt_primes(n, 56, T, exclude=tuple(src))
    conv = BasisConv(tuple(src), tuple(dst))
    rng = np.random.default_rng(0)
    x = np.stack([np.stack([rng.integers(0, qi, n, dtype=np.uint64)
                            for qi in src]) for _ in range(B)])
    y = conv.decompose(np, x)
    ref = conv.convert(np, y)
    got = np.asarray(bconv_convert_fused(jnp.asarray(y), conv))
    np.testing.assert_array_equal(got, ref)


def test_bconv_fused_no_batch():
    n, L, T = 4096, 2, 2
    src = gen_ntt_primes(n, 50, L)
    dst = gen_ntt_primes(n, 51, T, exclude=tuple(src))
    conv = BasisConv(tuple(src), tuple(dst))
    rng = np.random.default_rng(1)
    x = np.stack([rng.integers(0, qi, n, dtype=np.uint64) for qi in src])
    y = conv.decompose(np, x)
    ref = conv.convert(np, y)
    got = np.asarray(bconv_convert_fused(jnp.asarray(y), conv))
    np.testing.assert_array_equal(got, ref)


def test_bconv_gate_pipeline(monkeypatch):
    """LATTISENSE_PALLAS routes BasisConv.convert through the fused kernel
    on the jax (device) path of a full BFV multiply — bit-identical
    ciphertext. (The facade context is numpy-eager; the jax path is what
    FheTaskTpu jits, so drive the engine with xp=jnp directly.)"""
    import jax
    import lattisense_tpu.core.rns as core_rns
    from lattisense_tpu.params import BfvParams
    from lattisense_tpu.runtime import BfvContext
    params = BfvParams.create(4096)
    ctx = BfvContext.create_random_context(params, seed=2)
    eng = ctx.engine
    m1 = np.arange(params.n) % 97
    m2 = (np.arange(params.n) * 3) % 97
    ct1, ct2 = ctx.encrypt(ctx.encode(m1)), ctx.encrypt(ctx.encode(m2))
    ref = eng.relinearize(np, eng.mult(np, ct1, ct2), ctx.rlk)
    cj1 = jax.tree.map(jnp.asarray, ct1)
    cj2 = jax.tree.map(jnp.asarray, ct2)
    rlkj = jax.tree.map(jnp.asarray, ctx.rlk)
    monkeypatch.setattr(core_rns, '_USE_PALLAS', True)
    got = eng.relinearize(jnp, eng.mult(jnp, cj1, cj2), rlkj)
    np.testing.assert_array_equal(np.asarray(got.data), np.asarray(ref.data))
    np.testing.assert_array_equal(ctx.decrypt_decode(
        jax.tree.map(np.asarray, got)), ctx.decrypt_decode(ref))
