"""Fused key-switch inner product: bit-exactness vs the XLA path
(interpret mode on CPU; the same kernel lowers to Mosaic on chip)."""

import numpy as np
import jax
import jax.numpy as jnp

import lattisense_tpu  # noqa: F401
import lattisense_tpu.schemes.keyswitch as ksw_mod
from lattisense_tpu.params import BfvParams
from lattisense_tpu.runtime import BfvContext


def test_ksw_inner_fused_bitexact(monkeypatch):
    params = BfvParams.create(4096)
    ctx = BfvContext.create_random_context(params, seed=4)
    eng = ctx.engine
    m = np.arange(params.n) % 31
    ct = ctx.encrypt(ctx.encode(m))
    ct3 = eng.mult(np, ct, ct)
    rlkj = jax.tree.map(jnp.asarray, ctx.rlk)
    ct3j = jax.tree.map(jnp.asarray, ct3)
    ref = eng.relinearize(jnp, ct3j, rlkj)
    monkeypatch.setattr(ksw_mod, '_USE_PALLAS', True)
    got = eng.relinearize(jnp, ct3j, rlkj)
    np.testing.assert_array_equal(np.asarray(got.data), np.asarray(ref.data))


def test_ksw_fused_rotation_path(monkeypatch):
    """Hoisted galois (decompose_modup_ntt + inner product) under the
    fused gate decrypts identically on the jax path."""
    params = BfvParams.create(4096)
    ctx = BfvContext.create_random_context(params, seed=5)
    ctx.gen_rotation_keys_for_rotations([1])
    eng = ctx.engine
    m = (np.arange(params.n) * 5) % 17
    ct = ctx.encrypt(ctx.encode(m))
    from lattisense_tpu.schemes.galois import galois_elt_col
    elt = galois_elt_col(1, params.n)
    glk = ctx.glk.keys[elt]
    ref = eng.apply_galois(np, ct, elt, glk)
    ctj = jax.tree.map(jnp.asarray, ct)
    glkj = jax.tree.map(jnp.asarray, glk)
    monkeypatch.setattr(ksw_mod, '_USE_PALLAS', True)
    got = eng.apply_galois(jnp, ctj, elt, glkj)
    got = jax.tree.map(np.asarray, got)
    np.testing.assert_array_equal(ctx.decrypt_decode(got),
                                  ctx.decrypt_decode(ref))
