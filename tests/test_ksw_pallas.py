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
