"""Multi-chip sharding conformance on the virtual 8-device CPU mesh:
batched (op-axis) + limb-sharded pipelines must stay bit-identical to the
single-device NumPy golden path."""

import numpy as np
import pytest

import lattisense_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from lattisense_tpu.core.modring import gen_ntt_primes
from lattisense_tpu.params import BfvParams
from lattisense_tpu.runtime import BfvContext
from lattisense_tpu.parallel.mesh import make_mesh, ct_batch_spec, key_spec, shard
from lattisense_tpu.parallel.batch import (bfv_mult_relin, key_tree,
                                           make_batched_step)

N, T = 64, 65537


@pytest.fixture(scope='module')
def ctx():
    q = gen_ntt_primes(N, 50, 4)
    p = gen_ntt_primes(N, 51, 2, exclude=tuple(q))
    params = BfvParams.create_custom(N, T, q, p)
    return BfvContext.create_random_context(params, seed=21)


@pytest.mark.parametrize('limb', [1, 2])
def test_batched_mult_relin_sharded_bitexact(ctx, limb):
    level = 3
    mesh = make_mesh(op=8 // limb, limb=limb)
    fn = make_batched_step(ctx.engine, bfv_mult_relin, level, mesh=mesh,
                           limb_sharded=(limb > 1), n_inputs=2)
    batch = 8
    rng = np.random.default_rng(5)
    msgs = rng.integers(0, T, (2 * batch, N), dtype=np.uint64)
    cts = [ctx.encrypt(ctx.encode(m, level)) for m in msgs]
    a = np.stack([c.data for c in cts[:batch]])
    b = np.stack([c.data for c in cts[batch:]])
    keys = key_tree(ctx)

    from jax.sharding import NamedSharding
    a_d = shard(mesh, a, ct_batch_spec(limb > 1))
    b_d = shard(mesh, b, ct_batch_spec(limb > 1))
    keys_d = jax.tree.map(
        lambda k: jax.device_put(k, NamedSharding(mesh, key_spec(limb > 1))), keys)
    out = np.asarray(fn(a_d, b_d, keys_d))

    for i in range(batch):
        ref = ctx.engine.relinearize(np, ctx.engine.mult(np, cts[i], cts[batch + i]),
                                     ctx.rlk)
        np.testing.assert_array_equal(out[i], ref.data)
        np.testing.assert_array_equal(
            ctx.decrypt_decode(ref),
            (msgs[i].astype(object) * msgs[batch + i] % T).astype(np.uint64))
