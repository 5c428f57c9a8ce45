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


def test_integrated_limb_tp_mult_relin(ctx):
    """Integrated 2-D pipeline: op-sharded BEHZ mult feeding the
    explicit-collective limb-TP key switch in one jit program — bit-exact
    vs the single-device golden pipeline."""
    from lattisense_tpu.parallel.batch import make_limb_tp_mult_relin
    level = 3
    mesh = make_mesh(op=4, limb=2)
    f, prep = make_limb_tp_mult_relin(ctx.engine, level, mesh)
    kd = prep(ctx.rlk.key_q, ctx.rlk.key_p)
    batch = 8
    rng = np.random.default_rng(8)
    msgs = rng.integers(0, T, (2 * batch, N), dtype=np.uint64)
    cts = [ctx.encrypt(ctx.encode(m, level)) for m in msgs]
    a = np.stack([c.data for c in cts[:batch]])
    b = np.stack([c.data for c in cts[batch:]])
    out = np.asarray(f(a, b, kd))
    for i in range(batch):
        ref = ctx.engine.relinearize(
            np, ctx.engine.mult(np, cts[i], cts[batch + i]), ctx.rlk)
        np.testing.assert_array_equal(out[i], np.asarray(ref.data))


@pytest.mark.parametrize('mesh_shape', [(8, 1), (2, 4)],
                         ids=['op8', 'op2xlimb4'])
def test_task_graph_op_placement(ctx, tmp_path, mesh_shape):
    """FheTaskTpu(mesh=...): iso-op groups of a compiled task sharded over
    the op axis — and, when the mesh carries a limb axis, each member's RNS
    limbs sharded across it (graph-level DP x kernel-level TP in one
    compiled program) — results identical to the eager interpreter."""
    from lattisense_tpu.frontend import custom_task as fct
    from lattisense_tpu.runtime import FheTaskTpu
    level = 3
    mesh = make_mesh(op=mesh_shape[0], limb=mesh_shape[1])
    params = ctx.params
    fe = fct.BfvParam.create_custom_param(n=N, q=list(params.q),
                                          p=list(params.p), t=T)
    fct.set_fhe_param(fe)
    n_par = 8
    ins, outs = [], []
    for k in range(n_par):
        xk = fct.BfvCiphertextNode(f'x{k}', level)
        yk = fct.BfvCiphertextNode(f'y{k}', level)
        ins += [fct.Argument(f'x{k}', xk), fct.Argument(f'y{k}', yk)]
        outs.append(fct.Argument(f'z{k}', fct.mult_relin(xk, yk, f'z{k}')))
    fct.process_custom_task(ins, outs, output_instruction_path=str(tmp_path))

    rng = np.random.default_rng(9)
    vals = {}
    expected = {}
    for k in range(n_par):
        m1 = rng.integers(0, T, N, dtype=np.uint64)
        m2 = rng.integers(0, T, N, dtype=np.uint64)
        vals[f'x{k}'] = ctx.encrypt(ctx.encode(m1, level))
        vals[f'y{k}'] = ctx.encrypt(ctx.encode(m2, level))
        expected[f'z{k}'] = (m1.astype(object) * m2 % T).astype(np.uint64)
    placed = FheTaskTpu(str(tmp_path), mode='jit', mesh=mesh)
    out_p, _ = placed.run(ctx, vals)
    eager = FheTaskTpu(str(tmp_path), mode='eager')
    out_e, _ = eager.run(ctx, vals)
    for k in range(n_par):
        np.testing.assert_array_equal(np.asarray(out_p[f'z{k}'].data),
                                      np.asarray(out_e[f'z{k}'].data))
        np.testing.assert_array_equal(ctx.decrypt_decode(out_p[f'z{k}']),
                                      expected[f'z{k}'])
