"""Randomized graph conformance: random op-DAG programs executed through
the compiled (jit) path vs the eager NumPy oracle vs a plaintext slot-math
oracle tracked alongside construction.

The fixed op matrix (test_op_matrix / test_conformance_full) pins every op
in isolation; this fuzzer pins *compositions* — the orderings, fan-outs
and reuse patterns real graphs produce (the reference's power-DAG tests,
`unittests/test_cpu_bfv.py` ctc_ctc_* / 1_square_square cases, are a
hand-picked subset of this space). BFV, so every comparison is bit-exact.
"""

import os

import numpy as np
import pytest

import lattisense_tpu  # noqa: F401
from lattisense_tpu.core.modring import gen_ntt_primes
from lattisense_tpu.frontend import custom_task as ct
from lattisense_tpu.params import BfvParams
from lattisense_tpu.runtime import BfvContext, FheTaskTpu

from . import oracles

N, T = 64, 65537
LEVEL = 2
STEPS = (1, 2, 5)           # rotation steps the fuzzer may draw
N_INPUTS = 3
N_OPS = 10


@pytest.fixture(scope='module')
def setup():
    q = gen_ntt_primes(N, 50, 3)
    p = gen_ntt_primes(N, 51, 1, exclude=tuple(q))
    fe_param = ct.BfvParam.create_custom_param(n=N, q=q, p=p, t=T)
    context = BfvContext.create_random_context(
        BfvParams.create_custom(N, T, q, p), seed=11)
    context.gen_rotation_keys_for_rotations(list(STEPS))
    return fe_param, context


def _random_program(rng, tmp_path):
    """Build one random DAG; returns (task_dir, input msgs, expected)."""
    nodes = []          # (frontend node, plaintext slot vector oracle)
    ins = []
    msgs = {}
    for k in range(N_INPUTS):
        m = rng.integers(0, T, N, dtype=np.uint64)
        node = ct.BfvCiphertextNode(f'in{k}', LEVEL)
        ins.append(ct.Argument(f'in{k}', node))
        msgs[f'in{k}'] = m
        nodes.append((node, m.astype(object)))

    fresh = 0
    for _ in range(N_OPS):
        op = rng.choice(['add', 'sub', 'neg', 'mult_relin', 'rotate'])
        ai = int(rng.integers(0, len(nodes)))
        a, ma = nodes[ai]
        name = f'v{fresh}'
        fresh += 1
        if op == 'add':
            bi = int(rng.integers(0, len(nodes)))
            b, mb = nodes[bi]
            nodes.append((ct.add(a, b, name), (ma + mb) % T))
        elif op == 'sub':
            bi = int(rng.integers(0, len(nodes)))
            b, mb = nodes[bi]
            nodes.append((ct.sub(a, b, name), (ma - mb) % T))
        elif op == 'neg':
            nodes.append((ct.neg(a, name), (-ma) % T))
        elif op == 'mult_relin':
            bi = int(rng.integers(0, len(nodes)))
            b, mb = nodes[bi]
            nodes.append((ct.mult_relin(a, b, name), (ma * mb) % T))
        else:
            step = int(rng.choice(STEPS))
            nodes.append((ct.rotate_cols(a, step, name)[0],
                          np.array(oracles.vec_rotate_col(ma, step),
                                   dtype=object)))

    # consume every node (the serializer rejects dead intermediates):
    # fold the whole frontier into one output sum
    out_node, out_m = nodes[-1]
    for node, m in nodes[:-1]:
        out_node = ct.add(out_node, node, f'acc{fresh}')
        fresh += 1
        out_m = (out_m + m) % T
    outs = [ct.Argument('out', out_node)]
    ct.process_custom_task(input_args=ins, output_args=outs,
                           output_instruction_path=str(tmp_path))
    return str(tmp_path), msgs, out_m.astype(np.uint64)


# widen the seed pool in the slow tier (LATTISENSE_FUZZ_SEEDS overrides)
_N_SEEDS = int(os.environ.get(
    'LATTISENSE_FUZZ_SEEDS',
    '24' if os.environ.get('LATTISENSE_SLOW_TESTS', '') not in ('', '0')
    else '6'))


@pytest.mark.parametrize('seed', range(_N_SEEDS))
def test_random_program_jit_vs_eager_vs_plain(setup, tmp_path, seed):
    fe_param, context = setup
    ct.set_fhe_param(fe_param)
    rng = np.random.default_rng(1000 + seed)
    task_dir, msgs, expected = _random_program(rng, tmp_path)
    args = {k: context.encrypt(context.encode(m, LEVEL))
            for k, m in msgs.items()}
    got_j, _ = FheTaskTpu(task_dir, mode='jit').run(context, args)
    got_e, _ = FheTaskTpu(task_dir, mode='eager').run(context, args)
    np.testing.assert_array_equal(np.asarray(got_j['out'].data),
                                  np.asarray(got_e['out'].data))
    np.testing.assert_array_equal(context.decrypt_decode(got_j['out']),
                                  expected)


# ---------------------------------------------------------------------------
# CKKS: random compositions under scale/level tracking. Multiplications
# advance a node one "generation" (mult_relin + rescale → level-1); ops only
# combine scale-coherent nodes (same generation), so the fuzzer explores the
# legal composition space while the runtime's static scale propagation is
# exercised end-to-end. One output per non-empty generation.
# ---------------------------------------------------------------------------

from lattisense_tpu.params import CkksParams    # noqa: E402
from lattisense_tpu.runtime import CkksContext  # noqa: E402

C_LEVEL = 3
C_SLOTS = N // 2


@pytest.fixture(scope='module')
def ckks_setup():
    big = gen_ntt_primes(N, 60, 2)
    mids = gen_ntt_primes(N, 40, 3)
    q, p = [big[0]] + mids, [big[1]]
    scale = float(1 << 40)
    fe_param = ct.CkksParam.create_custom_param(n=N, q=q, p=p,
                                                slots=C_SLOTS, scale=scale)
    context = CkksContext.create_random_context(
        CkksParams.create_custom(N, q, p, slots=C_SLOTS, scale=scale),
        seed=17)
    context.gen_rotation_keys_for_rotations(list(STEPS))
    return fe_param, context


def _random_ckks_program(rng, tmp_path):
    gens: dict[int, list] = {0: []}     # gen → [(node, value vector)]
    ins, vals = [], {}
    for k in range(N_INPUTS):
        v = rng.uniform(-1, 1, C_SLOTS)
        node = ct.CkksCiphertextNode(f'in{k}', C_LEVEL)
        ins.append(ct.Argument(f'in{k}', node))
        vals[f'in{k}'] = v
        gens[0].append((node, v))

    fresh = 0
    for _ in range(N_OPS):
        op = rng.choice(['add', 'sub', 'neg', 'mult', 'rotate'])
        g = int(rng.choice([g for g, ns in gens.items() if ns]))
        pool = gens[g]
        a, va = pool[int(rng.integers(0, len(pool)))]
        name = f'v{fresh}'
        fresh += 1
        if op == 'mult' and g < C_LEVEL - 1:
            b, vb = pool[int(rng.integers(0, len(pool)))]
            z = ct.rescale(ct.mult_relin(a, b, name), f'{name}r')
            gens.setdefault(g + 1, []).append((z, va * vb))
        elif op in ('add', 'sub'):
            b, vb = pool[int(rng.integers(0, len(pool)))]
            f = ct.add if op == 'add' else ct.sub
            pool.append((f(a, b, name), va + vb if op == 'add' else va - vb))
        elif op == 'neg':
            pool.append((ct.neg(a, name), -va))
        else:
            step = int(rng.choice(STEPS))
            pool.append((ct.rotate_cols(a, step, name)[0],
                         np.roll(va, -step)))

    outs, expected = [], {}
    for g, pool in sorted(gens.items()):
        if not pool:
            continue
        node, v = pool[-1]
        for other, vo in pool[:-1]:
            node = ct.add(node, other, f'fold{fresh}')
            fresh += 1
            v = v + vo
        outs.append(ct.Argument(f'out{g}', node))
        expected[f'out{g}'] = v
    ct.process_custom_task(input_args=ins, output_args=outs,
                           output_instruction_path=str(tmp_path))
    return str(tmp_path), vals, expected


@pytest.mark.parametrize('seed', range(max(1, _N_SEEDS * 2 // 3)))
def test_random_ckks_program_jit_vs_eager_vs_plain(ckks_setup, tmp_path,
                                                   seed):
    fe_param, context = ckks_setup
    ct.set_fhe_param(fe_param)
    rng = np.random.default_rng(2000 + seed)
    task_dir, vals, expected = _random_ckks_program(rng, tmp_path)
    args = {k: context.encrypt(context.encode(v, C_LEVEL))
            for k, v in vals.items()}
    got_j, _ = FheTaskTpu(task_dir, mode='jit').run(context, args)
    got_e, _ = FheTaskTpu(task_dir, mode='eager').run(context, args)
    for k, want in expected.items():
        np.testing.assert_array_equal(np.asarray(got_j[k].data),
                                      np.asarray(got_e[k].data))
        got = context.decrypt_decode(got_j[k]).real[:C_SLOTS]
        np.testing.assert_allclose(got, want.astype(float), atol=5e-4)
