"""Randomized graph conformance: random op-DAG programs executed through
the compiled (jit) path vs the eager NumPy oracle vs a plaintext slot-math
oracle tracked alongside construction.

The fixed op matrix (test_op_matrix / test_conformance_full) pins every op
in isolation; this fuzzer pins *compositions* — the orderings, fan-outs
and reuse patterns real graphs produce (the reference's power-DAG tests,
`unittests/test_cpu_bfv.py` ctc_ctc_* / 1_square_square cases, are a
hand-picked subset of this space). BFV, so every comparison is bit-exact.
"""

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


@pytest.mark.parametrize('seed', range(6))
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
