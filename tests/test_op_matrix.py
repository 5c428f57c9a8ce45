"""Whole-pipeline op matrix over parameter sets × levels — the reference's
test_cpu_bfv / test_cpu_ckks case inventory (SURVEY.md §4): ct±ct, ct±pt,
ct±pt_ringt, neg, ct×{pt, pt_ringt, pt_mul, ct}, squares, relin, rescale,
level ladders and power DAGs, N_OP parallel ops per graph."""

import numpy as np
import pytest

import lattisense_tpu  # noqa: F401
from lattisense_tpu.core.modring import gen_ntt_primes
from lattisense_tpu.frontend import custom_task as fct
from lattisense_tpu.params import BfvParams, CkksParams
from lattisense_tpu.runtime import BfvContext, CkksContext, FheTaskTpu

from . import oracles

N, T = 64, 65537
N_OP = 4          # parallel ops per graph (reference test_cpu_bfv.py:50)


@pytest.fixture(scope='module', params=['setA', 'setB'])
def bfv(request):
    """Two parameter sets (the reference runs n=16384 default + n=8192
    custom; scaled-down chains with the same level structure)."""
    if request.param == 'setA':
        q = gen_ntt_primes(N, 50, 4)
        p = gen_ntt_primes(N, 51, 1, exclude=tuple(q))
    else:
        q = gen_ntt_primes(N, 45, 3)
        p = gen_ntt_primes(N, 46, 1, exclude=tuple(q))
    fe = fct.BfvParam.create_custom_param(n=N, q=q, p=p, t=T)
    params = BfvParams.create_custom(N, T, q, p)
    ctx = BfvContext.create_random_context(params, seed=61)
    return fe, ctx


def run_graph(fe, ctx, build, inputs, tmp_path):
    fct.set_fhe_param(fe)
    ins, outs = build()
    fct.process_custom_task(input_args=ins, output_args=outs,
                            output_instruction_path=str(tmp_path))
    task = FheTaskTpu(str(tmp_path), mode='eager')
    return task.run(ctx, inputs)[0]


def _rand(rng):
    return rng.integers(0, T, N, dtype=np.uint64)


CASES = {
    # name: (graph op, plain oracle, input kinds)
    'cac':       (lambda m, x, y: m.add(x, y), oracles.vec_mod_add, ('ct', 'ct')),
    'cap':       (lambda m, x, y: m.add(x, y), oracles.vec_mod_add, ('ct', 'pt')),
    'car':       (lambda m, x, y: m.add(x, y), oracles.vec_mod_add, ('ct', 'ringt')),
    'csc':       (lambda m, x, y: m.sub(x, y), oracles.vec_mod_sub, ('ct', 'ct')),
    'csp':       (lambda m, x, y: m.sub(x, y), oracles.vec_mod_sub, ('ct', 'pt')),
    'csr':       (lambda m, x, y: m.sub(x, y), oracles.vec_mod_sub, ('ct', 'ringt')),
    'cneg':      (lambda m, x: m.neg(x), oracles.vec_mod_neg, ('ct',)),
    'cmp':       (lambda m, x, y: m.mult(x, y), oracles.vec_mod_mul, ('ct', 'pt')),
    'cmp_ringt': (lambda m, x, y: m.mult(x, y), oracles.vec_mod_mul, ('ct', 'ringt')),
    'cmp_mul':   (lambda m, x, y: m.mult(x, y), oracles.vec_mod_mul, ('ct', 'ptmul')),
    'cmc_relin': (lambda m, x, y: m.relin(m.mult(x, y)), oracles.vec_mod_mul,
                  ('ct', 'ct')),
    'csqr_relin': (lambda m, x: m.relin(m.mult(x, x)), lambda a, t: oracles.vec_mod_mul(a, a, t),
                   ('ct',)),
}


@pytest.mark.parametrize('case', sorted(CASES))
@pytest.mark.parametrize('level', [1, 2])
def test_bfv_op_matrix(bfv, tmp_path, case, level):
    fe, ctx = bfv
    if level > fe.max_level:
        pytest.skip('level beyond chain')
    op, oracle, kinds = CASES[case]
    rng = np.random.default_rng(hash(case) % 2**31)
    msgs = [[_rand(rng) for _ in kinds] for _ in range(N_OP)]

    def build():
        ins, outs = [], []
        for k in range(N_OP):
            nodes = []
            for i, kind in enumerate(kinds):
                if kind == 'ct':
                    nodes.append(fct.BfvCiphertextNode(f'in{k}_{i}', level))
                elif kind == 'pt':
                    nodes.append(fct.BfvPlaintextNode(f'in{k}_{i}', level))
                elif kind == 'ringt':
                    nodes.append(fct.BfvPlaintextRingtNode(f'in{k}_{i}'))
                elif kind == 'ptmul':
                    nodes.append(fct.BfvPlaintextMulNode(f'in{k}_{i}', level))
            outs.append(op(fct, *nodes, ))
            ins += nodes
        return ([fct.Argument(n.id, n) for n in ins],
                [fct.Argument(f'out{k}', o) for k, o in enumerate(outs)])

    def build_wrap():
        return build()

    fct.set_fhe_param(fe)
    ins, outs = build_wrap()
    fct.process_custom_task(input_args=ins, output_args=outs,
                            output_instruction_path=str(tmp_path))
    task = FheTaskTpu(str(tmp_path), mode='eager')

    values = {}
    for k, kindvals in enumerate(msgs):
        for i, (kind, m) in enumerate(zip(kinds, kindvals)):
            key = f'in{k}_{i}'
            if kind == 'ct':
                values[key] = ctx.encrypt(ctx.encode(m, level))
            elif kind == 'pt':
                values[key] = ctx.encode(m, level)
            elif kind == 'ringt':
                values[key] = ctx.encode_ringt(m)
            elif kind == 'ptmul':
                values[key] = ctx.encode_mul(m, level)
    outputs, _ = task.run(ctx, values)
    for k in range(N_OP):
        expected = oracle(*msgs[k], T)
        np.testing.assert_array_equal(ctx.decrypt_decode(outputs[f'out{k}']),
                                      expected)


def _mk(fct_mod, name, level):
    return fct_mod.BfvCiphertextNode(name, level)


def test_bfv_power_dag(bfv, tmp_path):
    """x^4 via square-square with rescale ladder (reference power DAGs
    ctc_ctc_* / 1_square_square)."""
    fe, ctx = bfv
    if fe.max_level < 2:
        pytest.skip('needs 3 limbs')
    rng = np.random.default_rng(99)
    m = _rand(rng)

    def build():
        x = fct.BfvCiphertextNode('x', 2)
        x2 = fct.rescale(fct.mult_relin(x, x))
        x4 = fct.rescale(fct.mult_relin(x2, x2), 'x4')
        return [fct.Argument('x', x)], [fct.Argument('x4', x4)]

    outputs = run_graph(fe, ctx, build, {'x': ctx.encrypt(ctx.encode(m, 2))},
                        tmp_path)
    expected = (pow(m.astype(object), 4) % T).astype(np.uint64)
    np.testing.assert_array_equal(ctx.decrypt_decode(outputs['x4']), expected)


# ---------------------------------------------------------------------------
# CKKS matrix
# ---------------------------------------------------------------------------

@pytest.fixture(scope='module')
def ckks():
    big = gen_ntt_primes(N, 60, 2)
    mids = gen_ntt_primes(N, 40, 3)
    params = CkksParams.create_custom(N, [big[0]] + mids, [big[1]],
                                      scale=float(1 << 40))
    fe = fct.CkksParam.create_custom_param(N, [big[0]] + mids, [big[1]],
                                           scale=float(1 << 40))
    ctx = CkksContext.create_random_context(params, seed=62)
    return fe, ctx


CKKS_CASES = {
    'cac':   (lambda m, x, y: m.add(x, y), lambda a, b: a + b, ('ct', 'ct')),
    'csc':   (lambda m, x, y: m.sub(x, y), lambda a, b: a - b, ('ct', 'ct')),
    'cneg':  (lambda m, x: m.neg(x), lambda a: -a, ('ct',)),
    'cmc_rr': (lambda m, x, y: m.rescale(m.relin(m.mult(x, y))),
               lambda a, b: a * b, ('ct', 'ct')),
    'cmp_mul': (lambda m, x, y: m.rescale(m.mult(x, y)), lambda a, b: a * b,
                ('ct', 'ptmul')),
    'drop':  (lambda m, x: m.drop_level(x, 1), lambda a: a, ('ct',)),
}


@pytest.mark.parametrize('case', sorted(CKKS_CASES))
def test_ckks_op_matrix(ckks, tmp_path, case):
    fe, ctx = ckks
    level = 2
    op, oracle, kinds = CKKS_CASES[case]
    rng = np.random.default_rng(hash(case) % 2**31)
    msgs = [rng.uniform(-1, 1, N // 2) for _ in kinds]

    def build():
        nodes = []
        for i, kind in enumerate(kinds):
            if kind == 'ct':
                nodes.append(fct.CkksCiphertextNode(f'in_{i}', level))
            elif kind == 'ptmul':
                nodes.append(fct.CkksPlaintextMulNode(f'in_{i}', level))
        out = op(fct, *nodes)
        return ([fct.Argument(n.id, n) for n in nodes], [fct.Argument('out', out)])

    values = {}
    for i, (kind, m) in enumerate(zip(kinds, msgs)):
        if kind == 'ct':
            values[f'in_{i}'] = ctx.encrypt(ctx.encode(m, level))
        else:
            values[f'in_{i}'] = ctx.encode_mul(m, level)
    outputs = run_graph(fe, ctx, build, values, tmp_path)
    got = ctx.decrypt_decode(outputs['out']).real
    np.testing.assert_allclose(got, oracle(*msgs), atol=1e-4)


def test_fpga_param_chain_31bit():
    """The reference's FPGA-pinned parameter family (31-bit NTT primes,
    frontend create_fpga_param) through the engine: BFV mult_relin +
    rotation stay exact on a 31-bit chain (primes ≡ 1 mod 2^14 also serve
    any smaller power-of-two ring)."""
    from lattisense_tpu.frontend import custom_task as fct
    fe = fct.BfvParam.create_fpga_param()
    assert fe.n == 8192 and len(fe.q) == 6 and fe.t == 0x1B4001
    assert all(q.bit_length() == 31 for q in fe.q)
    n = 512
    params = BfvParams.create_custom(n, fe.t, fe.q, fe.p)
    ctx = BfvContext.create_random_context(params, seed=31)
    ctx.gen_rotation_keys_for_rotations([1])
    rng = np.random.default_rng(0)
    m1 = rng.integers(0, fe.t, n, dtype=np.uint64)
    m2 = rng.integers(0, fe.t, n, dtype=np.uint64)
    prod = ctx.rescale(ctx.mult_relin(ctx.encrypt(ctx.encode(m1)),
                                      ctx.encrypt(ctx.encode(m2))))
    exp = (m1.astype(object) * m2.astype(object)) % fe.t
    np.testing.assert_array_equal(
        ctx.decrypt_decode(prod).astype(object), exp)
    rot = ctx.rotate_cols(prod, 1)
    np.testing.assert_array_equal(
        ctx.decrypt_decode(rot).astype(object),
        oracles.vec_rotate_col(exp, 1))


def test_rotation_sweep():
    """Rotation sweep over many steps incl. negatives and composites
    (reference FPGA suites sweep 128 steps, test_fpga_bfv.py:310-414):
    every NAF decomposition path against the plain oracle."""
    n = 256
    q = gen_ntt_primes(n, 50, 4)
    p = gen_ntt_primes(n, 51, 1, exclude=tuple(q))
    params = BfvParams.create_custom(n, 65537, q, p)
    ctx = BfvContext.create_random_context(params, seed=41)
    steps = [1, 2, 3, 5, 7, 12, 31, 60, 63, 64, 100, 127,
             -1, -3, -17, -64]
    ctx.gen_rotation_keys_for_rotations(steps)
    rng = np.random.default_rng(1)
    m = rng.integers(0, 65537, n, dtype=np.uint64)
    ctv = ctx.encrypt(ctx.encode(m))
    for s in steps:
        got = ctx.decrypt_decode(ctx.rotate_cols(ctv, s))
        np.testing.assert_array_equal(got, oracles.vec_rotate_col(m, s),
                                      err_msg=f'step {s}')
