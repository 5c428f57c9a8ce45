"""Default-tier real-chain conformance: a budgeted slice of the
reference-scale matrix (test_conformance_full.py) that runs UNGATED on
every push — the reference CI runs its whole two-phase suite at
n=16384/8192 (unittests/conftest.py:24-69); this keeps at least the
n=8192 default chain exercised at three levels for both schemes, plus a
jit-vs-eager bit-exactness case, in the default `pytest -q` tier.

Full ladders (all levels × n=16384, and the n=65536 heavy chain) stay in
test_conformance_full.py behind LATTISENSE_SLOW/HEAVY_TESTS.
"""

import numpy as np
import pytest

import lattisense_tpu  # noqa: F401
from lattisense_tpu.params import BfvParams, CkksParams
from lattisense_tpu.runtime import BfvContext, CkksContext

from . import oracles

N = 8192


def _levels(max_level):
    """1, mid, max — the budgeted ladder slice."""
    return sorted({1, max(1, max_level // 2), max_level})


@pytest.fixture(scope='module')
def bfv_ctx():
    ctx = BfvContext.create_random_context(BfvParams.create(N), seed=81)
    ctx.gen_rotation_keys_for_rotations([1])
    return ctx


@pytest.fixture(scope='module')
def ckks_ctx():
    return CkksContext.create_random_context(CkksParams.create(N), seed=82)


def pytest_generate_tests(metafunc):
    if 'bfv_level' in metafunc.fixturenames:
        levels = _levels(BfvParams.create(N).max_level)
        metafunc.parametrize('bfv_level', levels,
                             ids=[f'L{lv}' for lv in levels])
    if 'ckks_level' in metafunc.fixturenames:
        levels = _levels(CkksParams.create(N).max_level)
        metafunc.parametrize('ckks_level', levels,
                             ids=[f'L{lv}' for lv in levels])


def test_bfv_default_chain(bfv_ctx, bfv_level):
    """Exact-equality op matrix at the real n=8192 default chain."""
    ctx, level = bfv_ctx, bfv_level
    t = ctx.params.t
    rng = np.random.default_rng(level)
    m1 = rng.integers(0, t, N, dtype=np.uint64)
    m2 = rng.integers(0, t, N, dtype=np.uint64)
    a = ctx.encrypt(ctx.encode(m1, level))
    b = ctx.encrypt(ctx.encode(m2, level))

    np.testing.assert_array_equal(ctx.decrypt_decode(ctx.add(a, b)),
                                  oracles.vec_mod_add(m1, m2, t))
    exp_mul = oracles.vec_mod_mul(m1, m2, t)
    np.testing.assert_array_equal(ctx.decrypt_decode(ctx.mult_relin(a, b)),
                                  exp_mul)
    np.testing.assert_array_equal(
        ctx.decrypt_decode(ctx.mult(a, ctx.encode_mul(m2, level))), exp_mul)
    np.testing.assert_array_equal(ctx.decrypt_decode(ctx.rotate_cols(a, 1)),
                                  oracles.vec_rotate_col(m1, 1))


def test_ckks_default_chain(ckks_ctx, ckks_level):
    """Precision-bounded matrix at the real n=8192 default chain."""
    ctx, level = ckks_ctx, ckks_level
    rng = np.random.default_rng(level)
    v1 = rng.uniform(-1, 1, ctx.params.slots)
    v2 = rng.uniform(-1, 1, ctx.params.slots)
    a = ctx.encrypt(ctx.encode(v1, level))
    b = ctx.encrypt(ctx.encode(v2, level))
    tol = 64.0 * N / ctx.params.scale
    np.testing.assert_allclose(ctx.decrypt_decode(ctx.add(a, b)).real,
                               v1 + v2, atol=tol)
    got = ctx.decrypt_decode(ctx.rescale(ctx.mult_relin(a, b))).real
    np.testing.assert_allclose(got, v1 * v2, atol=tol)


def test_bfv_jit_bit_exact_n8192(bfv_ctx, tmp_path):
    """Compiled(jit)-vs-eager bit-exactness at the real n=8192 chain —
    the compiled path must be exercised at default scale on every push."""
    from lattisense_tpu.frontend import custom_task as fct
    from lattisense_tpu.runtime import FheTaskTpu
    level = 2
    ctx = bfv_ctx
    fe = fct.BfvParam.create_default_param(N)
    fct.set_fhe_param(fe)
    x = fct.BfvCiphertextNode('x', level)
    y = fct.BfvCiphertextNode('y', level)
    z = fct.mult_relin(x, y, 'z')
    fct.process_custom_task([fct.Argument('x', x), fct.Argument('y', y)],
                            [fct.Argument('z', z)],
                            output_instruction_path=str(tmp_path))
    rng = np.random.default_rng(17)
    m1 = rng.integers(0, ctx.params.t, N, dtype=np.uint64)
    m2 = rng.integers(0, ctx.params.t, N, dtype=np.uint64)
    ea = ctx.encrypt(ctx.encode(m1, level))
    eb = ctx.encrypt(ctx.encode(m2, level))
    eager, _ = FheTaskTpu(str(tmp_path), mode='eager').run(
        ctx, {'x': ea, 'y': eb})
    jit, _ = FheTaskTpu(str(tmp_path), mode='jit').run(
        ctx, {'x': ea, 'y': eb})
    np.testing.assert_array_equal(np.asarray(jit['z'].data),
                                  np.asarray(eager['z'].data))
    np.testing.assert_array_equal(ctx.decrypt_decode(jit['z']),
                                  oracles.vec_mod_mul(m1, m2, ctx.params.t))
