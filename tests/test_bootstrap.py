"""CKKS bootstrapping end-to-end (toy config; reference analog:
test_cpu_ckks toy bootstrap, SURVEY.md §4)."""

import numpy as np
import pytest

import lattisense_tpu  # noqa: F401
from lattisense_tpu.core.modring import gen_ntt_primes
from lattisense_tpu.params import CkksParams
from lattisense_tpu.runtime import CkksBtpContext
from lattisense_tpu.schemes.bootstrap import BootstrapConfig

N = 256


@pytest.fixture(scope='module')
def btp_ctx():
    # 60-bit working primes (EvalMod runs at scale ≈ 2^60); the input
    # scale 2^45 gives message ratio q0/Δ ≈ 2^16
    q0 = gen_ntt_primes(N, 61, 1)
    qs = gen_ntt_primes(N, 60, 22)
    p = gen_ntt_primes(N, 61, 3, exclude=tuple(q0))
    params = CkksParams.create_custom(N, q0 + qs, p[1:], scale=float(1 << 45))
    cfg = BootstrapConfig(cts_depth=3, stc_depth=3, k=16, sine_deg=30,
                          double_angle=3)
    return CkksBtpContext.create_random_context(params, seed=71, h=32,
                                                btp_config=cfg)


def test_bootstrap_refresh(btp_ctx):
    ctx = btp_ctx
    rng = np.random.default_rng(0)
    msg = rng.uniform(-1, 1, ctx.params.slots)
    # exhausted ciphertext at level 0
    ct = ctx.encrypt(ctx.encode(msg, 0))
    assert ct.level == 0

    fresh = ctx.bootstrap(ct)
    assert fresh.level >= 2, 'bootstrap must leave usable levels'
    got = ctx.decrypt_decode(fresh).real
    err = np.max(np.abs(got - msg))
    assert err < 5e-3, f'bootstrap precision too low: max err {err:.2e}'

    # the refreshed ciphertext supports further multiplications
    sq = ctx.rescale(ctx.mult_relin(fresh, fresh))
    got2 = ctx.decrypt_decode(sq).real
    np.testing.assert_allclose(got2, msg ** 2, atol=5e-2)


def test_bootstrap_preserves_complex(btp_ctx):
    ctx = btp_ctx
    rng = np.random.default_rng(1)
    msg = rng.uniform(-1, 1, ctx.params.slots) + 1j * rng.uniform(-1, 1, ctx.params.slots)
    ct = ctx.encrypt(ctx.encode(msg, 0))
    fresh = ctx.bootstrap(ct)
    got = ctx.decrypt_decode(fresh)
    assert np.max(np.abs(got - msg)) < 5e-3


def test_bootstrap_task_graph(btp_ctx, tmp_path):
    """Frontend bootstrap node → mega_ag.json → FheTaskTpu eager run
    (reference two-phase shape for the toy bootstrap)."""
    from lattisense_tpu.frontend import custom_task as fct
    from lattisense_tpu.runtime import FheTaskTpu

    ctx = btp_ctx
    p = ctx.params
    fe = fct.CkksBtpParam.create_custom_param(
        n=N, q=p.q, p=p.p, slots=p.slots, scale=p.scale,
        cts_depth=3, stc_depth=3, eval_mod_k=16, sine_deg=30, double_angle=3,
        btp_output_level=3)
    fct.set_fhe_param(fe)
    x = fct.CkksCiphertextNode('x', 0)
    z = fct.bootstrap(x, 'z')
    fct.process_custom_task([fct.Argument('x', x)], [fct.Argument('z', z)],
                            output_instruction_path=str(tmp_path))

    task = FheTaskTpu(str(tmp_path), mode='eager')
    rng = np.random.default_rng(5)
    msg = rng.uniform(-1, 1, p.slots)
    ct = ctx.encrypt(ctx.encode(msg, 0))
    outputs, _ = task.run(ctx, {'x': ct})
    got = ctx.decrypt_decode(outputs['z']).real
    assert np.max(np.abs(got - msg)) < 5e-3


def test_bootstrap_sparse_slots():
    """Sparse packing (slots < n/2): SubSum projection + size-s transforms
    (reference toy bootstrap covers dense AND sparse)."""
    q0 = gen_ntt_primes(N, 61, 1)
    qs = gen_ntt_primes(N, 60, 22)
    p = gen_ntt_primes(N, 61, 3, exclude=tuple(q0))
    params = CkksParams.create_custom(N, q0 + qs, p[1:], slots=N // 8,
                                      scale=float(1 << 45))
    cfg = BootstrapConfig(cts_depth=2, stc_depth=2, k=16, sine_deg=30,
                          double_angle=3)
    ctx = CkksBtpContext.create_random_context(params, seed=73, h=32,
                                               btp_config=cfg)
    rng = np.random.default_rng(2)
    msg = rng.uniform(-1, 1, params.slots)
    ct = ctx.encrypt(ctx.encode(msg, 0))
    fresh = ctx.bootstrap(ct)
    got = ctx.decrypt_decode(fresh).real
    err = np.max(np.abs(got - msg))
    assert err < 5e-3, f'sparse bootstrap err {err:.2e}'
