"""Homomorphic Chebyshev evaluation vs plain Clenshaw oracle."""

import numpy as np
import pytest

import lattisense_tpu  # noqa: F401
from lattisense_tpu.core.modring import gen_ntt_primes
from lattisense_tpu.params import CkksParams
from lattisense_tpu.runtime import CkksContext
from lattisense_tpu.schemes.poly_eval import (ChebyshevEvaluator, cheb_divmod,
                                              chebyshev_interpolate,
                                              eval_chebyshev_plain)

N = 64


def test_cheb_divmod_identity():
    rng = np.random.default_rng(0)
    for d, g in ((7, 4), (12, 8), (30, 16), (5, 4)):
        c = rng.uniform(-1, 1, d + 1)
        q, r = cheb_divmod(c, g)
        y = rng.uniform(-1, 1, 50)
        lhs = eval_chebyshev_plain(c, y)
        rhs = (eval_chebyshev_plain(q, y) * np.cos(g * np.arccos(y))
               + eval_chebyshev_plain(r, y))
        np.testing.assert_allclose(lhs, rhs, atol=1e-12)


def test_chebyshev_interpolate_sin():
    c = chebyshev_interpolate(np.sin, -3, 3, 23)
    y = np.linspace(-3, 3, 100)
    t = (2 * y) / 6
    np.testing.assert_allclose(eval_chebyshev_plain(c, t), np.sin(y), atol=1e-10)


@pytest.fixture(scope='module')
def ctx():
    big = gen_ntt_primes(N, 60, 2)
    mids = gen_ntt_primes(N, 45, 8)
    params = CkksParams.create_custom(N, [big[0]] + mids, [big[1]],
                                      scale=float(1 << 45))
    return CkksContext.create_random_context(params, seed=43)


def test_homomorphic_sine(ctx):
    """Degree-23 sine on [-3, 3]: the EvalMod workhorse shape."""
    rng = np.random.default_rng(2)
    level = ctx.params.max_level
    coeffs = chebyshev_interpolate(np.sin, -3, 3, 23)
    ev = ChebyshevEvaluator(ctx.engine, coeffs, -3, 3)

    v = rng.uniform(-3, 3, ctx.params.slots)
    ct = ctx.encrypt(ctx.encode(v, level))
    out = ev(np, ct, ctx.rlk)
    got = ctx.decrypt_decode(out).real
    np.testing.assert_allclose(got, np.sin(v), atol=1e-3)


def test_relu_and_step(ctx):
    from lattisense_tpu.schemes.poly_eval import poly_eval_relu, poly_eval_step
    rng = np.random.default_rng(3)
    level = ctx.params.max_level
    v = rng.uniform(-1, 1, ctx.params.slots)
    ct = ctx.encrypt(ctx.encode(v, level))
    got = ctx.decrypt_decode(poly_eval_relu(ctx.engine, np, ct, ctx.rlk)).real
    assert np.max(np.abs(got - np.maximum(v, 0))) < 0.15   # smooth approx
    ct = ctx.encrypt(ctx.encode(v, level))
    got = ctx.decrypt_decode(poly_eval_step(ctx.engine, np, ct, ctx.rlk)).real
    far = np.abs(v) > 0.25
    assert np.max(np.abs(got[far] - (v[far] > 0))) < 0.1
