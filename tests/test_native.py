"""Native C++ host kernels must be bit-identical to the NumPy reference
implementations (and substantially faster)."""

import os
import time

import numpy as np
import pytest

import lattisense_tpu  # noqa: F401
from lattisense_tpu import native
from lattisense_tpu.core import ntt as ntt_mod
from lattisense_tpu.core import u64 as _u
from lattisense_tpu.core.modring import gen_ntt_primes, get_rns_ring

pytestmark = pytest.mark.skipif(not native.available(),
                                reason='native library unavailable')


def _pure_numpy_ntt(x, ring, inverse=False):
    os.environ['LATTISENSE_NO_NATIVE'] = '1'
    ntt_mod._USE_NATIVE = False
    try:
        return (ntt_mod.intt if inverse else ntt_mod.ntt)(np, x, ring)
    finally:
        os.environ['LATTISENSE_NO_NATIVE'] = ''
        ntt_mod._USE_NATIVE = True


@pytest.mark.parametrize('n,L', [(64, 3), (1024, 5), (16384, 4)])
def test_ntt_native_bitexact(n, L):
    q = gen_ntt_primes(n, 55, L)
    ring = get_rns_ring(tuple(q), n)
    rng = np.random.default_rng(0)
    x = np.stack([rng.integers(0, qi, n, dtype=np.uint64) for qi in q])
    f_native = native.ntt_forward(x, ring)
    f_ref = _pure_numpy_ntt(x, ring)
    np.testing.assert_array_equal(f_native, f_ref)
    b_native = native.ntt_inverse(f_native, ring)
    np.testing.assert_array_equal(b_native, _pure_numpy_ntt(f_ref, ring, inverse=True))
    np.testing.assert_array_equal(b_native, x)


def test_ntt_native_batched():
    n, L, B = 256, 3, 4
    q = gen_ntt_primes(n, 50, L)
    ring = get_rns_ring(tuple(q), n)
    rng = np.random.default_rng(1)
    x = np.stack([np.stack([rng.integers(0, qi, n, dtype=np.uint64) for qi in q])
                  for _ in range(B)])
    np.testing.assert_array_equal(native.ntt_forward(x, ring),
                                  _pure_numpy_ntt(x, ring))


def test_native_speedup():
    n, L = 16384, 8
    q = gen_ntt_primes(n, 55, L)
    ring = get_rns_ring(tuple(q), n)
    rng = np.random.default_rng(2)
    x = np.stack([rng.integers(0, qi, n, dtype=np.uint64) for qi in q])
    native.ntt_forward(x, ring)                      # warm
    t0 = time.perf_counter()
    for _ in range(3):
        native.ntt_forward(x, ring)
    t_native = (time.perf_counter() - t0) / 3
    t0 = time.perf_counter()
    _pure_numpy_ntt(x, ring)
    t_numpy = time.perf_counter() - t0
    assert t_native < t_numpy, (t_native, t_numpy)


# ---------------------------------------------------------------------------
# native full-pipeline baselines (csrc/behz.cpp): bit-exact vs golden engine
# ---------------------------------------------------------------------------

def _bfv_setup(n=256, level=2):
    from lattisense_tpu.params import BfvParams
    from lattisense_tpu.runtime.context import BfvContext
    q = gen_ntt_primes(n, 50, level + 1)
    p = gen_ntt_primes(n, 51, 2, exclude=tuple(q))
    params = BfvParams.create_custom(n, 65537, q, p)
    ctx = BfvContext.create_random_context(params, seed=3)
    rng = np.random.default_rng(0)
    m = rng.integers(0, params.t, (2, n), dtype=np.uint64)
    a = ctx.encrypt(ctx.encode(m[0], level))
    b = ctx.encrypt(ctx.encode(m[1], level))
    return ctx, a, b


def test_native_behz_mult_relin_bit_exact():
    from lattisense_tpu import native_behz
    if not native_behz.available():
        import pytest
        pytest.skip('native behz lib unavailable')
    ctx, a, b = _bfv_setup()
    eng = ctx.engine
    gold = eng.relinearize(np, eng.mult(np, a, b), ctx.rlk)
    nat = native_behz.BehzNative(eng, a.level)
    got = nat.bfv_mult_relin(np.asarray(a.data), np.asarray(b.data), ctx.rlk)
    np.testing.assert_array_equal(got, np.asarray(gold.data))
    # threaded bench driver produces the identical result
    secs, out = nat.bench_bfv_mult_relin(np.asarray(a.data), np.asarray(b.data),
                                         ctx.rlk, 4, 2)
    assert secs > 0
    np.testing.assert_array_equal(out, np.asarray(gold.data))


def test_native_behz_rotate_bit_exact():
    from lattisense_tpu import native_behz
    from lattisense_tpu.schemes.galois import galois_elt_col
    if not native_behz.available():
        import pytest
        pytest.skip('native behz lib unavailable')
    ctx, a, _ = _bfv_setup()
    elt = galois_elt_col(1, ctx.params.n)
    ctx.gen_galois_keys_for_elements([elt])
    gold = ctx.engine.apply_galois(np, a, elt, ctx.glk.keys[elt])
    nat = native_behz.BehzNative(ctx.engine, a.level)
    got = nat.bfv_rotate(np.asarray(a.data), elt, ctx.glk.keys[elt])
    np.testing.assert_array_equal(got, np.asarray(gold.data))


def test_native_behz_ckks_bit_exact():
    from lattisense_tpu import native_behz
    from lattisense_tpu.params import CkksParams
    from lattisense_tpu.runtime.context import CkksContext
    if not native_behz.available():
        import pytest
        pytest.skip('native behz lib unavailable')
    n, level = 256, 2
    big = gen_ntt_primes(n, 60, 1)
    mids = gen_ntt_primes(n, 40, level + 1, exclude=tuple(big))
    p = gen_ntt_primes(n, 60, 1, exclude=tuple(big) + tuple(mids))
    params = CkksParams.create_custom(n, [big[0]] + list(mids[:level]), p,
                                      scale=float(1 << 40))
    ctx = CkksContext.create_random_context(params, seed=5)
    eng = ctx.engine
    rng = np.random.default_rng(1)
    v = rng.uniform(-1, 1, (2, params.slots))
    a = ctx.encrypt(ctx.encode(v[0], level))
    b = ctx.encrypt(ctx.encode(v[1], level))
    gold = eng.rescale(np, eng.relinearize(np, eng.mult(np, a, b), ctx.rlk))
    nat = native_behz.BehzNative(eng, level)
    got = nat.ckks_mult_relin_rescale(np.asarray(a.data), np.asarray(b.data),
                                      ctx.rlk)
    np.testing.assert_array_equal(got, np.asarray(gold.data))
