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
