"""C ABI struct round-trips (plug-in exchange format, abi/c_types.h parity)."""

import numpy as np

import lattisense_tpu  # noqa: F401
from lattisense_tpu import abi
from lattisense_tpu.core.modring import gen_ntt_primes
from lattisense_tpu.params import BfvParams
from lattisense_tpu.runtime import BfvContext

N, T = 64, 65537


def test_ciphertext_abi_roundtrip():
    q = gen_ntt_primes(N, 50, 3)
    p = gen_ntt_primes(N, 51, 1, exclude=tuple(q))
    ctx = BfvContext.create_random_context(BfvParams.create_custom(N, T, q, p), seed=51)
    rng = np.random.default_rng(0)
    m = rng.integers(0, T, N, dtype=np.uint64)
    ct = ctx.encrypt(ctx.encode(m, 2))

    exported = abi.export_ciphertext(ct)
    s = exported.struct
    assert s.level == 2 and s.degree == 1
    assert s.polys[0].n_component == 3
    # a foreign library would read raw uint64 limb buffers
    row0 = np.ctypeslib.as_array(s.polys[0].components[0].data, shape=(N,))
    np.testing.assert_array_equal(row0, np.asarray(ct.data)[0, 0])

    back = abi.import_ciphertext(s)
    np.testing.assert_array_equal(back.data, ct.data)
    np.testing.assert_array_equal(ctx.decrypt_decode(back), m)


def test_plaintext_abi_roundtrip():
    q = gen_ntt_primes(N, 50, 2)
    p = gen_ntt_primes(N, 51, 1, exclude=tuple(q))
    ctx = BfvContext.create_random_context(BfvParams.create_custom(N, T, q, p), seed=52)
    pt = ctx.encode(np.arange(N, dtype=np.uint64), 1)
    back = abi.import_plaintext(abi.export_plaintext(pt).struct)
    np.testing.assert_array_equal(back.data, pt.data)
