"""Golden-model BFV conformance: every op decrypt-checked against plain
modular math, bit-exact (the reference's oracle discipline:
unittests/test_cpu_bfv.cpp REQUIRE(decrypt_and_decode(...) == expected))."""

import numpy as np
import pytest

from lattisense_tpu.params import BfvParams
from lattisense_tpu.core.modring import gen_ntt_primes
from lattisense_tpu.schemes.bfv import BfvEngine
from lattisense_tpu.schemes import keys as K

from .oracles import (vec_mod_add, vec_mod_sub, vec_mod_mul, vec_mod_neg,
                      vec_rotate_col, vec_rotate_row)

T = 65537


@pytest.fixture(scope='module')
def small():
    n = 64
    q = gen_ntt_primes(n, 50, 3)
    p = gen_ntt_primes(n, 51, 1, exclude=tuple(q))
    params = BfvParams.create_custom(n, T, q, p)
    eng = BfvEngine(params)
    rng = np.random.default_rng(7)
    sk = K.SecretKey(K.sample_ternary(rng, n))
    pk = K.gen_public_key(rng, sk, tuple(q), n)
    rlk = K.gen_relin_key(rng, sk, tuple(q), tuple(p), n)
    return params, eng, rng, sk, pk, rlk


def rand_msg(rng, n):
    return rng.integers(0, T, size=n, dtype=np.uint64)


def enc(eng, rng, pk, msg, level):
    return eng.encrypt_asymmetric(rng, pk, eng.encode(msg, level))


class TestBfvGolden:
    def test_encode_decode_roundtrip(self, small):
        params, eng, rng, *_ = small
        msg = rand_msg(rng, params.n)
        pt = eng.encode(msg, 2)
        # decrypting a "trivial" path: decode(encode) via mod-t poly
        from lattisense_tpu.schemes.encoding import bfv_encode_slots, bfv_decode_slots
        assert np.array_equal(bfv_decode_slots(bfv_encode_slots(msg, T, params.n), T, params.n), msg)
        assert pt.data.shape == (3, params.n)

    def test_encrypt_decrypt(self, small):
        params, eng, rng, sk, pk, _ = small
        for level in range(params.max_level + 1):
            msg = rand_msg(rng, params.n)
            ct = enc(eng, rng, pk, msg, level)
            assert np.array_equal(eng.decrypt_decode(sk, ct), msg)

    def test_encrypt_symmetric(self, small):
        params, eng, rng, sk, pk, _ = small
        msg = rand_msg(rng, params.n)
        ct = eng.encrypt_symmetric(rng, sk, eng.encode(msg, 1))
        assert np.array_equal(eng.decrypt_decode(sk, ct), msg)

    def test_add_sub_neg(self, small):
        params, eng, rng, sk, pk, _ = small
        for level in range(params.max_level + 1):
            ma, mb = rand_msg(rng, params.n), rand_msg(rng, params.n)
            a, b = enc(eng, rng, pk, ma, level), enc(eng, rng, pk, mb, level)
            assert np.array_equal(eng.decrypt_decode(sk, eng.add(np, a, b)), vec_mod_add(ma, mb, T))
            assert np.array_equal(eng.decrypt_decode(sk, eng.sub(np, a, b)), vec_mod_sub(ma, mb, T))
            assert np.array_equal(eng.decrypt_decode(sk, eng.neg(np, a)), vec_mod_neg(ma, T))

    def test_add_plain_variants(self, small):
        params, eng, rng, sk, pk, _ = small
        ma, mb = rand_msg(rng, params.n), rand_msg(rng, params.n)
        a = enc(eng, rng, pk, ma, 2)
        assert np.array_equal(eng.decrypt_decode(sk, eng.add(np, a, eng.encode(mb, 2))),
                              vec_mod_add(ma, mb, T))
        assert np.array_equal(eng.decrypt_decode(sk, eng.add(np, a, eng.encode_ringt(mb))),
                              vec_mod_add(ma, mb, T))
        assert np.array_equal(eng.decrypt_decode(sk, eng.sub(np, a, eng.encode_ringt(mb))),
                              vec_mod_sub(ma, mb, T))

    def test_mult_relin(self, small):
        params, eng, rng, sk, pk, rlk = small
        for level in range(1, params.max_level + 1):
            ma, mb = rand_msg(rng, params.n), rand_msg(rng, params.n)
            a, b = enc(eng, rng, pk, ma, level), enc(eng, rng, pk, mb, level)
            ct3 = eng.mult(np, a, b)
            assert ct3.data.shape[0] == 3
            expected = vec_mod_mul(ma, mb, T)
            assert np.array_equal(eng.decrypt_decode(sk, ct3), expected)
            ct = eng.relinearize(np, ct3, rlk)
            assert ct.data.shape[0] == 2
            assert np.array_equal(eng.decrypt_decode(sk, ct), expected)

    def test_mult_plain_variants(self, small):
        params, eng, rng, sk, pk, _ = small
        ma, mb = rand_msg(rng, params.n), rand_msg(rng, params.n)
        a = enc(eng, rng, pk, ma, 2)
        expected = vec_mod_mul(ma, mb, T)
        assert np.array_equal(eng.decrypt_decode(sk, eng.mult(np, a, eng.encode(mb, 2))), expected)
        assert np.array_equal(eng.decrypt_decode(sk, eng.mult(np, a, eng.encode_ringt(mb))), expected)
        assert np.array_equal(eng.decrypt_decode(sk, eng.mult(np, a, eng.encode_mul(mb, 2))), expected)

    def test_rescale(self, small):
        params, eng, rng, sk, pk, _ = small
        msg = rand_msg(rng, params.n)
        ct = enc(eng, rng, pk, msg, params.max_level)
        ct2 = eng.rescale(np, ct)
        assert ct2.level == params.max_level - 1
        assert np.array_equal(eng.decrypt_decode(sk, ct2), msg)

    def test_mult_chain_with_rescale(self, small):
        params, eng, rng, sk, pk, rlk = small
        msg = rand_msg(rng, params.n)
        x = enc(eng, rng, pk, msg, 2)
        x2 = eng.rescale(np, eng.relinearize(np, eng.mult(np, x, x), rlk))
        assert np.array_equal(eng.decrypt_decode(sk, x2), vec_mod_mul(msg, msg, T))
        x1 = eng.rescale(np, x)
        x3 = eng.relinearize(np, eng.mult(np, x1, x2), rlk)
        expected = vec_mod_mul(vec_mod_mul(msg, msg, T), msg, T)
        assert np.array_equal(eng.decrypt_decode(sk, x3), expected)

    def test_rotations(self, small):
        params, eng, rng, sk, pk, _ = small
        n, q, p = params.n, tuple(params.q), tuple(params.p)
        from lattisense_tpu.schemes.galois import galois_elt_col, galois_elt_row
        msg = rand_msg(rng, n)
        ct = enc(eng, rng, pk, msg, 1)
        for step in (1, 2, -1, 5):
            g = galois_elt_col(step, n)
            glk = K.gen_galois_key(rng, sk, g, q, p, n)
            out = eng.rotate_cols(np, ct, step, glk)
            assert np.array_equal(eng.decrypt_decode(sk, out), vec_rotate_col(msg, step)), step
        glk_row = K.gen_galois_key(rng, sk, galois_elt_row(n), q, p, n)
        out = eng.rotate_rows(np, ct, glk_row)
        assert np.array_equal(eng.decrypt_decode(sk, out), vec_rotate_row(msg))

    def test_mult_scalar(self, small):
        params, eng, rng, sk, pk, _ = small
        msg = rand_msg(rng, params.n)
        ct = enc(eng, rng, pk, msg, 1)
        # scalar multiplies the *plaintext* mod t via Δ-scaled data? No —
        # scalar mult multiplies ct coefficients: decrypts to m*scalar mod t.
        out = eng.mult_scalar(np, ct, 7)
        assert np.array_equal(eng.decrypt_decode(sk, out), vec_mod_mul(msg, np.full(params.n, 7), T))


def test_default_param_n16384_smoke():
    """One mult_relin on the reference default chain (bfv_mult_cpu config)."""
    params = BfvParams.create(16384)
    eng = BfvEngine(params)
    rng = np.random.default_rng(42)
    sk = K.SecretKey(K.sample_ternary(rng, params.n))
    pk = K.gen_public_key(rng, sk, tuple(params.q), params.n)
    rlk = K.gen_relin_key(rng, sk, tuple(params.q), tuple(params.p), params.n)
    msg_x = np.array([3, 1, 4, 1], dtype=np.uint64)
    msg_y = np.array([5, 9, 2, 6], dtype=np.uint64)
    level = 3
    x = eng.encrypt_asymmetric(rng, pk, eng.encode(msg_x, level))
    y = eng.encrypt_asymmetric(rng, pk, eng.encode(msg_y, level))
    z = eng.relinearize(np, eng.mult(np, x, y), rlk)
    got = eng.decrypt_decode(sk, z)
    assert got[0] == 15 and got[1] == 9 and got[2] == 8 and got[3] == 6
    assert (got[4:] == 0).all()
