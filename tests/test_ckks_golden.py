"""Golden-model CKKS conformance: decrypt-checked against float oracles
within precision bounds (reference discipline: compare_double_vectors,
fhe_ops_lib/utils.h:39)."""

import numpy as np
import pytest

from lattisense_tpu.params import CkksParams
from lattisense_tpu.core.modring import gen_ntt_primes
from lattisense_tpu.schemes.ckks import CkksEngine
from lattisense_tpu.schemes import keys as K

from .oracles import vec_rotate

TOL = 1e-5


@pytest.fixture(scope='module')
def small():
    n = 64
    big = gen_ntt_primes(n, 60, 2)
    mids = gen_ntt_primes(n, 40, 4)
    q = [big[0]] + mids
    p = [big[1]]
    params = CkksParams.create_custom(n, q, p, scale=float(1 << 40))
    eng = CkksEngine(params)
    rng = np.random.default_rng(11)
    sk = K.SecretKey(K.sample_ternary(rng, n))
    pk = K.gen_public_key(rng, sk, tuple(q), n)
    rlk = K.gen_relin_key(rng, sk, tuple(q), tuple(p), n)
    return params, eng, rng, sk, pk, rlk


def rand_vals(rng, slots):
    return rng.uniform(-1, 1, slots)


def enc(eng, rng, pk, vals, level):
    return eng.encrypt_asymmetric(rng, pk, eng.encode(vals, level))


class TestCkksGolden:
    def test_encode_decode(self, small):
        params, eng, rng, *_ = small
        v = rand_vals(rng, params.slots)
        pt = eng.encode(v, 2)
        # decode via decrypt of a zero-noise "trivial" path isn't exposed;
        # check embedding roundtrip instead
        from lattisense_tpu.schemes.encoding import ckks_encode_values, ckks_decode_values
        c = ckks_encode_values(v, params.n, params.slots, params.scale)
        out = ckks_decode_values(c, params.n, params.slots, params.scale)
        np.testing.assert_allclose(out.real, v, atol=1e-9)
        assert pt.is_ntt and pt.data.shape == (3, params.n)

    def test_encrypt_decrypt(self, small):
        params, eng, rng, sk, pk, _ = small
        for level in range(params.max_level + 1):
            v = rand_vals(rng, params.slots)
            ct = enc(eng, rng, pk, v, level)
            got = eng.decrypt_decode(sk, ct)
            np.testing.assert_allclose(got.real, v, atol=TOL)

    def test_encrypt_symmetric(self, small):
        params, eng, rng, sk, pk, _ = small
        v = rand_vals(rng, params.slots)
        ct = eng.encrypt_symmetric(rng, sk, eng.encode(v, 1))
        np.testing.assert_allclose(eng.decrypt_decode(sk, ct).real, v, atol=TOL)

    def test_add_sub_neg(self, small):
        params, eng, rng, sk, pk, _ = small
        va, vb = rand_vals(rng, params.slots), rand_vals(rng, params.slots)
        a, b = enc(eng, rng, pk, va, 2), enc(eng, rng, pk, vb, 2)
        np.testing.assert_allclose(eng.decrypt_decode(sk, eng.add(np, a, b)).real, va + vb, atol=TOL)
        np.testing.assert_allclose(eng.decrypt_decode(sk, eng.sub(np, a, b)).real, va - vb, atol=TOL)
        np.testing.assert_allclose(eng.decrypt_decode(sk, eng.neg(np, a)).real, -va, atol=TOL)
        np.testing.assert_allclose(eng.decrypt_decode(sk, eng.add(np, a, eng.encode(vb, 2))).real,
                                   va + vb, atol=TOL)
        np.testing.assert_allclose(eng.decrypt_decode(sk, eng.add(np, a, eng.encode_ringt(vb))).real,
                                   va + vb, atol=TOL)

    def test_mult_relin_rescale(self, small):
        params, eng, rng, sk, pk, rlk = small
        for level in range(1, params.max_level + 1):
            va, vb = rand_vals(rng, params.slots), rand_vals(rng, params.slots)
            a, b = enc(eng, rng, pk, va, level), enc(eng, rng, pk, vb, level)
            ct3 = eng.mult(np, a, b)
            np.testing.assert_allclose(eng.decrypt_decode(sk, ct3).real, va * vb, atol=TOL)
            ct = eng.relinearize(np, ct3, rlk)
            np.testing.assert_allclose(eng.decrypt_decode(sk, ct).real, va * vb, atol=TOL)
            rs = eng.rescale(np, ct)
            assert rs.level == level - 1
            np.testing.assert_allclose(eng.decrypt_decode(sk, rs).real, va * vb, atol=TOL)

    def test_mult_plain_variants(self, small):
        params, eng, rng, sk, pk, _ = small
        va, vb = rand_vals(rng, params.slots), rand_vals(rng, params.slots)
        a = enc(eng, rng, pk, va, 2)
        for pt in (eng.encode(vb, 2), eng.encode_ringt(vb), eng.encode_mul(vb, 2)):
            out = eng.mult(np, a, pt)
            np.testing.assert_allclose(eng.decrypt_decode(sk, out).real, va * vb, atol=TOL)

    def test_drop_level(self, small):
        params, eng, rng, sk, pk, _ = small
        v = rand_vals(rng, params.slots)
        ct = enc(eng, rng, pk, v, 3)
        d = eng.drop_level(np, ct, 2)
        assert d.level == 1
        np.testing.assert_allclose(eng.decrypt_decode(sk, d).real, v, atol=TOL)

    def test_rotate_conjugate(self, small):
        params, eng, rng, sk, pk, _ = small
        from lattisense_tpu.schemes.galois import galois_elt_col, galois_elt_row
        n, q, p = params.n, tuple(params.q), tuple(params.p)
        v = rand_vals(rng, params.slots) + 1j * rand_vals(rng, params.slots)
        ct = enc(eng, rng, pk, v, 1)
        for step in (1, 3, -2):
            glk = K.gen_galois_key(rng, sk, galois_elt_col(step, n), q, p, n)
            out = eng.rotate(np, ct, step, glk)
            np.testing.assert_allclose(eng.decrypt_decode(sk, out), vec_rotate(v, step), atol=TOL)
        glk_r = K.gen_galois_key(rng, sk, galois_elt_row(n), q, p, n)
        out = eng.conjugate(np, ct, glk_r)
        np.testing.assert_allclose(eng.decrypt_decode(sk, out), np.conj(v), atol=TOL)

    def test_mult_chain(self, small):
        params, eng, rng, sk, pk, rlk = small
        v = rand_vals(rng, params.slots)
        x = enc(eng, rng, pk, v, params.max_level)
        acc, expected = x, v.copy()
        for _ in range(2):
            acc = eng.rescale(np, eng.relinearize(np, eng.mult(np, acc, acc), rlk))
            expected = expected * expected
        np.testing.assert_allclose(eng.decrypt_decode(sk, acc).real, expected, atol=1e-3)


def test_sparse_slots():
    n = 64
    big = gen_ntt_primes(n, 60, 2)
    mids = gen_ntt_primes(n, 40, 2)
    params = CkksParams.create_custom(n, [big[0]] + mids, [big[1]],
                                      slots=8, scale=float(1 << 40))
    eng = CkksEngine(params)
    rng = np.random.default_rng(5)
    sk = K.SecretKey(K.sample_ternary(rng, n))
    pk = K.gen_public_key(rng, sk, tuple(params.q), n)
    v = rng.uniform(-1, 1, 8)
    ct = eng.encrypt_asymmetric(rng, pk, eng.encode(v, 1))
    np.testing.assert_allclose(eng.decrypt_decode(sk, ct).real, v, atol=TOL)


def test_default_param_n16384_smoke():
    params = CkksParams.create(16384)
    eng = CkksEngine(params)
    rng = np.random.default_rng(42)
    sk = K.SecretKey(K.sample_ternary(rng, params.n))
    pk = K.gen_public_key(rng, sk, tuple(params.q), params.n)
    rlk = K.gen_relin_key(rng, sk, tuple(params.q), tuple(params.p), params.n)
    v = rng.uniform(-1, 1, params.slots)
    w = rng.uniform(-1, 1, params.slots)
    a = eng.encrypt_asymmetric(rng, pk, eng.encode(v, 3))
    b = eng.encrypt_asymmetric(rng, pk, eng.encode(w, 3))
    z = eng.rescale(np, eng.relinearize(np, eng.mult(np, a, b), rlk))
    np.testing.assert_allclose(eng.decrypt_decode(sk, z).real, v * w, atol=1e-4)


def test_precision_stats_conformance():
    """CKKS pipeline accepted via PrecisionStats bounds — the reference's
    acceptance criterion for CKKS (precision.cpp; SURVEY.md §4)."""
    from lattisense_tpu.core.modring import gen_ntt_primes
    from lattisense_tpu.params import CkksParams
    from lattisense_tpu.runtime import CkksContext
    from lattisense_tpu.utils.precision import get_precision_stats

    n = 64
    big = gen_ntt_primes(n, 60, 2)
    mids = gen_ntt_primes(n, 40, 3)
    ctx = CkksContext.create_random_context(
        CkksParams.create_custom(n, [big[0]] + mids, [big[1]],
                                 scale=float(1 << 40)), seed=91)
    rng = np.random.default_rng(0)
    va = rng.uniform(-1, 1, n // 2) + 1j * rng.uniform(-1, 1, n // 2)
    vb = rng.uniform(-1, 1, n // 2) + 1j * rng.uniform(-1, 1, n // 2)
    a = ctx.encrypt(ctx.encode(va, 2))
    b = ctx.encrypt(ctx.encode(vb, 2))
    out = ctx.rescale(ctx.mult_relin(a, b))
    stats = get_precision_stats(va * vb, ctx.decrypt_decode(out))
    assert stats.mean_precision.l2 > 18, str(stats)
    assert stats.min_precision.l2 > 12, str(stats)
