"""Facade error-path matrix — the REQUIRE_THROWS battery from the
reference facade tests (unittests/test_lattigo.cpp:2049-2128), ported
onto BfvContext/CkksContext with the reference's verbatim error strings,
plus the negative paths the reference exercises elsewhere in the same
file (missing keys, serialization failures, public-context restrictions).
"""

import numpy as np
import pytest

import lattisense_tpu  # noqa: F401
from lattisense_tpu.core.modring import gen_ntt_primes
from lattisense_tpu.params import BfvParams, CkksParams
from lattisense_tpu.runtime import BfvContext, CkksContext

N, T = 64, 65537


@pytest.fixture(scope='module')
def bfv():
    q = gen_ntt_primes(N, 50, 4)
    p = gen_ntt_primes(N, 51, 2, exclude=tuple(q))
    return BfvContext.create_random_context(
        BfvParams.create_custom(N, T, q, p), seed=11)


@pytest.fixture(scope='module')
def ckks():
    big = gen_ntt_primes(N, 60, 2)
    mids = gen_ntt_primes(N, 40, 3)
    return CkksContext.create_random_context(
        CkksParams.create_custom(N, [big[0]] + mids, [big[1]],
                                 scale=float(1 << 40)), seed=12)


# ---- BFV encode errors (test_lattigo.cpp:2049-2065) ----------------------
def test_bfv_encode_length_zero(bfv):
    with pytest.raises(RuntimeError, match='Invalid message length.'):
        bfv.encode(np.zeros(0, dtype=np.uint64), 2)


def test_bfv_encode_length_n_plus_1(bfv):
    with pytest.raises(RuntimeError, match='Invalid message length.'):
        bfv.encode(np.zeros(N + 1, dtype=np.uint64), 2)


def test_bfv_encode_level_negative(bfv):
    with pytest.raises(RuntimeError, match='Invalid level.'):
        bfv.encode(np.zeros(N, dtype=np.uint64), -1)


def test_bfv_encode_level_above_max(bfv):
    with pytest.raises(RuntimeError, match='Invalid level.'):
        bfv.encode(np.zeros(N, dtype=np.uint64), bfv.params.max_level + 1)


def test_bfv_encode_mul_level_above_max(bfv):
    with pytest.raises(RuntimeError, match='Invalid level.'):
        bfv.encode_mul(np.zeros(N, dtype=np.uint64),
                       bfv.params.max_level + 1)


# ---- BFV encode_ringt errors (test_lattigo.cpp:2067-2076) ----------------
def test_bfv_encode_ringt_length_zero(bfv):
    with pytest.raises(RuntimeError, match='Invalid message length.'):
        bfv.encode_ringt(np.zeros(0, dtype=np.uint64))


def test_bfv_encode_ringt_length_n_plus_1(bfv):
    with pytest.raises(RuntimeError, match='Invalid message length.'):
        bfv.encode_ringt(np.zeros(N + 1, dtype=np.uint64))


# ---- encrypt/decrypt without sk (test_lattigo.cpp:2078-2116) -------------
def test_bfv_encrypt_symmetric_no_sk(bfv):
    pub = bfv.make_public_context()
    pt = bfv.encode(np.zeros(1, dtype=np.uint64), 2)
    with pytest.raises(RuntimeError,
                       match='Context does not have sk and the corresponding '
                             'encryptor.'):
        pub.encrypt_symmetric(pt)


def test_bfv_encrypt_symmetric_compressed_no_sk(bfv):
    pub = bfv.make_public_context()
    pt = bfv.encode(np.zeros(1, dtype=np.uint64), 2)
    with pytest.raises(RuntimeError,
                       match='Context does not have sk and the corresponding '
                             'encryptor.'):
        pub.encrypt_symmetric_compressed(pt)


def test_bfv_decrypt_no_sk(bfv):
    pub = bfv.make_public_context()
    ct = bfv.encrypt(bfv.encode(np.zeros(1, dtype=np.uint64), 2))
    with pytest.raises(RuntimeError,
                       match='Context does not have sk and decryptor.'):
        pub.decrypt(ct)


def test_bfv_decrypt_decode_no_sk(bfv):
    pub = bfv.make_public_context()
    ct = bfv.encrypt(bfv.encode(np.zeros(1, dtype=np.uint64), 2))
    with pytest.raises(RuntimeError,
                       match='Context does not have sk and decryptor.'):
        pub.decrypt_decode(ct)


def test_ckks_decrypt_no_sk(ckks):
    pub = ckks.make_public_context()
    ct = ckks.encrypt(ckks.encode(np.zeros(1), 2))
    with pytest.raises(RuntimeError,
                       match='Context does not have sk and decryptor.'):
        pub.decrypt(ct)


def test_ckks_encrypt_symmetric_no_sk(ckks):
    pub = ckks.make_public_context()
    pt = ckks.encode(np.zeros(1), 2)
    with pytest.raises(RuntimeError,
                       match='Context does not have sk and the corresponding '
                             'encryptor.'):
        pub.encrypt_symmetric(pt)


# ---- mismatched levels (test_lattigo.cpp:2118-2128) ----------------------
def test_bfv_add_different_levels(bfv):
    x0 = bfv.encrypt(bfv.encode(np.zeros(1, dtype=np.uint64), 1))
    x1 = bfv.encrypt(bfv.encode(np.zeros(1, dtype=np.uint64), 2))
    with pytest.raises(RuntimeError,
                       match='x0 and x1 have different levels.'):
        bfv.add(x0, x1)


def test_bfv_sub_different_levels(bfv):
    x0 = bfv.encrypt(bfv.encode(np.zeros(1, dtype=np.uint64), 1))
    x1 = bfv.encrypt(bfv.encode(np.zeros(1, dtype=np.uint64), 2))
    with pytest.raises(RuntimeError,
                       match='x0 and x1 have different levels.'):
        bfv.sub(x0, x1)


def test_bfv_mult_different_levels(bfv):
    x0 = bfv.encrypt(bfv.encode(np.zeros(1, dtype=np.uint64), 1))
    x1 = bfv.encrypt(bfv.encode(np.zeros(1, dtype=np.uint64), 2))
    with pytest.raises(RuntimeError,
                       match='x0 and x1 have different levels.'):
        bfv.mult(x0, x1)


def test_bfv_add_plain_different_levels(bfv):
    ct = bfv.encrypt(bfv.encode(np.zeros(1, dtype=np.uint64), 2))
    pt = bfv.encode(np.zeros(1, dtype=np.uint64), 1)
    with pytest.raises(RuntimeError,
                       match='x0 and x1 have different levels.'):
        bfv.add(ct, pt)


def test_ckks_add_different_levels(ckks):
    x0 = ckks.encrypt(ckks.encode(np.zeros(1), 1))
    x1 = ckks.encrypt(ckks.encode(np.zeros(1), 2))
    with pytest.raises(RuntimeError,
                       match='x0 and x1 have different levels.'):
        ckks.add(x0, x1)


def test_ckks_mult_different_levels(ckks):
    x0 = ckks.encrypt(ckks.encode(np.zeros(1), 1))
    x1 = ckks.encrypt(ckks.encode(np.zeros(1), 2))
    with pytest.raises(RuntimeError,
                       match='x0 and x1 have different levels.'):
        ckks.mult(x0, x1)


# ---- CKKS encode errors ---------------------------------------------------
def test_ckks_encode_length_zero(ckks):
    with pytest.raises(RuntimeError, match='Invalid message length.'):
        ckks.encode(np.zeros(0), 2)


def test_ckks_encode_length_above_slots(ckks):
    with pytest.raises(RuntimeError, match='Invalid message length.'):
        ckks.encode(np.zeros(ckks.params.slots + 1), 2)


def test_ckks_encode_level_negative(ckks):
    with pytest.raises(RuntimeError, match='Invalid level.'):
        ckks.encode(np.zeros(1), -1)


# ---- missing evaluation keys ----------------------------------------------
def test_rotation_without_galois_key(bfv):
    ct = bfv.encrypt(bfv.encode(np.zeros(1, dtype=np.uint64), 2))
    with pytest.raises(RuntimeError, match='missing Galois key'):
        bfv.rotate_cols(ct, 7)


def test_relinearize_without_rlk(bfv):
    ct = bfv.encrypt(bfv.encode(np.ones(1, dtype=np.uint64), 2))
    ct3 = bfv.mult(ct, ct)
    empty = BfvContext.create_empty_context(bfv.params)
    with pytest.raises(RuntimeError,
                       match='Context does not have a relinearization key.'):
        empty.relinearize(ct3)


def test_bootstrap_without_bootstrapper(ckks):
    ct = ckks.encrypt(ckks.encode(np.zeros(1), 2))
    with pytest.raises(RuntimeError, match='create_bootstrapper'):
        ckks.bootstrap(ct)


# ---- serialization failures -------------------------------------------------
def test_deserialize_ciphertext_garbage(bfv):
    with pytest.raises(Exception):
        bfv.deserialize_ciphertext(b'\x00\x01garbage-not-a-ciphertext')


def test_deserialize_context_garbage():
    from lattisense_tpu.runtime.context import FheContext
    with pytest.raises(Exception):
        FheContext.deserialize(b'not-a-context-blob')


def test_deserialize_ciphertext_truncated(bfv):
    ct = bfv.encrypt(bfv.encode(np.arange(N, dtype=np.uint64) % T, 2))
    blob = bfv.serialize_ciphertext(ct)
    with pytest.raises(Exception):
        bfv.deserialize_ciphertext(blob[:len(blob) // 3])
