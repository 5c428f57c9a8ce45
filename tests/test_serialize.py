"""Serialization round-trips (reference coverage: test_lattigo.cpp
serialization cases — ct, compressed ct, secret/public context, plain &
"advanced") plus the 2-party client/server flow of
examples/ckks_mult_serialization_cpu."""

import numpy as np
import pytest

import lattisense_tpu  # noqa: F401
from lattisense_tpu.core.modring import gen_ntt_primes
from lattisense_tpu.params import BfvParams, CkksParams
from lattisense_tpu.runtime import BfvContext, CkksContext
from lattisense_tpu.utils import serialize as S

N, T = 64, 65537


@pytest.fixture(scope='module')
def bfv_ctx():
    q = gen_ntt_primes(N, 50, 3)
    p = gen_ntt_primes(N, 51, 1, exclude=tuple(q))
    ctx = BfvContext.create_random_context(BfvParams.create_custom(N, T, q, p), seed=31)
    ctx.gen_rotation_keys_for_rotations([1], swap_rows=True)
    return ctx


@pytest.fixture(scope='module')
def ckks_ctx():
    big = gen_ntt_primes(N, 60, 2)
    mids = gen_ntt_primes(N, 40, 2)
    params = CkksParams.create_custom(N, [big[0]] + mids, [big[1]], scale=float(1 << 40))
    return CkksContext.create_random_context(params, seed=32)


def test_pack_bits_roundtrip():
    rng = np.random.default_rng(0)
    for w in (1, 2, 17, 50, 63, 64):
        vals = rng.integers(0, 1 << min(w, 62), 100, dtype=np.uint64)
        got = S.unpack_bits(S.pack_bits(vals, w), w, 100)
        np.testing.assert_array_equal(got, vals)


def test_bfv_ciphertext_roundtrip(bfv_ctx):
    rng = np.random.default_rng(1)
    m = rng.integers(0, T, N, dtype=np.uint64)
    ct = bfv_ctx.encrypt(bfv_ctx.encode(m, 2))
    blob = bfv_ctx.serialize_ciphertext(ct)
    back = bfv_ctx.deserialize_ciphertext(blob)
    np.testing.assert_array_equal(back.data, ct.data)
    assert back.level == ct.level and back.degree == ct.degree
    np.testing.assert_array_equal(bfv_ctx.decrypt_decode(back), m)


def test_bfv_ciphertext_bit_drop(bfv_ctx):
    """LSB-drop compression is lossy but must still decrypt correctly for
    small drops (noise margin) and shrink the blob."""
    rng = np.random.default_rng(2)
    m = rng.integers(0, T, N, dtype=np.uint64)
    ct = bfv_ctx.encrypt(bfv_ctx.encode(m, 2))
    full = bfv_ctx.serialize_ciphertext(ct)
    dropped = bfv_ctx.serialize_ciphertext(ct, n_drop_bit_0=8, n_drop_bit_1=8)
    assert len(dropped) < len(full)
    back = bfv_ctx.deserialize_ciphertext(dropped)
    np.testing.assert_array_equal(bfv_ctx.decrypt_decode(back), m)


def test_compressed_ciphertext_roundtrip(bfv_ctx):
    rng = np.random.default_rng(3)
    m = rng.integers(0, T, N, dtype=np.uint64)
    cct = bfv_ctx.encrypt_symmetric_compressed(bfv_ctx.encode(m, 2))
    blob = cct.serialize(bfv_ctx.params)
    full = bfv_ctx.serialize_ciphertext(bfv_ctx.compressed_ciphertext_to_ciphertext(cct))
    assert len(blob) < 0.6 * len(full)
    back = S.CompressedCiphertext.deserialize(blob)
    ct = bfv_ctx.compressed_ciphertext_to_ciphertext(back)
    np.testing.assert_array_equal(bfv_ctx.decrypt_decode(ct), m)


def test_ckks_compressed(ckks_ctx):
    rng = np.random.default_rng(4)
    v = rng.uniform(-1, 1, N // 2)
    cct = ckks_ctx.encrypt_symmetric_compressed(ckks_ctx.encode(v, 2))
    ct = ckks_ctx.compressed_ciphertext_to_ciphertext(
        S.CompressedCiphertext.deserialize(cct.serialize(ckks_ctx.params)))
    np.testing.assert_allclose(ckks_ctx.decrypt_decode(ct).real, v, atol=1e-6)


def test_context_roundtrip_public_and_advanced(bfv_ctx):
    rng = np.random.default_rng(5)
    m = rng.integers(0, T, N, dtype=np.uint64)

    # client/server: public context travels without sk; advanced carries keys
    pub = bfv_ctx.make_public_context()
    blob = pub.serialize_advanced()
    server = BfvContext.deserialize(blob)
    assert server.sk is None and server.rlk is not None
    assert set(server.glk.keys) == set(bfv_ctx.glk.keys)

    ct = bfv_ctx.encrypt(bfv_ctx.encode(m, 2))
    prod = server.mult_relin(ct, ct)
    expected = (m.astype(object) * m % T).astype(np.uint64)
    np.testing.assert_array_equal(bfv_ctx.decrypt_decode(prod), expected)

    # secret context round-trip decrypts what the original encrypted
    sec = BfvContext.deserialize(bfv_ctx.serialize())
    np.testing.assert_array_equal(sec.decrypt_decode(ct), m)


def test_two_party_protocol(ckks_ctx):
    """examples/ckks_mult_serialization_cpu shape: client encrypts +
    serializes; server (public context from bytes) computes; client
    decrypts the returned bytes."""
    rng = np.random.default_rng(6)
    va = rng.uniform(-1, 1, N // 2)
    vb = rng.uniform(-1, 1, N // 2)

    # client -> server: public context + two ciphertexts
    server = CkksContext.deserialize(ckks_ctx.make_public_context().serialize_advanced())
    blob_a = ckks_ctx.serialize_ciphertext(ckks_ctx.encrypt(ckks_ctx.encode(va, 2)))
    blob_b = ckks_ctx.serialize_ciphertext(ckks_ctx.encrypt(ckks_ctx.encode(vb, 2)))

    # server computes and returns bytes
    ca = server.deserialize_ciphertext(blob_a)
    cb = server.deserialize_ciphertext(blob_b)
    out = server.rescale(server.mult_relin(ca, cb))
    blob_out = server.serialize_ciphertext(out)

    # client decrypts
    got = ckks_ctx.decrypt_decode(ckks_ctx.deserialize_ciphertext(blob_out))
    np.testing.assert_allclose(got.real, va * vb, atol=1e-4)


def test_word32_roundtrips():
    """w32 (31-bit-word) chains: ct, compressed ct, and advanced context
    round-trips restore the u32 dtype (the params header records the word)
    and decrypt correctly."""
    chain = gen_ntt_primes(N, 31, 8)
    q, p = chain[:6], chain[6:8]
    params = BfvParams.create_custom(N, T, q, p, word_bits=32)
    ctx = BfvContext.create_random_context(params, seed=41)
    ctx.gen_rotation_keys_for_rotations([1])
    rng = np.random.default_rng(9)
    m = rng.integers(0, T, N, dtype=np.uint64)

    ct = ctx.encrypt(ctx.encode(m, 2))
    ct2 = S.deserialize_ciphertext(S.serialize_ciphertext(ct, params))
    assert ct2.data.dtype == np.uint32
    np.testing.assert_array_equal(ctx.decrypt_decode(ct2), m)

    cct = ctx.encrypt_symmetric_compressed(ctx.encode(m, 2), seed=99)
    cct2 = S.CompressedCiphertext.deserialize(cct.serialize(params))
    assert cct2.c0.dtype == np.uint32
    dec = ctx.compressed_ciphertext_to_ciphertext(cct2)
    np.testing.assert_array_equal(ctx.decrypt_decode(dec), m)

    blob = S.serialize_context(ctx, advanced=True)
    ctx2 = S.deserialize_context(blob)
    assert ctx2.params.word_bits == 32
    assert ctx2.pk.data.dtype == np.uint32
    assert ctx2.rlk.key_q.dtype == np.uint32
    ct3 = ctx2.encrypt(ctx2.encode(m, 2))
    prod = ctx2.engine.relinearize(
        np, ctx2.engine.mult(np, ct3, ct3), ctx2.rlk)
    np.testing.assert_array_equal(
        ctx2.decrypt_decode(prod),
        (m.astype(object) * m % T).astype(np.uint64))
