"""Device-path conformance: engine eval ops under jax.numpy (jitted) must be
bit-identical to the NumPy golden path (exact u64 semantics survive XLA)."""

import numpy as np
import pytest

import lattisense_tpu  # noqa: F401  (x64)
import jax
import jax.numpy as jnp

from lattisense_tpu.params import BfvParams, CkksParams
from lattisense_tpu.core.modring import gen_ntt_primes
from lattisense_tpu.schemes.bfv import BfvEngine
from lattisense_tpu.schemes.ckks import CkksEngine
from lattisense_tpu.schemes.types import Ciphertext
from lattisense_tpu.schemes import keys as K


@pytest.fixture(scope='module')
def bfv():
    n = 64
    q = gen_ntt_primes(n, 50, 3)
    p = gen_ntt_primes(n, 51, 1, exclude=tuple(q))
    params = BfvParams.create_custom(n, 65537, q, p)
    eng = BfvEngine(params)
    rng = np.random.default_rng(3)
    sk = K.SecretKey(K.sample_ternary(rng, n))
    pk = K.gen_public_key(rng, sk, tuple(q), n)
    rlk = K.gen_relin_key(rng, sk, tuple(q), tuple(p), n)
    return params, eng, rng, sk, pk, rlk


def test_bfv_mult_relin_jit_bitexact(bfv):
    params, eng, rng, sk, pk, rlk = bfv
    ma = rng.integers(0, 65537, params.n, dtype=np.uint64)
    mb = rng.integers(0, 65537, params.n, dtype=np.uint64)
    a = eng.encrypt_asymmetric(rng, pk, eng.encode(ma, 2))
    b = eng.encrypt_asymmetric(rng, pk, eng.encode(mb, 2))

    ref = eng.relinearize(np, eng.mult(np, a, b), rlk)

    @jax.jit
    def step(xa, xb):
        ca = Ciphertext(data=xa, level=2)
        cb = Ciphertext(data=xb, level=2)
        return eng.relinearize(jnp, eng.mult(jnp, ca, cb), rlk).data

    dev = np.asarray(step(jnp.asarray(a.data), jnp.asarray(b.data)))
    assert np.array_equal(dev, ref.data)


def test_bfv_rotate_jit_bitexact(bfv):
    params, eng, rng, sk, pk, rlk = bfv
    from lattisense_tpu.schemes.galois import galois_elt_col
    glk = K.gen_galois_key(rng, sk, galois_elt_col(3, params.n),
                           tuple(params.q), tuple(params.p), params.n)
    ma = rng.integers(0, 65537, params.n, dtype=np.uint64)
    a = eng.encrypt_asymmetric(rng, pk, eng.encode(ma, 1))
    ref = eng.rotate_cols(np, a, 3, glk)

    @jax.jit
    def step(x):
        return eng.rotate_cols(jnp, Ciphertext(data=x, level=1), 3, glk).data

    assert np.array_equal(np.asarray(step(jnp.asarray(a.data))), ref.data)


def test_ckks_pipeline_jit_bitexact():
    n = 64
    big = gen_ntt_primes(n, 60, 2)
    mids = gen_ntt_primes(n, 40, 3)
    params = CkksParams.create_custom(n, [big[0]] + mids, [big[1]], scale=float(1 << 40))
    eng = CkksEngine(params)
    rng = np.random.default_rng(9)
    sk = K.SecretKey(K.sample_ternary(rng, n))
    pk = K.gen_public_key(rng, sk, tuple(params.q), n)
    rlk = K.gen_relin_key(rng, sk, tuple(params.q), tuple(params.p), n)
    va = rng.uniform(-1, 1, params.slots)
    vb = rng.uniform(-1, 1, params.slots)
    a = eng.encrypt_asymmetric(rng, pk, eng.encode(va, 2))
    b = eng.encrypt_asymmetric(rng, pk, eng.encode(vb, 2))

    ref = eng.rescale(np, eng.relinearize(np, eng.mult(np, a, b), rlk))

    @jax.jit
    def step(xa, xb):
        ca = Ciphertext(data=xa, level=2, is_ntt=True, scale=a.scale)
        cb = Ciphertext(data=xb, level=2, is_ntt=True, scale=b.scale)
        return eng.rescale(jnp, eng.relinearize(jnp, eng.mult(jnp, ca, cb), rlk)).data

    dev = np.asarray(step(jnp.asarray(a.data), jnp.asarray(b.data)))
    assert np.array_equal(dev, ref.data)
