"""Four-step MXU NTT/INTT: bit-exact twin of core/ntt.py (the contract
every consumer relies on — same bit-reversed-eval-order convention)."""

import numpy as np
import pytest

import lattisense_tpu  # noqa: F401
import jax.numpy as jnp

from lattisense_tpu.core import ntt as ntt_mod
from lattisense_tpu.core.modring import gen_ntt_primes, get_rns_ring
from lattisense_tpu.ops import ntt_mxu


@pytest.mark.parametrize('n', [64, 128, 256, 512])
@pytest.mark.parametrize('bits', [50, 61])
def test_mxu_ntt_bit_exact(n, bits):
    L = 3
    q = gen_ntt_primes(n, bits, L)
    ring = get_rns_ring(tuple(q), n)
    rng = np.random.default_rng(n + bits)
    x = np.stack([np.stack([rng.integers(0, qi, n, dtype=np.uint64)
                            for qi in q]) for _ in range(2)])   # (2, L, n)
    ref = ntt_mod.ntt(np, x, ring)
    got = np.asarray(ntt_mxu.ntt(jnp, jnp.asarray(x), ring))
    np.testing.assert_array_equal(got, ref)
    back = np.asarray(ntt_mxu.intt(jnp, jnp.asarray(ref), ring))
    ref_back = ntt_mod.intt(np, ref, ring)
    np.testing.assert_array_equal(back, ref_back)
    np.testing.assert_array_equal(back, x)


def test_mxu_roundtrip_odd_logn():
    """R != C path (odd log2 n)."""
    n, L = 128, 2
    q = gen_ntt_primes(n, 55, L)
    ring = get_rns_ring(tuple(q), n)
    rng = np.random.default_rng(7)
    x = np.stack([rng.integers(0, qi, n, dtype=np.uint64) for qi in q])
    got = np.asarray(ntt_mxu.ntt(jnp, jnp.asarray(x), ring))
    np.testing.assert_array_equal(got, ntt_mod.ntt(np, x, ring))


def test_mxu_int8_dot_path(monkeypatch):
    """The LATTISENSE_MXU_I8DOT variant is equally bit-exact."""
    monkeypatch.setattr(ntt_mxu, '_I8DOT', True)
    n, L = 256, 2
    q = gen_ntt_primes(n, 61, L)
    ring = get_rns_ring(tuple(q), n)
    rng = np.random.default_rng(3)
    x = np.stack([rng.integers(0, qi, n, dtype=np.uint64) for qi in q])
    np.testing.assert_array_equal(
        np.asarray(ntt_mxu.ntt(jnp, jnp.asarray(x), ring)),
        ntt_mod.ntt(np, x, ring))
    y = ntt_mod.ntt(np, x, ring)
    np.testing.assert_array_equal(
        np.asarray(ntt_mxu.intt(jnp, jnp.asarray(y), ring)), x)


def test_mxu_gate_via_core(monkeypatch):
    """core.ntt dispatches to the MXU path when enabled — same results."""
    monkeypatch.setattr(ntt_mxu, '_ENABLED', True)
    n, L = 4096, 3
    q = gen_ntt_primes(n, 55, L)
    ring = get_rns_ring(tuple(q), n)
    rng = np.random.default_rng(4)
    x = np.stack([rng.integers(0, qi, n, dtype=np.uint64) for qi in q])
    got = np.asarray(ntt_mod.ntt(jnp, jnp.asarray(x), ring))
    np.testing.assert_array_equal(got, ntt_mod.ntt(np, x, ring))
    back = np.asarray(ntt_mod.intt(jnp, jnp.asarray(got), ring))
    np.testing.assert_array_equal(back, x)
