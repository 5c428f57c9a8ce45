"""Fused Pallas NTT vs the reference implementation (interpret mode on the
CPU mesh; bit-exactness of the u32-pair arithmetic and the two-phase
transposed layout)."""

import numpy as np
import pytest

import lattisense_tpu  # noqa: F401
import jax.numpy as jnp

from lattisense_tpu.core import ntt as ntt_mod
from lattisense_tpu.core.modring import gen_ntt_primes, get_rns_ring
from lattisense_tpu.ops.ntt_pallas import ntt_fused


def test_fused_ntt_bitexact():
    n, L, B = 16384, 2, 1
    q = gen_ntt_primes(n, 55, L)
    ring = get_rns_ring(tuple(q), n)
    rng = np.random.default_rng(0)
    x = np.stack([np.stack([rng.integers(0, qi, n, dtype=np.uint64) for qi in q])
                  for _ in range(B)])
    ref = ntt_mod.ntt(np, x, ring)
    got = np.asarray(ntt_fused(jnp.asarray(x), ring))
    np.testing.assert_array_equal(got, ref)


def test_u32_pair_primitives():
    """The in-kernel 64-bit building blocks vs native u64 arithmetic."""
    from lattisense_tpu.ops import ntt_pallas as K
    rng = np.random.default_rng(1)
    a = rng.integers(0, 1 << 63, 1000, dtype=np.uint64)
    b = rng.integers(0, 1 << 63, 1000, dtype=np.uint64)

    def split(v):
        return ((v >> np.uint64(32)).astype(np.uint32),
                (v & np.uint64(0xFFFFFFFF)).astype(np.uint32))

    def join(h, l):
        return h.astype(np.uint64) << np.uint64(32) | l.astype(np.uint64)

    ah, al = split(a)
    bh, bl = split(b)
    np.testing.assert_array_equal(join(*K._add64(ah, al, bh, bl)), a + b)
    np.testing.assert_array_equal(join(*K._sub64(ah, al, bh, bl)), a - b)
    np.testing.assert_array_equal(join(*K._mullo64(ah, al, bh, bl)), a * b)
    hi = ((a.astype(object) * b.astype(object)) >> 64).astype(np.uint64)
    np.testing.assert_array_equal(join(*K._mulhi64(ah, al, bh, bl)), hi)
    np.testing.assert_array_equal(K._geq64(ah, al, bh, bl), a >= b)


def test_fused_intt_bitexact():
    from lattisense_tpu.ops.ntt_pallas import intt_fused
    n, L, B = 16384, 2, 1
    q = gen_ntt_primes(n, 55, L)
    ring = get_rns_ring(tuple(q), n)
    rng = np.random.default_rng(3)
    x = np.stack([np.stack([rng.integers(0, qi, n, dtype=np.uint64) for qi in q])
                  for _ in range(B)])
    ref = ntt_mod.intt(np, x, ring)
    got = np.asarray(intt_fused(jnp.asarray(x), ring))
    np.testing.assert_array_equal(got, ref)


def test_fused_roundtrip():
    from lattisense_tpu.ops.ntt_pallas import ntt_fused, intt_fused
    n, L = 16384, 2
    q = gen_ntt_primes(n, 55, L)
    ring = get_rns_ring(tuple(q), n)
    rng = np.random.default_rng(5)
    x = np.stack([rng.integers(0, qi, n, dtype=np.uint64) for qi in q])[None]
    back = np.asarray(intt_fused(ntt_fused(jnp.asarray(x), ring), ring))
    np.testing.assert_array_equal(back, x)


def test_core_dispatch_env_gate(monkeypatch):
    """LATTISENSE_PALLAS_NTT routes the jax path through the fused kernels
    (interpret mode on CPU) and stays bit-identical to the XLA path."""
    import jax.numpy as jnp2
    import lattisense_tpu.core.ntt as core_ntt
    n, L = 16384, 2
    q = gen_ntt_primes(n, 55, L)
    ring = get_rns_ring(tuple(q), n)
    rng = np.random.default_rng(9)
    x = np.stack([rng.integers(0, qi, n, dtype=np.uint64) for qi in q])[None]
    ref_f = np.asarray(core_ntt.ntt(jnp2, jnp2.asarray(x), ring))
    ref_i = np.asarray(core_ntt.intt(jnp2, jnp2.asarray(ref_f), ring))
    monkeypatch.setattr(core_ntt, '_USE_PALLAS', True)
    got_f = np.asarray(core_ntt.ntt(jnp2, jnp2.asarray(x), ring))
    got_i = np.asarray(core_ntt.intt(jnp2, jnp2.asarray(got_f), ring))
    np.testing.assert_array_equal(got_f, ref_f)
    np.testing.assert_array_equal(got_i, ref_i)


def test_fused_ntt_under_vmap():
    """jax.vmap over the fused NTT must collapse into one batched kernel
    call (custom_vmap) and stay bit-identical."""
    import jax
    from lattisense_tpu.ops.ntt_pallas import ntt_fused
    n, L, B = 2048, 2, 3
    q = gen_ntt_primes(n, 55, L)
    ring = get_rns_ring(tuple(q), n)
    rng = np.random.default_rng(11)
    x = np.stack([np.stack([rng.integers(0, qi, n, dtype=np.uint64)
                            for qi in q]) for _ in range(B)])
    ref = ntt_mod.ntt(np, x, ring)
    got = np.asarray(jax.vmap(lambda v: ntt_fused(v, ring))(jnp.asarray(x)))
    np.testing.assert_array_equal(got, ref)


def test_conjugated_inverse_bitexact():
    """The descending-distance (bit-reversal-conjugated GS) inverse is
    bit-identical to core intt (both ring sizes exercise the two brv-axis
    splits)."""
    from lattisense_tpu.ops.ntt_pallas import _intt_conj_impl
    for n in (2048, 4096):
        L = 2
        q = gen_ntt_primes(n, 55, L)
        ring = get_rns_ring(tuple(q), n)
        rng = np.random.default_rng(n)
        x = np.stack([np.stack([rng.integers(0, qi, n, dtype=np.uint64)
                                for qi in q]) for _ in range(2)])
        ref = ntt_mod.intt(np, x, ring)
        got = np.asarray(_intt_conj_impl(jnp.asarray(x), ring))
        np.testing.assert_array_equal(got, ref)


def test_xla_conjugated_inverse_bitexact():
    """The env-gated XLA conjugated inverse (core.ntt._intt_conj) is
    bit-identical to the ascending formulation."""
    import lattisense_tpu.core.ntt as core_ntt2
    n, L = 4096, 3
    q = gen_ntt_primes(n, 55, L)
    ring = get_rns_ring(tuple(q), n)
    rng = np.random.default_rng(17)
    x = np.stack([rng.integers(0, qi, n, dtype=np.uint64) for qi in q])[None]
    ref = core_ntt2.intt(np, x, ring)
    got = np.asarray(core_ntt2._intt_conj(jnp, jnp.asarray(x), ring))
    np.testing.assert_array_equal(got, ref)


# ---------------------------------------------------------------------------
# fold-idiom u64 kernels (ops/ntt_pallas64f.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('n,batch', [(256, (1,)), (1024, (3,))])
def test_pallas64f_bit_exact(n, batch):
    import jax.numpy as jnp
    from lattisense_tpu.core.modring import gen_ntt_primes, get_rns_ring
    from lattisense_tpu.core import ntt as ntt_mod
    from lattisense_tpu.ops.ntt_pallas64f import intt_fused64, ntt_fused64
    chain = tuple(gen_ntt_primes(n, 55, 3))
    ring = get_rns_ring(chain, n)
    rng = np.random.default_rng(9)
    x = np.stack([[rng.integers(0, qi, n, dtype=np.uint64) for qi in chain]
                  for _ in range(int(np.prod(batch)))]).reshape(*batch, 3, n)
    want = ntt_mod.ntt(np, x, ring)
    got = np.asarray(ntt_fused64(jnp.asarray(x), ring))
    assert np.array_equal(got, want)
    back = np.asarray(intt_fused64(jnp.asarray(want), ring))
    assert np.array_equal(back, x)


def test_pallas64f_vmap_collapses():
    import jax
    import jax.numpy as jnp
    from lattisense_tpu.core.modring import gen_ntt_primes, get_rns_ring
    from lattisense_tpu.core import ntt as ntt_mod
    from lattisense_tpu.ops.ntt_pallas64f import ntt_fused64
    n = 256
    chain = tuple(gen_ntt_primes(n, 55, 2))
    ring = get_rns_ring(chain, n)
    rng = np.random.default_rng(10)
    x = np.stack([[rng.integers(0, qi, n, dtype=np.uint64) for qi in chain]
                  for _ in range(4)])
    want = ntt_mod.ntt(np, x, ring)
    got = np.asarray(jax.vmap(lambda v: ntt_fused64(v, ring))(jnp.asarray(x)))
    assert np.array_equal(got, want)
