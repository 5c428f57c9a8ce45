"""Galois automorphisms σ_g: m(x) → m(x^g) on R = Z[x]/(x^n+1).

Column rotation by `step` uses g = 5^step mod 2n (GALOIS_GEN = 5,
reference: frontend/custom_task.py:44,139); row swap / CKKS conjugation
uses g = 2n-1 (custom_task.py:143). SEAL-convention variants (gen 3) are
the same machinery with a different generator.

Two precomputed index maps per (n, g):
- coefficient domain: gather with sign flip (x^n = -1 wrap),
- NTT (bit-reversed evaluation) domain: pure permutation of eval points,
  identical for every RNS limb (the position→exponent map of the core NTT
  depends only on the bit-reversal structure, not the prime).
"""

import functools

import numpy as np

from ..core.modring import bit_reverse


def galois_elt_col(step: int, n: int, gen: int = 5) -> int:
    """Galois element for a column rotation by `step`
    (reference: get_galois_element_for_column_rotation_by, custom_task.py:139)."""
    mask = (n << 1) - 1
    return pow(gen, step & mask, n << 1)


def galois_elt_row(n: int) -> int:
    return (n << 1) - 1


@functools.lru_cache(maxsize=None)
def coeff_automorphism_maps(n: int, g: int):
    """(src, sign_neg): out[k] = ± in[src[k]]; sign_neg[k]=1 means negate."""
    two_n = 2 * n
    g_inv = pow(g, -1, two_n)
    k = np.arange(n, dtype=np.int64)
    j = (k * g_inv) % two_n
    sign_neg = (j >= n).astype(np.uint64)
    src = np.where(j >= n, j - n, j)
    return src, sign_neg


@functools.lru_cache(maxsize=None)
def _ntt_pos_exponents(n: int) -> np.ndarray:
    """exp_of_pos[i] for the core NTT's output order: position i holds the
    evaluation at ψ^(2·brv(i)+1) (verified by tests against the empirical
    map in encoding._ntt_exponent_map)."""
    logn = n.bit_length() - 1
    return np.array([2 * bit_reverse(i, logn) + 1 for i in range(n)], dtype=np.int64)


@functools.lru_cache(maxsize=None)
def ntt_automorphism_perm(n: int, g: int) -> np.ndarray:
    """perm such that out[..., i] = in[..., perm[i]] applies σ_g in NTT domain."""
    two_n = 2 * n
    exp_of_pos = _ntt_pos_exponents(n)
    pos_of_exp = np.full(two_n, -1, dtype=np.int64)
    pos_of_exp[exp_of_pos] = np.arange(n)
    perm = pos_of_exp[(exp_of_pos * g) % two_n]
    assert (perm >= 0).all()
    return perm


def apply_automorphism_coeff(xp, x, q, n: int, g: int):
    """σ_g on coeff-domain limbs x: (..., L, n), q: (L, 1) moduli."""
    src, sign_neg = coeff_automorphism_maps(n, g)
    vals = xp.take(x, xp.asarray(src), axis=-1) if xp.__name__ != 'numpy' else x[..., src]
    neg = xp.where(vals == 0, vals, q - vals)
    return xp.where(xp.asarray(sign_neg, dtype=bool), neg, vals)


def apply_automorphism_ntt(xp, x, n: int, g: int):
    """σ_g on NTT-domain limbs x: (..., L, n)."""
    perm = ntt_automorphism_perm(n, g)
    if xp.__name__ == 'numpy':
        return x[..., perm]
    return xp.take(x, xp.asarray(perm), axis=-1)
