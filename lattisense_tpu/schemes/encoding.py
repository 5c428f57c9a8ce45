"""Message encoding/decoding: BFV slot batching and CKKS canonical embedding.

BFV batching (reference behavior: BfvContext::encode/decode,
fhe_ops_lib/fhe_lib_v2.h:358-706): messages are vectors over Z_t laid out as
a 2×(n/2) matrix. Slot (r, c) is the evaluation of the plaintext polynomial
at ζ^((2n-1)^r · 5^c mod 2n), ζ a primitive 2n-th root of unity mod t, so
that the Galois automorphism x→x^(5^step) rotates columns left by `step`
(matching the vec_rotate_col oracle, fhe_ops_lib/utils.h:66-69) and
x→x^(2n-1) swaps the rows (vec_rotate_row).

CKKS (CkksContext::encode): canonical embedding at ζ^(5^c), computed with a
twisted FFT on the host (float64), slots ≤ n/2 with sparse packing realized
as message replication (Lattigo convention).

The slot→NTT-position permutation is derived *empirically* from the NTT
tables (discrete-log of the transform of x), so it is correct for any
bit-reversal convention of the core NTT.
"""

import functools

import numpy as np

from ..core import ntt as ntt_mod
from ..core.modring import get_rns_ring

_U64 = np.uint64


@functools.lru_cache(maxsize=None)
def _ntt_exponent_map(t: int, n: int) -> np.ndarray:
    """exp_of_pos[i] = e such that NTT output position i is evaluation at ψ^e
    (ψ the primitive 2n-th root used by the tables), derived by transforming
    the monomial x."""
    ring = get_rns_ring((t,), n)
    x = np.zeros((1, n), dtype=_U64)
    x[0, 1] = 1
    evals = ntt_mod.ntt(np, x, ring)[0]
    psi = ring.rings[0].psi
    dlog = {}
    cur = 1
    for k in range(2 * n):
        dlog[cur] = k
        cur = cur * psi % t
    return np.array([dlog[int(v)] for v in evals], dtype=np.int64)


@functools.lru_cache(maxsize=None)
def _bfv_slot_perm(t: int, n: int) -> np.ndarray:
    """perm[s] = NTT position of slot s (s = r*(n/2) + c)."""
    exp_of_pos = _ntt_exponent_map(t, n)
    pos_of_exp = np.full(2 * n, -1, dtype=np.int64)
    pos_of_exp[exp_of_pos] = np.arange(n)
    half = n // 2
    perm = np.empty(n, dtype=np.int64)
    e = 1
    for c in range(half):
        perm[c] = pos_of_exp[e]                      # row 0: ζ^(5^c)
        perm[half + c] = pos_of_exp[(2 * n - 1) * e % (2 * n)]  # row 1: ζ^(-5^c)
        e = e * 5 % (2 * n)
    assert (perm >= 0).all()
    return perm


def bfv_encode_slots(values, t: int, n: int) -> np.ndarray:
    """Z_t slot vector (≤ n entries, zero-padded) → plaintext poly mod t (n,)."""
    ring = get_rns_ring((t,), n)
    perm = _bfv_slot_perm(t, n)
    v = np.zeros(n, dtype=_U64)
    vals = np.asarray(values, dtype=_U64) % _U64(t)
    v[:len(vals)] = vals
    evals = np.zeros((1, n), dtype=_U64)
    evals[0, perm] = v
    return ntt_mod.intt(np, evals, ring)[0]


def bfv_decode_slots(poly_mod_t: np.ndarray, t: int, n: int) -> np.ndarray:
    """Plaintext poly mod t (n,) → slot vector (n,) over Z_t."""
    ring = get_rns_ring((t,), n)
    perm = _bfv_slot_perm(t, n)
    evals = ntt_mod.ntt(np, poly_mod_t.reshape(1, n).astype(_U64), ring)[0]
    return evals[perm]


# ---------------------------------------------------------------------------
# CKKS canonical embedding (host float64)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _ckks_tables(n: int):
    half = n // 2
    j = np.arange(n)
    twist = np.exp(1j * np.pi * j / n)              # ζ^j, ζ = e^{iπ/n}
    # slot c ↔ evaluation at ζ^(5^c); exponent 2k+1 ↔ FFT bin k
    e = np.empty(half, dtype=np.int64)
    cur = 1
    for c in range(half):
        e[c] = cur
        cur = cur * 5 % (2 * n)
    k_pos = (e - 1) // 2
    k_neg = (2 * n - e - 1) // 2
    return twist, k_pos, k_neg


def ckks_embed_inv(values: np.ndarray, n: int) -> np.ndarray:
    """Complex slot vector (n/2, replicated if sparse) → real coeffs (n,) float."""
    twist, k_pos, k_neg = _ckks_tables(n)
    evals = np.zeros(n, dtype=np.complex128)
    v = np.asarray(values, dtype=np.complex128)
    evals[k_pos] = v
    evals[k_neg] = np.conj(v)
    # evals[k] = m(ζ^{2k+1}) = Σ_j (m_j ζ^j) e^{2πi jk / n} = n·ifft(twisted)
    tw = np.fft.fft(evals) / n
    return np.real(tw * np.conj(twist))


def ckks_embed(coeffs: np.ndarray, n: int) -> np.ndarray:
    """Real coeffs (n,) → complex slot vector (n/2,)."""
    twist, k_pos, k_neg = _ckks_tables(n)
    evals = n * np.fft.ifft(np.asarray(coeffs, dtype=np.float64) * twist)
    return evals[k_pos]


def ckks_encode_values(values, n: int, slots: int, scale: float) -> np.ndarray:
    """Complex/real message (≤ slots entries) → scaled integer coeffs (n,) as
    Python-int array (exact, may exceed 64 bits for large scales)."""
    half = n // 2
    v = np.zeros(slots, dtype=np.complex128)
    vals = np.asarray(values, dtype=np.complex128)
    v[:len(vals)] = vals
    dense = np.tile(v, half // slots)
    coeffs = ckks_embed_inv(dense, n) * scale
    return np.array([int(round(c)) for c in coeffs], dtype=object)


def ckks_decode_values(coeffs_signed, n: int, slots: int, scale: float) -> np.ndarray:
    """Signed integer coeffs (n,) → complex message (slots,)."""
    half = n // 2
    c = np.array([float(x) for x in coeffs_signed], dtype=np.float64) / scale
    dense = ckks_embed(c, n)
    return dense[:slots]
