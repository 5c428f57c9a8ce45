"""Key generation (host-side, NumPy, exact) for BFV/CKKS.

Replaces the reference's Lattigo keygen (CreateRandomBfvContext etc.,
fhe_ops_lib/fhe_lib_v2.cpp:85). Deterministic given a seed, mirroring the
reference's seeded-context path (fhe_lib_v2.h:846
create_random_context_with_seed).

Distributions: uniform ternary secret, centered discrete Gaussian errors
(σ = 3.2), uniform ring elements sampled directly per RNS limb (CRT makes
independent per-limb uniforms a uniform element of R_Q).

Hybrid key-switching keys (GHS / Lattigo-style): β = ceil(Lq/α) digits with
α = |P| special primes. Digit d's key encrypts P·γ_d·s' where
γ_d = (Q/Q_d)·[(Q/Q_d)^{-1}]_{Q_d}; γ_d's residues are level-independent on
the q-chain, so one key serves every level (see schemes/keyswitch.py).
"""

import math

import numpy as np

from ..core import ntt as ntt_mod
from ..core import u64 as _u
from ..core.modring import get_rns_ring
from .types import KeySwitchKey, PublicKey
from .galois import apply_automorphism_coeff

_U64 = np.uint64
SIGMA = 3.2


def lift_signed(coeffs, moduli, word_bits: int = 64) -> np.ndarray:
    """Signed small coeffs (n,) → RNS (L, n) in the word dtype."""
    from ..core.u64 import word_dtype
    dt = word_dtype(word_bits)
    c = np.asarray(coeffs, dtype=np.int64)
    out = np.empty((len(moduli), len(c)), dtype=dt)
    for i, q in enumerate(moduli):
        # true reduction, not a single +q re-center: wide smudging noise
        # (sigma ~2^30 multiparty shares) exceeds 31-bit w32 primes
        out[i] = np.mod(c, np.int64(q)).astype(dt)
    return out


def sample_ternary(rng, n: int, h: int | None = None) -> np.ndarray:
    """Uniform ternary secret; ``h`` gives a sparse secret of Hamming
    weight h (bootstrapping contexts — reference param sets use H192)."""
    if h is None:
        return rng.integers(-1, 2, size=n, dtype=np.int64)
    coeffs = np.zeros(n, dtype=np.int64)
    idx = rng.choice(n, size=h, replace=False)
    coeffs[idx] = rng.choice(np.array([-1, 1], dtype=np.int64), size=h)
    return coeffs


def sample_gaussian(rng, n: int, sigma: float = SIGMA) -> np.ndarray:
    """Discrete gaussian; ``sigma`` > SIGMA gives the smudging/flooding
    distribution used by multiparty partial decryptions (reference:
    sigma_smudging on DBfvContext::create_random_context, fhe_lib_v2.h:716)."""
    return np.round(rng.normal(0.0, sigma, size=n)).astype(np.int64)


def sample_uniform_rns(rng, moduli, n: int, word_bits: int = 64) -> np.ndarray:
    """Uniform per-limb residues. Always drawn as a u64 stream then cast, so
    the sampled VALUES are identical across word widths (32/64-bit engines
    on the same chain are bit-comparable given the same seed)."""
    from ..core.u64 import word_dtype
    out = np.stack([rng.integers(0, int(q), size=n, dtype=np.uint64) for q in moduli])
    return out.astype(word_dtype(word_bits))


class SecretKey:
    def __init__(self, coeffs: np.ndarray):
        self.coeffs = coeffs                     # (n,) in {-1, 0, 1}
        self._ntt_cache: dict = {}

    def ntt_form(self, moduli: tuple[int, ...], n: int,
                 word_bits: int = 64) -> np.ndarray:
        key = (moduli, n, word_bits)
        if key not in self._ntt_cache:
            ring = get_rns_ring(moduli, n, word_bits)
            self._ntt_cache[key] = ntt_mod.ntt(
                np, lift_signed(self.coeffs, moduli, word_bits), ring)
        return self._ntt_cache[key]


def gen_public_key(rng, sk: SecretKey, q_moduli: tuple[int, ...], n: int,
                   word_bits: int = 64) -> PublicKey:
    """pk = (b, a) with b = -(a·s + e), stored in NTT domain over full Q."""
    ring = get_rns_ring(q_moduli, n, word_bits)
    s_ntt = sk.ntt_form(q_moduli, n, word_bits)
    a = sample_uniform_rns(rng, q_moduli, n, word_bits)  # uniform in NTT domain
    e_ntt = ntt_mod.ntt(np, lift_signed(sample_gaussian(rng, n), q_moduli,
                                        word_bits), ring)
    as_ = _u.mulmod(np, a, s_ntt, ring.q, ring.pinv, ring.r2)
    b = _u.negmod(np, _u.addmod(np, as_, e_ntt, ring.q), ring.q)
    return PublicKey(data=np.stack([b, a]))


def _gamma_times_p(q_moduli: tuple[int, ...], p_moduli: tuple[int, ...], alpha: int):
    """[P·γ_d]_{q_i} for each digit d (zero mod every special prime)."""
    Q = math.prod(q_moduli)
    P = math.prod(p_moduli)
    L = len(q_moduli)
    beta = (L + alpha - 1) // alpha
    consts = np.zeros((beta, L), dtype=np.uint64)
    for d in range(beta):
        group = q_moduli[d * alpha:(d + 1) * alpha]
        Qd = math.prod(group)
        gamma = (Q // Qd) * pow(Q // Qd, -1, Qd)
        for i, qi in enumerate(q_moduli):
            consts[d, i] = (P * gamma) % qi
    return consts


def gen_keyswitch_key(rng, sk: SecretKey, target_coeffs_rns_fn,
                      q_moduli: tuple[int, ...], p_moduli: tuple[int, ...],
                      n: int, word_bits: int = 64) -> KeySwitchKey:
    """Key switching s' → s. ``target_coeffs_rns_fn(moduli)`` returns the NTT
    form of s' over the given moduli. Output keys are NTT + Montgomery."""
    from ..core.u64 import word_dtype
    wdt = word_dtype(word_bits)
    qp = tuple(q_moduli) + tuple(p_moduli)
    ring = get_rns_ring(qp, n, word_bits)
    Lq, Lp = len(q_moduli), len(p_moduli)
    alpha = Lp
    beta = (Lq + alpha - 1) // alpha
    s_ntt = sk.ntt_form(qp, n, word_bits)
    t_ntt = target_coeffs_rns_fn(qp)
    consts = _gamma_times_p(q_moduli, p_moduli, alpha)   # (β, Lq)

    key_q = np.empty((beta, 2, Lq, n), dtype=wdt)
    key_p = np.empty((beta, 2, Lp, n), dtype=wdt)
    for d in range(beta):
        a = sample_uniform_rns(rng, qp, n, word_bits)
        e_ntt = ntt_mod.ntt(np, lift_signed(sample_gaussian(rng, n), qp,
                                            word_bits), ring)
        as_ = _u.mulmod(np, a, s_ntt, ring.q, ring.pinv, ring.r2)
        b = _u.negmod(np, _u.addmod(np, as_, e_ntt, ring.q), ring.q)
        # + P·γ_d·s'  (zero on the p-limbs)
        pg = np.zeros((Lq + Lp, 1), dtype=wdt)
        pg[:Lq, 0] = consts[d].astype(wdt)
        term = _u.mulmod(np, pg, t_ntt, ring.q, ring.pinv, ring.r2)
        b = _u.addmod(np, b, term, ring.q)
        bm = _u.to_mont(np, b, ring.q, ring.pinv, ring.r2)
        am = _u.to_mont(np, a, ring.q, ring.pinv, ring.r2)
        key_q[d, 0], key_q[d, 1] = bm[:Lq], am[:Lq]
        key_p[d, 0], key_p[d, 1] = bm[Lq:], am[Lq:]
    return KeySwitchKey(key_q=key_q, key_p=key_p,
                        level=Lq - 1, sp_level=Lp - 1)


def gen_relin_key(rng, sk: SecretKey, q_moduli, p_moduli, n: int,
                  word_bits: int = 64) -> KeySwitchKey:
    """Relinearization key: s' = s^2."""
    def s2_ntt(moduli):
        ring = get_rns_ring(moduli, n, word_bits)
        s = sk.ntt_form(moduli, n, word_bits)
        return _u.mulmod(np, s, s, ring.q, ring.pinv, ring.r2)
    return gen_keyswitch_key(rng, sk, s2_ntt, q_moduli, p_moduli, n, word_bits)


def gen_galois_key(rng, sk: SecretKey, galois_elt: int,
                   q_moduli, p_moduli, n: int,
                   word_bits: int = 64) -> KeySwitchKey:
    """Galois key for element g: s' = σ_g(s)."""
    def sg_ntt(moduli):
        ring = get_rns_ring(moduli, n, word_bits)
        s_rns = lift_signed(sk.coeffs, moduli, word_bits)
        s_rot = apply_automorphism_coeff(np, s_rns, ring.q, n, galois_elt)
        return ntt_mod.ntt(np, s_rot, ring)
    return gen_keyswitch_key(rng, sk, sg_ntt, q_moduli, p_moduli, n, word_bits)
