"""Multiparty / threshold BFV protocols (reference parity:
fhe_ops_lib/fhe_lib_v2.h:710-829 — DBfvContext, CkgContext, RkgContext,
RtgContext, E2sContext, S2eContext, RefreshContext,
RefreshAndPermuteContext; semantics exercised by the reference's
unittests/test_mp_lattigo.cpp:174-400).

The joint secret is s = Σ_i s_i. All protocol math is host-side NumPy over
the same exact RNS kernels as the schemes (transport is the application's
problem, as in the reference: shares expose serialize()/deserialize()).

Common reference polynomials (CRPs) are derived deterministically from a
public seed via the Philox expansion in utils/serialize.expand_uniform —
every party derives identical CRPs from the shared seed.
"""

import numpy as np

from ..core import ntt as ntt_mod
from ..core import u64 as _u
from ..core.u64 import word_dtype
from ..core.modring import get_rns_ring
from ..utils.csprng import CryptoRng
from ..utils.serialize import (_emit, _pack_rns, _parse, _unpack_rns,
                               expand_uniform)
from .keys import SecretKey, _gamma_times_p, lift_signed, sample_gaussian, sample_ternary
from .types import Ciphertext, KeySwitchKey, PublicKey
from .galois import apply_automorphism_coeff

_U64 = np.uint64


def _wb(obj) -> int:
    """RNS word width of a params/engine object (64 unless word_bits=32)."""
    return int(getattr(obj, 'word_bits', 64))


def _e_ntt(rng, moduli, n, ring, wb: int = 64):
    return ntt_mod.ntt(np, lift_signed(sample_gaussian(rng, n), moduli, wb),
                       ring)


class _Share:
    """Array share with a self-describing byte serialization."""

    kind = 'share'

    def __init__(self, data: np.ndarray, moduli: tuple[int, ...]):
        self.data = np.asarray(data, dtype=_U64)
        self.moduli = tuple(int(m) for m in moduli)

    def serialize(self) -> bytes:
        header = {'kind': self.kind, 'shape': list(self.data.shape),
                  'moduli': [str(m) for m in self.moduli]}
        return _emit(header, _pack_rns(self.data, self.moduli))

    @classmethod
    def deserialize(cls, blob: bytes) -> '_Share':
        header, body = _parse(blob)
        assert header['kind'] == cls.kind, f'expected {cls.kind} share'
        moduli = tuple(int(m) for m in header['moduli'])
        data, _ = _unpack_rns(body, 0, tuple(header['shape']), moduli)
        return cls(data, moduli)


class PublicKeyShare(_Share):
    kind = 'ckg'


class RelinKeyShareRound1(_Share):
    kind = 'rkg1'


class RelinKeyShareRound2(_Share):
    kind = 'rkg2'


class GaloisKeyShare(_Share):
    kind = 'rtg'


class DecryptionShare(_Share):
    kind = 'e2s'


class EncryptionShare(_Share):
    kind = 's2e'


class RefreshShare(_Share):
    kind = 'refresh'


class DBfvParty:
    """One party's local state: its additive secret-key share s_i
    (reference DBfvContext, fhe_lib_v2.h:710).

    ``sigma_smudging`` is the flooding-noise deviation added to every
    *published partial decryption* (E2S/S2E/Refresh shares) so that
    h_i = c1·s_i + e_i − Δ·M_i statistically hides s_i and the ciphertext
    noise (reference: explicit sigma_smudging parameter on
    DBfvContext::create_random_context, fhe_lib_v2.h:716; Lattigo threshold
    semantics). The default 2^30 gives ≈30 bits of statistical smudging over
    the base σ=3.2 noise; size it to your statistical-security target — it
    must stay far below Δ/(2·N_parties) for correct decryption."""

    def __init__(self, params, seed=None, sigma_smudging: float = 2.0 ** 30):
        self.params = params
        self.rng = CryptoRng(seed)
        self.sigma_smudging = float(sigma_smudging)
        self.sk = SecretKey(sample_ternary(self.rng, params.n))
        self.q = tuple(params.q)
        self.p = tuple(params.p)
        self.qp = self.q + self.p
        self.n = params.n


# ---------------------------------------------------------------------------
# CKG — collective public-key generation (fhe_lib_v2.h:726)
# ---------------------------------------------------------------------------

class CkgProtocol:
    def __init__(self, params, crp_seed: int):
        self.params = params
        self.q = tuple(params.q)
        self.wb = _wb(params)
        self.dt = word_dtype(self.wb)
        self.crp = expand_uniform(crp_seed, self.q, params.n).astype(self.dt)

    def gen_share(self, party: DBfvParty) -> PublicKeyShare:
        ring = get_rns_ring(self.q, party.n, self.wb)
        s = party.sk.ntt_form(self.q, party.n, self.wb)
        as_ = _u.mulmod(np, self.crp, s, ring.q, ring.pinv, ring.r2)
        e = _e_ntt(party.rng, self.q, party.n, ring, self.wb)
        share = _u.negmod(np, _u.addmod(np, as_, e, ring.q), ring.q)
        return PublicKeyShare(share, self.q)

    def aggregate(self, shares: list[PublicKeyShare]) -> PublicKey:
        ring = get_rns_ring(self.q, self.params.n, self.wb)
        b = shares[0].data.astype(self.dt, copy=False)
        for s in shares[1:]:
            b = _u.addmod(np, b, s.data.astype(self.dt, copy=False), ring.q)
        return PublicKey(data=np.stack([b, self.crp]))


# ---------------------------------------------------------------------------
# RKG — 2-round collective relinearization-key generation (fhe_lib_v2.h:739)
# ---------------------------------------------------------------------------

class RkgProtocol:
    """Lattigo-style protocol: joint rlk encrypts P·γ_d·s² under s without
    any party learning s. Round 1 uses an ephemeral u_i per party."""

    def __init__(self, params, crp_seed: int):
        self.params = params
        self.q = tuple(params.q)
        self.p = tuple(params.p)
        self.qp = self.q + self.p
        self.n = params.n
        self.alpha = len(self.p)
        self.beta = (len(self.q) + self.alpha - 1) // self.alpha
        self.wb = _wb(params)
        self.dt = word_dtype(self.wb)
        ring = get_rns_ring(self.qp, self.n, self.wb)
        self.ring = ring
        # β CRPs over Q∪P
        self.crp = np.stack([expand_uniform(crp_seed + d, self.qp, self.n)
                             for d in range(self.beta)]).astype(self.dt)
        self.gamma_p = _gamma_times_p(self.q, self.p, self.alpha)   # (β, Lq)
        self._ephemeral: dict[int, np.ndarray] = {}

    def _pgs(self, s_ntt):
        """P·γ_d·s in NTT domain, per digit: (β, L+P, n)."""
        Lq, Lp = len(self.q), len(self.p)
        pg = np.zeros((self.beta, Lq + Lp, 1), dtype=self.dt)
        pg[:, :Lq, 0] = self.gamma_p
        return _u.mulmod(np, pg, s_ntt[None], self.ring.q, self.ring.pinv,
                         self.ring.r2)

    def gen_share_round1(self, party: DBfvParty) -> RelinKeyShareRound1:
        ring = self.ring
        u = SecretKey(sample_ternary(party.rng, self.n))
        self._ephemeral[id(party)] = u
        u_ntt = u.ntt_form(self.qp, self.n, self.wb)
        s_ntt = party.sk.ntt_form(self.qp, self.n, self.wb)
        pgs = self._pgs(s_ntt)
        h = np.empty((self.beta, 2, len(self.qp), self.n), dtype=self.dt)
        for d in range(self.beta):
            ua = _u.mulmod(np, self.crp[d], u_ntt, ring.q, ring.pinv, ring.r2)
            e0 = _e_ntt(party.rng, self.qp, self.n, ring, self.wb)
            h[d, 0] = _u.addmod(np, _u.submod(np, pgs[d], ua, ring.q), e0, ring.q)
            sa = _u.mulmod(np, self.crp[d], s_ntt, ring.q, ring.pinv, ring.r2)
            e1 = _e_ntt(party.rng, self.qp, self.n, ring, self.wb)
            h[d, 1] = _u.addmod(np, sa, e1, ring.q)
        return RelinKeyShareRound1(h, self.qp)

    def aggregate_round1(self, shares: list[RelinKeyShareRound1]) -> RelinKeyShareRound1:
        acc = shares[0].data.astype(self.dt, copy=False)
        for s in shares[1:]:
            acc = _u.addmod(np, acc, s.data.astype(self.dt, copy=False),
                            self.ring.q)
        return RelinKeyShareRound1(acc, self.qp)

    def gen_share_round2(self, party: DBfvParty,
                         round1: RelinKeyShareRound1) -> RelinKeyShareRound2:
        ring = self.ring
        u = self._ephemeral.pop(id(party))
        u_ntt = u.ntt_form(self.qp, self.n, self.wb)
        s_ntt = party.sk.ntt_form(self.qp, self.n, self.wb)
        r1 = round1.data.astype(self.dt, copy=False)
        h0, h1 = r1[:, 0], r1[:, 1]
        out = np.empty_like(r1)
        for d in range(self.beta):
            e0 = _e_ntt(party.rng, self.qp, self.n, ring, self.wb)
            out[d, 0] = _u.addmod(np, _u.mulmod(np, s_ntt, h0[d], ring.q,
                                                ring.pinv, ring.r2), e0, ring.q)
            us = _u.submod(np, u_ntt, s_ntt, ring.q)
            e1 = _e_ntt(party.rng, self.qp, self.n, ring, self.wb)
            out[d, 1] = _u.addmod(np, _u.mulmod(np, us, h1[d], ring.q,
                                                ring.pinv, ring.r2), e1, ring.q)
        return RelinKeyShareRound2(out, self.qp)

    def aggregate_round2(self, shares: list[RelinKeyShareRound2],
                         round1: RelinKeyShareRound1) -> KeySwitchKey:
        ring = self.ring
        acc = shares[0].data.astype(self.dt, copy=False)
        for s in shares[1:]:
            acc = _u.addmod(np, acc, s.data.astype(self.dt, copy=False), ring.q)
        Lq = len(self.q)
        key_q = np.empty((self.beta, 2, Lq, self.n), dtype=self.dt)
        key_p = np.empty((self.beta, 2, len(self.p), self.n), dtype=self.dt)
        for d in range(self.beta):
            k0 = _u.addmod(np, acc[d, 0], acc[d, 1], ring.q)
            k1 = round1.data[d, 1].astype(self.dt, copy=False)
            k0 = _u.to_mont(np, k0, ring.q, ring.pinv, ring.r2)
            k1 = _u.to_mont(np, k1, ring.q, ring.pinv, ring.r2)
            key_q[d, 0], key_q[d, 1] = k0[:Lq], k1[:Lq]
            key_p[d, 0], key_p[d, 1] = k0[Lq:], k1[Lq:]
        return KeySwitchKey(key_q=key_q, key_p=key_p, level=Lq - 1,
                            sp_level=len(self.p) - 1)


# ---------------------------------------------------------------------------
# RTG — collective rotation-key generation (fhe_lib_v2.h:754)
# ---------------------------------------------------------------------------

class RtgProtocol:
    def __init__(self, params, galois_elt: int, crp_seed: int):
        self.params = params
        self.galois_elt = galois_elt
        self.q = tuple(params.q)
        self.p = tuple(params.p)
        self.qp = self.q + self.p
        self.n = params.n
        self.alpha = len(self.p)
        self.beta = (len(self.q) + self.alpha - 1) // self.alpha
        self.wb = _wb(params)
        self.dt = word_dtype(self.wb)
        self.ring = get_rns_ring(self.qp, self.n, self.wb)
        self.crp = np.stack([expand_uniform(crp_seed + d, self.qp, self.n)
                             for d in range(self.beta)]).astype(self.dt)
        self.gamma_p = _gamma_times_p(self.q, self.p, self.alpha)

    def gen_share(self, party: DBfvParty) -> GaloisKeyShare:
        ring = self.ring
        s_ntt = party.sk.ntt_form(self.qp, self.n, self.wb)
        s_rot = apply_automorphism_coeff(
            np, lift_signed(party.sk.coeffs, self.qp, self.wb),
            ring.q, self.n, self.galois_elt)
        srot_ntt = ntt_mod.ntt(np, s_rot, ring)
        Lq, Lp = len(self.q), len(self.p)
        pg = np.zeros((self.beta, Lq + Lp, 1), dtype=self.dt)
        pg[:, :Lq, 0] = self.gamma_p
        pgs = _u.mulmod(np, pg, srot_ntt[None], ring.q, ring.pinv, ring.r2)
        h = np.empty((self.beta, len(self.qp), self.n), dtype=self.dt)
        for d in range(self.beta):
            as_ = _u.mulmod(np, self.crp[d], s_ntt, ring.q, ring.pinv, ring.r2)
            e = _e_ntt(party.rng, self.qp, self.n, ring, self.wb)
            h[d] = _u.addmod(np, _u.submod(np, pgs[d], as_, ring.q), e, ring.q)
        return GaloisKeyShare(h, self.qp)

    def aggregate(self, shares: list[GaloisKeyShare]) -> KeySwitchKey:
        ring = self.ring
        acc = shares[0].data.astype(self.dt, copy=False)
        for s in shares[1:]:
            acc = _u.addmod(np, acc, s.data.astype(self.dt, copy=False), ring.q)
        Lq = len(self.q)
        key_q = np.empty((self.beta, 2, Lq, self.n), dtype=self.dt)
        key_p = np.empty((self.beta, 2, len(self.p), self.n), dtype=self.dt)
        for d in range(self.beta):
            k0 = _u.to_mont(np, acc[d], ring.q, ring.pinv, ring.r2)
            k1 = _u.to_mont(np, self.crp[d], ring.q, ring.pinv, ring.r2)
            key_q[d, 0], key_q[d, 1] = k0[:Lq], k1[:Lq]
            key_p[d, 0], key_p[d, 1] = k0[Lq:], k1[Lq:]
        return KeySwitchKey(key_q=key_q, key_p=key_p, level=Lq - 1,
                            sp_level=len(self.p) - 1)


# ---------------------------------------------------------------------------
# E2S / S2E — encryption ↔ additive secret shares (fhe_lib_v2.h:769,788)
# ---------------------------------------------------------------------------

class E2sProtocol:
    """ct → additive shares over Z_t: each party keeps a uniform mask M_i
    and publishes a masked partial decryption; the aggregator's residual
    plus all masks sums to m (mod t)."""

    def __init__(self, engine, level: int):
        self.engine = engine
        self.level = level
        self.q = engine.q[:level + 1]
        self.ring = engine.ring(level)
        self.wb = _wb(engine.params)
        self.dt = word_dtype(self.wb)

    def gen_share(self, party: DBfvParty, ct: Ciphertext):
        """→ (public DecryptionShare, private mask M_i over Z_t slots)."""
        eng = self.engine
        mask = party.rng.integers(0, eng.t, eng.n, dtype=_U64)
        # Δ·M_i as plaintext poly (slot-encoded)
        from .encoding import bfv_encode_slots
        m_poly = bfv_encode_slots(mask, eng.t, eng.n)
        delta_m = _u.mont_mul(np, np.broadcast_to(m_poly, (self.level + 1, eng.n)).astype(self.dt),
                              eng.delta_mont(self.level), self.ring.q, self.ring.pinv)
        c1_ntt = ntt_mod.ntt(np, np.asarray(ct.data[1]), self.ring)
        s_ntt = party.sk.ntt_form(tuple(self.q), eng.n, self.wb)
        c1s = ntt_mod.intt(np, _u.mulmod(np, c1_ntt, s_ntt, self.ring.q,
                                         self.ring.pinv, self.ring.r2), self.ring)
        # Smudging noise: the published share must not leak s_i / ct noise.
        e = lift_signed(sample_gaussian(party.rng, eng.n,
                                        sigma=party.sigma_smudging), self.q,
                        self.wb)
        h = _u.submod(np, _u.addmod(np, c1s, e, self.ring.q), delta_m, self.ring.q)
        return DecryptionShare(h, tuple(self.q)), mask

    def aggregate(self, ct: Ciphertext, shares: list[DecryptionShare]) -> np.ndarray:
        """Aggregator's residual share m_agg = m − Σ M_i (mod t, slots)."""
        eng = self.engine
        acc = np.asarray(ct.data[0])
        for s in shares:
            acc = _u.addmod(np, acc, s.data.astype(self.dt, copy=False),
                            self.ring.q)
        return eng.decode(eng_decrypt_poly(eng, acc, self.level))


def eng_decrypt_poly(eng, acc, level):
    """Round Δ·x + e → x mod t by exact CRT composition."""
    import math
    q_mods = eng.q[:level + 1]
    Q = math.prod(q_mods)
    X = np.zeros(eng.n, dtype=object)
    for i, qi in enumerate(q_mods):
        Qi = Q // qi
        w = Qi * pow(Qi, -1, qi)
        X = X + acc[i].astype(object) * w
    X = X % Q
    return np.array([((2 * eng.t * int(x) + Q) // (2 * Q)) % eng.t for x in X],
                    dtype=_U64)


class S2eProtocol:
    """Additive shares over Z_t → ciphertext under the joint key
    (fhe_lib_v2.h:788). CRP c1 derived from a shared seed."""

    def __init__(self, engine, level: int, crp_seed: int):
        self.engine = engine
        self.level = level
        self.q = tuple(engine.q[:level + 1])
        self.ring = engine.ring(level)
        self.wb = _wb(engine.params)
        self.dt = word_dtype(self.wb)
        self.crp_ntt = expand_uniform(crp_seed, self.q, engine.n).astype(self.dt)

    def gen_share(self, party: DBfvParty, mask: np.ndarray) -> EncryptionShare:
        eng = self.engine
        from .encoding import bfv_encode_slots
        m_poly = bfv_encode_slots(mask, eng.t, eng.n)
        delta_m = _u.mont_mul(np, np.broadcast_to(m_poly, (self.level + 1, eng.n)).astype(self.dt),
                              eng.delta_mont(self.level), self.ring.q, self.ring.pinv)
        s_ntt = party.sk.ntt_form(self.q, eng.n, self.wb)
        as_ = ntt_mod.intt(np, _u.mulmod(np, self.crp_ntt, s_ntt, self.ring.q,
                                         self.ring.pinv, self.ring.r2), self.ring)
        # Smudging noise (same rationale as E2S — published share).
        e = lift_signed(sample_gaussian(party.rng, eng.n,
                                        sigma=party.sigma_smudging), self.q,
                        self.wb)
        h = _u.submod(np, _u.addmod(np, delta_m, e, self.ring.q), as_, self.ring.q)
        return EncryptionShare(h, self.q)

    def aggregate(self, shares: list[EncryptionShare],
                  residual: np.ndarray | None = None) -> Ciphertext:
        eng = self.engine
        acc = shares[0].data.astype(self.dt, copy=False)
        for s in shares[1:]:
            acc = _u.addmod(np, acc, s.data.astype(self.dt, copy=False),
                            self.ring.q)
        if residual is not None:
            from .encoding import bfv_encode_slots
            m_poly = bfv_encode_slots(residual, eng.t, eng.n)
            delta_m = _u.mont_mul(np, np.broadcast_to(m_poly, (self.level + 1, eng.n)).astype(self.dt),
                                  eng.delta_mont(self.level), self.ring.q, self.ring.pinv)
            acc = _u.addmod(np, acc, delta_m, self.ring.q)
        c1 = ntt_mod.intt(np, self.crp_ntt, self.ring)
        return Ciphertext(data=np.stack([acc, c1]), level=self.level)


# ---------------------------------------------------------------------------
# Collective refresh (+ permute) — fhe_lib_v2.h:801,814
# ---------------------------------------------------------------------------

class RefreshProtocol:
    """E2S ∘ S2E with per-party masks: resets noise to fresh levels without
    full decryption. ``permutation`` (slot index map) gives the
    refresh-and-permute variant: out_slot[k] = in_slot[perm[k]]."""

    def __init__(self, engine, level: int, crp_seed: int,
                 permutation: np.ndarray | None = None):
        self.engine = engine
        self.e2s = E2sProtocol(engine, level)
        self.s2e = S2eProtocol(engine, level, crp_seed)
        self.perm = permutation

    def gen_share(self, party: DBfvParty, ct: Ciphertext):
        dec_share, mask = self.e2s.gen_share(party, ct)
        out_mask = mask if self.perm is None else mask[self.perm]
        enc_share = self.s2e.gen_share(party, out_mask)
        return RefreshShare(np.stack([dec_share.data, enc_share.data]),
                            dec_share.moduli)

    def finalize(self, ct: Ciphertext, shares: list[RefreshShare]) -> Ciphertext:
        dec_shares = [DecryptionShare(s.data[0], s.moduli) for s in shares]
        enc_shares = [EncryptionShare(s.data[1], s.moduli) for s in shares]
        residual = self.e2s.aggregate(ct, dec_shares)
        if self.perm is not None:
            residual = residual[self.perm]
        return self.s2e.aggregate(enc_shares, residual)
