"""Hybrid RNS key switching (GHS / Lattigo-style gadget product).

switch(x, ksk) for x ∈ R_{Q_ℓ} (coeff domain) computes (e0, e1) with
e0 + e1·s ≈ x·s' (the key's target secret factor), by:

1. digit-decomposing x into β = ceil((ℓ+1)/α) groups of α = |P| limbs,
2. mod-up of each digit to Q_ℓ ∪ P (FastBConv; the α·Q_d overflow vanishes
   mod Q_ℓ and only adds P-bounded noise),
3. NTT, inner product with the key digits (Montgomery-form keys: one REDC
   per MAC), accumulate,
4. INTT and divide-and-round by P (approximate conversion P→Q_ℓ).

This replaces the reference's Lattigo key-switch kernels used by relin /
rotate executors (mega_ag_runners/cpu/mega_ag_executors_cpu.cpp:236,269).
All steps are (..., L, n) elementwise/broadcast ops + NTTs: jit-friendly.
"""

import functools
import math

import numpy as np

from ..core import ntt as ntt_mod
from ..core import u64 as _u
from ..core.modring import get_rns_ring
from ..core.rns import BasisConv, _col, _mont


class RoundDivP:
    """c' = round(c / P): exact-up-to-small-error mod-down Q_ℓ∪P → Q_ℓ."""

    def __init__(self, q_moduli: tuple[int, ...], p_moduli: tuple[int, ...]):
        P = math.prod(p_moduli)
        half = P // 2
        self.conv = BasisConv(p_moduli, q_moduli)
        self.p_q = _col(p_moduli)
        self.dst_q = _col(q_moduli)
        self.dst_pinv = _col([(-pow(q, -1, 1 << 64)) % (1 << 64) for q in q_moduli])
        self.half_p = _col([half % p for p in p_moduli])
        self.half_q = _col([half % q for q in q_moduli])
        self.pinv_mont = _col([_mont(pow(P % q, -1, q), q) for q in q_moduli])

    def __call__(self, xp, x_q, x_p):
        """x_q: (..., L, n), x_p: (..., |P|, n) → (..., L, n)."""
        xp2 = _u.addmod(xp, x_p, self.half_p, self.p_q)
        conv = self.conv(xp, xp2)
        num = _u.submod(xp, _u.addmod(xp, x_q, self.half_q, self.dst_q), conv, self.dst_q)
        return _u.mont_mul(xp, num, self.pinv_mont, self.dst_q, self.dst_pinv)


class KeySwitcher:
    """Per-parameter key-switch engine; per-level precomputes are cached."""

    def __init__(self, q_moduli: tuple[int, ...], p_moduli: tuple[int, ...], n: int):
        self.q_moduli = tuple(int(q) for q in q_moduli)
        self.p_moduli = tuple(int(p) for p in p_moduli)
        self.n = n
        self.alpha = len(self.p_moduli)

    def beta(self, level: int) -> int:
        return (level + 1 + self.alpha - 1) // self.alpha

    @functools.lru_cache(maxsize=None)
    def _level_pre(self, level: int):
        L = level + 1
        q = self.q_moduli[:L]
        qp = q + self.p_moduli
        ring_qp = get_rns_ring(qp, self.n)
        convs = []
        for d in range(self.beta(level)):
            grp = q[d * self.alpha:(d + 1) * self.alpha]
            convs.append(BasisConv(grp, qp))
        return ring_qp, convs, RoundDivP(q, self.p_moduli)

    def decompose_modup_ntt(self, xp, x, level: int):
        """Digit-decompose + mod-up + NTT: x (..., L, n) coeff →
        list of β arrays (..., L+|P|, n) in NTT domain. Exposed separately to
        implement hoisted rotations (reference rns_sp_decomp,
        frontend/custom_task.py:1360)."""
        ring_qp, convs, _ = self._level_pre(level)
        out = []
        for d, conv in enumerate(convs):
            grp = x[..., d * self.alpha:(d + 1) * self.alpha + 0, :]
            grp = grp[..., :len(conv.src), :]
            xd = conv(xp, grp)
            out.append(ntt_mod.ntt(xp, xd, ring_qp))
        return out

    def inner_product(self, xp, digits_ntt, ksk, level: int):
        """Σ_d digit_d ⊙ key_d over Q_ℓ∪P (NTT domain) → pair of (..., L+|P|, n)."""
        ring_qp, _, _ = self._level_pre(level)
        L = level + 1
        acc0 = acc1 = None
        for d, xd in enumerate(digits_ntt):
            for j, acc in ((0, acc0), (1, acc1)):
                kd = xp.concatenate([ksk.key_q[d, j, :L], ksk.key_p[d, j]], axis=0)
                term = _u.mont_mul(xp, xd, kd, ring_qp.q, ring_qp.pinv)
                new = term if acc is None else _u.addmod(xp, acc, term, ring_qp.q)
                if j == 0:
                    acc0 = new
                else:
                    acc1 = new
        return acc0, acc1

    def switch(self, xp, x, ksk, level: int, output_ntt: bool = False):
        """Full key switch of coeff-domain x (..., L, n) → (e0, e1) over Q_ℓ."""
        ring_qp, convs, round_div = self._level_pre(level)
        L = level + 1
        digits = self.decompose_modup_ntt(xp, x, level)
        acc0, acc1 = self.inner_product(xp, digits, ksk, level)
        ring_q = get_rns_ring(self.q_moduli[:L], self.n)
        outs = []
        for acc in (acc0, acc1):
            c = ntt_mod.intt(xp, acc, ring_qp)
            e = round_div(xp, c[..., :L, :], c[..., L:, :])
            if output_ntt:
                e = ntt_mod.ntt(xp, e, ring_q)
            outs.append(e)
        return outs[0], outs[1]
