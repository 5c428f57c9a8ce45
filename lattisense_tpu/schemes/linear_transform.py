"""Homomorphic linear transforms: slot-space matrix × ciphertext via
diagonal decomposition with baby-step/giant-step rotations and hoisted
key-switch digits.

(Mv)_k = Σ_d diag_d[k] · v[k+d], so a matrix with diagonal support D costs
|D| plaintext multiplies and, BSGS-split d = g·n1 + b, only
|babies| + |giants| rotations; the baby rotations share one rns_sp_decomp
(hoisting). This is the engine behind CKKS bootstrapping's
CoeffsToSlots/SlotsToCoeffs (reference: frontend/bootstrap_params.py BSGS
splits) and the packed conv2d example.

Giant-step correction: out = Σ_g rot_g(Σ_b pre_g(diag_{g+b}) ⊙ rot_b(ct))
requires the diagonal pre-rotated by -g at encode time.
"""

import numpy as np

from .types import Ciphertext


class EncodedLinearTransform:
    """Host-encoded diagonals of one matrix, ready for device application.

    diags: {offset: complex slot vector (slots,)}; offsets taken mod slots.
    """

    def __init__(self, engine, diags: dict, level: int, n1: int,
                 scale: float | None = None,
                 out_scale_target: float | None = None,
                 limb_step: int = 1):
        """``scale=None`` (recommended for chains with mixed prime sizes)
        encodes the diagonals lazily at the prime of the level where the
        transform executes — the product's rescale then preserves the
        running ciphertext scale exactly, whatever the chain looks like.
        ``out_scale_target`` instead steers the post-rescale output onto a
        fixed scale (the bootstrap EvalMod entry). ``limb_step``: limbs one
        transform level consumes (2 on the 32-bit-word engine, where the
        working scale spans a prime pair — the caller rescales twice)."""
        self.engine = engine
        self.level = level
        self.n1 = n1
        self.scale = scale
        self.out_scale_target = out_scale_target
        self.step = int(limb_step)
        slots = engine.params.slots
        self.slots = slots
        self.raw: dict[tuple[int, int], np.ndarray] = {}
        self._plain_cache: dict = {}
        self.babies: set[int] = set()
        self.giants: set[int] = set()
        for off, vec in diags.items():
            off = off % slots
            g, b = (off // n1) * n1, off % n1
            self.babies.add(b)
            if g:
                self.giants.add(g)
            # pre-rotate by -g so the giant rotation can be applied last
            self.raw[(g, b)] = np.roll(np.asarray(vec, dtype=np.complex128), g)
        if scale is not None:
            self._plain_cache[level] = {
                k: engine.encode_mul(v, level, scale) for k, v in self.raw.items()}

    def _plain(self, ct_level: int, ct_scale: float):
        if self.scale is not None:
            return self._plain_cache[self.level]
        q_lv = 1.0
        for j in range(ct_level - self.step + 1, ct_level + 1):
            q_lv *= float(self.engine.q[j])
        if self.out_scale_target is not None:
            scale = self.out_scale_target * q_lv / ct_scale
        else:
            scale = q_lv
        key = (ct_level, scale)
        if key not in self._plain_cache:
            self._plain_cache[key] = {
                k: self.engine.encode_mul(v, self.level, scale)
                for k, v in self.raw.items()}
        return self._plain_cache[key]

    def galois_elements(self):
        from .galois import galois_elt_col
        n = self.engine.params.n
        return [galois_elt_col(r, n) for r in
                sorted((self.babies | self.giants) - {0})]

    def __call__(self, xp, ct: Ciphertext, glk_map: dict) -> Ciphertext:
        """Apply to a CKKS ciphertext (NTT domain) at self.level."""
        from .galois import galois_elt_col
        eng = self.engine
        n = eng.params.n
        level = ct.level
        ring = eng.ring(level)
        plain = self._plain(level, ct.scale)

        # hoist: one decomposition serves every baby rotation
        rotated: dict[int, Ciphertext] = {}
        if 0 in self.babies:
            rotated[0] = ct
        nonzero = sorted(self.babies - {0})
        if nonzero:
            dct = eng.rns_sp_decomp(xp, ct)
            for b in nonzero:
                elt = galois_elt_col(b, n)
                rotated[b] = eng.apply_galois_decomposed(xp, dct, elt,
                                                         glk_map[elt])

        # baby MACs grouped per giant step, then giant rotations
        out = None
        for g in sorted({g for g, _ in plain}):
            acc = None
            for (gg, b), pt in plain.items():
                if gg != g:
                    continue
                term = eng.mult(xp, rotated[b], pt)
                acc = term if acc is None else eng.add(xp, acc, term)
            if g:
                elt = galois_elt_col(g, n)
                acc = eng.apply_galois(xp, acc, elt, glk_map[elt])
            out = acc if out is None else eng.add(xp, out, acc)
        return out


def matrix_diagonals(mat: np.ndarray, tol: float = 0.0) -> dict:
    """Dense (s, s) matrix → {offset: diagonal vector}; offsets with all
    |entries| <= tol are dropped."""
    s = mat.shape[0]
    out = {}
    idx = np.arange(s)
    for d in range(s):
        diag = mat[idx, (idx + d) % s]
        if np.max(np.abs(diag)) > tol:
            out[d] = diag
    return out


def bsgs_split(n_diags_offsets, slots: int, ratio: float = 2.0) -> int:
    """Power-of-two baby window n1 minimizing rotations (reference:
    find_best_bsgs_split, frontend/bootstrap_params.py)."""
    best_n1, best_cost = 1, None
    n1 = 1
    while n1 <= slots:
        giants = {((d % slots) // n1) * n1 for d in n_diags_offsets}
        babies = {(d % slots) % n1 for d in n_diags_offsets}
        cost = len(giants - {0}) + len(babies - {0})
        if best_cost is None or cost < best_cost:
            best_n1, best_cost = n1, cost
        n1 <<= 1
    return best_n1
