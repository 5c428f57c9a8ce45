"""CKKS bootstrapping configuration math.

Computes, for a CoeffsToSlots / SlotsToCoeffs encoding-matrix factorization,
the set of slot rotations (→ Galois keys) each bootstrap needs, and the
EvalMod (scaled cosine) depth accounting. Behavior-compatible with the
reference (frontend/bootstrap_params.py) because the emitted
task_signature.json Galois-key sets must agree; the underlying math is the
Lattigo bootstrapping DFT factorization with baby-step/giant-step splits.
"""

import math
from dataclasses import dataclass
from enum import Enum, auto


class LinearTransformType(Enum):
    CoeffsToSlots = auto()
    SlotsToCoeffs = auto()


class SineType(Enum):
    Sin = auto()
    Cos1 = auto()
    Cos2 = auto()


@dataclass
class EvalModParams:
    """EvalMod step: homomorphic modular reduction by q via scaled sine/cosine
    polynomial evaluation (+ optional double-angle and arcsine corrections)."""

    q: int
    level_start: int
    scaling_factor: float
    sine_type: SineType
    message_ratio: float
    k: int
    sine_deg: int
    double_angle: int
    arcsine_deg: int

    def q_diff(self) -> float:
        return self.q / 2 ** round(math.log2(self.q))

    def depth(self) -> int:
        if self.sine_type == SineType.Cos1:
            d = math.ceil(math.log2(max(self.sine_deg, 2 * self.k - 1) + 1))
        else:
            d = math.ceil(math.log2(self.sine_deg + 1))
        return int(d) + self.double_angle + int(math.ceil(math.log2(self.arcsine_deg + 1)))


def _bsgs_split_counts(diag_index: dict, slots: int, n1: int):
    """Count distinct giant (n1-aligned) and baby rotations for a split n1."""
    giants, babies = set(), set()
    for rot in diag_index:
        rot &= slots - 1
        giants.add(((rot // n1) * n1) & (slots - 1))
        babies.add(rot & (n1 - 1))
    return len(giants), len(babies)


def find_best_bsgs_split(diag_index: dict, max_n: int, max_ratio: float) -> int:
    """Smallest power-of-two n1 whose baby/giant count ratio hits max_ratio."""
    n1 = 1
    while n1 < max_n:
        nb1, nb2 = _bsgs_split_counts(diag_index, max_n, n1)
        ratio = (nb2 - 1) / (nb1 - 1)
        if ratio == max_ratio:
            return n1
        if ratio > max_ratio:
            return n1 // 2
        n1 <<= 1
    return 1


@dataclass
class EncodingMatrixParams:
    """CoeffsToSlots / SlotsToCoeffs factorized DFT parameters."""

    linear_transform_type: LinearTransformType
    repack_imag_2_real: bool
    level_start: int
    bit_reversed: bool
    bsgs_ratio: float
    scaling_factor: list
    log_n: int = 0
    log_slots: int = 0

    def depth(self, actual: bool = True) -> int:
        if actual:
            return len(self.scaling_factor)
        return sum(len(lvl) for lvl in self.scaling_factor)

    def levels(self) -> list[int]:
        lvls = []
        d = self.depth(actual=True)
        for i in range(d):
            lvls.extend([self.level_start - i] * len(self.scaling_factor[d - 1 - i]))
        return lvls

    # -- DFT stage geometry -------------------------------------------------
    def _stage_rot(self, level: int, n_mask: int) -> int:
        """Base rotation amount of one radix-2 DFT level."""
        cts_natural = (self.linear_transform_type == LinearTransformType.CoeffsToSlots
                       and not self.bit_reversed)
        stc_reversed = (self.linear_transform_type == LinearTransformType.SlotsToCoeffs
                        and self.bit_reversed)
        if cts_natural or stc_reversed:
            return (1 << (level - 1)) & n_mask
        return (1 << (self.log_slots - level)) & n_mask

    def _merge_schedule(self) -> list[int]:
        """How many radix-2 levels each factorized matrix absorbs."""
        max_depth = self.depth(actual=False)
        merge = [0] * max_depth
        remaining = self.log_slots
        for i in range(max_depth):
            d = math.ceil(remaining / (max_depth - i))
            if self.linear_transform_type == LinearTransformType.CoeffsToSlots:
                merge[i] = d
            else:
                merge[max_depth - i - 1] = d
            remaining -= d
        return merge

    def dft_index_map(self) -> dict:
        """{matrix_index: {rotation: True}} — nonzero diagonals of each
        factorized DFT matrix (reference parity:
        compute_bootstrapping_dft_index_map, bootstrap_params.py:96)."""
        merge = self._merge_schedule()
        sparse = self.log_slots < self.log_n - 1
        stc = self.linear_transform_type == LinearTransformType.SlotsToCoeffs
        out: dict = {}
        level = self.log_slots
        for i in range(len(merge)):
            if sparse and stc and i == 0 and self.repack_imag_2_real:
                # first StC matrix also repacks imag→real: doubled slot count
                vec = {0: True, (1 << self.log_slots): True}
                n_mask = (2 << self.log_slots) - 1
                vec = self._expand(vec, level, n_mask)
                nxt = level - 1
                for _ in range(merge[i] - 1):
                    vec = self._expand(vec, nxt, n_mask)
                    nxt -= 1
            else:
                rot = self._stage_rot(level, (1 << self.log_slots) - 1)
                vec = {0: True, rot: True, ((1 << self.log_slots) - rot): True}
                n_mask = (1 << self.log_slots) - 1
                nxt = level - 1
                for _ in range(merge[i] - 1):
                    vec = self._expand(vec, nxt, n_mask)
                    nxt -= 1
            out[i] = vec
            level -= merge[i]
        return out

    def _expand(self, vec: dict, level: int, n_mask: int) -> dict:
        rot = self._stage_rot(level, n_mask)
        new = {}
        for i in vec:
            new[i] = True
            new[(i + rot) & n_mask] = True
            new[(i - rot) & n_mask] = True
        return new

    def rotations(self) -> list[int]:
        """All slot rotations (Galois keys) this linear transform requires."""
        rots: list[int] = []
        slots = 1 << self.log_slots
        dslots = slots
        sparse = self.log_slots < self.log_n - 1
        stc = self.linear_transform_type == LinearTransformType.SlotsToCoeffs
        if sparse and self.repack_imag_2_real:
            dslots <<= 1
            if self.linear_transform_type == LinearTransformType.CoeffsToSlots:
                rots.append(slots)

        for i, pvec in self.dft_index_map().items():
            n1 = find_best_bsgs_split(pvec, dslots, self.bsgs_ratio)
            repack = stc and sparse and i == 0 and self.repack_imag_2_real
            if len(pvec) < 3:
                for j in pvec:
                    if j not in rots:
                        rots.append(j)
                continue
            for j in pvec:
                giant = (j // n1) * n1
                giant &= (2 * slots - 1) if repack else (slots - 1)
                if giant != 0 and giant not in rots:
                    rots.append(giant)
                baby = j & (n1 - 1)
                if baby != 0 and baby not in rots:
                    rots.append(baby)
        return rots
