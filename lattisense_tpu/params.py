"""FHE parameter sets (BFV / CKKS / CKKS-bootstrap).

The default prime chains are the reference's canonical table
(reference: frontend/parameter.json, loaded at frontend/custom_task.py:167)
— the conformance oracles depend on these exact primes. On top of the
declared chain, the runtime derives TPU-side constants:

- the auxiliary BEHZ basis for BFV multiplication (NTT-friendly ~59-bit
  primes distinct from q ∪ p, plus m_sk and the power-of-two m̃),
- per-level Δ_ℓ = floor(Q_ℓ/t) tables for BFV encoding,
- hybrid key-switching digit structure (α = |p| special primes).

Security note: parameter security follows the reference's table choices
(Lattigo default logQP budgets); custom parameters are the caller's
responsibility, as in the reference.
"""

import functools
import json
import math
import os

_TABLE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'parameter.json')
MTILDE_BITS = 16
MTILDE = 1 << MTILDE_BITS


@functools.lru_cache(maxsize=None)
def _load_table():
    with open(_TABLE_PATH) as f:
        return json.load(f)


class FheParams:
    """Common runtime parameter base (reference: fhe_ops_lib/fhe_lib_v2.h:193-308)."""

    algo = ''

    def __init__(self, n: int, q: list[int], p: list[int]):
        self.n = int(n)
        self.logn = self.n.bit_length() - 1
        if 1 << self.logn != self.n:
            raise ValueError(f'n must be a power of two, got {n}')
        self.q = [int(x) for x in q]
        self.p = [int(x) for x in p]
        self.max_level = len(self.q) - 1

    @property
    def max_sp_level(self) -> int:
        return len(self.p) - 1

    def q_prod(self, level: int) -> int:
        return math.prod(self.q[:level + 1])

    @property
    def p_prod(self) -> int:
        return math.prod(self.p)

    def level_of(self, n_limbs: int) -> int:
        return n_limbs - 1

    def __eq__(self, other):
        return (type(self) is type(other) and self.__dict__ == other.__dict__)

    def __hash__(self):
        return hash((self.algo, self.n, tuple(self.q), tuple(self.p)))


class BfvParams(FheParams):
    algo = 'BFV'

    def __init__(self, n: int, t: int, q: list[int], p: list[int]):
        super().__init__(n, q, p)
        self.t = int(t)

    @classmethod
    def create(cls, n: int, t: int | None = None) -> 'BfvParams':
        """Default chain from the canonical table (BfvParameter::create_parameter)."""
        entry = _load_table()['BFV'][str(n)]
        return cls(n, t if t is not None else entry['t'], entry['q'], entry['p'])

    @classmethod
    def create_custom(cls, n: int, t: int, q: list[int], p: list[int]) -> 'BfvParams':
        return cls(n, t, q, p)

    def delta(self, level: int) -> int:
        """Δ_ℓ = floor(Q_ℓ / t) — BFV plaintext scaling at level ℓ."""
        return self.q_prod(level) // self.t


class CkksParams(FheParams):
    algo = 'CKKS'

    def __init__(self, n: int, q: list[int], p: list[int],
                 slots: int | None = None, scale: float = 0.0):
        super().__init__(n, q, p)
        self.slots = int(slots) if slots else n // 2
        if self.slots & (self.slots - 1) or not (0 < self.slots <= n // 2):
            raise ValueError(f'slots must be a power of two in (0, n/2], got {slots}')
        self.scale = float(scale) if scale else float(q[-1])

    @classmethod
    def create(cls, n: int) -> 'CkksParams':
        entry = _load_table()['CKKS'][str(n)]
        return cls(n, entry['q'], entry['p'], entry['slots'], entry['scale'])

    @classmethod
    def create_custom(cls, n: int, q: list[int], p: list[int],
                      slots: int | None = None, scale: float = 0.0) -> 'CkksParams':
        return cls(n, q, p, slots, scale)

    def set_log_slots(self, log_slots: int):
        self.slots = 1 << log_slots

    @property
    def log_slots(self) -> int:
        return self.slots.bit_length() - 1


def params_from_task_json(parameter: dict) -> FheParams:
    """Rebuild runtime params from a mega_ag.json 'parameter' blob
    (schema: frontend/custom_task.py:2307-2331). Bootstrap tasks carry
    btp_* fields; they are attached as ``params.btp`` so the runtime can
    validate/construct a matching bootstrapper config."""
    if 't' in parameter:
        return BfvParams(parameter['n'], parameter['t'], parameter['q'], parameter['p'])
    p = CkksParams(parameter['n'], parameter['q'], parameter['p'],
                   parameter.get('slots'), parameter.get('scale', 0.0))
    if 'btp_cts_depth' in parameter:
        p.btp = {k: v for k, v in parameter.items() if k.startswith('btp_')}
    return p


@functools.lru_cache(maxsize=None)
def bfv_aux_basis(n: int, q: tuple[int, ...], p: tuple[int, ...]) -> tuple[tuple[int, ...], int]:
    """Auxiliary basis (B, m_sk) for BEHZ BFV multiplication.

    |B| = |q| + 1 NTT-friendly ~59-bit primes plus one m_sk, all distinct
    from the declared chain. Sized so B_ℓ * m_sk comfortably exceeds the
    scaled tensor-product bound at every level.
    """
    from .core.modring import gen_ntt_primes

    count = len(q) + 2
    primes = gen_ntt_primes(n, 59, count, exclude=tuple(q) + tuple(p))
    return tuple(primes[:-1]), primes[-1]
