"""Lightweight FHE data carriers (arrays are NumPy on host, JAX on device).

Mirrors the reference's handle types (fhe_ops_lib/fhe_lib_v2.h:1223-1441)
and the three plaintext formats of the platform overview table
(doc/doc-en/2_Platform_Overview.md:66-75):

- Plaintext      : BFV — Δ·m over Q_ℓ, coeff domain. CKKS — Δ·m, NTT domain.
- PlaintextRingt : single-component message (BFV: m mod t; CKKS: small
                   scaled integer coeffs), lifted to the chain at op time.
- PlaintextMul   : NTT + Montgomery domain over Q_ℓ, cheapest ct·pt multiply.
"""

from dataclasses import dataclass, field, fields
from typing import Any

import jax


def _register(cls, array_fields: tuple[str, ...]):
    """Register a carrier dataclass as a JAX pytree: array fields are
    children (traced), everything else static aux data — so Ciphertext /
    key objects pass through jit/vmap/shard_map boundaries directly."""
    static_fields = tuple(f.name for f in fields(cls) if f.name not in array_fields)

    def flatten(obj):
        return (tuple(getattr(obj, f) for f in array_fields),
                tuple(getattr(obj, f) for f in static_fields))

    def unflatten(aux, children):
        kw = dict(zip(array_fields, children))
        kw.update(zip(static_fields, aux))
        return cls(**kw)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@dataclass
class Plaintext:
    data: Any                 # (L, n) u64
    level: int
    is_ntt: bool = False
    scale: float = 1.0        # CKKS only


@dataclass
class PlaintextRingt:
    data: Any                 # (n,) u64
    scale: float = 1.0        # CKKS only


@dataclass
class PlaintextMul:
    data: Any                 # (L, n) u64, NTT + Montgomery
    level: int
    scale: float = 1.0


@dataclass
class Ciphertext:
    data: Any                 # (degree+1, L, n) u64
    level: int
    is_ntt: bool = False
    is_mform: bool = False
    scale: float = 1.0        # CKKS only

    @property
    def degree(self) -> int:
        return self.data.shape[0] - 1


@dataclass
class DecomposedCiphertext:
    """Ciphertext with c1 pre-decomposed + mod-upped + NTT'd for hoisted
    rotations (reference op rns_sp_decomp, frontend/custom_task.py:1360):
    the expensive half of every key switch is paid once and shared by all
    subsequent rotations of this ciphertext."""
    c0: Any                   # (L, n) u64 — same domain as the source ct
    digits: Any               # (β, L+|P|, n) u64, NTT domain
    level: int
    is_ntt: bool = False      # domain of c0
    is_mform: bool = False
    scale: float = 1.0

    degree = 1


@dataclass
class KeySwitchKey:
    """Hybrid key-switching key: β digits over Q_full ∪ P, NTT+Montgomery."""
    key_q: Any                # (β, 2, Lq_full, n)
    key_p: Any                # (β, 2, |P|, n)
    level: int = -1
    sp_level: int = -1


@dataclass
class PublicKey:
    data: Any                 # (2, Lq_full, n), NTT domain


@dataclass
class GaloisKeys:
    keys: dict = field(default_factory=dict)   # galois_element -> KeySwitchKey


for _cls, _arrays in ((Plaintext, ('data',)), (PlaintextRingt, ('data',)),
                      (PlaintextMul, ('data',)), (Ciphertext, ('data',)),
                      (DecomposedCiphertext, ('c0', 'digits')),
                      (KeySwitchKey, ('key_q', 'key_p')), (PublicKey, ('data',))):
    _register(_cls, _arrays)
