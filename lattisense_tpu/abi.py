"""Raw-RNS C ABI: the cross-library exchange format (plug-in band).

Reference parity: abi/c_types.h:26-60 — the canonical struct layout other
libraries use to hand polynomials to the runners (SEAL / Lattigo plug-ins,
SURVEY.md §2.6):

    CComponent    { int n;  uint64* data; }              # one limb
    CPolynomial   { int n_component;  CComponent* }      # limbs of one poly
    CPlaintext    { int level;  CPolynomial poly; }
    CCiphertext   { int level;  int degree;  CPolynomial* polys; }
    CPublicKey    = CCiphertext
    CKeySwitchKey { int n_public_key;  CPublicKey* }     # one per digit
    CRelinKey     = CKeySwitchKey
    CGaloisKey    { int n_key_switch_key;  uint64* galois_elements;
                    CKeySwitchKey* }

ctypes Structures with identical field layout (``int`` fields are C ``int``,
matching the header bit-for-bit so a real foreign library could link
against these buffers), plus exporters/importers bridging to the
framework's (degree+1, L, n) arrays. Buffers are kept alive by the Python
wrapper objects.

Montgomery-form control (the reference's ``mf_nbits`` / ``key_mf_nbits``
arguments, cxx_sdk_v2/cxx_abi_bridge_executors.h:70-82): keys and pt_mul
data live in NTT+Montgomery form internally; ``mf_nbits=64`` exports them
as stored (native exchange), ``mf_nbits=0`` strips the Montgomery factor so
a foreign library sees plain NTT-domain residues.
"""

import ctypes

import numpy as np

from .schemes.types import Ciphertext, KeySwitchKey, Plaintext

_U64P = ctypes.POINTER(ctypes.c_uint64)
_INT = ctypes.c_int     # the header's fields are C int (abi/c_types.h:27)


class CComponent(ctypes.Structure):
    _fields_ = [('n', _INT), ('data', _U64P)]


class CPolynomial(ctypes.Structure):
    _fields_ = [('n_component', _INT),
                ('components', ctypes.POINTER(CComponent))]


class CPlaintext(ctypes.Structure):
    _fields_ = [('level', _INT), ('poly', CPolynomial)]


class CCiphertext(ctypes.Structure):
    _fields_ = [('level', _INT), ('degree', _INT),
                ('polys', ctypes.POINTER(CPolynomial))]


CPublicKey = CCiphertext


class CKeySwitchKey(ctypes.Structure):
    _fields_ = [('n_public_key', _INT),
                ('public_keys', ctypes.POINTER(CPublicKey))]


CRelinKey = CKeySwitchKey


class CGaloisKey(ctypes.Structure):
    _fields_ = [('n_key_switch_key', _INT),
                ('galois_elements', _U64P),
                ('key_switch_keys', ctypes.POINTER(CKeySwitchKey))]


class _Exported:
    """Owns the numpy buffers + ctypes arrays backing an exported struct."""

    def __init__(self, struct, buffers):
        self.struct = struct
        self._buffers = buffers


def _poly_struct(arr2d: np.ndarray, keep):
    L, n = arr2d.shape
    comps = (CComponent * L)()
    for i in range(L):
        row = np.ascontiguousarray(arr2d[i])
        keep.append(row)
        comps[i] = CComponent(n, row.ctypes.data_as(_U64P))
    keep.append(comps)
    return CPolynomial(L, comps)


def export_ciphertext(ct: Ciphertext) -> _Exported:
    """Ciphertext → CCiphertext view (zero-copy per limb)."""
    data = np.asarray(ct.data)
    keep: list = []
    polys = (CPolynomial * data.shape[0])()
    for j in range(data.shape[0]):
        polys[j] = _poly_struct(data[j], keep)
    keep.append(polys)
    return _Exported(CCiphertext(ct.level, ct.degree, polys), keep)


def import_ciphertext(c: CCiphertext, is_ntt: bool = False,
                      scale: float = 1.0) -> Ciphertext:
    polys = []
    for j in range(c.degree + 1):
        poly = c.polys[j]
        limbs = []
        for i in range(poly.n_component):
            comp = poly.components[i]
            limbs.append(np.ctypeslib.as_array(comp.data, shape=(comp.n,)).copy())
        polys.append(np.stack(limbs))
    return Ciphertext(data=np.stack(polys).astype(np.uint64), level=int(c.level),
                      is_ntt=is_ntt, scale=scale)


def export_plaintext(pt: Plaintext) -> _Exported:
    data = np.asarray(pt.data)
    keep: list = []
    return _Exported(CPlaintext(pt.level, _poly_struct(data, keep)), keep)


def import_plaintext(c: CPlaintext, is_ntt: bool = False,
                     scale: float = 1.0) -> Plaintext:
    limbs = []
    for i in range(c.poly.n_component):
        comp = c.poly.components[i]
        limbs.append(np.ctypeslib.as_array(comp.data, shape=(comp.n,)).copy())
    return Plaintext(data=np.stack(limbs).astype(np.uint64), level=int(c.level),
                     is_ntt=is_ntt, scale=scale)


# ---------------------------------------------------------------------------
# evaluation keys (CKeySwitchKey / CRelinKey / CGaloisKey)
# ---------------------------------------------------------------------------

def export_keyswitch_key(ksk: KeySwitchKey, mf_nbits: int = 64,
                         qp_ring=None) -> _Exported:
    """KeySwitchKey → CKeySwitchKey: one CPublicKey (degree-1 ciphertext over
    Q∪P) per decomposition digit; limbs ordered Q then P (the linker's
    canonical ordering, frontend/custom_task.py FPGA partitioner).

    ``mf_nbits=0`` requires ``qp_ring`` (to strip Montgomery form)."""
    kq = np.asarray(ksk.key_q)     # (β, 2, Lq, n)
    kp = np.asarray(ksk.key_p)     # (β, 2, α, n)
    beta = kq.shape[0]
    data = np.concatenate([kq, kp], axis=2)    # (β, 2, T, n)
    if mf_nbits == 0:
        if qp_ring is None:
            raise ValueError('mf_nbits=0 needs the Q∪P ring for de-Montgomery')
        from .core import u64 as _u
        data = _u.from_mont(np, data, qp_ring.q, qp_ring.pinv)
    keep: list = []
    pks = (CPublicKey * beta)()
    T = data.shape[2]
    for d in range(beta):
        polys = (CPolynomial * 2)()
        for j in range(2):
            polys[j] = _poly_struct(data[d, j], keep)
        keep.append(polys)
        pks[d] = CPublicKey(T - 1, 1, polys)
    keep.append(pks)
    return _Exported(CKeySwitchKey(beta, pks), keep)


def import_keyswitch_key(c: CKeySwitchKey, level: int, sp_level: int,
                         mf_nbits: int = 64, qp_ring=None) -> KeySwitchKey:
    """CKeySwitchKey → KeySwitchKey, splitting Q∪P limbs at level+1."""
    Lq = level + 1
    digits = []
    for d in range(c.n_public_key):
        pk = c.public_keys[d]
        polys = []
        for j in range(2):
            poly = pk.polys[j]
            limbs = [np.ctypeslib.as_array(poly.components[i].data,
                                           shape=(poly.components[i].n,)).copy()
                     for i in range(poly.n_component)]
            polys.append(np.stack(limbs))
        digits.append(np.stack(polys))
    data = np.stack(digits).astype(np.uint64)        # (β, 2, T, n)
    if mf_nbits == 0:
        if qp_ring is None:
            raise ValueError('mf_nbits=0 needs the Q∪P ring to re-enter '
                             'Montgomery form')
        from .core import u64 as _u
        data = _u.to_mont(np, data, qp_ring.q, qp_ring.pinv, qp_ring.r2)
    return KeySwitchKey(key_q=data[:, :, :Lq], key_p=data[:, :, Lq:],
                        level=level, sp_level=sp_level)


def export_galois_keys(glk: dict, mf_nbits: int = 64, qp_ring=None) -> _Exported:
    """{galois_element: KeySwitchKey} → CGaloisKey."""
    elements = sorted(glk.keys())
    keep: list = []
    elems = np.asarray(elements, dtype=np.uint64)
    keep.append(elems)
    ksks = (CKeySwitchKey * len(elements))()
    for i, elt in enumerate(elements):
        e = export_keyswitch_key(glk[elt], mf_nbits, qp_ring)
        keep.append(e)
        ksks[i] = e.struct
    keep.append(ksks)
    return _Exported(CGaloisKey(len(elements), elems.ctypes.data_as(_U64P),
                                ksks), keep)


def import_galois_keys(c: CGaloisKey, level: int, sp_level: int,
                       mf_nbits: int = 64, qp_ring=None) -> dict:
    out = {}
    for i in range(c.n_key_switch_key):
        elt = int(c.galois_elements[i])
        out[elt] = import_keyswitch_key(c.key_switch_keys[i], level, sp_level,
                                        mf_nbits, qp_ring)
    return out
