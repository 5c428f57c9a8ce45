"""Raw-RNS C ABI: the cross-library exchange format (plug-in band).

Reference parity: abi/c_types.h:26-60 — the canonical struct layout other
libraries use to hand polynomials to the runners (SEAL / Lattigo plug-ins,
SURVEY.md §2.6):

    CComponent   { int64 n;  uint64* data; }           # one limb
    CPolynomial  { int64 n_component;  CComponent* }   # limbs of one poly
    CPlaintext   { int64 level;  CPolynomial poly; }
    CCiphertext  { int64 level;  int64 degree;  CPolynomial* polys; }

ctypes Structures with identical field layout, plus exporters/importers
bridging to the framework's (degree+1, L, n) arrays. Buffers are kept
alive by the Python wrapper objects; `export_*` can optionally drop
Montgomery form bits the way the reference's `mf_nbits` argument does.
"""

import ctypes

import numpy as np

from .schemes.types import Ciphertext, Plaintext

_U64P = ctypes.POINTER(ctypes.c_uint64)


class CComponent(ctypes.Structure):
    _fields_ = [('n', ctypes.c_int64), ('data', _U64P)]


class CPolynomial(ctypes.Structure):
    _fields_ = [('n_component', ctypes.c_int64),
                ('components', ctypes.POINTER(CComponent))]


class CPlaintext(ctypes.Structure):
    _fields_ = [('level', ctypes.c_int64), ('poly', CPolynomial)]


class CCiphertext(ctypes.Structure):
    _fields_ = [('level', ctypes.c_int64), ('degree', ctypes.c_int64),
                ('polys', ctypes.POINTER(CPolynomial))]


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
