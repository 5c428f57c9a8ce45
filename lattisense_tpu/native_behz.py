"""Native multi-threaded host pipelines (ctypes bindings for csrc/behz.cpp).

The bench's honest host baseline: complete BFV mult_relin / rotate and CKKS
mult_relin_rescale pipelines in C++ threaded over independent ops — the same
role the reference's Lattigo kernels play under its <=32-thread pool
(mega_ag_runners/cpu_wrapper.cpp:57). Bit-exact vs the Python golden engine
(asserted by tests/test_native.py), so the baseline provably performs the
identical computation the chip is benchmarked on.

Constant-pool layout contract: csrc/behz.cpp `enum Buf` — the buffer order
in :meth:`BehzNative._build_pool` must match it exactly.
"""

import ctypes
import math

import numpy as np

from .core.modring import get_rns_ring
from .core.rns import _mont, _shoup
from .params import MTILDE
from .native import _lib, _ptr

_U64 = np.uint64
_I64 = ctypes.c_longlong
_U64P = ctypes.POINTER(ctypes.c_uint64)
_VOIDPP = ctypes.POINTER(ctypes.c_void_p)


def _c(a):
    return np.ascontiguousarray(np.asarray(a, dtype=_U64))


def _behz_lib():
    lib = _lib()
    if lib is None:
        return None
    if getattr(lib, '_behz_ready', False):
        return lib
    try:
        for name, extra in (
                ('ls_bfv_mult_relin', [_U64P] * 4),
                ('ls_bfv_rotate', [_U64P] * 5),
                ('ls_ckks_mult_relin_rescale', [_U64P] * 4),
        ):
            fn = getattr(lib, name)
            fn.argtypes = [_VOIDPP, ctypes.POINTER(_I64)] + extra
            fn.restype = None
        for name, nptr in (('ls_bfv_mult_relin_bench', 4),
                           ('ls_bfv_rotate_bench', 5),
                           ('ls_ckks_mult_relin_rescale_bench', 4)):
            fn = getattr(lib, name)
            fn.argtypes = ([_VOIDPP, ctypes.POINTER(_I64)] + [_U64P] * nptr
                           + [_I64, _I64])
            fn.restype = ctypes.c_double
    except AttributeError:
        return None
    lib._behz_ready = True
    return lib


def available() -> bool:
    return _behz_lib() is not None


class BehzNative:
    """Marshals one engine's per-level constants into the C pool."""

    def __init__(self, engine, level: int):
        self.engine = engine
        self.level = level
        self.n = engine.n
        self.Lq = level + 1
        self._arrays = []            # keep alive
        self._build_pool()

    def _keep(self, a):
        a = _c(a)
        self._arrays.append(a)
        return a

    def _build_pool(self):
        eng, level = self.engine, self.level
        n, Lq = self.n, self.Lq
        q = eng.q[:Lq]
        sw = eng.switcher
        alpha, beta = sw.alpha, sw.beta(level)
        Tk = Lq + alpha

        ring_q = get_rns_ring(tuple(q), n)
        bufs = []

        def ring_bufs(ring):
            return [ring.q.reshape(-1), ring.pinv.reshape(-1), ring.r2.reshape(-1),
                    ring.psi_rev, ring.psi_rev_shoup, ring.psi_inv_rev,
                    ring.psi_inv_rev_shoup, ring.n_inv.reshape(-1),
                    ring.n_inv_shoup.reshape(-1)]

        bufs += ring_bufs(ring_q)                                 # B_Q..B_QNINV_SH

        # BFV-only BEHZ constants; CKKS pools pass zero placeholders.
        is_bfv = hasattr(eng, 'behz')
        if is_bfv:
            bz = eng.behz(level)
            Td = len(bz.ring_aux.moduli)
            ring_a = bz.ring_aux
            bufs += ring_bufs(ring_a)                             # B_A..B_ANINV_SH
            ext = bz.extend
            bufs += [ext.mtilde_mont.reshape(-1),
                     ext.conv.qhat_inv.reshape(-1),
                     ext.conv.qhat_inv_shoup.reshape(-1),
                     ext.conv.qhat_dst_mont,                      # (Td, Lq)
                     ext.conv.qhat_mtilde.reshape(-1),
                     np.array([ext.smmrq.neg_qinv_mtilde], dtype=_U64),
                     ext.smmrq.q_mont.reshape(-1),
                     ext.smmrq.mtilde_inv_mont.reshape(-1),
                     bz.t_mont_q.reshape(-1),
                     bz.t_mont_aux.reshape(-1),
                     bz.qinv_mont_aux.reshape(-1)]
            sh = bz.shenoy
            bufs += [sh.conv.qhat_inv.reshape(-1),
                     sh.conv.qhat_inv_shoup.reshape(-1),
                     sh.conv.qhat_dst_mont,                       # (Lq+1, Tb)
                     np.array([int(sh.sk_q), int(sh.sk_pinv),
                               int(sh.binv_sk_mont)], dtype=_U64),
                     sh.b_mont.reshape(-1)]
        else:
            Td = Lq + 2
            zero = np.zeros(1, dtype=_U64)
            bufs += [zero] * 9                                    # aux ring
            bufs += [zero] * 11                                   # extend/scale
            bufs += [zero] * 5                                    # shenoy

        # key-switch constants (shared BFV/CKKS; same KeySwitcher math)
        ring_qp, ks_qhi, ks_qhi_sh, ks_srcq, ks_conv, round_div = \
            sw._level_pre(level)
        bufs += [ring_qp.q.reshape(-1), ring_qp.pinv.reshape(-1),
                 ring_qp.psi_rev, ring_qp.psi_rev_shoup,
                 ring_qp.psi_inv_rev, ring_qp.psi_inv_rev_shoup,
                 ring_qp.n_inv.reshape(-1), ring_qp.n_inv_shoup.reshape(-1),
                 ks_qhi.reshape(beta, alpha), ks_qhi_sh.reshape(beta, alpha),
                 ks_srcq.reshape(beta, alpha), ks_conv]           # (β, Tk, α)
        rd = round_div
        bufs += [rd.conv.qhat_inv.reshape(-1), rd.conv.qhat_inv_shoup.reshape(-1),
                 rd.conv.qhat_dst_mont,                           # (Lq, α)
                 rd.p_q.reshape(-1),
                 np.array([(-pow(int(p), -1, 1 << 64)) % (1 << 64)
                           for p in sw.p_moduli], dtype=_U64),
                 rd.half_p.reshape(-1), rd.half_q.reshape(-1),
                 rd.pinv_mont.reshape(-1)]

        # DivRoundLast (CKKS rescale)
        if Lq >= 2:
            q_last = int(q[-1])
            rest = q[:-1]
            bufs += [np.array([_mont(pow(q_last % int(d), -1, int(d)), int(d))
                               for d in rest], dtype=_U64),
                     np.array([(q_last + 1) // 2], dtype=_U64)]
        else:
            bufs += [np.zeros(1, dtype=_U64)] * 2

        self._bufs = [self._keep(b) for b in bufs]
        ptrs = (ctypes.c_void_p * len(self._bufs))(
            *[b.ctypes.data_as(ctypes.c_void_p) for b in self._bufs])
        self._ptrs = ptrs
        self._dims = (_I64 * 8)(n, Lq, Td, alpha, beta, Tk, MTILDE,
                                getattr(eng, 't', 0))

    # ---- single-op (validation) ----
    def bfv_mult_relin(self, a: np.ndarray, b: np.ndarray, rlk) -> np.ndarray:
        lib = _behz_lib()
        a, b = _c(a), _c(b)
        key = self._pack_key(rlk)
        out = np.empty((2, self.Lq, self.n), dtype=_U64)
        lib.ls_bfv_mult_relin(self._ptrs, self._dims, _ptr(a), _ptr(b),
                              _ptr(key), _ptr(out))
        return out

    def bfv_rotate(self, ct: np.ndarray, galois_elt: int, glk) -> np.ndarray:
        from .schemes.galois import coeff_automorphism_maps
        lib = _behz_lib()
        ct = _c(ct)
        src, sign = coeff_automorphism_maps(self.n, galois_elt)
        src, sign = self._keep(src), self._keep(sign)
        key = self._pack_key(glk)
        out = np.empty((2, self.Lq, self.n), dtype=_U64)
        lib.ls_bfv_rotate(self._ptrs, self._dims, _ptr(ct), _ptr(src),
                          _ptr(sign), _ptr(key), _ptr(out))
        return out

    def ckks_mult_relin_rescale(self, a, b, rlk) -> np.ndarray:
        lib = _behz_lib()
        a, b = _c(a), _c(b)
        key = self._pack_key(rlk)
        out = np.empty((2, self.Lq - 1, self.n), dtype=_U64)
        lib.ls_ckks_mult_relin_rescale(self._ptrs, self._dims, _ptr(a), _ptr(b),
                                       _ptr(key), _ptr(out))
        return out

    # ---- threaded bench drivers ----
    def bench_bfv_mult_relin(self, a, b, rlk, n_ops: int, n_threads: int):
        lib = _behz_lib()
        a, b = _c(a), _c(b)
        key = self._pack_key(rlk)
        out = np.empty((2, self.Lq, self.n), dtype=_U64)
        secs = lib.ls_bfv_mult_relin_bench(self._ptrs, self._dims, _ptr(a),
                                           _ptr(b), _ptr(key), _ptr(out),
                                           n_ops, n_threads)
        return secs, out

    def bench_bfv_rotate(self, ct, galois_elt: int, glk, n_ops, n_threads):
        from .schemes.galois import coeff_automorphism_maps
        lib = _behz_lib()
        ct = _c(ct)
        src, sign = coeff_automorphism_maps(self.n, galois_elt)
        src, sign = self._keep(src), self._keep(sign)
        key = self._pack_key(glk)
        out = np.empty((2, self.Lq, self.n), dtype=_U64)
        secs = lib.ls_bfv_rotate_bench(self._ptrs, self._dims, _ptr(ct),
                                       _ptr(src), _ptr(sign), _ptr(key),
                                       _ptr(out), n_ops, n_threads)
        return secs, out

    def bench_ckks_mult_relin_rescale(self, a, b, rlk, n_ops, n_threads):
        lib = _behz_lib()
        a, b = _c(a), _c(b)
        key = self._pack_key(rlk)
        out = np.empty((2, self.Lq - 1, self.n), dtype=_U64)
        secs = lib.ls_ckks_mult_relin_rescale_bench(
            self._ptrs, self._dims, _ptr(a), _ptr(b), _ptr(key), _ptr(out),
            n_ops, n_threads)
        return secs, out

    def _pack_key(self, ksk) -> np.ndarray:
        """KeySwitchKey -> (beta, 2, Tk, n) contiguous (key_q[:, :, :Lq] ‖ key_p)."""
        sw = self.engine.switcher
        beta = sw.beta(self.level)
        kq = np.asarray(ksk.key_q)[:beta, :, :self.Lq]
        kp = np.asarray(ksk.key_p)[:beta]
        key = self._keep(np.concatenate([kq, kp], axis=2))
        return key
