"""Homomorphic polynomial evaluation in the Chebyshev basis
(Paterson–Stockmeyer recursion over T_{2^k} giants, log-depth).

Backs CKKS bootstrapping's EvalMod (scaled sine) and the reference facade's
polynomial activations (CkksContext::poly_eval_relu_function /
poly_eval_step_function, fhe_ops_lib/fhe_lib_v2.h:1101-1135).

Scale discipline: products drift the scale by q_level/Δ per rescale; adds
align operands by dropping levels and *forcing* the smaller relative scale
difference into the message (SEAL-style set_scale), asserting the forced
error stays below ``SCALE_FORCE_TOL``. Exact Lattigo-style target-scale
steering can replace this without changing the API.
"""

import numpy as np

from .types import Ciphertext

SCALE_FORCE_TOL = 1e-3


def chebyshev_interpolate(f, a: float, b: float, degree: int) -> np.ndarray:
    """Chebyshev series coefficients of f on [a, b] (degree+1 terms)."""
    k = np.arange(degree + 1)
    nodes = np.cos(np.pi * (k + 0.5) / (degree + 1))
    vals = f((b - a) / 2 * nodes + (b + a) / 2)
    # DCT-based projection
    coeffs = np.empty(degree + 1)
    for j in range(degree + 1):
        coeffs[j] = 2.0 / (degree + 1) * np.sum(vals * np.cos(np.pi * j * (k + 0.5) / (degree + 1)))
    coeffs[0] /= 2.0
    return coeffs


def cheb_divmod(c: np.ndarray, g: int):
    """p = q·T_g + r in the Chebyshev basis (deg r < g)."""
    c = np.array(c, dtype=np.float64)
    d = len(c) - 1
    q = np.zeros(max(d - g + 1, 1))
    for i in range(d, g, -1):
        ci = c[i]
        if ci == 0.0:
            continue
        q[i - g] += 2.0 * ci
        c[i] = 0.0
        c[abs(i - 2 * g)] -= ci
    if d >= g:
        q[0] += c[g]
        c[g] = 0.0
    return q, c[:g]


def eval_chebyshev_plain(coeffs, y):
    """Clenshaw reference evaluation (oracle for tests)."""
    b1 = b2 = 0.0
    for c in coeffs[::-1][:-1]:
        b1, b2 = 2 * y * b1 - b2 + c, b1
    return y * b1 - b2 + coeffs[0]


class ChebyshevEvaluator:
    """Evaluate Σ c_i·T_i((2x-(a+b))/(b-a)) on a CKKS ciphertext."""

    def __init__(self, engine, coeffs, a: float, b: float,
                 baby_log: int | None = None, pre_normalized: bool = False):
        """``pre_normalized``: the operand already lives on [-1, 1] (the
        caller folded the affine map into an upstream constant, e.g. the
        bootstrap CoeffsToSlots post-scale) — saves one level."""
        self.engine = engine
        self.coeffs = np.asarray(coeffs, dtype=np.float64)
        self.a, self.b = float(a), float(b)
        self.pre_normalized = pre_normalized
        if pre_normalized:
            assert abs(a + b) < 1e-12, 'pre-normalized domain must be symmetric'
        d = len(self.coeffs) - 1
        m = max((d).bit_length(), 1)
        self.baby_log = baby_log if baby_log is not None else (m + 1) // 2
        self.giant_logs = list(range(self.baby_log, m))

    # ---- scale/level alignment helpers -----------------------------------
    def _align(self, xp, cts: list) -> list:
        eng = self.engine
        level = min(c.level for c in cts)
        out = [eng.drop_level(xp, c, c.level - level) if c.level > level else c
               for c in cts]
        ref = max(c.scale for c in out)
        for c in out:
            rel = abs(c.scale - ref) / ref
            assert rel < SCALE_FORCE_TOL, f'scale forcing error {rel:.2e}'
            c.scale = ref
        return out

    def _add(self, xp, x, y):
        x, y = self._align(xp, [x, y])
        return self.engine.add(xp, x, y)

    def _add_const(self, xp, ct, value: float):
        eng = self.engine
        pt = eng.encode(np.full(eng.params.slots, value), ct.level, ct.scale)
        return eng.add(xp, ct, pt)

    def _mul_const(self, xp, ct, value: float, rescale=True):
        """Scale-preserving scalar multiply: the constant is encoded at the
        level's rescale prime, so ct.scale survives the rescale exactly —
        lets the whole evaluation run at a large scale (e.g. 2^60 EvalMod
        levels) independent of the context default."""
        eng = self.engine
        pt = eng.encode(np.full(eng.params.slots, value), ct.level,
                        scale=float(eng.q[ct.level]))
        out = eng.mult(xp, ct, pt)
        return eng.rescale(xp, out) if rescale else out

    def _mult(self, xp, x, y, rlk):
        x, y = self._align(xp, [x, y])
        return self.engine.rescale(xp, self.engine.relinearize(
            xp, self.engine.mult(xp, x, y), rlk))

    # ---- basis -----------------------------------------------------------
    def _basis(self, xp, ct, rlk):
        """T_1 = affine(x); babies T_2..T_{2^bl - 1}; giants T_{2^k}."""
        a, b = self.a, self.b
        if self.pre_normalized:
            y = ct
        else:
            y = self._mul_const(xp, ct, 2.0 / (b - a))
            y = self._add_const(xp, y, -(a + b) / (b - a))
        T = {1: y}
        for k in range(1, 1 << self.baby_log):
            if k + 1 in T or k + 1 == 1:
                continue
            half, other = (k + 1) // 2, k + 1 - (k + 1) // 2
            if half == other:
                t = self._mult(xp, T[half], T[half], rlk)
                t = self._add(xp, t, t)                       # 2T²
                T[k + 1] = self._add_const(xp, t, -1.0)       # −T_0
            else:
                # T_a T_b = (T_{a+b} + T_{a−b})/2
                t = self._mult(xp, T[half], T[other], rlk)
                t = self._add(xp, t, t)
                diff = other - half
                corr = (self._mul_const(xp, T[diff], -1.0)
                        if diff else None)
                T[k + 1] = (self._add_const(xp, t, -1.0) if diff == 0
                            else self._add(xp, t, corr))
        for lg in self.giant_logs:
            src = 1 << lg
            t = self._mult(xp, T[src], T[src], rlk)
            t = self._add(xp, t, t)
            T[2 * src] = self._add_const(xp, t, -1.0)
        return T

    def _eval_rec(self, xp, coeffs, T, rlk):
        d = len(coeffs) - 1
        if d < (1 << self.baby_log):
            # direct: c_0 + Σ c_i T_i at a common level/scale
            terms = []
            const = coeffs[0]
            for i in range(1, d + 1):
                if abs(coeffs[i]) < 1e-14:
                    continue
                terms.append(self._mul_const(xp, T[i], float(coeffs[i])))
            if not terms:
                base = self._mul_const(xp, T[1], 0.0)
                return self._add_const(xp, base, float(const))
            out = terms[0]
            for t in terms[1:]:
                out = self._add(xp, out, t)
            return self._add_const(xp, out, float(const))
        g = 1 << (d.bit_length() - 1)
        q, r = cheb_divmod(coeffs, g)
        qc = self._eval_rec(xp, q, T, rlk)
        rc = self._eval_rec(xp, r, T, rlk)
        out = self._mult(xp, qc, T[g], rlk)
        return self._add(xp, out, rc)

    def __call__(self, xp, ct: Ciphertext, rlk) -> Ciphertext:
        T = self._basis(xp, ct, rlk)
        return self._eval_rec(xp, self.coeffs, T, rlk)


def poly_eval_relu(engine, xp, ct, rlk, degree: int = 15,
                   bound: float = 1.0):
    """Smooth ReLU ≈ x·sigmoid-ish via Chebyshev (reference
    poly_eval_relu_function semantics: polynomial ReLU approximation)."""
    ev = ChebyshevEvaluator(engine,
                            chebyshev_interpolate(lambda t: np.maximum(t, 0.0),
                                                  -bound, bound, degree),
                            -bound, bound)
    return ev(xp, ct, rlk)


def poly_eval_step(engine, xp, ct, rlk, degree: int = 15,
                   bound: float = 1.0):
    """Polynomial step/sign approximation (reference poly_eval_step_function)."""
    ev = ChebyshevEvaluator(engine,
                            chebyshev_interpolate(
                                lambda t: (np.tanh(20 * t) + 1) / 2,
                                -bound, bound, degree),
                            -bound, bound)
    return ev(xp, ct, rlk)
