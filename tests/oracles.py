"""Plain-math test oracles, mirroring fhe_ops_lib/utils.h:59-80 semantics."""

import numpy as np


def vec_mod_add(a, b, t):
    return (np.asarray(a, dtype=np.int64) + np.asarray(b, dtype=np.int64)) % t


def vec_mod_sub(a, b, t):
    return (np.asarray(a, dtype=np.int64) - np.asarray(b, dtype=np.int64)) % t


def vec_mod_mul(a, b, t):
    return (np.asarray(a, dtype=np.int64) * np.asarray(b, dtype=np.int64)) % t


def vec_mod_neg(a, t):
    return (-np.asarray(a, dtype=np.int64)) % t


def vec_rotate_col(a, step):
    """2-row layout (n = 2 * n_col); cyclic column shift, positive = left."""
    m = np.asarray(a).reshape(2, -1)
    return np.roll(m, -step, axis=1).reshape(-1)


def vec_rotate_row(a):
    m = np.asarray(a).reshape(2, -1)
    return m[::-1].reshape(-1)


def vec_rotate(a, step):
    """CKKS slot rotation: result[k] = a[(k + step) % n]."""
    return np.roll(np.asarray(a), -step)
