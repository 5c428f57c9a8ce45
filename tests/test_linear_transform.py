"""Homomorphic BSGS linear transform vs plain matrix-vector product."""

import numpy as np
import pytest

import lattisense_tpu  # noqa: F401
from lattisense_tpu.core.modring import gen_ntt_primes
from lattisense_tpu.params import CkksParams
from lattisense_tpu.runtime import CkksContext
from lattisense_tpu.schemes.linear_transform import (EncodedLinearTransform,
                                                     bsgs_split,
                                                     matrix_diagonals)

N = 64


@pytest.fixture(scope='module')
def ctx():
    big = gen_ntt_primes(N, 60, 2)
    mids = gen_ntt_primes(N, 40, 3)
    params = CkksParams.create_custom(N, [big[0]] + mids, [big[1]],
                                      scale=float(1 << 40))
    return CkksContext.create_random_context(params, seed=41)


def test_dense_matrix_transform(ctx):
    rng = np.random.default_rng(0)
    s = ctx.params.slots
    mat = rng.uniform(-1, 1, (s, s)) + 1j * rng.uniform(-1, 1, (s, s))
    diags = matrix_diagonals(mat)
    n1 = bsgs_split(diags.keys(), s)
    lt = EncodedLinearTransform(ctx.engine, diags, level=2, n1=n1)
    ctx.gen_galois_keys_for_elements(lt.galois_elements())
    glk_map = ctx.glk.keys

    v = rng.uniform(-1, 1, s) + 1j * rng.uniform(-1, 1, s)
    ct = ctx.encrypt(ctx.encode(v, 2))
    out = lt(np, ct, glk_map)
    got = ctx.decrypt_decode(ctx.rescale(out))
    np.testing.assert_allclose(got, mat @ v, atol=1e-3)


def test_sparse_diagonal_transform(ctx):
    """3-diagonal matrix (the special-FFT stage shape) + BSGS consistency."""
    rng = np.random.default_rng(1)
    s = ctx.params.slots
    mat = np.zeros((s, s), dtype=np.complex128)
    idx = np.arange(s)
    for d in (0, 4, s - 4):
        mat[idx, (idx + d) % s] = rng.uniform(-1, 1, s) + 1j * rng.uniform(-1, 1, s)
    diags = matrix_diagonals(mat)
    assert set(diags) == {0, 4, s - 4}
    n1 = bsgs_split(diags.keys(), s)
    lt = EncodedLinearTransform(ctx.engine, diags, level=2, n1=n1)
    ctx.gen_galois_keys_for_elements(lt.galois_elements())

    v = rng.uniform(-1, 1, s)
    ct = ctx.encrypt(ctx.encode(v, 2))
    got = ctx.decrypt_decode(ctx.rescale(lt(np, ct, ctx.glk.keys)))
    np.testing.assert_allclose(got, mat @ v, atol=1e-3)
