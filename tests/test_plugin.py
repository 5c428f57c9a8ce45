"""Plug-in offload adapter round-trips: a simulated foreign client that owns
only raw-RNS C structs (the reference plug-in test shape,
plug-in/SEAL/test_acc/test_bfv_gpu.cpp — foreign types → C structs → runner
→ C structs → foreign types, validated against plain math)."""

import tempfile

import numpy as np
import pytest

import lattisense_tpu  # noqa: F401
from lattisense_tpu import abi
from lattisense_tpu.core.modring import gen_ntt_primes, get_rns_ring
from lattisense_tpu.frontend import custom_task as ctk
from lattisense_tpu.frontend.custom_task import BfvParam
from lattisense_tpu.params import BfvParams
from lattisense_tpu.plugin import ForeignTask, ForeignVectorArgument
from lattisense_tpu.runtime import BfvContext

N, T = 64, 65537


@pytest.fixture(scope='module')
def setup():
    q = gen_ntt_primes(N, 50, 4)
    p = gen_ntt_primes(N, 51, 2, exclude=tuple(q))
    params = BfvParams.create_custom(N, T, q, p)
    fe = BfvParam.create_custom_param(N, q, p, T)
    level = 2

    task_dir = tempfile.mkdtemp(prefix='plugin_task_')
    ctk.set_fhe_param(fe)
    x = ctk.BfvCiphertextNode('x', level)
    y = ctk.BfvCiphertextNode('y', level)
    z = ctk.mult_relin(x, y, 'z')
    w = ctk.rotate_cols(z, 1, 'w')
    ctk.process_custom_task([ctk.Argument('x', x), ctk.Argument('y', y)],
                            [ctk.Argument('w', w)],
                            output_instruction_path=task_dir)

    # The "foreign client": holds keys + data, hands out only C structs.
    ctx = BfvContext.create_random_context(params, seed=77)
    ctx.gen_rotation_keys_for_rotations([1])
    return params, level, task_dir, ctx


def _foreign_structs(ctx, params, mf_nbits):
    qp_ring = get_rns_ring(tuple(params.q) + tuple(params.p), params.n)
    rlk_exp = abi.export_keyswitch_key(ctx.rlk, mf_nbits, qp_ring)
    glk_exp = abi.export_galois_keys(ctx.glk.keys, mf_nbits, qp_ring)
    return rlk_exp, glk_exp, qp_ring


@pytest.mark.parametrize('mf_nbits', [64, 0])
def test_foreign_roundtrip_vs_golden(setup, mf_nbits):
    params, level, task_dir, ctx = setup
    rng = np.random.default_rng(3)
    m1 = rng.integers(0, T, N, dtype=np.uint64)
    m2 = rng.integers(0, T, N, dtype=np.uint64)
    ca = ctx.encrypt(ctx.encode(m1, level))
    cb = ctx.encrypt(ctx.encode(m2, level))

    # client side: everything crosses as C structs
    rlk_exp, glk_exp, _ = _foreign_structs(ctx, params, mf_nbits)
    a_exp = abi.export_ciphertext(ca)
    b_exp = abi.export_ciphertext(cb)

    ft = ForeignTask(task_dir, mode='eager')
    outs, ns = ft.run(rlk=rlk_exp.struct, glk=glk_exp.struct,
                      args=[ForeignVectorArgument('x', a_exp.struct),
                            ForeignVectorArgument('y', b_exp.struct)],
                      mf_nbits=mf_nbits)
    assert ns > 0
    back = abi.import_ciphertext(outs['w'].struct)

    got = ctx.decrypt_decode(back)
    # BFV slots are a 2 x N/2 matrix; rotate_cols rolls each row
    prod = (m1.astype(np.uint64) * m2) % T
    half = N // 2
    exp_rot = np.concatenate([np.roll(prod[:half], -1), np.roll(prod[half:], -1)])
    np.testing.assert_array_equal(got, exp_rot)


def test_signature_error_strings(setup):
    params, level, task_dir, ctx = setup
    rng = np.random.default_rng(4)
    m = rng.integers(0, T, N, dtype=np.uint64)
    good = abi.export_ciphertext(ctx.encrypt(ctx.encode(m, level)))
    wrong_level = abi.export_ciphertext(ctx.encrypt(ctx.encode(m, level - 1)))
    rlk_exp, glk_exp, _ = _foreign_structs(ctx, params, 64)
    ft = ForeignTask(task_dir, mode='eager')

    with pytest.raises(RuntimeError,
                       match='For argument x, expected level is 2, but input '
                             'level is 1.'):
        ft.run(rlk=rlk_exp.struct, glk=glk_exp.struct,
               args=[ForeignVectorArgument('x', wrong_level.struct),
                     ForeignVectorArgument('y', good.struct)], mf_nbits=64)

    with pytest.raises(RuntimeError, match='expected 2 arguments, got 1.'):
        ft.run(rlk=rlk_exp.struct, glk=glk_exp.struct,
               args=[ForeignVectorArgument('x', good.struct)], mf_nbits=64)

    with pytest.raises(RuntimeError,
                       match='Level of relin key is smaller than the expected '
                             'level.'):
        ft.run(rlk=None, glk=glk_exp.struct,
               args=[ForeignVectorArgument('x', good.struct),
                     ForeignVectorArgument('y', good.struct)], mf_nbits=64)

    with pytest.raises(RuntimeError,
                       match='Level of Galois key is smaller than the expected '
                             'level.'):
        ft.run(rlk=rlk_exp.struct, glk=None,
               args=[ForeignVectorArgument('x', good.struct),
                     ForeignVectorArgument('y', good.struct)], mf_nbits=64)


def test_offline_signature_replaces_online(setup):
    """Reference semantics (plug-in/SEAL/acc/check_sig.h:209-211): a
    non-empty offline signature REPLACES the online one for argument
    checking — args are validated positionally against the offline rows."""
    params, level, task_dir, ctx = setup
    q, p = list(params.q), list(params.p)
    fe = BfvParam.create_custom_param(N, q, p, T)
    off_dir = tempfile.mkdtemp(prefix='plugin_offline_')
    ctk.set_fhe_param(fe)
    a = ctk.BfvCiphertextNode('a', level)
    b = ctk.BfvCiphertextNode('b', level)
    c = ctk.add(a, b, 'c')
    ctk.process_custom_task(
        [], [ctk.Argument('c', c)], output_instruction_path=off_dir,
        offline_input_args=[ctk.Argument('a', a), ctk.Argument('b', b)])

    rng = np.random.default_rng(5)
    m1 = rng.integers(0, T, N, dtype=np.uint64)
    m2 = rng.integers(0, T, N, dtype=np.uint64)
    a_exp = abi.export_ciphertext(ctx.encrypt(ctx.encode(m1, level)))
    b_exp = abi.export_ciphertext(ctx.encrypt(ctx.encode(m2, level)))

    ft = ForeignTask(off_dir, mode='eager')
    assert ft.signature['offline'], 'task must carry an offline signature'
    outs, _ = ft.run(args=[ForeignVectorArgument('a', a_exp.struct),
                           ForeignVectorArgument('b', b_exp.struct)])
    got = ctx.decrypt_decode(abi.import_ciphertext(outs['c'].struct))
    np.testing.assert_array_equal(got, (m1 + m2) % T)

    # wrong positional id against the OFFLINE rows (reference error string)
    with pytest.raises(RuntimeError,
                       match='For argument b, expected id is a'):
        ft.run(args=[ForeignVectorArgument('b', b_exp.struct),
                     ForeignVectorArgument('a', a_exp.struct)])

    # pt_ringt rows are level-checked like everything else (reference
    # check_with_sig has no pt exemption)
    wrong = abi.export_ciphertext(ctx.encrypt(ctx.encode(m1, level - 1)))
    with pytest.raises(RuntimeError, match='expected level is 2'):
        ft.run(args=[ForeignVectorArgument('a', wrong.struct),
                     ForeignVectorArgument('b', b_exp.struct)])


def test_keyswitch_key_abi_roundtrip(setup):
    params, level, task_dir, ctx = setup
    qp_ring = get_rns_ring(tuple(params.q) + tuple(params.p), params.n)
    for mf in (64, 0):
        exp = abi.export_keyswitch_key(ctx.rlk, mf, qp_ring)
        back = abi.import_keyswitch_key(exp.struct, ctx.rlk.level,
                                        ctx.rlk.sp_level, mf, qp_ring)
        np.testing.assert_array_equal(np.asarray(back.key_q),
                                      np.asarray(ctx.rlk.key_q))
        np.testing.assert_array_equal(np.asarray(back.key_p),
                                      np.asarray(ctx.rlk.key_p))
    exp = abi.export_galois_keys(ctx.glk.keys, 64, qp_ring)
    back = abi.import_galois_keys(exp.struct, ctx.rlk.level, ctx.rlk.sp_level)
    assert set(back) == set(ctx.glk.keys)


def test_struct_layout_matches_c_header():
    """Binary layout parity with abi/c_types.h (int fields, pointer sizes)."""
    import ctypes
    assert abi.CComponent.n.size == ctypes.sizeof(ctypes.c_int)
    assert ctypes.sizeof(abi.CComponent) == 2 * ctypes.sizeof(ctypes.c_void_p)
    # two packed ints then a pointer: no int64 padding inflation
    assert ctypes.sizeof(abi.CCiphertext) == 2 * ctypes.sizeof(ctypes.c_void_p)
    assert abi.CCiphertext.degree.offset == 4
    assert abi.CGaloisKey.galois_elements.offset == ctypes.sizeof(ctypes.c_void_p)
