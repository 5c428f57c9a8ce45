"""Frontend contract parity: run identical task-builder scripts through the
*reference* frontend (/root/reference, executed read-only) and through ours,
and require structurally identical mega_ag.json / task_signature.json
(modulo random node ids)."""

import copy
import importlib
import json
import sys

import pytest


@pytest.fixture(scope='module')
def ref():
    sys.path.insert(0, '/root/reference')
    mod = importlib.import_module('frontend.custom_task')
    yield mod
    sys.path.remove('/root/reference')


@pytest.fixture(scope='module')
def ours():
    return importlib.import_module('lattisense_tpu.frontend.custom_task')


def normalize(task_dir_mag: dict, sig: dict):
    """Replace random 12-char ids with canonical per-index names."""
    mag = copy.deepcopy(task_dir_mag)
    for idx, d in mag['data'].items():
        d['id'] = f'data_{idx}' if len(d['id']) == 12 and d['id'].isalpha() and d['id'].islower() \
            and not d['id'].startswith(('rlk', 'glk', 'swk')) else d['id']
    for idx, c in mag['compute'].items():
        c['id'] = f'compute_{idx}'
    mag.pop('name', None)
    return mag, sig


def run_task(mod, build, tmpdir):
    """build(mod) constructs the graph and returns (input_args, output_args)."""
    ins, outs = build(mod)
    mag = mod.process_custom_task(
        input_args=ins, output_args=outs,
        output_instruction_path=str(tmpdir), fpga_acc=False)
    sig = json.load(open(f'{tmpdir}/task_signature.json'))
    mag = json.load(open(f'{tmpdir}/mega_ag.json'))
    return normalize(mag, sig)


def build_bfv_mult(mod):
    mod.set_fhe_param(mod.BfvParam.create_default_param(n=16384))
    x = mod.BfvCiphertextNode('x', 3)
    y = mod.BfvCiphertextNode('y', 3)
    z = mod.mult_relin(x, y, 'z')
    return [mod.Argument('x', x), mod.Argument('y', y)], [mod.Argument('z', z)]


def build_bfv_ops_mix(mod):
    mod.set_fhe_param(mod.BfvParam.create_custom_param(
        n=8192, q=[0x3FFFFFFFEF8001, 0x4000000011C001, 0x40000000120001],
        p=[0x7FFFFFFFFB4001], t=65537))
    xs = [mod.BfvCiphertextNode(f'x_{i}', 2) for i in range(4)]
    ys = [mod.BfvPlaintextNode(f'y_{i}', 2) for i in range(4)]
    zs = [mod.add(xs[i], ys[i], f'a_{i}') for i in range(4)]
    ws = [mod.rescale(mod.mult_relin(zs[i], zs[i], f'm_{i}'), f'w_{i}') for i in range(4)]
    return ([mod.Argument('in_x', xs), mod.Argument('in_y', ys)],
            [mod.Argument('out_w', ws)])


def build_bfv_rotations(mod):
    mod.set_fhe_param(mod.BfvParam.create_default_param(n=16384))
    x = mod.BfvCiphertextNode('x', 1)
    outs = mod.rotate_cols(x, [1, 3, -2, 100], 'r')
    row = mod.rotate_rows(x, 'row')
    adv = mod.advanced_rotate_cols(x, [7], 'adv')
    return [mod.Argument('x', x)], [mod.Argument('r', outs), mod.Argument('row', row),
                                    mod.Argument('adv', adv)]


def build_seal_rotations(mod):
    mod.set_fhe_param(mod.BfvParam.create_default_param(n=16384))
    x = mod.BfvCiphertextNode('x', 1)
    outs = mod.seal_rotate_cols(x, [5, -3], 'r')
    row = mod.seal_rotate_rows(x, 'row')
    adv = mod.seal_advanced_rotate_cols(x, [9], 'adv')
    return [mod.Argument('x', x)], [mod.Argument('r', outs), mod.Argument('row', row),
                                    mod.Argument('adv', adv)]


def build_ckks_mix(mod):
    mod.set_fhe_param(mod.CkksParam.create_default_param(n=16384))
    x = mod.CkksCiphertextNode('x', 3)
    y = mod.CkksCiphertextNode('y', 3)
    z = mod.rescale(mod.mult_relin(x, y, 'z'), 'zr')
    d = mod.drop_level(x, 2, 'd')
    return [mod.Argument('x', x), mod.Argument('y', y)], \
        [mod.Argument('zr', z), mod.Argument('d', d)]


def build_cmp_sums(mod):
    mod.set_fhe_param(mod.BfvParam.create_default_param(n=16384))
    xs = [mod.BfvCiphertextNode(f'x_{i}', 1) for i in range(20)]
    ys = [mod.BfvPlaintextRingtNode(f'y_{i}') for i in range(20)]
    z = mod.ct_pt_mult_accumulate(xs, ys)
    z2 = mod.ct_pt_mult_accumulate_1(xs[:10], ys[:10])
    out = mod.add(z, z2, 'out')
    return [mod.Argument('x', xs), mod.Argument('y', ys)], [mod.Argument('out', out)]


def build_bootstrap(mod):
    p = mod.CkksBtpParam.create_toy_param()
    p.set_slots(p.n // 2)
    mod.set_fhe_param(p)
    x = mod.CkksCiphertextNode('x', 0)
    z = mod.bootstrap(x, 'z')
    return [mod.Argument('x', x)], [mod.Argument('z', z)]


def build_domain_conversions(mod):
    mod.set_fhe_param(mod.BfvParam.create_default_param(n=16384))
    x = mod.BfvCiphertextNode('x', 1)
    a = mod.to_ntt(x, 'a')
    b = mod.to_inv_ntt(a, 'b')
    c = mod.to_mform(b, 'c')
    d = mod.to_mul(mod.to_inv_ntt(mod.to_ntt(x)), 'd')
    return [mod.Argument('x', x)], [mod.Argument('c', c), mod.Argument('d', d)]


BUILDERS = [build_bfv_mult, build_bfv_ops_mix, build_bfv_rotations, build_seal_rotations,
            build_ckks_mix, build_cmp_sums, build_bootstrap, build_domain_conversions]


@pytest.mark.parametrize('build', BUILDERS, ids=lambda b: b.__name__)
def test_frontend_matches_reference(ref, ours, build, tmp_path):
    mag_ref, sig_ref = run_task(ref, build, tmp_path / 'ref')
    mag_ours, sig_ours = run_task(ours, build, tmp_path / 'ours')
    assert sig_ours == sig_ref
    assert mag_ours == mag_ref
