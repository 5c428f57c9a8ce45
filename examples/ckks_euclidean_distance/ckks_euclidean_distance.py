"""Example: packed squared-euclidean distance (reference parity:
examples/ckks_euclidean_distance_cpu — (x+w)^2, rotate-and-add reduction
over packed segments, mask multiply)."""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _common import ckks_params, example_args  # noqa: E402

import numpy as np  # noqa: E402


def build(ct, pack: int, skip: int):
    x = ct.CkksCiphertextNode('x', 3)
    w = ct.CkksCiphertextNode('w', 3)
    mask = ct.CkksPlaintextRingtNode(id='mask')

    z = ct.add(x, w, 'z')
    u = ct.rescale(ct.mult_relin(z, z), 'u')
    u_rot_list = [u]
    step = skip
    for j in range(pack - 1):
        u_rot_list.append(ct.rotate_cols(u, step, f'u_rot_{j}')[0])
        step += skip
    s = u_rot_list[0]
    for k in range(1, len(u_rot_list)):
        s = ct.add(s, u_rot_list[k], f'sum_{k}')
    distance = ct.rescale(ct.mult(s, mask, 'distance'))
    return x, w, mask, distance


def main():
    args = example_args('CKKS packed euclidean distance')
    from lattisense_tpu.frontend import custom_task as ct
    from lattisense_tpu.runtime import CkksContext, FheTaskTpu

    fe_param, rt_params = ckks_params(args.n, args.toy)
    slots = rt_params.slots
    pack, skip = 4, slots // 8
    task_dir = tempfile.mkdtemp(prefix='ckks_eucl_task_')
    ct.set_fhe_param(fe_param)
    x, w, mask, distance = build(ct, pack, skip)
    ct.process_custom_task(
        [ct.Argument('x_input', x), ct.Argument('w_input_inv', w),
         ct.Argument('mask', mask)],
        [ct.Argument('d', distance)], output_instruction_path=task_dir)

    context = CkksContext.create_random_context(rt_params, seed=6)
    # rotation keys for the NAF decompositions of the used steps
    context.gen_rotation_keys_for_rotations([skip * (j + 1) for j in range(pack - 1)])
    task = FheTaskTpu(task_dir)

    rng = np.random.default_rng(0)
    xv = rng.uniform(-1, 1, pack * skip)
    wv = rng.uniform(-1, 1, pack * skip)
    mask_v = np.zeros(slots)
    mask_v[:skip] = 1.0
    inputs = {
        'x_input': context.encrypt(context.encode(xv, 3)),
        'w_input_inv': context.encrypt(context.encode(-wv, 3)),
        'mask': context.encode_ringt(mask_v),
    }
    outputs, dur_ns = task.run(context, inputs)
    got = context.decrypt_decode(outputs['d']).real[:skip]

    diff2 = (xv - wv).reshape(pack, skip) ** 2
    expected = diff2.sum(axis=0)
    err = np.max(np.abs(got - expected))
    assert err < 1e-2, f'distance mismatch (max err {err})'
    print(f'packed euclidean distance over {pack}x{skip} features '
          f'({dur_ns/1e6:.1f} ms, max err {err:.2e}) — OK')


if __name__ == '__main__':
    main()
