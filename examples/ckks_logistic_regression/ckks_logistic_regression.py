"""Example: logistic-regression inference score (reference parity:
examples/ckks_logistic_regression_cpu — x·w dot product via log-rotations,
bias add, output mask)."""

import math
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _common import ckks_params, example_args  # noqa: E402

import numpy as np  # noqa: E402


def build(ct, n_input_feature: int, level: int):
    x = ct.CkksCiphertextNode('x', level)
    w = ct.CkksPlaintextRingtNode()
    b = ct.CkksPlaintextNode('b', level - 1)
    mask = ct.CkksPlaintextRingtNode()

    u = ct.rescale(ct.mult(x, w))
    n_rotate = math.ceil(math.log(n_input_feature, 2))
    step = int(math.pow(2, n_rotate) / 2)
    for _ in range(n_rotate):
        u_rot = ct.rotate_cols(u, step)
        u = ct.add(u, u_rot[0])
        step = step // 2
    s = ct.add(u, b)
    y = ct.rescale(ct.mult(s, mask))
    return x, w, b, mask, y


def main():
    args = example_args('CKKS logistic regression inference')
    from lattisense_tpu.frontend import custom_task as ct
    from lattisense_tpu.runtime import CkksContext, FheTaskTpu

    fe_param, rt_params = ckks_params(args.n, args.toy)
    level = 3
    n_feat = min(30, rt_params.slots)
    task_dir = tempfile.mkdtemp(prefix='ckks_logreg_task_')
    ct.set_fhe_param(fe_param)
    x, w, b, mask, y = build(ct, n_feat, level)
    ct.process_custom_task(
        [ct.Argument('x', x), ct.Argument('w', w), ct.Argument('b', b),
         ct.Argument('mask', mask)],
        [ct.Argument('y', y)], output_instruction_path=task_dir)

    context = CkksContext.create_random_context(rt_params, seed=8)
    n_rotate = math.ceil(math.log(n_feat, 2))
    steps = [2 ** i for i in range(n_rotate)]
    context.gen_rotation_keys_for_rotations(steps)
    task = FheTaskTpu(task_dir)

    rng = np.random.default_rng(0)
    scale = context.params.scale
    xv = np.zeros(rt_params.slots)
    wv = np.zeros(rt_params.slots)
    xv[:n_feat] = rng.uniform(-1, 1, n_feat)
    wv[:n_feat] = rng.uniform(-1, 1, n_feat)
    bias = 0.25
    u_scale = scale * scale / rt_params.q[level]
    mask_v = np.zeros(rt_params.slots)
    mask_v[0] = 1.0
    inputs = {
        'x': context.encrypt(context.encode(xv, level)),
        'w': context.encode_ringt(wv),
        'b': context.encode(np.full(rt_params.slots, bias), level - 1,
                            scale=u_scale),
        'mask': context.encode_ringt(mask_v),
    }
    outputs, dur_ns = task.run(context, inputs)
    got = context.decrypt_decode(outputs['y']).real[0]
    expected = float(xv @ wv) + bias
    assert abs(got - expected) < 1e-2, f'{got} != {expected}'
    print(f'score = {got:.4f} (expected {expected:.4f}, {dur_ns/1e6:.1f} ms) — OK')


if __name__ == '__main__':
    main()
