"""Example: CKKS mult + relinearize + rescale through the compiled-task path
(reference parity: examples/ckks_mult_cpu)."""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _common import ckks_params, example_args  # noqa: E402

import numpy as np  # noqa: E402


def main():
    args = example_args('CKKS homomorphic multiply')
    from lattisense_tpu.frontend import custom_task as ct
    from lattisense_tpu.runtime import CkksContext, FheTaskTpu

    fe_param, rt_params = ckks_params(args.n, args.toy)
    level = 3
    task_dir = tempfile.mkdtemp(prefix='ckks_mult_task_')

    ct.set_fhe_param(fe_param)
    x = ct.CkksCiphertextNode('x', level)
    y = ct.CkksCiphertextNode('y', level)
    z = ct.rescale(ct.mult_relin(x, y, 'z'), 'zr')
    ct.process_custom_task([ct.Argument('x', x), ct.Argument('y', y)],
                           [ct.Argument('zr', z)], output_instruction_path=task_dir)

    context = CkksContext.create_random_context(rt_params, seed=1)
    task = FheTaskTpu(task_dir)
    xv, yv = np.array([5.0, 10.0]), np.array([2.0, 3.0])
    ea = context.encrypt(context.encode(xv, level))
    eb = context.encrypt(context.encode(yv, level))
    outputs, dur_ns = task.run(context, {'x': ea, 'y': eb})
    got = context.decrypt_decode(outputs['zr']).real[:2]
    print(f'[5,10] * [2,3] = {np.round(got, 4)} ({dur_ns/1e6:.1f} ms)')
    assert np.allclose(got, [10.0, 30.0], atol=1e-2)
    print('OK')


if __name__ == '__main__':
    main()
