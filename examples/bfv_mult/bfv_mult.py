"""Example: BFV homomorphic multiply, end-to-end through the compiled-task
path (reference example parity: examples/bfv_mult_cpu/bfv_mult_cpu.{py,cpp}).

Compile step: build the Erg graph and emit the task directory.
Run step: create a context, encrypt, execute the jitted task, decrypt.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _common import bfv_params, example_args  # noqa: E402

import numpy as np  # noqa: E402


def main():
    args = example_args('BFV homomorphic multiply')
    from lattisense_tpu.frontend import custom_task as ct
    from lattisense_tpu.runtime import BfvContext, FheTaskTpu

    level = 3
    fe_param, params = bfv_params(args.n, args.toy)
    task_dir = tempfile.mkdtemp(prefix='bfv_mult_task_')

    # --- compile (frontend) ---
    ct.set_fhe_param(fe_param)
    x = ct.BfvCiphertextNode('x', level)
    y = ct.BfvCiphertextNode('y', level)
    z = ct.mult_relin(x, y, 'z')
    ct.process_custom_task([ct.Argument('x', x), ct.Argument('y', y)],
                           [ct.Argument('z', z)], output_instruction_path=task_dir)
    print(f'task compiled -> {task_dir}')

    # --- run (runtime) ---
    context = BfvContext.create_random_context(params, seed=1)
    task = FheTaskTpu(task_dir)

    a = np.full(params.n, 3, dtype=np.uint64)
    b = np.full(params.n, 5, dtype=np.uint64)
    ea = context.encrypt(context.encode(a, level))
    eb = context.encrypt(context.encode(b, level))
    outputs, dur_ns = task.run(context, {'x': ea, 'y': eb})
    got = context.decrypt_decode(outputs['z'])
    print(f'3 * 5 = {got[0]} (task ran in {dur_ns/1e6:.1f} ms)')
    assert (got == 15).all(), 'decryption mismatch'
    print('OK')
    return 0


if __name__ == '__main__':
    sys.exit(main())
