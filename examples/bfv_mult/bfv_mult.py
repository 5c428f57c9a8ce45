"""Example: BFV homomorphic multiply, end-to-end through the compiled-task
path (reference example parity: examples/bfv_mult_cpu/bfv_mult_cpu.{py,cpp}).

Compile step: build the Erg graph and emit the task directory.
Run step: create a context, encrypt, execute the jitted task, decrypt.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', '..'))

import numpy as np

from lattisense_tpu.frontend import custom_task as ct
from lattisense_tpu.params import BfvParams
from lattisense_tpu.runtime import BfvContext, FheTaskTpu


def main():
    n, level = 16384, 3
    task_dir = tempfile.mkdtemp(prefix='bfv_mult_task_')

    # --- compile (frontend) ---
    ct.set_fhe_param(ct.BfvParam.create_default_param(n=n))
    x = ct.BfvCiphertextNode('x', level)
    y = ct.BfvCiphertextNode('y', level)
    z = ct.mult_relin(x, y, 'z')
    ct.process_custom_task([ct.Argument('x', x), ct.Argument('y', y)],
                           [ct.Argument('z', z)], output_instruction_path=task_dir)
    print(f'task compiled -> {task_dir}')

    # --- run (runtime) ---
    params = BfvParams.create(n)
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
