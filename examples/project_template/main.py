"""Standalone consumer template (reference parity: examples/project_template
— the minimal skeleton of an application built on the framework).

Copy this directory out of the repo, point PYTHONPATH (or pip install
lattisense-tpu once packaged) at the framework, and fill in your own task.
"""

import sys
import tempfile

import numpy as np

from lattisense_tpu.frontend import custom_task as ct
from lattisense_tpu.params import BfvParams
from lattisense_tpu.runtime import BfvContext, FheTaskTpu


def main():
    n, level = 16384, 1
    task_dir = tempfile.mkdtemp(prefix='my_task_')

    # 1. describe the FHE computation
    ct.set_fhe_param(ct.BfvParam.create_default_param(n=n))
    x = ct.BfvCiphertextNode('x', level)
    y = ct.BfvPlaintextNode('y', level)
    z = ct.add(x, y, 'z')
    ct.process_custom_task([ct.Argument('x', x), ct.Argument('y', y)],
                           [ct.Argument('z', z)], output_instruction_path=task_dir)

    # 2. create a context + keys, run the compiled task
    context = BfvContext.create_random_context(BfvParams.create(n))
    task = FheTaskTpu(task_dir)
    a = np.arange(n, dtype=np.uint64) % context.params.t
    b = np.ones(n, dtype=np.uint64)
    outputs, _ = task.run(context, {
        'x': context.encrypt(context.encode(a, level)),
        'y': context.encode(b, level),
    })
    print('first slots:', context.decrypt_decode(outputs['z'])[:4])
    return 0


if __name__ == '__main__':
    sys.exit(main())
