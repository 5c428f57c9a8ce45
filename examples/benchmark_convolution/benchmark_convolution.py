"""Packed-channel CKKS conv2d benchmark (reference parity:
examples/benchmark_convolution — multiple channels packed into one
ciphertext's slots; kernel positions realized as slot rotations; one
ct×pt MAC per (input-channel, kernel-position); cyclic boundary
semantics like the reference).

Runs the layer end-to-end through the compiled-task path and verifies the
decrypted feature map against a plain simulation of the identical packed
computation.
"""

import math
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _common import ckks_params, example_args  # noqa: E402

import numpy as np  # noqa: E402


class Conv2DPackedLayer:
    """Channel-packed conv2d graph builder (reference Conv2DPackedLayer)."""

    def __init__(self, ct, n_channel, input_shape, kernel_shape, pack):
        self.ct = ct
        self.n_channel = n_channel
        self.h, self.w = input_shape
        self.kh, self.kw = kernel_shape
        self.pack = pack                      # channels per ciphertext
        self.ch_stride = self.h * self.w      # slots per channel
        self.pad_h, self.pad_w = self.kh // 2, self.kw // 2

    def _rotations_2_sides(self, x, n_rot, unit):
        ct = self.ct
        if n_rot == 0:
            return [x]
        steps = [-i * unit for i in range(1, n_rot + 1)] + \
                [i * unit for i in range(1, n_rot + 1)]
        r = ct.rotate_cols(x, steps)
        return list(reversed(r[:n_rot])) + [x] + r[n_rot:]

    def rotation_steps(self):
        """All rotation steps the layer needs (for key generation)."""
        steps = set()
        for i in range(1, self.pack):
            steps.add(i * self.ch_stride)
        for i in range(1, self.pad_h + 1):
            steps.update({i * self.w, -i * self.w})
        for i in range(1, self.pad_w + 1):
            steps.update({i, -i})
        return sorted(steps)

    def build(self, x, weight_pt, bias_pt):
        """x: packed input ct node; weights[pack][kh*kw] pt nodes; bias pt."""
        ct = self.ct
        # channel alignment rotations then spatial rotations per channel
        chan_rots = [x] + (ct.rotate_cols(
            x, [i * self.ch_stride for i in range(1, self.pack)])
            if self.pack > 1 else [])
        partial = None
        for c, xc in enumerate(chan_rots):
            rows = self._rotations_2_sides(xc, self.pad_h, self.w)
            for i, xr in enumerate(rows):
                cols = self._rotations_2_sides(xr, self.pad_w, 1)
                for j, xrc in enumerate(cols):
                    prod = ct.mult(xrc, weight_pt[c][i * self.kw + j])
                    partial = prod if partial is None else ct.add(partial, prod)
        out = ct.add(ct.rescale(partial), bias_pt)
        return out


def plain_packed_conv(xv, weights, bias, layer):
    """Plain simulation with identical cyclic-rotation semantics."""
    acc = np.zeros_like(xv)
    for c in range(layer.pack):
        xc = np.roll(xv, -c * layer.ch_stride)
        for i in range(-layer.pad_h, layer.pad_h + 1):
            for j in range(-layer.pad_w, layer.pad_w + 1):
                idx = (i + layer.pad_h) * layer.kw + (j + layer.pad_w)
                acc = acc + np.roll(xc, -(i * layer.w + j)) * weights[c][idx]
    return acc + bias


def main():
    args = example_args('packed CKKS conv2d layer')
    import time
    from lattisense_tpu.frontend import custom_task as fct
    from lattisense_tpu.runtime import CkksContext, FheTaskTpu

    fe_param, rt_params = ckks_params(args.n, args.toy)
    slots = rt_params.slots
    if args.toy:
        input_shape, kernel = (4, 4), (3, 3)
    else:
        input_shape, kernel = (32, 32), (3, 3)
    pack = max(1, min(4, slots // (input_shape[0] * input_shape[1])))
    level = 2
    task_dir = tempfile.mkdtemp(prefix='conv2d_task_')

    fct.set_fhe_param(fe_param)
    layer = Conv2DPackedLayer(fct, pack, input_shape, kernel, pack)
    x = fct.CkksCiphertextNode('x', level)
    weight_pt = [[fct.CkksPlaintextNode(f'w_{c}_{k}', level)
                  for k in range(kernel[0] * kernel[1])] for c in range(pack)]
    bias_pt = fct.CkksPlaintextNode('b', level - 1)
    y = layer.build(x, weight_pt, bias_pt)
    fct.process_custom_task(
        [fct.Argument('x', x), fct.Argument('w', weight_pt), fct.Argument('b', bias_pt)],
        [fct.Argument('y', y)], output_instruction_path=task_dir)

    context = CkksContext.create_random_context(rt_params, seed=17)
    context.gen_rotation_keys_for_rotations(layer.rotation_steps())
    task = FheTaskTpu(task_dir)

    rng = np.random.default_rng(0)
    xv = np.zeros(slots)
    used = pack * layer.ch_stride
    xv[:used] = rng.uniform(-1, 1, used)
    weights = rng.uniform(-1, 1, (pack, kernel[0] * kernel[1]))
    bias = rng.uniform(-1, 1)
    u_scale = rt_params.scale ** 2 / rt_params.q[level]

    inputs = {
        'x': context.encrypt(context.encode(xv, level)),
        'w': [[context.encode(np.full(slots, wv), level) for wv in wc]
              for wc in weights],
        'b': context.encode(np.full(slots, bias), level - 1, scale=u_scale),
    }
    t0 = time.perf_counter()
    outputs, dur_ns = task.run(context, inputs)
    got = context.decrypt_decode(outputs['y']).real
    expected = plain_packed_conv(xv, weights, bias, layer)
    err = np.max(np.abs(got - expected))
    macs = pack * kernel[0] * kernel[1]
    print(f'conv2d {input_shape[0]}x{input_shape[1]} pack={pack} '
          f'{kernel[0]}x{kernel[1]}: {macs} ct-pt MACs, {dur_ns/1e6:.1f} ms, '
          f'max err {err:.2e}')
    assert err < 1e-2, 'conv mismatch'
    print('OK')


if __name__ == '__main__':
    main()
