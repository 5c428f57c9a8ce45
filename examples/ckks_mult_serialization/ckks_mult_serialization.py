"""Example: 2-party client/server encrypted computation over serialized
bytes (reference parity: examples/ckks_mult_serialization_cpu — the
client keeps the secret key; the server computes on deserialized state)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _common import ckks_params, example_args  # noqa: E402

import numpy as np  # noqa: E402


def client_phase_0(rt_params, level):
    from lattisense_tpu.runtime import CkksContext
    ctx = CkksContext.create_random_context(rt_params, seed=3)
    x_ct = ctx.encrypt(ctx.encode(np.array([5.0, 10.0]), level))
    y_ct = ctx.encrypt(ctx.encode(np.array([2.0, 3.0]), level))
    public_ctx_bin = ctx.make_public_context().serialize_advanced()
    return (ctx, public_ctx_bin, ctx.serialize_ciphertext(x_ct),
            ctx.serialize_ciphertext(y_ct))


def server_phase_1(ctx_bin: bytes, x_bin: bytes, y_bin: bytes) -> bytes:
    from lattisense_tpu.runtime import CkksContext
    public_context = CkksContext.deserialize(ctx_bin)
    x_ct = public_context.deserialize_ciphertext(x_bin)
    y_ct = public_context.deserialize_ciphertext(y_bin)
    z_ct = public_context.relinearize(public_context.mult(x_ct, y_ct))
    return public_context.serialize_ciphertext(z_ct)


def client_phase_2(ctx, z_bin: bytes):
    z_ct = ctx.deserialize_ciphertext(z_bin)
    return ctx.decrypt_decode(z_ct).real[:2]


def main():
    args = example_args('CKKS two-party encrypted computation with serialization')
    _, rt_params = ckks_params(args.n, args.toy)
    level = 3
    ctx, public_ctx_bin, x_bin, y_bin = client_phase_0(rt_params, level)
    print(f'client -> server: context {len(public_ctx_bin)} B, '
          f'cts {len(x_bin)} + {len(y_bin)} B')
    z_bin = server_phase_1(public_ctx_bin, x_bin, y_bin)
    print(f'server -> client: {len(z_bin)} B')
    got = client_phase_2(ctx, z_bin)
    print(f'z = {np.round(got, 4)}')
    assert np.allclose(got, [10.0, 30.0], atol=1e-2)
    print('OK')


if __name__ == '__main__':
    main()
