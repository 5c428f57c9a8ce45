"""Device-mesh construction for FHE sharding.

Axis vocabulary (SURVEY.md §2.8 "TPU-native equivalents"):

- ``op``   — graph-level sharding: independent ciphertext operations of a
  batch placed on different chips. Replaces the reference's 32-thread
  priority pool (cpu_task_utils.h:378) — FHE's "data parallelism".
- ``limb`` — kernel-level sharding: the RNS limb axis of a single
  ciphertext split across chips; base-conversion/key-switch limb products
  reduced with psum_scatter over ICI — FHE's "tensor parallelism".

``make_mesh(op=4, limb=2)`` builds a 2-D mesh from the available devices.
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(op: int | None = None, limb: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if op is None:
        op = n // limb
    if op * limb != n:
        raise ValueError(f'mesh {op}x{limb} does not match {n} devices')
    arr = np.asarray(devices).reshape(op, limb)
    return Mesh(arr, axis_names=('op', 'limb'))


def ct_batch_spec(limb_sharded: bool = False) -> P:
    """PartitionSpec for a batched ciphertext (B, degree+1, L, n)."""
    return P('op', None, 'limb' if limb_sharded else None, None)


def key_spec(limb_sharded: bool = False) -> P:
    """PartitionSpec for key-switch key halves (β, 2, L, n): replicated over
    ``op`` (every chip needs the keys), optionally limb-sharded."""
    return P(None, None, 'limb' if limb_sharded else None, None)


def shard(mesh: Mesh, x, spec: P):
    return jax.device_put(x, NamedSharding(mesh, spec))
