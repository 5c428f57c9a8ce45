"""Kernel-level (limb/digit) sharded hybrid key switching.

The genuine new capability vs the reference (SURVEY.md §5 "it never splits
one ciphertext across devices"): one key switch distributed over the mesh's
``limb`` axis with explicit ICI collectives:

- the β gadget digits are computed *independently* per device (digit axis
  sharded): each digit's FastBConv mod-up and its (T, n) NTT run locally —
  the dominant FLOPs parallelize with zero communication;
- keys are sharded the same way, so the gadget inner product is a local
  partial sum; one ``psum_scatter`` both reduces over devices and lands
  the accumulator sharded over the T = L+|P| output-limb axis — factor-D
  less traffic than an all-reduce;
- the INTT of the accumulator then runs locally per output-limb shard;
- the final mod-down needs the |P| special limbs everywhere: one small
  ``all_gather`` of the scattered P-shard rows.

Per-device compute drops from O(β·T·n·log n) to O((β/D)·T·n·log n +
(T/D)·n·log n); ICI moves 2·T·n/D + |P|·n words.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import ntt as ntt_mod
from ..core import u64 as _u
from ..core.modring import get_rns_ring


def _pad_axis(x, axis, size):
    if x.shape[axis] == size:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, size - x.shape[axis])
    return np.pad(x, widths) if isinstance(x, np.ndarray) else jnp.pad(x, widths)


class ShardedKeySwitcher:
    """Digit/limb-sharded twin of schemes.keyswitch.KeySwitcher.switch.

    Built for a fixed (mesh, level); produces a jitted callable over
    (x, key_q, key_p) with the digit axis padded to a multiple of the
    ``limb`` mesh axis.
    """

    def __init__(self, switcher, level: int, mesh: Mesh):
        self.sw = switcher
        self.level = level
        self.mesh = mesh
        self.D = mesh.shape['limb']
        L = level + 1
        self.L = L
        self.n = switcher.n
        self.alpha = switcher.alpha
        self.beta = switcher.beta(level)
        self.beta_pad = -(-self.beta // self.D) * self.D
        qp = switcher.q_moduli[:L] + switcher.p_moduli
        self.T = len(qp)
        self.ring_qp = get_rns_ring(qp, self.n)
        self.ring_q = get_rns_ring(switcher.q_moduli[:L], self.n)
        # per-digit constants, padded on the digit axis (zeros annihilate)
        pre = switcher._level_pre(level)
        (_, qhat_inv, qhat_inv_shoup, src_q, qhat_conv, self.round_div) = pre
        self.qhat_inv = _pad_axis(qhat_inv, 0, self.beta_pad)
        self.qhat_inv_shoup = _pad_axis(qhat_inv_shoup, 0, self.beta_pad)
        self.src_q = _pad_axis(np.broadcast_to(src_q, qhat_inv.shape).copy(),
                               0, self.beta_pad) + np.uint64(0)
        self.src_q[self.beta:] = 1          # avoid mod-0 in padded digits
        self.qhat_conv = _pad_axis(qhat_conv, 0, self.beta_pad)
        # T padded to a multiple of D for the psum_scatter tiling
        self.T_pad = -(-self.T // self.D) * self.D
        self._call = self._build()

    # ------------------------------------------------------------------
    def pad_keys(self, key_q, key_p):
        """(β, 2, Lq_full, n) keys → concatenated (β_pad, 2, T_pad, n)."""
        kq = np.asarray(key_q)[:self.beta, :, :self.L]
        kp = np.asarray(key_p)[:self.beta]
        kd = np.concatenate([kq, kp], axis=2)
        kd = _pad_axis(kd, 0, self.beta_pad)
        return _pad_axis(kd, 2, self.T_pad)

    def _build(self):
        sw, D = self.sw, self.D
        L, n, T, T_pad = self.L, self.n, self.T, self.T_pad
        alpha, beta_pad = self.alpha, self.beta_pad
        ring_qp, ring_q = self.ring_qp, self.ring_q
        qp_q = np.asarray(ring_qp.q)                      # (T, 1)
        qp_q_pad = _pad_axis(qp_q, 0, T_pad) + np.uint64(0)
        qp_q_pad[T:] = 1
        qp_pinv_pad = _pad_axis(np.asarray(ring_qp.pinv), 0, T_pad) + np.uint64(0)
        qp_pinv_pad[T:] = 1                               # padded rows discarded

        consts = dict(
            qhat_inv=self.qhat_inv, qhat_inv_shoup=self.qhat_inv_shoup,
            src_q=self.src_q, qhat_conv=self.qhat_conv)

        def local(x, kd, qhat_inv, qhat_inv_shoup, src_q, qhat_conv):
            """Per-device body. x: (L_pad_src…, n) replicated; kd digit
            shard (β/D, 2, T_pad, n); constants digit-sharded."""
            # digit decomposition of the local digit group(s)
            pad = beta_pad * alpha - L
            xg = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
            xg = xg.reshape(beta_pad, alpha, n)
            my = jax.lax.axis_index('limb')
            bD = beta_pad // D
            xg = jax.lax.dynamic_slice_in_dim(xg, my * bD, bD, axis=0)
            y = _u.shoup_mul(jnp, xg, qhat_inv, qhat_inv_shoup, src_q)
            terms = _u.mont_mul(jnp, y[:, None, :, :], qhat_conv[:, :, :, None],
                                qp_q[:, :, None], np.asarray(ring_qp.pinv)[:, :, None])
            xd = _u.modsum_tree(jnp, terms, qp_q[:, :, None], axis=-2)
            xd = ntt_mod.ntt(jnp, xd, ring_qp)            # (β/D, T, n)
            xd = jnp.pad(xd, ((0, 0), (0, T_pad - T), (0, 0)))
            # local gadget inner product over this shard's digits
            terms = _u.mont_mul(jnp, xd[:, None, :, :], kd, qp_q_pad, qp_pinv_pad)
            acc = _u.modsum_tree(jnp, terms, qp_q_pad, axis=0)   # (2, T_pad, n)
            # reduce over devices + scatter the T axis: each device gets
            # (2, T_pad/D, n) fully-summed rows. Row sums < D·q < 2^64.
            acc = jax.lax.psum_scatter(acc, 'limb', scatter_dimension=1,
                                       tiled=True)
            # fold the ≤ D·q overflow back below q (log2 D conditional subs)
            q_loc = jax.lax.dynamic_slice_in_dim(
                jnp.asarray(qp_q_pad), my * (T_pad // D), T_pad // D, axis=0)
            d = D
            while d > 1:
                d //= 2
                over = acc >= q_loc * jnp.uint64(d)
                acc = jnp.where(over, acc - q_loc * jnp.uint64(d), acc)
            acc = jnp.where(acc >= q_loc, acc - q_loc, acc)
            return acc

        in_specs = (P(), P('limb'), P('limb'), P('limb'), P('limb'), P('limb'))
        shard_fn = jax.jit(jax.shard_map(
            functools.partial(local),
            mesh=self.mesh, in_specs=in_specs, out_specs=P(None, 'limb', None),
            check_vma=False))

        def call(x, kd):
            acc = shard_fn(x, kd, consts['qhat_inv'], consts['qhat_inv_shoup'],
                           consts['src_q'], consts['qhat_conv'])
            acc = np.asarray(acc)[:, :T, :]
            # host-side epilogue (INTT + mod-down); device epilogue follows
            # the same sharding in the fused pipeline
            c = ntt_mod.intt(np, acc, ring_qp)
            e = self.round_div(np, c[..., :L, :], c[..., L:, :])
            return e[0], e[1]

        return call

    def __call__(self, x, key_q, key_p):
        """x: (L, n) coeff-domain numpy; returns (e0, e1) over Q_ℓ —
        bit-identical to KeySwitcher.switch."""
        kd = self.pad_keys(key_q, key_p)
        return self._call(np.asarray(x), kd)
