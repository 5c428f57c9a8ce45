"""jit with closure constants lifted to runtime arguments.

`jax.jit` embeds closed-over arrays (NTT twiddle tables, encoded DFT
diagonals, key material captured by a segment closure) as literal
constants in the serialized HLO. On the axon tunnel the remote compile
service rejects large request bodies (HTTP 413) — a full-profile
(n=2^16) bootstrap segment carries hundreds of MB of such constants and
cannot be submitted at all, even though the compiled program itself is
fine (the toy-profile anatomy is in NOTES.md round-4 session-2).

`jit_lifted(g)` closes that hole generically: trace ``g`` once with
`jax.make_jaxpr` (which hoists every captured array into the jaxpr's
``consts``), `device_put` the consts ONCE, and compile a wrapper whose
XLA signature takes them as ordinary parameters. The serialized program
then contains no big literals; steady-state behavior is identical (the
tables live in HBM either way — as executable-embedded buffers before,
as argument buffers now).

No reference analog (the reference's runtime never serializes programs
— graphs are interpreted against Lattigo/HEonGPU calls); this is
TPU-runtime plumbing for the remote-compiler deployment model.
"""

import functools

import jax
import jax.numpy as jnp


def _tree_flatten(args):
    return jax.tree_util.tree_flatten(args)


def jit_lifted(g, static_argnums=()):
    """Return a callable equivalent to ``jax.jit(g)`` whose compiled
    program takes all closure constants as runtime arguments.

    The jaxpr is cached per (flattened input shapes/dtypes, tree
    structure); consts are device_put once per cache entry. ``g`` may
    take / return arbitrary pytrees of arrays."""
    assert not static_argnums, 'static args not supported'
    cache: dict = {}

    def call(*args):
        flat, in_tree = jax.tree_util.tree_flatten(args)
        key = (in_tree, tuple((tuple(a.shape), str(jnp.asarray(a).dtype))
                              for a in flat))
        ent = cache.get(key)
        if ent is None:
            def gf(*flat_args):
                return g(*jax.tree_util.tree_unflatten(in_tree, flat_args))

            closed, out_shape = jax.make_jaxpr(gf, return_shape=True)(*flat)
            out_tree = jax.tree_util.tree_structure(out_shape)
            consts = [jax.device_put(c) for c in closed.consts]
            jaxpr = closed.jaxpr

            @jax.jit
            def run(consts, *flat_args):
                outs = jax.core.eval_jaxpr(jaxpr, consts, *flat_args)
                return jax.tree_util.tree_unflatten(out_tree, outs)

            cache[key] = ent = (run, consts)
        run, consts = ent
        return run(consts, *flat)

    return call
