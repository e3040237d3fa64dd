"""Nested-vmap flattening for Pallas kernel dispatch.

The kernels dispatch through jax.custom_vmap: the INNERMOST vmap fires the
rule and lowers to a pallas_call padded to 128-lane tiles. Any FURTHER vmap
layer (MPC solves over samples, FD linearization over perturbations, line
search over step sizes) then batches that already-padded call through
jax's mechanical pallas batching rule — every extra layer multiplies the
padding waste (a K=32 inner batch pads 4x; a 4-alpha line search pads 32x).

`flat_batched(fn)` wraps the single-batch-dim pallas path in ANOTHER
custom_vmap whose rule merges each new vmap layer into the leading batch
dim and recurses into itself — so no matter how deeply the call is nested
in vmaps, the kernel always sees ONE flat, fully-packed batch axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.custom_batching import custom_vmap


def flat_batched(fn):
    """fn: callable taking ARRAY args with ONE leading batch dim, returning
    a pytree of arrays with the same leading batch dim. Returns a wrapped
    callable that collapses any number of stacked vmap axes into that
    single batch dim before calling fn."""

    @custom_vmap
    def g(*args):
        return fn(*args)

    @g.def_vmap
    def _rule(axis_size, in_batched, *args):
        def bc(x, b):
            return x if b else jnp.broadcast_to(x[None], (axis_size,) + x.shape)

        args = [bc(a, b) for a, b in zip(args, in_batched)]

        def flat(x):
            return x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])

        out = g(*[flat(a) for a in args])  # recurse: still one batch dim

        def unflat(x):
            return x.reshape((axis_size, x.shape[0] // axis_size) + x.shape[1:])

        out = jax.tree_util.tree_map(unflat, out)
        return out, jax.tree_util.tree_map(lambda _: True, out)

    return g
