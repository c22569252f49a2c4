"""Pipeline parallelism: GPipe-style microbatch schedule over a mesh axis.

The reference is data-parallel only; this is a TPU-native scaling extension
for models whose layer stacks exceed one chip (T5-XXL decoder/encoder at
long context). Stages live on different devices along the ``pp`` mesh axis;
activations flow stage-to-stage over ICI via ``ppermute`` inside a
``shard_map``, with the classic (S + M - 1)-step schedule: microbatch m
occupies stage s at step t = m + s.

Everything is ``lax.scan``-based, so ``jax.grad`` differentiates straight
through the schedule (the transpose of ``ppermute`` is the reverse
``ppermute``) — a pipelined *training* step needs no extra machinery.

Typical use (see tests/test_pipeline.py and __graft_entry__.dryrun_multichip):

    stacked = stack_stage_params([p_0, ..., p_{S-1}])   # leading stage axis
    stacked = jax.device_put(stacked, NamedSharding(mesh, P("pp")))
    y = pipeline_apply(block_fn, stacked, x, mesh, axis="pp",
                       num_microbatches=M)
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P


def stack_stage_params(per_stage_params):
    """[tree_0, ..., tree_{S-1}] -> one tree with a leading stage axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_stage_params)


def pipeline_apply(
    stage_fn: Callable,
    stacked_params,
    x,
    mesh,
    axis: str = "pp",
    num_microbatches: int | None = None,
    extras=(),
):
    """Run ``stage_fn`` as a pipeline over the ``axis`` mesh dimension.

    Args:
        stage_fn: ``(stage_params, activations, *extras) -> activations``
            for one stage; activations keep a constant structure/shape
            across stages.
        stacked_params: pytree whose leaves have a leading stage axis of
            size = mesh.shape[axis], sharded over ``axis``.
        x: pytree of (B, ...) arrays (replicated across ``axis``); every
            leaf is microbatched on its leading axis and flows stage to
            stage (activations plus any per-sample aux like masks or
            encoder states for cross-attention).
        num_microbatches: M >= S; defaults to S. B must divide by M.
        extras: pytree of arrays shared by every microbatch (e.g. the T5
            rel-pos bias) — replicated, passed to ``stage_fn`` verbatim.

    Returns:
        pytree of (B, ...) outputs after all S stages.
    """
    n_stages = mesh.shape[axis]
    m = num_microbatches or n_stages
    leaves = jax.tree.leaves(x)
    b = leaves[0].shape[0]
    assert all(l.shape[0] == b for l in leaves), "inconsistent leading axes"
    assert b % m == 0, f"batch {b} must divide into {m} microbatches"
    mb = b // m

    def stage_program(params, x_local, extras_local):
        # params: this device's stage slice — shard_map keeps the sharded
        # leading axis at local size 1; strip it. x_local: full batch
        # (replicated over pp).
        params = jax.tree.map(lambda p: p[0], params)
        stage_id = jax.lax.axis_index(axis)
        micro = jax.tree.map(
            lambda a: a.reshape((m, mb) + a.shape[1:]), x_local
        )

        # state: the activation currently being processed by this stage
        state0 = jax.tree.map(
            lambda a: jnp.zeros((mb,) + a.shape[1:], a.dtype), x_local
        )
        out0 = jax.tree.map(jnp.zeros_like, micro)

        def step(carry, t):
            state, outs = carry
            # stage 0 injects microbatch t (when one remains); other stages
            # use what arrived from the left neighbor last step.
            inject = jax.tree.map(lambda mi: mi[jnp.minimum(t, m - 1)], micro)
            state = jax.tree.map(
                lambda i, s: jnp.where(stage_id == 0, i, s), inject, state
            )
            new = stage_fn(params, state, *extras_local)
            # pass to the right neighbor (last stage's send is ignored by
            # stage 0's where-inject next step)
            perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
            passed = jax.tree.map(
                lambda a: jax.lax.ppermute(a, axis, perm), new
            )
            # last stage banks finished microbatch t - (S - 1)
            out_idx = t - (n_stages - 1)
            valid = (stage_id == n_stages - 1) & (out_idx >= 0)
            outs = jax.lax.cond(
                valid,
                lambda o: jax.tree.map(
                    lambda oo, nn: jax.lax.dynamic_update_slice_in_dim(
                        oo, nn[None], jnp.maximum(out_idx, 0), axis=0
                    ), o, new,
                ),
                lambda o: o,
                outs,
            )
            return (passed, outs), None

        (state, outs), _ = jax.lax.scan(
            step, (state0, out0), jnp.arange(m + n_stages - 1)
        )
        # broadcast the last stage's outputs to every pp rank so the result
        # is replicated (psum of one-hot contribution)
        contribution = jax.tree.map(
            lambda o: jnp.where(stage_id == n_stages - 1, o,
                                jnp.zeros_like(o)), outs
        )
        outs = jax.lax.psum(contribution, axis)
        return jax.tree.map(
            lambda o: o.reshape((b,) + o.shape[2:]), outs
        )

    fn = shard_map(
        stage_program,
        mesh=mesh,
        in_specs=(P(axis), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(stacked_params, x, extras)


def sequential_reference(stage_fn, per_stage_params, x):
    """Ground truth: run the stages back-to-back on one device."""
    for p in per_stage_params:
        x = stage_fn(p, x)
    return x
