"""Device mesh construction and sharding placement.

The TPU-native replacement for the reference's DDP/NCCL layer
(``lavis/common/dist_utils.py`` + ``runner_base.py:89-96``): instead of
per-GPU processes with bucketed allreduce, we build one
``jax.sharding.Mesh`` with axes

    dp — data parallel (batch axis; gradient psum rides ICI)
    tp — tensor parallel (reserved for T5-XXL weight sharding)

and let GSPMD insert collectives from sharding annotations.  Parameters are
replicated across ``dp`` and the batch is sharded on its leading axis; with
``tp > 1`` the heavy T5 matmuls are sharded over ``tp`` via logical rules
(see :mod:`mr_blip_tpu.parallel.sharding_rules`).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int | None = None, tp: int = 1, devices=None) -> Mesh:
    """Build a (dp, tp) mesh over available devices.

    ``dp=None`` uses all devices not consumed by ``tp``.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
        dp = n // tp
    assert dp * tp <= n, f"mesh {dp}x{tp} needs {dp*tp} devices, have {n}"
    grid = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(grid, axis_names=("dp", "tp"))


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch, mesh: Mesh):
    """Shard every array's leading axis over ``dp`` (replicate scalars)."""

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, NamedSharding(mesh, P("dp")))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(place, batch)


def pad_batch_to_multiple(batch, multiple: int):
    """Pad the leading axis so it divides the dp mesh axis.

    Returns (padded_batch, real_count).  Padding repeats the last row; the
    loss weighting must use masks, so repeated rows only waste FLOPs on the
    final ragged step.
    """
    import numpy as np

    sizes = {x.shape[0] for x in jax.tree.leaves(batch) if hasattr(x, "shape") and x.ndim}
    assert len(sizes) == 1, f"inconsistent leading axes: {sizes}"
    b = sizes.pop()
    target = ((b + multiple - 1) // multiple) * multiple
    if target == b:
        return batch, b

    def pad(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            reps = np.repeat(x[-1:], target - b, axis=0)
            return np.concatenate([x, reps], axis=0)
        return x

    return jax.tree.map(pad, batch), b
