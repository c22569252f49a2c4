"""Parameter sharding rules for the (dp, tp) mesh.

Megatron-style tensor parallelism for the T5/OPT stacks, applied as
param-path -> PartitionSpec rules (GSPMD derives the activation shardings
and inserts the psum/all-gather collectives over ICI):

* attention q/k/v kernels  (d_model, inner)  -> shard inner over tp
* attention o kernel       (inner, d_model)  -> shard inner over tp
* FFN up projections       (d_model, d_ff)   -> shard d_ff over tp
* FFN down projection      (d_ff, d_model)   -> shard d_ff over tp
* lm_head                  (d_model, vocab)  -> shard vocab over tp
* everything else (embeddings, norms, ViT, Q-Former, LoRA) replicated —
  the vision tower is frozen and small relative to T5-XXL.

This is the TPU-idiomatic extension the reference lacks (it is DP-only,
SURVEY §2.4); it exists to fit Flan-T5-XXL training on a pod slice.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COLUMN_PARALLEL = ("q", "k", "v", "wi", "wi_0", "wi_1", "lm_head",
                    "q_proj", "k_proj", "v_proj", "fc1")
_ROW_PARALLEL = ("o", "wo", "out_proj", "fc2")


def param_spec(path, ndim: int = 2) -> P:
    """PartitionSpec for one parameter, from its pytree path.

    ``ndim``: rank of the leaf — scan-over-layers kernels carry a leading
    layer axis (L, in, out), so the tp axis is always counted from the
    BACK (column-parallel shards the last dim, row-parallel the
    second-to-last)."""
    keys = [str(getattr(p, "key", p)) for p in path]
    leaf = keys[-1]
    if leaf != "kernel" or "lora_" in str(keys):
        return P()
    # the Dense module name sits right above Dense_0/kernel
    owner = keys[-3] if len(keys) >= 3 else ""
    if owner in _COLUMN_PARALLEL:
        return P(*([None] * (ndim - 1) + ["tp"]))
    if owner in _ROW_PARALLEL:
        return P(*([None] * (ndim - 2) + ["tp", None]))
    return P()


def shard_params(params, mesh: Mesh):
    """Place a param tree on the mesh according to the TP rules."""

    def place(path, leaf):
        spec = param_spec(path, ndim=getattr(leaf, "ndim", 2))
        # guard: only shard dims that divide the mesh axis
        if spec != P():
            tp = mesh.shape["tp"]
            dim = spec.index("tp")
            if leaf.shape[dim] % tp != 0:
                spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def describe_sharding(params, mesh: Mesh) -> dict:
    """{path: spec} for logging/debugging."""
    out = {}

    def fn(path, leaf):
        spec = param_spec(path, ndim=getattr(leaf, "ndim", 2))
        if spec != P():
            out["/".join(str(getattr(p, "key", p)) for p in path)] = str(spec)
        return leaf

    jax.tree_util.tree_map_with_path(fn, params)
    return out
