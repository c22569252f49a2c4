"""Layer-stacked ("scan") parameter layout converters.

The flagship stacks (EVA ViT-g's 39 blocks, Flan-T5's 24+24 blocks) run
under ``flax.linen.scan`` so XLA compiles ONE block body instead of a
program linear in depth — round 4's 898 s cold compile of the train step
was almost entirely unrolled-depth tracing/compilation. Scanned modules
store their per-layer parameters STACKED along a leading layer axis:

    flat (unrolled) layout              stacked (scan) layout
    visual_encoder/blocks_0/attn/...    visual_encoder/blocks/attn/...
    ...                                   (leading axis = 39)
    t5/encoder/block_0/self_attention   t5/encoder/block/self_attention
    ...                                   (leading axis = 24)

These helpers convert between the two layouts so torch-weight ports,
old checkpoints, and per-layer parity tests (which naturally produce the
flat layout) interoperate with scan models and vice versa. Conversion is
pure ``jnp.stack``/slice — bit-exact both ways.
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp
import numpy as np


def _stack_group(tree: dict, prefix: str, stacked_name: str) -> dict:
    """Replace ``{prefix}{i}`` sibling subtrees with one stacked subtree."""
    pat = re.compile(re.escape(prefix) + r"(\d+)$")
    idx = sorted(
        (int(m.group(1)), k)
        for k in tree
        if (m := pat.match(k)) is not None
    )
    if not idx:
        return dict(tree)
    assert [i for i, _ in idx] == list(range(len(idx))), (
        f"non-contiguous layer indices under {prefix}*: {idx}")
    layers = [tree[k] for _, k in idx]
    out = {k: v for k, v in tree.items() if not pat.match(k)}
    out[stacked_name] = jax.tree.map(
        lambda *xs: (np.stack(xs) if isinstance(xs[0], np.ndarray)
                     else jnp.stack(xs)),
        *layers,
    )
    return out


def _unstack_group(tree: dict, stacked_name: str, prefix: str) -> dict:
    """Replace one stacked subtree with ``{prefix}{i}`` sibling subtrees."""
    if stacked_name not in tree:
        return dict(tree)
    stacked = tree[stacked_name]
    depth = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    out = {k: v for k, v in tree.items() if k != stacked_name}
    for i in range(depth):
        out[f"{prefix}{i}"] = jax.tree.map(lambda x: x[i], stacked)
    return out


# --------------------------------------------------------------- ViT (EVA)

def stack_vit_blocks(vit_params: dict) -> dict:
    """``blocks_0..N-1`` -> stacked ``blocks`` (ViTConfig.scan_layers)."""
    return _stack_group(vit_params, "blocks_", "blocks")


def unstack_vit_blocks(vit_params: dict) -> dict:
    return _unstack_group(vit_params, "blocks", "blocks_")


# --------------------------------------------------------------------- T5

def stack_t5_blocks(t5_params: dict, encoder: bool = True,
                    decoder: bool = True) -> dict:
    """encoder/decoder ``block_0..N-1`` -> stacked ``block``
    (T5Config.scan_layers; per-side for scan_layers="encoder"/"decoder")."""
    out = dict(t5_params)
    sides = (("encoder",) if encoder else ()) + (
        ("decoder",) if decoder else ())
    for side in sides:
        if side in out:
            out[side] = _stack_group(out[side], "block_", "block")
    return out


def unstack_t5_blocks(t5_params: dict) -> dict:
    out = dict(t5_params)
    for side in ("encoder", "decoder"):
        if side in out:
            out[side] = _unstack_group(out[side], "block", "block_")
    return out


# ---------------------------------------------------- flagship param trees

def stack_blip2_mr_params(params: dict, vit_scan: bool = True,
                          t5_scan=True) -> dict:
    """Flat flagship tree -> the layout a scan-enabled BLIP2_MR expects.

    ``t5_scan`` mirrors T5Config.scan_layers: True/False or
    "encoder"/"decoder" to stack only that side (model.scan_t5 passes
    through verbatim)."""
    out = dict(params)
    if vit_scan and "visual_encoder" in out:
        out["visual_encoder"] = stack_vit_blocks(out["visual_encoder"])
    if t5_scan and "t5" in out:
        out["t5"] = stack_t5_blocks(
            out["t5"],
            encoder=t5_scan in (True, "encoder"),
            decoder=t5_scan in (True, "decoder"),
        )
    return out


def unstack_blip2_mr_params(params: dict) -> dict:
    out = dict(params)
    if "visual_encoder" in out:
        out["visual_encoder"] = unstack_vit_blocks(out["visual_encoder"])
    if "t5" in out:
        out["t5"] = unstack_t5_blocks(out["t5"])
    return out


def is_stacked(section: dict, stacked_name: str) -> bool:
    return stacked_name in section


def match_scan_layout(loaded: dict, target: dict) -> dict:
    """Convert flat<->stacked block groups in ``loaded`` so its layout
    matches ``target`` (both nested state dicts).

    Used by non-strict checkpoint loading: a flat-layout file (old
    checkpoint, torch port) restores cleanly over a scan model and vice
    versa. Only the known scan group names convert ("blocks_{i}" <->
    "blocks", "block_{i}" <-> "block"); everything else passes through.
    """
    def walk(l, t):
        if not (isinstance(l, dict) and isinstance(t, dict)):
            return l
        out = dict(l)
        for name, prefix in (("blocks", "blocks_"), ("block", "block_")):
            if name in t and name not in out and f"{prefix}0" in out:
                out = _stack_group(out, prefix, name)
            elif f"{prefix}0" in t and name in out and f"{prefix}0" not in out:
                out = _unstack_group(out, name, prefix)
        return {k: (walk(v, t[k]) if k in t else v) for k, v in out.items()}

    return walk(loaded, target)
