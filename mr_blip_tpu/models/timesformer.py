"""TimeSformer: divided space-time attention video transformer (flax).

Counterpart of the reference ``lavis/models/timesformer/vit.py:1-634``
(used by ALPRO): each block applies temporal attention (tokens attend
across frames at the same spatial location) then spatial attention (within
a frame), each with its own residual, then the MLP.  The cls token
participates in spatial attention per frame and is averaged across frames
for temporal steps.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from mr_blip_tpu.common.registry import registry
from mr_blip_tpu.models.layers import Dense, DropPath, LayerNormFP32, Mlp
from mr_blip_tpu.ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class TimeSformerConfig:
    img_size: int = 224
    patch_size: int = 16
    n_frms: int = 8
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    norm_eps: float = 1e-5  # torch nn.LayerNorm default (reference norm_layer)
    # reference vit.py:148-156: "divided_space_time" (default),
    # "joint_space_time" (one attention over all 1+T*P tokens),
    # "space_only" (frames processed independently, averaged at the end)
    attention_type: str = "divided_space_time"
    # stochastic depth, linear per-block ramp (reference vit.py:145,183:
    # default drop_path_rate 0.1 under timm DropPath)
    drop_path_rate: float = 0.0

    @property
    def patches_per_frame(self) -> int:
        return (self.img_size // self.patch_size) ** 2


def timesformer_base_config(**kw) -> TimeSformerConfig:
    return TimeSformerConfig(**kw)


def timesformer_tiny_config(**kw) -> TimeSformerConfig:
    defaults = dict(img_size=28, patch_size=14, n_frms=2, embed_dim=32,
                    depth=2, num_heads=2)
    defaults.update(kw)
    return TimeSformerConfig(**defaults)


class _MHA(nn.Module):
    dim: int
    heads: int
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, n, _ = x.shape
        qkv = Dense(3 * self.dim, compute_dtype=self.compute_dtype,
                    name="qkv")(x).reshape(b, n, 3, self.heads, -1)
        out = dot_product_attention(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2])
        return Dense(self.dim, compute_dtype=self.compute_dtype,
                     name="proj")(out.reshape(b, n, self.dim))


class _DividedBlock(nn.Module):
    config: TimeSformerConfig
    compute_dtype: Any = jnp.bfloat16
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: (B, 1 + T*P, D) — cls token then frame-major patch tokens."""
        cfg = self.config
        dp = DropPath(self.drop_path, name="drop_path")
        b = x.shape[0]
        t, p, d = cfg.n_frms, cfg.patches_per_frame, cfg.embed_dim
        cls, patches = x[:, :1], x[:, 1:]

        # Temporal attention: same spatial location attends across frames.
        h = LayerNormFP32(epsilon=cfg.norm_eps, name="temporal_norm")(patches)
        h = h.reshape(b, t, p, d).transpose(0, 2, 1, 3).reshape(b * p, t, d)
        h = _MHA(d, cfg.num_heads, self.compute_dtype, name="temporal_attn")(h)
        h = Dense(d, compute_dtype=self.compute_dtype, name="temporal_fc")(h)
        h = h.reshape(b, p, t, d).transpose(0, 2, 1, 3).reshape(b, t * p, d)
        patches = patches + dp(h, deterministic=deterministic)

        # Spatial attention: cls joins each frame.
        h = LayerNormFP32(epsilon=cfg.norm_eps, name="norm1")(jnp.concatenate([cls, patches], axis=1))
        cls_n, patches_n = h[:, :1], h[:, 1:]
        frame_tokens = patches_n.reshape(b, t, p, d).reshape(b * t, p, d)
        cls_rep = jnp.repeat(cls_n, t, axis=0)  # (B*T, 1, D)
        h = jnp.concatenate([cls_rep, frame_tokens], axis=1)
        h = _MHA(d, cfg.num_heads, self.compute_dtype, name="attn")(h)
        cls_out = h[:, :1].reshape(b, t, 1, d).mean(axis=1)  # avg over frames
        patch_out = h[:, 1:].reshape(b, t * p, d)
        sp = dp(jnp.concatenate([cls_out, patch_out], axis=1),
                deterministic=deterministic)
        cls = cls + sp[:, :1]
        patches = patches + sp[:, 1:]

        x = jnp.concatenate([cls, patches], axis=1)
        x = x + dp(
            Mlp(int(d * cfg.mlp_ratio), compute_dtype=self.compute_dtype,
                name="mlp")(LayerNormFP32(epsilon=cfg.norm_eps, name="norm2")(x)),
            deterministic=deterministic,
        )
        return x


class _JointBlock(nn.Module):
    """Plain pre-norm ViT block: one attention over the whole token set —
    the "joint_space_time" flavor (and the per-frame block of
    "space_only"; reference vit.py:206-210)."""

    config: TimeSformerConfig
    compute_dtype: Any = jnp.bfloat16
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.config
        d = cfg.embed_dim
        dp = DropPath(self.drop_path, name="drop_path")
        x = x + dp(_MHA(d, cfg.num_heads, self.compute_dtype, name="attn")(
            LayerNormFP32(epsilon=cfg.norm_eps, name="norm1")(x)
        ), deterministic=deterministic)
        x = x + dp(
            Mlp(int(d * cfg.mlp_ratio), compute_dtype=self.compute_dtype,
                name="mlp")(LayerNormFP32(epsilon=cfg.norm_eps, name="norm2")(x)),
            deterministic=deterministic,
        )
        return x


@registry.register_model("timesformer")
class TimeSformer(nn.Module):
    config: TimeSformerConfig
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, video, deterministic: bool = True):
        """video: (B, T, H, W, C) -> final-normed tokens.

        Output is (B, 1 + T*P, D) for divided/joint attention; for
        "space_only" frames run independently (separate cls each) and the
        result is frame-averaged to (B, 1 + P, D) — reference vit.py
        forward_features' space_only mean-over-time.
        """
        cfg = self.config
        b, t = video.shape[0], video.shape[1]
        assert t == cfg.n_frms, f"expected {cfg.n_frms} frames, got {t}"
        flat = video.reshape((b * t,) + video.shape[2:])
        x = nn.Conv(
            cfg.embed_dim, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
            dtype=self.compute_dtype, param_dtype=jnp.float32,
            name="patch_embed",
        )(flat.astype(self.compute_dtype)).reshape(b, t * cfg.patches_per_frame,
                                                   cfg.embed_dim)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, cfg.patches_per_frame + 1, cfg.embed_dim), jnp.float32,
        )
        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, cfg.embed_dim), jnp.float32)

        p = cfg.patches_per_frame
        x = x.reshape(b, t, p, cfg.embed_dim)
        x = x + pos[:, 1:].astype(x.dtype)[:, None]
        if cfg.attention_type != "space_only":
            # reference vit.py:334: no time embedding for space_only
            time_embed = self.param(
                "time_embed", nn.initializers.normal(0.02),
                (1, cfg.n_frms, cfg.embed_dim), jnp.float32,
            )
            x = x + time_embed.astype(x.dtype)[:, :, None]

        if cfg.attention_type == "space_only":
            # each frame is an independent image: per-frame cls, plain ViT
            # blocks over (B*T, 1+P, D), mean over frames at the end
            x = x.reshape(b * t, p, cfg.embed_dim)
            cls_tok = jnp.broadcast_to(
                cls + pos[:, :1], (b * t, 1, cfg.embed_dim)
            ).astype(x.dtype)
            x = jnp.concatenate([cls_tok, x], axis=1)
            for i in range(cfg.depth):
                rate = (cfg.drop_path_rate * i / max(cfg.depth - 1, 1)
                        if cfg.drop_path_rate else 0.0)
                x = _JointBlock(cfg, self.compute_dtype, rate,
                                name=f"blocks_{i}")(x, deterministic)
            x = x.reshape(b, t, p + 1, cfg.embed_dim).mean(axis=1)
            return LayerNormFP32(epsilon=cfg.norm_eps, name="norm")(x)

        x = x.reshape(b, t * p, cfg.embed_dim)
        cls_tok = jnp.broadcast_to(cls, (b, 1, cfg.embed_dim)).astype(x.dtype)
        cls_tok = cls_tok + pos[:, :1].astype(x.dtype)
        x = jnp.concatenate([cls_tok, x], axis=1)

        block_cls = (_DividedBlock if cfg.attention_type == "divided_space_time"
                     else _JointBlock)
        for i in range(cfg.depth):
            rate = (cfg.drop_path_rate * i / max(cfg.depth - 1, 1)
                    if cfg.drop_path_rate else 0.0)
            x = block_cls(cfg, self.compute_dtype, rate,
                          name=f"blocks_{i}")(x, deterministic)
        return LayerNormFP32(epsilon=cfg.norm_eps, name="norm")(x)


def resize_timesformer_embeds(params, new_n_frms=None, new_patches=None):
    """Nearest-neighbor resize of time/pos embeddings so pretrained weights
    load at a different frame count or resolution (reference
    timesformer/helpers.py:363,376 uses F.interpolate mode='nearest')."""
    import numpy as np

    params = dict(params)
    if new_n_frms is not None and "time_embed" in params:
        te = np.asarray(params["time_embed"])  # (1, T, D)
        t_old = te.shape[1]
        if t_old != new_n_frms:
            idx = np.clip(
                np.round(np.arange(new_n_frms) * t_old / new_n_frms), 0,
                t_old - 1,
            ).astype(int)
            params["time_embed"] = jnp.asarray(te[:, idx])
    if new_patches is not None:
        pe = np.asarray(params["pos_embed"])  # (1, P+1, D)
        p_old = pe.shape[1] - 1
        if p_old != new_patches:
            idx = np.clip(
                np.round(np.arange(new_patches) * p_old / new_patches), 0,
                p_old - 1,
            ).astype(int)
            params["pos_embed"] = jnp.asarray(
                np.concatenate([pe[:, :1], pe[:, 1:][:, idx]], axis=1)
            )
    return params
