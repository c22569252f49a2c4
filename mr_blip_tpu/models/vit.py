"""Generic pre-norm Vision Transformer (flax linen).

Counterpart of the reference base ViT (``lavis/models/vit.py:1-527``,
timm-style) used by the ALBEF/BLIP-v1 families: standard fused-QKV
attention (bias on q, k, and v — unlike EVA's zero-k-bias), GELU MLP,
learned cls token + absolute position embeddings, final LayerNorm, optional
classification head.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from mr_blip_tpu.models.layers import Dense, DropPath, LayerNormFP32, Mlp
from mr_blip_tpu.ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class BaseViTConfig:
    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_classes: int = 0
    drop_rate: float = 0.0
    # stochastic depth, linear per-block ramp (reference vit.py drop_path)
    drop_path_rate: float = 0.0
    act: str = "gelu"  # "gelu" | "quick_gelu" (OpenAI CLIP towers)
    pre_norm: bool = False  # CLIP's ln_pre before the blocks
    norm_eps: float = 1e-6  # CLIP towers use torch's 1e-5 default

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @property
    def mlp_hidden_dim(self) -> int:
        return int(self.embed_dim * self.mlp_ratio)


def vit_base_config(**kw) -> BaseViTConfig:
    return BaseViTConfig(**kw)


def vit_large_config(**kw) -> BaseViTConfig:
    return BaseViTConfig(embed_dim=1024, depth=24, num_heads=16, **kw)


class _Attention(nn.Module):
    config: BaseViTConfig
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.config
        b, n, c = x.shape
        head_dim = cfg.embed_dim // cfg.num_heads
        qkv = Dense(
            3 * cfg.embed_dim, compute_dtype=self.compute_dtype, name="qkv"
        )(x).reshape(b, n, 3, cfg.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        out = dot_product_attention(q, k, v).reshape(b, n, cfg.embed_dim)
        return Dense(cfg.embed_dim, compute_dtype=self.compute_dtype, name="proj")(out)


class _Block(nn.Module):
    config: BaseViTConfig
    compute_dtype: Any = jnp.bfloat16
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.config
        dp = DropPath(self.drop_path, name="drop_path")
        x = x + dp(_Attention(cfg, self.compute_dtype, name="attn")(
            LayerNormFP32(epsilon=cfg.norm_eps, name="norm1")(x), deterministic=deterministic
        ), deterministic=deterministic)
        x = x + dp(Mlp(
            cfg.mlp_hidden_dim, compute_dtype=self.compute_dtype,
            dropout=cfg.drop_rate, name="mlp",
            activation=None if cfg.act == "gelu" else cfg.act,
        )(LayerNormFP32(epsilon=cfg.norm_eps, name="norm2")(x), deterministic=deterministic),
            deterministic=deterministic)
        return x


class VisionTransformer(nn.Module):
    config: BaseViTConfig
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, images, deterministic=True):
        """images: (B, H, W, C) -> (B, 1+P, D) tokens (final-normed), or
        (B, num_classes) logits when a head is configured."""
        cfg = self.config
        b = images.shape[0]
        x = nn.Conv(
            cfg.embed_dim, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
            dtype=self.compute_dtype, param_dtype=jnp.float32,
            name="patch_embed",
        )(images.astype(self.compute_dtype)).reshape(b, -1, cfg.embed_dim)

        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, cfg.embed_dim), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, cfg.embed_dim)).astype(x.dtype), x], axis=1
        )
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, cfg.num_patches + 1, cfg.embed_dim), jnp.float32)
        x = x + pos.astype(x.dtype)
        if cfg.pre_norm:  # CLIP's ln_pre
            x = LayerNormFP32(epsilon=cfg.norm_eps, name="ln_pre")(x)

        for i in range(cfg.depth):
            rate = (cfg.drop_path_rate * i / max(cfg.depth - 1, 1)
                    if cfg.drop_path_rate else 0.0)
            x = _Block(cfg, self.compute_dtype, rate, name=f"blocks_{i}")(
                x, deterministic=deterministic
            )
        x = LayerNormFP32(epsilon=cfg.norm_eps, name="norm")(x)
        if cfg.num_classes > 0:
            return Dense(cfg.num_classes, compute_dtype=self.compute_dtype,
                         name="head")(x[:, 0])
        return x
