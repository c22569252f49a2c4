"""CLIP dual encoder (flax linen).

Counterpart of the reference CLIP family (``lavis/models/clip_models/
model.py:1-1254``): ViT visual tower + causal text transformer, projection
heads to a shared embedding space, learned logit scale, and the symmetric
contrastive (InfoNCE) objective with an all-gather over the dp axis for
cross-device negatives (the reference uses ``all_gather_with_grad``,
base_model.py:203-240).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mr_blip_tpu.common.registry import registry
from mr_blip_tpu.models.clip_resnet import ModifiedResNet, ResNetVisionConfig
from mr_blip_tpu.models.layers import Dense, LayerNormFP32, Mlp
from mr_blip_tpu.models.vit import BaseViTConfig, VisionTransformer
from mr_blip_tpu.ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int = 512
    vision: BaseViTConfig = dataclasses.field(
        default_factory=lambda: BaseViTConfig(
            img_size=224, patch_size=16, embed_dim=768, depth=12, num_heads=12,
            pre_norm=True, norm_eps=1e-5,
        )
    )
    # When set, the visual tower is the anti-aliased ModifiedResNet
    # (reference model.py:456-464 chooses it when vision layers is a tuple)
    # and ``vision`` is ignored; the tower projects to embed_dim itself.
    resnet: Optional[ResNetVisionConfig] = None
    vocab_size: int = 49408
    context_length: int = 77
    text_width: int = 512
    text_heads: int = 8
    text_layers: int = 12
    quick_gelu: bool = False  # OpenAI-checkpoint nonlinearity (both towers)
    norm_eps: float = 1e-5  # torch nn.LayerNorm default (reference model.py)


# OpenCLIP model zoo — geometry mirrors the reference's JSON configs
# (lavis/configs/models/clip/*.json; ViT vision heads = width // head_width,
# head_width default 64; ResNet towers via models/clip_resnet.py). The timm
# tower family is not ported (needs the timm library; no reference yaml or
# checkpoint uses it).
CLIP_MODEL_ZOO = {
    # name: (embed, img, patch, v_width, v_layers, v_head_width, v_mlp_ratio,
    #        t_width, t_heads, t_layers, quick_gelu)
    "ViT-B-32":           (512, 224, 32, 768, 12, 64, 4.0, 512, 8, 12, False),
    "ViT-B-32-quickgelu": (512, 224, 32, 768, 12, 64, 4.0, 512, 8, 12, True),
    "ViT-B-16":           (512, 224, 16, 768, 12, 64, 4.0, 512, 8, 12, False),
    "ViT-B-16-plus-240":  (640, 240, 16, 896, 12, 64, 4.0, 640, 10, 12, False),
    "ViT-L-14":           (768, 224, 14, 1024, 24, 64, 4.0, 768, 12, 12, False),
    "ViT-L-14-336":       (768, 336, 14, 1024, 24, 64, 4.0, 768, 12, 12, False),
    "ViT-H-14":           (1024, 224, 14, 1280, 32, 80, 4.0, 1024, 16, 24, False),
    "ViT-g-14":           (1024, 224, 14, 1408, 40, 88, 4.3637, 1024, 16, 24, False),
}

# ResNet tower zoo (reference configs/models/clip/RN*.json):
# name: (embed, img, width, layers, t_width, t_heads, t_layers, quick_gelu)
CLIP_RESNET_ZOO = {
    "RN50":            (1024, 224, 64, (3, 4, 6, 3), 512, 8, 12, False),
    "RN50-quickgelu":  (1024, 224, 64, (3, 4, 6, 3), 512, 8, 12, True),
    "RN101":           (512, 224, 64, (3, 4, 23, 3), 512, 8, 12, False),
    "RN101-quickgelu": (512, 224, 64, (3, 4, 23, 3), 512, 8, 12, True),
    "RN50x4":          (640, 288, 80, (4, 6, 10, 6), 640, 10, 12, False),
    "RN50x16":         (768, 384, 96, (6, 8, 18, 8), 768, 12, 12, False),
}


def clip_config_from_name(name: str) -> CLIPConfig:
    """CLIPConfig for an OpenCLIP zoo name (see CLIP_MODEL_ZOO /
    CLIP_RESNET_ZOO)."""
    if name in CLIP_RESNET_ZOO:
        embed, img, w, layers, tw, th, tl, qg = CLIP_RESNET_ZOO[name]
        return CLIPConfig(
            embed_dim=embed,
            resnet=ResNetVisionConfig(
                layers=layers, output_dim=embed, image_size=img, width=w,
            ),
            text_width=tw, text_heads=th, text_layers=tl, quick_gelu=qg,
        )
    (embed, img, patch, vw, vl, vhw, vmr, tw, th, tl,
     qg) = CLIP_MODEL_ZOO[name]
    return CLIPConfig(
        embed_dim=embed,
        vision=BaseViTConfig(
            img_size=img, patch_size=patch, embed_dim=vw, depth=vl,
            num_heads=vw // vhw, mlp_ratio=vmr,
            act="quick_gelu" if qg else "gelu",
            pre_norm=True, norm_eps=1e-5,  # CLIP's ln_pre + torch eps
        ),
        text_width=tw, text_heads=th, text_layers=tl, quick_gelu=qg,
    )


def clip_vit_b16_config() -> CLIPConfig:
    return clip_config_from_name("ViT-B-16")


def clip_tiny_config() -> CLIPConfig:
    return CLIPConfig(
        embed_dim=16,
        vision=BaseViTConfig(img_size=28, patch_size=14, embed_dim=32, depth=2,
                             num_heads=2, pre_norm=True, norm_eps=1e-5),
        vocab_size=100, context_length=12, text_width=32, text_heads=2,
        text_layers=2,
    )


class _TextBlock(nn.Module):
    width: int
    heads: int
    compute_dtype: Any = jnp.bfloat16
    activation: Any = None  # None = exact gelu; "quick_gelu" = OpenAI CLIP
    norm_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, mask):
        b, n, _ = x.shape
        h = LayerNormFP32(epsilon=self.norm_eps, name="ln_1")(x)
        qkv = Dense(3 * self.width, compute_dtype=self.compute_dtype,
                    name="attn_qkv")(h).reshape(b, n, 3, self.heads, -1)
        attn = dot_product_attention(
            qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], mask=mask
        ).reshape(b, n, self.width)
        x = x + Dense(self.width, compute_dtype=self.compute_dtype,
                      name="attn_out")(attn)
        x = x + Mlp(self.width * 4, compute_dtype=self.compute_dtype,
                    activation=self.activation,
                    name="mlp")(LayerNormFP32(epsilon=self.norm_eps, name="ln_2")(x))
        return x


@registry.register_model("clip_feature_extractor")
class CLIP(nn.Module):
    config: CLIPConfig
    compute_dtype: Any = jnp.bfloat16

    def setup(self):
        cfg = self.config
        if cfg.resnet is not None:
            self.visual = ModifiedResNet(cfg.resnet, self.compute_dtype,
                                         name="visual")
            self.visual_proj = None  # attnpool c_proj already maps to embed
        else:
            self.visual = VisionTransformer(cfg.vision, self.compute_dtype,
                                            name="visual")
            self.visual_proj = Dense(cfg.embed_dim, use_bias=False,
                                     compute_dtype=self.compute_dtype,
                                     name="visual_proj")
        self.token_embedding = nn.Embed(
            cfg.vocab_size, cfg.text_width,
            embedding_init=nn.initializers.normal(0.02),
            param_dtype=jnp.float32, name="token_embedding",
        )
        self.text_blocks = [
            _TextBlock(cfg.text_width, cfg.text_heads, self.compute_dtype,
                       activation="quick_gelu" if cfg.quick_gelu else None,
                       norm_eps=cfg.norm_eps, name=f"text_block_{i}")
            for i in range(cfg.text_layers)
        ]
        self.ln_final = LayerNormFP32(epsilon=cfg.norm_eps, name="ln_final")
        self.text_proj = Dense(cfg.embed_dim, use_bias=False,
                               compute_dtype=self.compute_dtype,
                               name="text_proj")
        self.positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (cfg.context_length, cfg.text_width), jnp.float32,
        )
        self.logit_scale = self.param(
            "logit_scale",
            lambda key, shape: jnp.full(shape, jnp.log(1.0 / 0.07)), (),
        )

    def encode_image(self, images):
        if self.config.resnet is not None:
            return self.visual(images)  # tower pools + projects internally
        tokens = self.visual(images)
        return self.visual_proj(tokens[:, 0])

    def encode_text(self, text_ids):
        cfg = self.config
        n = text_ids.shape[1]
        x = self.token_embedding(text_ids).astype(self.compute_dtype)
        x = x + self.positional_embedding[:n].astype(x.dtype)
        causal = jnp.tril(jnp.ones((n, n), bool))[None, None]
        for block in self.text_blocks:
            x = block(x, causal)
        x = self.ln_final(x)
        # features at the EOT position (highest token id, CLIP convention)
        eot = jnp.argmax(text_ids, axis=-1)
        x = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        return self.text_proj(x)

    def __call__(self, images, text_ids):
        """Returns (logits_per_image, logits_per_text)."""
        img = self.encode_image(images)
        txt = self.encode_text(text_ids)
        img = img / jnp.linalg.norm(img.astype(jnp.float32), axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt.astype(jnp.float32), axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        logits_per_image = scale * img @ txt.T
        return logits_per_image, logits_per_image.T


def clip_contrastive_loss(logits_per_image, axis_name: Optional[str] = None):
    """Symmetric InfoNCE. With ``axis_name`` the similarity matrix already
    spans the gathered global batch (caller all-gathers features over dp)."""
    n = logits_per_image.shape[0]
    labels = jnp.arange(n)
    li = -jnp.take_along_axis(
        jax.nn.log_softmax(logits_per_image, axis=-1), labels[:, None], axis=1
    ).mean()
    lt = -jnp.take_along_axis(
        jax.nn.log_softmax(logits_per_image.T, axis=-1), labels[:, None], axis=1
    ).mean()
    return (li + lt) / 2


def all_gather_features(x, axis_name="dp"):
    """Differentiable all-gather (reference all_gather_with_grad)."""
    return jax.lax.all_gather(x, axis_name, tiled=True)
