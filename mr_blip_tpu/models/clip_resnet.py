"""CLIP ModifiedResNet visual tower (flax linen).

Counterpart of the reference's anti-aliased ResNet CLIP tower
(``lavis/models/clip_models/model.py:50-244``): 3-conv stem with an
average pool instead of max pool, bottleneck blocks whose strided
convolutions are replaced by stride-1 conv + prepended avgpool
(anti-aliasing), and a final QKV attention pool instead of global average
pooling. Covers the RN50/RN101/RN50x4/RN50x16 OpenAI checkpoint family
(``clip_models/pretrained.py:17-48``).

TPU notes: convs run NHWC (XLA's native conv layout on TPU — the MXU
tiles the channel contraction); explicit torch-style padding pairs keep
spatial indexing bit-aligned with the reference so ported checkpoints
reproduce its features. The attention pool needs only the first (mean)
query row — attention output at position 0 depends on row 0 of Q alone —
so we compute a single-query attention instead of the reference's full
(HW+1)x(HW+1) one (``model.py:123-153``).

BatchNorm: running statistics live in the params tree (``mean``/``var``
alongside ``scale``/``bias``) so ported checkpoints stay a single tree.
``deterministic=True`` normalizes with running stats (inference parity
path); ``deterministic=False`` normalizes with batch statistics (correct
training-mode forward/gradients). Running-stat EMA *updates* are not
implemented: the reference's own finetuning idiom locks the tower and
freezes BN stats (``model.py:217-224`` lock / ``utils.freeze_batch_norm_2d``),
which is exactly the supported mode.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from mr_blip_tpu.models.layers import Dense


@dataclasses.dataclass(frozen=True)
class ResNetVisionConfig:
    layers: Tuple[int, int, int, int] = (3, 4, 6, 3)
    output_dim: int = 1024
    image_size: int = 224
    width: int = 64

    @property
    def heads(self) -> int:
        # reference: vision_heads = width * 32 // 64 (model.py:457)
        return self.width * 32 // 64

    @property
    def embed_dim(self) -> int:
        return self.width * 32  # final ResNet feature dim (model.py:190)


class BatchNorm2d(nn.Module):
    """Inference-parity BatchNorm with running stats stored as params.

    torch ``nn.BatchNorm2d`` semantics: eps 1e-5, per-channel affine.
    See module docstring for the deterministic/batch-stats contract.
    """

    features: int
    compute_dtype: Any = jnp.bfloat16
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        var = self.param("var", nn.initializers.ones,
                         (self.features,), jnp.float32)
        if not deterministic:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(0, 1, 2))
            var = jnp.var(xf, axis=(0, 1, 2))
        inv = scale / jnp.sqrt(var + self.epsilon)
        # folded affine: runs in compute dtype, stats math in fp32
        out = x.astype(jnp.float32) * inv + (bias - mean * inv)
        return out.astype(self.compute_dtype)


def _conv(features: int, kernel: int, stride: int = 1, padding: int = 0,
          compute_dtype: Any = jnp.bfloat16, name: str = ""):
    """torch-style conv: explicit symmetric padding pairs (flax 'SAME' pads
    asymmetrically under stride>1 and would shift pixels vs the checkpoint)."""
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        padding=((padding, padding), (padding, padding)), use_bias=False,
        dtype=compute_dtype, param_dtype=jnp.float32, name=name,
    )


class Bottleneck(nn.Module):
    """Anti-aliased bottleneck (reference ``model.py:50-106``): all convs
    stride 1; when ``stride > 1`` an avgpool follows conv2 and prefixes the
    1x1 downsample projection."""

    planes: int
    stride: int = 1
    use_downsample: bool = False
    compute_dtype: Any = jnp.bfloat16
    expansion = 4

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dt = self.compute_dtype
        out = _conv(self.planes, 1, compute_dtype=dt, name="conv1")(x)
        out = nn.relu(BatchNorm2d(self.planes, dt, name="bn1")(
            out, deterministic))
        out = _conv(self.planes, 3, padding=1, compute_dtype=dt,
                    name="conv2")(out)
        out = nn.relu(BatchNorm2d(self.planes, dt, name="bn2")(
            out, deterministic))
        if self.stride > 1:
            out = nn.avg_pool(out, (self.stride,) * 2, (self.stride,) * 2)
        out = _conv(self.planes * self.expansion, 1, compute_dtype=dt,
                    name="conv3")(out)
        out = BatchNorm2d(self.planes * self.expansion, dt, name="bn3")(
            out, deterministic)

        identity = x
        if self.use_downsample:
            if self.stride > 1:
                identity = nn.avg_pool(
                    identity, (self.stride,) * 2, (self.stride,) * 2)
            identity = _conv(self.planes * self.expansion, 1,
                             compute_dtype=dt, name="ds_conv")(identity)
            identity = BatchNorm2d(self.planes * self.expansion, dt,
                                   name="ds_bn")(identity, deterministic)
        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    """QKV attention pool (reference ``model.py:109-153``): mean token
    prepended, learned positional embedding, multi-head attention, output
    taken at the mean-token position — computed as a single-query attention."""

    embed_dim: int
    num_heads: int
    output_dim: int
    spacial_dim: int
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        dt = self.compute_dtype
        x = x.reshape(b, h * w, c)
        x = jnp.concatenate([x.mean(axis=1, keepdims=True), x], axis=1)
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(self.embed_dim ** -0.5),
            (self.spacial_dim ** 2 + 1, self.embed_dim), jnp.float32,
        )
        x = x + pos.astype(x.dtype)
        q = Dense(self.embed_dim, compute_dtype=dt, name="q_proj")(x[:, :1])
        k = Dense(self.embed_dim, compute_dtype=dt, name="k_proj")(x)
        v = Dense(self.embed_dim, compute_dtype=dt, name="v_proj")(x)
        hd = self.embed_dim // self.num_heads
        n = x.shape[1]
        q = q.reshape(b, 1, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, self.num_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, self.num_heads, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
        attn = nn.softmax(logits * hd ** -0.5, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, 1, self.embed_dim)
        return Dense(self.output_dim, compute_dtype=dt,
                     name="c_proj")(out)[:, 0]


class ModifiedResNet(nn.Module):
    """Full tower (reference ``model.py:156-244``)."""

    config: ResNetVisionConfig
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.config
        dt = self.compute_dtype
        x = x.astype(dt)
        # 3-layer stem: two stride/pool reductions -> /4 spatial
        x = _conv(cfg.width // 2, 3, stride=2, padding=1, compute_dtype=dt,
                  name="conv1")(x)
        x = nn.relu(BatchNorm2d(cfg.width // 2, dt, name="bn1")(
            x, deterministic))
        x = _conv(cfg.width // 2, 3, padding=1, compute_dtype=dt,
                  name="conv2")(x)
        x = nn.relu(BatchNorm2d(cfg.width // 2, dt, name="bn2")(
            x, deterministic))
        x = _conv(cfg.width, 3, padding=1, compute_dtype=dt, name="conv3")(x)
        x = nn.relu(BatchNorm2d(cfg.width, dt, name="bn3")(x, deterministic))
        x = nn.avg_pool(x, (2, 2), (2, 2))

        inplanes = cfg.width
        for li, (planes_mult, blocks) in enumerate(
            zip((1, 2, 4, 8), cfg.layers)
        ):
            planes = cfg.width * planes_mult
            stride = 1 if li == 0 else 2
            for bi in range(blocks):
                s = stride if bi == 0 else 1
                needs_ds = s > 1 or inplanes != planes * Bottleneck.expansion
                x = Bottleneck(
                    planes, s, use_downsample=needs_ds, compute_dtype=dt,
                    name=f"layer{li + 1}_block{bi}",
                )(x, deterministic)
                inplanes = planes * Bottleneck.expansion

        return AttentionPool2d(
            cfg.embed_dim, cfg.heads, cfg.output_dim,
            spacial_dim=cfg.image_size // 32, compute_dtype=dt,
            name="attnpool",
        )(x)
