"""Shared flax building blocks with an explicit precision policy.

Policy (matches the reference's AMP discipline, blip2.py:36,113-119):
params live in ``param_dtype`` (fp32 by default), matmul activations run in
``compute_dtype`` (bf16 on TPU), while LayerNorm / RMSNorm always reduce in
fp32 regardless of input dtype.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class LayerNormFP32(nn.Module):
    """LayerNorm computed in fp32, cast back to the input dtype.

    The reference keeps LayerNorm in fp32 under fp16/bf16 autocast
    (``blip2.py:113-119`` LayerNorm subclass); bf16 variance accumulation
    visibly shifts BLIP-2 logits.
    """

    epsilon: float = 1e-6
    use_bias: bool = True
    use_scale: bool = True

    @nn.compact
    def __call__(self, x):
        if self.use_bias and self.use_scale and x.ndim >= 2:
            # Fused path: fp32 statistics without materializing an fp32
            # activation copy — Pallas kernel on TPU for 16-bit inputs, an
            # equivalent jnp formulation elsewhere (ops/layer_norm.py).
            # The child module keeps the "LayerNorm_0/{scale,bias}" param
            # layout every checkpoint/port function expects.
            from mr_blip_tpu.ops.layer_norm import fused_layer_norm

            scale, bias = _LNParams(x.shape[-1], name="LayerNorm_0")()
            return fused_layer_norm(x, scale, bias, self.epsilon)
        orig_dtype = x.dtype
        y = nn.LayerNorm(
            epsilon=self.epsilon,
            use_bias=self.use_bias,
            use_scale=self.use_scale,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(x.astype(jnp.float32))
        return y.astype(orig_dtype)


class _LNParams(nn.Module):
    """Parameter-only child scope matching nn.LayerNorm's naming."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return scale, bias


class RMSNormFP32(nn.Module):
    """T5-style RMSNorm (no mean subtraction, no bias), fp32 accumulation."""

    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        x32 = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        y = x32 * jnp.reciprocal(jnp.sqrt(var + self.epsilon))
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        return (y * scale).astype(orig_dtype)


class DropPath(nn.Module):
    """Stochastic depth (timm ``drop_path``, reference eva_vit.py:20-43):
    drop an entire residual branch per SAMPLE with probability ``rate``,
    scaling survivors by 1/(1-rate). Identity when deterministic or
    rate == 0. Uses the ``"drop_path"`` rng collection.
    """

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True, rate=None):
        # ``rate`` overrides the static attribute with a (possibly traced)
        # per-layer value — the scan-over-layers path feeds the
        # stochastic-depth ramp as a scanned input (eva_vit.py).
        if deterministic or (rate is None and self.rate == 0.0):
            return x
        keep = 1.0 - (self.rate if rate is None else rate)
        rng = self.make_rng("drop_path")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class Dense(nn.Module):
    """nn.Dense with the framework dtype policy and optional LoRA delta.

    When ``lora_rank > 0`` the layer adds a trainable low-rank update
    ``x @ A @ B * (alpha / rank)`` on top of the (typically frozen) base
    kernel — the reference applies LoRA r=8, alpha=8 to every T5 Linear
    (blip2_mr.py:183-237).
    """

    features: int
    use_bias: bool = True
    compute_dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: float = 8.0
    lora_dropout: float = 0.0
    kernel_init: Callable = nn.initializers.lecun_normal()
    # int8 weight-only storage (inference): the kernel lives as int8 +
    # per-output-channel fp32 scale, dequantized on the fly inside the dot
    # (the convert fuses into the matmul, halving weight HBM traffic —
    # autoregressive decode is weight-bandwidth-bound). The per-channel
    # scale commutes with the contraction, so it is applied AFTER the
    # matmul in fp32. Convert float trees with models/quantize.py.
    quantize: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.quantize:
            wq = self.param(
                "kernel_q", nn.initializers.zeros,
                (x.shape[-1], self.features), jnp.int8,
            )
            scale = self.param(
                "kernel_scale", nn.initializers.ones,
                (self.features,), jnp.float32,
            )
            y = jnp.dot(
                x.astype(self.compute_dtype), wq.astype(self.compute_dtype),
                preferred_element_type=jnp.float32,
            )
            y = (y * scale).astype(self.compute_dtype)
            if self.use_bias:
                qb = self.param(
                    "bias", nn.initializers.zeros, (self.features,),
                    self.param_dtype,
                )
                y = y + qb.astype(self.compute_dtype)
        else:
            y = nn.Dense(
                features=self.features,
                use_bias=self.use_bias,
                dtype=self.compute_dtype,
                param_dtype=self.param_dtype,
                kernel_init=self.kernel_init,
            )(x)
        if self.lora_rank > 0:
            a = self.param(
                "lora_a",
                nn.initializers.normal(stddev=0.02),
                (x.shape[-1], self.lora_rank),
                self.param_dtype,
            )
            b = self.param(
                "lora_b",
                nn.initializers.zeros,
                (self.lora_rank, self.features),
                self.param_dtype,
            )
            h = x
            if self.lora_dropout > 0.0 and not deterministic:
                h = nn.Dropout(rate=self.lora_dropout)(h, deterministic=False)
            scaling = self.lora_alpha / self.lora_rank
            delta = (
                h.astype(self.compute_dtype)
                @ a.astype(self.compute_dtype)
                @ b.astype(self.compute_dtype)
            ) * scaling
            y = y + delta
        return y


class Mlp(nn.Module):
    """Two-layer GELU MLP (ViT / BERT style).

    ``approximate_gelu`` swaps exact erf-GELU for the tanh approximation —
    ~10% faster on the v5e VPU, but no longer bit-matched to the reference
    (torch nn.GELU is erf); perf opt-in only.

    ``activation="quick_gelu"`` selects x*sigmoid(1.702x) — the OpenAI CLIP
    nonlinearity (reference clip_models/model.py QuickGELU), required to
    port the original OpenAI checkpoints bit-faithfully.
    """

    hidden_features: int
    out_features: Optional[int] = None
    compute_dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    dropout: float = 0.0
    approximate_gelu: bool = False
    activation: Optional[str] = None  # None -> (approximate_)gelu

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out_features = self.out_features or x.shape[-1]
        x = Dense(
            self.hidden_features,
            compute_dtype=self.compute_dtype,
            param_dtype=self.param_dtype,
            name="fc1",
        )(x)
        if self.activation == "quick_gelu":
            x = x * jax.nn.sigmoid(1.702 * x)
        else:
            assert self.activation in (None, "gelu"), self.activation
            x = nn.gelu(x, approximate=self.approximate_gelu)
        x = Dense(
            out_features,
            compute_dtype=self.compute_dtype,
            param_dtype=self.param_dtype,
            name="fc2",
        )(x)
        if self.dropout > 0.0:
            x = nn.Dropout(rate=self.dropout)(x, deterministic=deterministic)
        return x


class QDenseParams(nn.Module):
    """Parameter-only scope in the ``Dense(quantize=True)`` layout
    (kernel_q int8 + per-channel kernel_scale [+ bias]) for modules that
    feed the W8A8 Pallas kernels directly (ops/int8_matmul.py)."""

    features: int
    in_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        wq = self.param(
            "kernel_q", nn.initializers.zeros,
            (self.in_features, self.features), jnp.int8,
        )
        sw = self.param(
            "kernel_scale", nn.initializers.ones, (self.features,),
            jnp.float32,
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
            if self.use_bias else None
        )
        return wq, sw, b


class LNParamsScope(nn.Module):
    """Parameter-only scope producing the ``<name>/LayerNorm_0/{scale,bias}``
    layout of LayerNormFP32 — used when the norm COMPUTE is fused into a
    downstream Pallas kernel (int8 path) but the params must stay at the
    float tree's path so ports/checkpoints are layout-identical."""

    features: int

    @nn.compact
    def __call__(self):
        return _LNParams(self.features, name="LayerNorm_0")()


class RMSParamsScope(nn.Module):
    """Parameter-only scope matching RMSNormFP32's ``<name>/scale`` path."""

    features: int

    @nn.compact
    def __call__(self):
        return self.param("scale", nn.initializers.ones, (self.features,),
                          jnp.float32)
