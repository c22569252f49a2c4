"""MED: BERT-based Multimodal Encoder-Decoder (flax linen).

Counterpart of the reference ``lavis/models/blip_models/med.py:1-1416``
(BLIP's text backbone) and the ALBEF text encoder: a post-LN BERT stack
with word/position embeddings that runs in three modes:

* ``mode="text"``      — unimodal text encoder (no cross-attention)
* ``mode="multimodal"`` — cross-attention to image tokens in every layer
* ``mode="decoder"``    — causal self-attention + cross-attention + LM head
  (BLIP captioning decoder)

One module serves ALBEF, BLIP-v1, and ALPRO; mode is a call argument so
all parameter sets live in one tree (cross-attn params are created lazily
only when a multimodal/decoder call happens at init).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from mr_blip_tpu.models.layers import Dense, LayerNormFP32
from mr_blip_tpu.ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class MedConfig:
    vocab_size: int = 30524  # bert-base + [DEC]/[ENC] tokens
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    encoder_width: int = 768  # image token width for cross-attention
    max_position_embeddings: int = 512
    layer_norm_eps: float = 1e-12
    dropout: float = 0.1
    # ALBEF/ALPRO split the stack: layers [0, fusion_layer) are the text
    # encoder (mode="text"), layers [fusion_layer, num_layers) the
    # multimodal fusion encoder (mode="fusion"); None = num_layers = the
    # BLIP behavior where "multimodal" cross-attends in every layer
    # (reference med.py BertEncoder:540-558, med_config_albef.json:21).
    fusion_layer: int | None = None


def med_base_config(**kw) -> MedConfig:
    return MedConfig(**kw)


def med_tiny_config(**kw) -> MedConfig:
    defaults = dict(vocab_size=120, hidden_size=32, num_layers=2, num_heads=2,
                    intermediate_size=64, encoder_width=32, dropout=0.0)
    defaults.update(kw)
    return MedConfig(**defaults)


class _BertAttention(nn.Module):
    config: MedConfig
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, kv_states=None, kv_mask=None, causal=False,
                 deterministic=True):
        cfg = self.config
        head_dim = cfg.hidden_size // cfg.num_heads
        kv = kv_states if kv_states is not None else x
        q = Dense(cfg.hidden_size, compute_dtype=self.compute_dtype, name="query")(x)
        k = Dense(cfg.hidden_size, compute_dtype=self.compute_dtype, name="key")(kv)
        v = Dense(cfg.hidden_size, compute_dtype=self.compute_dtype, name="value")(kv)
        b, n, _ = q.shape
        m = k.shape[1]
        q = q.reshape(b, n, cfg.num_heads, head_dim)
        k = k.reshape(b, m, cfg.num_heads, head_dim)
        v = v.reshape(b, m, cfg.num_heads, head_dim)
        mask = None
        if kv_mask is not None:
            mask = kv_mask[:, None, None, :].astype(bool)
        if causal:
            tri = jnp.tril(jnp.ones((n, m), bool))[None, None]
            mask = tri if mask is None else jnp.logical_and(mask, tri)
        drop_kw = {}
        if cfg.dropout > 0.0 and not deterministic:
            # BERT drops the attention probabilities too (reference med.py
            # BertSelfAttention: self.dropout(attention_probs))
            drop_kw = dict(dropout_rate=cfg.dropout,
                           dropout_rng=self.make_rng("dropout"))
        out = dot_product_attention(q, k, v, mask=mask,
                                    **drop_kw).reshape(b, n, cfg.hidden_size)
        out = Dense(cfg.hidden_size, compute_dtype=self.compute_dtype, name="output")(out)
        if cfg.dropout > 0.0:
            out = nn.Dropout(rate=cfg.dropout)(out, deterministic=deterministic)
        return LayerNormFP32(epsilon=cfg.layer_norm_eps, name="output_norm")(x + out)


class _BertLayer(nn.Module):
    config: MedConfig
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, text_mask=None, image_states=None, image_mask=None,
                 causal=False, deterministic=True):
        cfg = self.config
        x = _BertAttention(cfg, self.compute_dtype, name="attention")(
            x, kv_mask=text_mask, causal=causal, deterministic=deterministic
        )
        if image_states is not None:
            x = _BertAttention(cfg, self.compute_dtype, name="crossattention")(
                x, kv_states=image_states, kv_mask=image_mask,
                deterministic=deterministic,
            )
        h = Dense(cfg.intermediate_size, compute_dtype=self.compute_dtype,
                  name="intermediate")(x)
        h = nn.gelu(h, approximate=False)
        h = Dense(cfg.hidden_size, compute_dtype=self.compute_dtype,
                  name="output")(h)
        if cfg.dropout > 0.0:
            h = nn.Dropout(rate=cfg.dropout)(h, deterministic=deterministic)
        return LayerNormFP32(epsilon=cfg.layer_norm_eps, name="ffn_norm")(x + h)


class MedModel(nn.Module):
    """BERT stack; returns all hidden states (B, N, H)."""

    config: MedConfig
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, text_ids, text_mask=None, image_states=None,
                 image_mask=None, mode="text", deterministic=True,
                 input_embeds=None):
        """``mode``: "text" runs layers [0, fusion_layer); "fusion" runs
        [fusion_layer, num_layers) over ``input_embeds`` (the text-mode
        output — reference ALBEF continues the same BERT stack) with
        cross-attention; "multimodal"/"decoder" run the whole stack.
        """
        cfg = self.config
        assert mode in ("text", "multimodal", "decoder", "fusion")
        fusion = cfg.fusion_layer if cfg.fusion_layer is not None else cfg.num_layers
        if mode == "fusion":
            assert input_embeds is not None, "fusion mode continues from the text-mode hidden states"
            x = input_embeds.astype(self.compute_dtype)
            start_layer, end_layer = fusion, cfg.num_layers
        else:
            word = nn.Embed(
                cfg.vocab_size, cfg.hidden_size,
                embedding_init=nn.initializers.normal(0.02),
                param_dtype=jnp.float32, name="word_embeddings",
            )(text_ids)
            pos = nn.Embed(
                cfg.max_position_embeddings, cfg.hidden_size,
                embedding_init=nn.initializers.normal(0.02),
                param_dtype=jnp.float32, name="position_embeddings",
            )(jnp.arange(text_ids.shape[1]))
            x = (word + pos).astype(self.compute_dtype)
            x = LayerNormFP32(epsilon=cfg.layer_norm_eps, name="embeddings_norm")(x)
            if cfg.dropout > 0.0:
                x = nn.Dropout(rate=cfg.dropout)(x, deterministic=deterministic)
            start_layer = 0
            end_layer = fusion if mode == "text" else cfg.num_layers

        use_image = (mode in ("multimodal", "decoder", "fusion")
                     and image_states is not None)
        # NLVR pair mode: a (states0, states1) tuple alternates the
        # cross-attention memory by layer parity — the functional equivalent
        # of the reference's paired layers with shared k/v
        # (albef_nlvr.py:198-214 share_cross_attention; both images are
        # cross-attended through interleaved layers).
        paired = use_image and isinstance(image_states, (tuple, list))
        for i in range(start_layer, end_layer):
            if paired:
                states_i = image_states[i % 2]
                mask_i = (image_mask[i % 2]
                          if isinstance(image_mask, (tuple, list))
                          else image_mask)
            else:
                states_i = image_states if use_image else None
                mask_i = image_mask
            x = _BertLayer(cfg, self.compute_dtype, name=f"layer_{i}")(
                x, text_mask=text_mask,
                image_states=states_i,
                image_mask=mask_i, causal=(mode == "decoder"),
                deterministic=deterministic,
            )
        return x


class MedLMHead(nn.Module):
    """BERT LM prediction head (dense -> gelu -> norm -> vocab logits)."""

    config: MedConfig
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, hidden):
        cfg = self.config
        h = Dense(cfg.hidden_size, compute_dtype=self.compute_dtype,
                  name="transform")(hidden)
        h = nn.gelu(h, approximate=False)
        h = LayerNormFP32(epsilon=cfg.layer_norm_eps, name="transform_norm")(h)
        return Dense(cfg.vocab_size, compute_dtype=self.compute_dtype,
                     name="decoder")(h).astype(jnp.float32)
