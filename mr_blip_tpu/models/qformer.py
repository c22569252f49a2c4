"""BLIP-2 Q-Former (flax linen): 32 learned queries cross-attending to frames.

Matches the live Mr. BLIP configuration of the reference Q-Former
(``lavis/models/blip2_models/Qformer.py`` + ``blip2.py:46-61`` +
``blip2_mr.py:255-264``): BERT-base geometry (12 post-LN layers, d=768,
12 heads, LN eps 1e-12), cross-attention to the 1408-d ViT tokens inserted
every ``cross_attention_freq=2`` layers (layers 0, 2, 4, ...), and the text
path stripped — no word/position embeddings, no text FFN; only the
query-token FFN (``intermediate_query``/``output_query``) runs.

The 32 query tokens enter through the BertEmbeddings LayerNorm+dropout
(Qformer.py:104-108) before the encoder stack.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from mr_blip_tpu.models.layers import Dense, LayerNormFP32
from mr_blip_tpu.ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class QFormerConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    encoder_width: int = 1408  # ViT token width for cross-attention K/V
    cross_attention_freq: int = 2
    num_query_tokens: int = 32
    layer_norm_eps: float = 1e-12
    dropout: float = 0.1


def qformer_base_config(encoder_width: int = 1408, num_query_tokens: int = 32):
    return QFormerConfig(encoder_width=encoder_width, num_query_tokens=num_query_tokens)


def qformer_tiny_config(encoder_width: int = 32):
    return QFormerConfig(
        hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
        encoder_width=encoder_width, num_query_tokens=4,
    )


class QFormerAttention(nn.Module):
    """Post-LN BERT attention; cross-attention keys/values come from
    ``kv_states`` (possibly a different width than hidden_size)."""

    config: QFormerConfig
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, kv_states=None, kv_mask=None, deterministic=True):
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
            mask = kv_mask[:, None, None, :].astype(bool)  # (B, 1, 1, M)
        out = dot_product_attention(q, k, v, mask=mask)
        out = out.reshape(b, n, cfg.hidden_size)

        out = Dense(cfg.hidden_size, compute_dtype=self.compute_dtype, name="output")(out)
        if cfg.dropout > 0.0:
            out = nn.Dropout(rate=cfg.dropout)(out, deterministic=deterministic)
        return LayerNormFP32(epsilon=cfg.layer_norm_eps, name="output_norm")(x + out)


class QFormerLayer(nn.Module):
    config: QFormerConfig
    has_cross_attention: bool
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, encoder_states, encoder_mask=None, deterministic=True):
        cfg = self.config
        x = QFormerAttention(cfg, self.compute_dtype, name="self_attention")(
            x, deterministic=deterministic
        )
        if self.has_cross_attention:
            x = QFormerAttention(cfg, self.compute_dtype, name="cross_attention")(
                x, kv_states=encoder_states, kv_mask=encoder_mask,
                deterministic=deterministic,
            )
        # Query-token FFN (reference intermediate_query/output_query).
        h = Dense(
            cfg.intermediate_size, compute_dtype=self.compute_dtype,
            name="intermediate_query",
        )(x)
        h = nn.gelu(h, approximate=False)
        h = Dense(
            cfg.hidden_size, compute_dtype=self.compute_dtype, name="output_query"
        )(h)
        if cfg.dropout > 0.0:
            h = nn.Dropout(rate=cfg.dropout)(h, deterministic=deterministic)
        return LayerNormFP32(epsilon=cfg.layer_norm_eps, name="output_query_norm")(x + h)


class QFormer(nn.Module):
    """Query-only Q-Former: (B, M, encoder_width) frames -> (B, Q, hidden)."""

    config: QFormerConfig
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, encoder_states, encoder_mask=None, deterministic=True):
        cfg = self.config
        b = encoder_states.shape[0]

        query_tokens = self.param(
            "query_tokens",
            nn.initializers.normal(0.02),
            (1, cfg.num_query_tokens, cfg.hidden_size),
            jnp.float32,
        )
        x = jnp.broadcast_to(
            query_tokens, (b, cfg.num_query_tokens, cfg.hidden_size)
        ).astype(self.compute_dtype)

        # BertEmbeddings applies LayerNorm + dropout to the query tokens.
        x = LayerNormFP32(epsilon=cfg.layer_norm_eps, name="embeddings_norm")(x)
        if cfg.dropout > 0.0:
            x = nn.Dropout(rate=cfg.dropout)(x, deterministic=deterministic)

        for i in range(cfg.num_layers):
            x = QFormerLayer(
                cfg,
                has_cross_attention=(i % cfg.cross_attention_freq == 0),
                compute_dtype=self.compute_dtype,
                name=f"layer_{i}",
            )(x, encoder_states, encoder_mask, deterministic=deterministic)
        return x
