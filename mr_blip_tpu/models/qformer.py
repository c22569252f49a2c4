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
    # text path (multimodal Q-Former; stripped on the default Mr. BLIP path)
    vocab_size: int = 30522  # bert-base-uncased
    max_position_embeddings: int = 512
    with_text: bool = False
    # W8A8 int8 cross-attention K/V projections (inference-only): the
    # (B*T*257, encoder_width) -> hidden K and V matmuls dominate the
    # Q-Former stage (SURVEY bench note "cross K/V projections dominate");
    # packed into one fused Pallas kernel. Convert float params with
    # models/quantize.py::quantize_qformer_cross_params.
    int8_cross: bool = False


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
        if cfg.int8_cross and kv_states is not None:
            # packed K+V on the int8 MXU: one in-kernel quant pass over the
            # (B*T*tokens, encoder_width) frame features, one launch
            from mr_blip_tpu.models.layers import QDenseParams
            from mr_blip_tpu.ops.int8_matmul import w8a8_linear

            kvw, kvs, kvb = QDenseParams(
                2 * cfg.hidden_size, kv.shape[-1], name="kv_packed"
            )()
            kv2 = w8a8_linear(
                kv.reshape(-1, kv.shape[-1]), kvw, kvs, kvb
            ).reshape(kv.shape[0], kv.shape[1], 2 * cfg.hidden_size)
            k = kv2[..., :cfg.hidden_size]
            v = kv2[..., cfg.hidden_size:]
        else:
            k = Dense(cfg.hidden_size, compute_dtype=self.compute_dtype, name="key")(kv)
            v = Dense(cfg.hidden_size, compute_dtype=self.compute_dtype, name="value")(kv)

        b, n, _ = q.shape
        m = k.shape[1]
        q = q.reshape(b, n, cfg.num_heads, head_dim)
        k = k.reshape(b, m, cfg.num_heads, head_dim)
        v = v.reshape(b, m, cfg.num_heads, head_dim)

        mask = None
        if kv_mask is not None:
            km = kv_mask.astype(bool)
            # (B, M) padding mask or (B, N, M) full mask (causal LM mode)
            mask = km[:, None, None, :] if km.ndim == 2 else km[:, None, :, :]
        drop_kw = {}
        if cfg.dropout > 0.0 and not deterministic:
            # reference Qformer.py BertSelfAttention drops the attention
            # probabilities (attention_probs_dropped = self.dropout(...))
            drop_kw = dict(dropout_rate=cfg.dropout,
                           dropout_rng=self.make_rng("dropout"))
        out = dot_product_attention(q, k, v, mask=mask, **drop_kw)
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
    def __call__(self, x, encoder_states, encoder_mask=None, self_mask=None,
                 num_queries=None, deterministic=True):
        """``x`` is [queries ‖ text]; cross-attention and the query FFN act
        on the first ``num_queries`` positions, text gets its own FFN
        (reference BertLayer query_length split, Qformer.py:403-470)."""
        cfg = self.config
        nq = num_queries if num_queries is not None else x.shape[1]
        x = QFormerAttention(cfg, self.compute_dtype, name="self_attention")(
            x, kv_mask=self_mask, deterministic=deterministic
        )
        q_part, t_part = x[:, :nq], x[:, nq:]
        if self.has_cross_attention and nq > 0:
            q_part = QFormerAttention(cfg, self.compute_dtype, name="cross_attention")(
                q_part, kv_states=encoder_states, kv_mask=encoder_mask,
                deterministic=deterministic,
            )

        def ffn(h, prefix):
            y = Dense(
                cfg.intermediate_size, compute_dtype=self.compute_dtype,
                name=f"intermediate{prefix}",
            )(h)
            y = nn.gelu(y, approximate=False)
            y = Dense(
                cfg.hidden_size, compute_dtype=self.compute_dtype,
                name=f"output{prefix}",
            )(y)
            if cfg.dropout > 0.0:
                y = nn.Dropout(rate=cfg.dropout)(y, deterministic=deterministic)
            return LayerNormFP32(
                epsilon=cfg.layer_norm_eps, name=f"output{prefix}_norm"
            )(h + y)

        if nq > 0:
            q_part = ffn(q_part, "_query")
        if t_part.shape[1] > 0:
            t_part = ffn(t_part, "")
            if nq == 0:
                return t_part
            return jnp.concatenate([q_part, t_part], axis=1)
        return q_part


class QFormer(nn.Module):
    """BLIP-2 Q-Former: (B, M, encoder_width) frames -> (B, Q, hidden).

    Query-only by default (the Mr. BLIP configuration); with
    ``config.with_text`` and ``text_ids`` it runs the multimodal path —
    queries and text share self-attention, text gets word/position
    embeddings and the text FFN (reference multimodal_Qformer branch,
    blip2_mr.py:455-481)."""

    config: QFormerConfig
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, encoder_states=None, encoder_mask=None, text_ids=None,
                 text_mask=None, deterministic=True, mode="query"):
        """Modes (reference Blip2Qformer forward variants, blip2_qformer.py):

        * ``query``     — return the ``num_query_tokens`` query outputs
          (default; text optional, shares self-attention when given);
        * ``multimodal``— same pass, return the FULL [queries ‖ text]
          sequence (ITM head reads the query part, callers split);
        * ``text``      — text-only BERT encoding, no queries and no
          cross-attention (ITC text tower);
        * ``lm``        — queries attend only among themselves (and the
          image via cross-attention); text decodes causally over
          [queries ‖ text prefix] — the image-grounded caption LM.
        """
        cfg = self.config
        assert mode in ("query", "multimodal", "text", "lm")
        use_queries = mode != "text"
        b = encoder_states.shape[0] if encoder_states is not None else text_ids.shape[0]

        nq = cfg.num_query_tokens if use_queries else 0
        if use_queries:
            query_tokens = self.param(
                "query_tokens",
                nn.initializers.normal(0.02),
                (1, cfg.num_query_tokens, cfg.hidden_size),
                jnp.float32,
            )
            x = jnp.broadcast_to(
                query_tokens, (b, cfg.num_query_tokens, cfg.hidden_size)
            ).astype(self.compute_dtype)
        else:
            x = jnp.zeros((b, 0, cfg.hidden_size), self.compute_dtype)

        self_mask = None
        if text_ids is not None:
            assert cfg.with_text, "construct QFormerConfig(with_text=True)"
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
            t = (word + pos).astype(self.compute_dtype)
            x = jnp.concatenate([x, t], axis=1)
            n = x.shape[1]
            pad = (text_mask.astype(bool) if text_mask is not None
                   else jnp.ones(text_ids.shape, bool))
            pad = jnp.concatenate([jnp.ones((b, nq), bool), pad], axis=1)
            if mode == "lm":
                # queries see only queries; text position i sees queries and
                # text positions <= i (reference Qformer.py
                # get_extended_attention_mask is_decoder + query prefix)
                row = jnp.arange(n)[:, None]
                col = jnp.arange(n)[None, :]
                allow = jnp.where(row < nq, col < nq, col <= row)
                self_mask = allow[None] & pad[:, None, :]  # (B, N, N)
            else:
                self_mask = pad

        # BertEmbeddings applies LayerNorm + dropout to the sequence.
        x = LayerNormFP32(epsilon=cfg.layer_norm_eps, name="embeddings_norm")(x)
        if cfg.dropout > 0.0:
            x = nn.Dropout(rate=cfg.dropout)(x, deterministic=deterministic)

        for i in range(cfg.num_layers):
            x = QFormerLayer(
                cfg,
                has_cross_attention=(i % cfg.cross_attention_freq == 0),
                compute_dtype=self.compute_dtype,
                name=f"layer_{i}",
            )(x, encoder_states, encoder_mask, self_mask=self_mask,
              num_queries=nq, deterministic=deterministic)
        if mode == "query":
            return x[:, :nq]
        return x


class TemporalQFormer(nn.Module):
    """Per-video temporal Q-Former (reference init_TemporalQFormer,
    blip2.py:63-74): one query per frame attending over frame features."""

    config: QFormerConfig
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, frame_features, deterministic=True):
        return QFormer(self.config, self.compute_dtype, name="qformer")(
            frame_features, deterministic=deterministic
        )
