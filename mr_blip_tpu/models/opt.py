"""OPT decoder-only causal LM (flax linen).

Counterpart of the reference's vendored HF OPT
(``lavis/models/blip2_models/modeling_opt.py:1-1131``) used by the
``blip2_opt_mr`` variant: pre-LN transformer decoder, learned positional
embeddings with the OPT offset of 2, ReLU FFN, final LayerNorm, tied LM
head.  Supports ``inputs_embeds`` prefixes (the video prompt enters as
embeddings) and a static-shape KV cache whose prefill writes the whole
prompt in one pass (block-causal masking inside the written window).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mr_blip_tpu.models.layers import Dense, LayerNormFP32
from mr_blip_tpu.ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class OPTConfig:
    vocab_size: int = 50272
    hidden_size: int = 2560
    num_layers: int = 32
    num_heads: int = 32
    ffn_dim: int = 10240
    max_position_embeddings: int = 2048
    dropout: float = 0.1
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 1
    bos_token_id: int = 2
    eos_token_id: int = 2
    position_offset: int = 2  # OPT quirk: positions start at offset 2
    activation: str = "relu"  # "relu" (OPT) | "gelu" (GPT-2 reuse)
    tie_head: bool = True
    lora_rank: int = 0
    lora_alpha: float = 8.0
    lora_dropout: float = 0.05


def opt_2_7b_config(**kw) -> OPTConfig:
    return OPTConfig(**kw)


def opt_6_7b_config(**kw) -> OPTConfig:
    return OPTConfig(hidden_size=4096, num_layers=32, num_heads=32,
                     ffn_dim=16384, **kw)


def opt_tiny_config(**kw) -> OPTConfig:
    defaults = dict(vocab_size=256, hidden_size=32, num_layers=2, num_heads=4,
                    ffn_dim=64, max_position_embeddings=128, dropout=0.0)
    defaults.update(kw)
    return OPTConfig(**defaults)


class OPTAttention(nn.Module):
    config: OPTConfig
    compute_dtype: Any = jnp.bfloat16
    decode_cache_len: int = 0

    @nn.compact
    def __call__(self, x, mask=None, decode=False, deterministic=True):
        cfg = self.config
        head_dim = cfg.hidden_size // cfg.num_heads
        dense = lambda name: Dense(
            cfg.hidden_size, compute_dtype=self.compute_dtype,
            lora_rank=cfg.lora_rank, lora_alpha=cfg.lora_alpha,
            lora_dropout=cfg.lora_dropout, name=name,
        )
        b, n, _ = x.shape
        q = dense("q_proj")(x, deterministic=deterministic).reshape(
            b, n, cfg.num_heads, head_dim
        )
        k = dense("k_proj")(x, deterministic=deterministic).reshape(
            b, n, cfg.num_heads, head_dim
        )
        v = dense("v_proj")(x, deterministic=deterministic).reshape(
            b, n, cfg.num_heads, head_dim
        )

        if decode:
            max_len = self.decode_cache_len
            assert max_len > 0
            cached_key = self.variable(
                "cache", "cached_key", jnp.zeros,
                (b, max_len, cfg.num_heads, head_dim), k.dtype,
            )
            cached_value = self.variable(
                "cache", "cached_value", jnp.zeros,
                (b, max_len, cfg.num_heads, head_dim), v.dtype,
            )
            cache_index = self.variable(
                "cache", "cache_index", lambda: jnp.zeros((), jnp.int32)
            )
            idx = cache_index.value
            cached_key.value = jax.lax.dynamic_update_slice(
                cached_key.value, k, (0, idx, 0, 0)
            )
            cached_value.value = jax.lax.dynamic_update_slice(
                cached_value.value, v, (0, idx, 0, 0)
            )
            cache_index.value = idx + n
            k, v = cached_key.value, cached_value.value
            # Block-causal: query j (global pos idx+j) sees slots <= idx+j.
            q_pos = idx + jnp.arange(n)[:, None]          # (n, 1)
            k_pos = jnp.arange(max_len)[None, :]          # (1, max_len)
            causal = (k_pos <= q_pos)[None, None]         # (1, 1, n, max_len)
            mask = causal if mask is None else jnp.logical_and(mask, causal)
        else:
            causal = jnp.tril(jnp.ones((n, n), bool))[None, None]
            mask = causal if mask is None else jnp.logical_and(mask, causal)

        drop_kw = {}
        if cfg.dropout > 0.0 and not deterministic:
            # HF OPTAttention drops the attention weights during training
            drop_kw = dict(dropout_rate=cfg.dropout,
                           dropout_rng=self.make_rng("dropout"))
        out = dot_product_attention(q, k, v, mask=mask, **drop_kw)
        out = out.reshape(b, n, cfg.hidden_size)
        return dense("out_proj")(out, deterministic=deterministic)


class OPTDecoderLayer(nn.Module):
    config: OPTConfig
    compute_dtype: Any = jnp.bfloat16
    decode_cache_len: int = 0

    @nn.compact
    def __call__(self, x, mask=None, decode=False, deterministic=True):
        cfg = self.config
        h = LayerNormFP32(epsilon=cfg.layer_norm_eps, name="self_attn_norm")(x)
        h = OPTAttention(
            cfg, self.compute_dtype, self.decode_cache_len, name="self_attn"
        )(h, mask=mask, decode=decode, deterministic=deterministic)
        x = x + h
        h = LayerNormFP32(epsilon=cfg.layer_norm_eps, name="final_norm")(x)
        h = Dense(cfg.ffn_dim, compute_dtype=self.compute_dtype,
                  lora_rank=cfg.lora_rank, name="fc1")(h, deterministic=deterministic)
        h = nn.relu(h) if cfg.activation == "relu" else nn.gelu(h, approximate=True)
        h = Dense(cfg.hidden_size, compute_dtype=self.compute_dtype,
                  lora_rank=cfg.lora_rank, name="fc2")(h, deterministic=deterministic)
        return x + h


class OPTForCausalLM(nn.Module):
    config: OPTConfig
    compute_dtype: Any = jnp.bfloat16
    decode_cache_len: int = 0

    def setup(self):
        cfg = self.config
        self.embed_tokens_table = nn.Embed(
            cfg.vocab_size, cfg.hidden_size,
            embedding_init=nn.initializers.normal(0.02),
            param_dtype=jnp.float32, name="embed_tokens",
        )
        self.embed_positions = nn.Embed(
            cfg.max_position_embeddings + cfg.position_offset, cfg.hidden_size,
            embedding_init=nn.initializers.normal(0.02),
            param_dtype=jnp.float32, name="embed_positions",
        )
        self.layers = [
            OPTDecoderLayer(
                cfg, self.compute_dtype, self.decode_cache_len, name=f"layer_{i}"
            )
            for i in range(cfg.num_layers)
        ]
        self.final_norm = LayerNormFP32(epsilon=cfg.layer_norm_eps, name="final_norm")

    def embed_tokens(self, input_ids):
        return self.embed_tokens_table(input_ids)

    def __call__(
        self,
        inputs_embeds,
        attention_mask=None,
        decode: bool = False,
        decode_position=None,
        deterministic: bool = True,
    ):
        """inputs_embeds: (B, N, H). Returns fp32 logits (B, N, V)."""
        cfg = self.config
        b, n, _ = inputs_embeds.shape
        if decode:
            assert decode_position is not None
            positions = decode_position + jnp.arange(n)
        else:
            positions = jnp.arange(n)
        pos_embeds = self.embed_positions(positions + cfg.position_offset)

        x = inputs_embeds.astype(self.compute_dtype) + pos_embeds.astype(
            self.compute_dtype
        )
        mask = None
        if attention_mask is not None:
            if attention_mask.ndim == 2:
                mask = attention_mask[:, None, None, :].astype(bool)
            else:  # already broadcast to (B, 1|H, 1|N, K)
                mask = attention_mask.astype(bool)
        for layer in self.layers:
            x = layer(x, mask=mask, decode=decode, deterministic=deterministic)
        x = self.final_norm(x)
        logits = self.embed_tokens_table.attend(x.astype(jnp.float32))
        return logits
