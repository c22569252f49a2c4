"""GPT video dialogue model (flax).

Counterpart of the reference GPT dialogue family
(``lavis/models/gpt_models/gpt_dialogue.py``, AVSD video-grounded dialogue):
a GPT-2-style causal LM (the OPT decoder stack with GELU FFN and no
position offset) consuming projected video (and optional audio) features
prepended to the tokenized dialogue history; the LM loss covers the
response region only.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mr_blip_tpu.common.registry import registry
from mr_blip_tpu.models.layers import Dense
from mr_blip_tpu.models.opt import OPTConfig, OPTForCausalLM


def gpt2_config(**kw) -> OPTConfig:
    defaults = dict(
        vocab_size=50257, hidden_size=768, num_layers=12, num_heads=12,
        ffn_dim=3072, max_position_embeddings=1024, position_offset=0,
        activation="gelu", dropout=0.1,
    )
    defaults.update(kw)
    return OPTConfig(**defaults)


def gpt2_tiny_config(**kw) -> OPTConfig:
    defaults = dict(
        vocab_size=256, hidden_size=32, num_layers=2, num_heads=4, ffn_dim=64,
        max_position_embeddings=128, position_offset=0, activation="gelu",
        dropout=0.0,
    )
    defaults.update(kw)
    return OPTConfig(**defaults)


@registry.register_model("gpt_dialogue")
class GPTDialogue(nn.Module):
    """Video/audio-conditioned dialogue LM."""

    config: OPTConfig
    video_feature_dim: int = 768
    audio_feature_dim: int = 0
    compute_dtype: Any = jnp.bfloat16

    def setup(self):
        self.lm = OPTForCausalLM(self.config, self.compute_dtype, name="lm")
        self.video_proj = Dense(
            self.config.hidden_size, compute_dtype=self.compute_dtype,
            name="video_proj",
        )
        if self.audio_feature_dim > 0:
            self.audio_proj = Dense(
                self.config.hidden_size, compute_dtype=self.compute_dtype,
                name="audio_proj",
            )

    def _assemble(self, video_feats, text_ids, audio_feats=None):
        parts = [self.video_proj(video_feats.astype(self.compute_dtype))]
        if audio_feats is not None:
            parts.append(self.audio_proj(audio_feats.astype(self.compute_dtype)))
        parts.append(
            self.lm.embed_tokens_table(text_ids).astype(self.compute_dtype)
        )
        return jnp.concatenate(parts, axis=1)

    def __call__(self, video_feats, text_ids, text_mask=None, audio_feats=None,
                 deterministic=True):
        """Returns LM logits over the text region (B, N_text, V)."""
        embeds = self._assemble(video_feats, text_ids, audio_feats)
        prefix = embeds.shape[1] - text_ids.shape[1]
        mask = None
        if text_mask is not None:
            mask = jnp.concatenate(
                [jnp.ones((text_ids.shape[0], prefix), jnp.int32), text_mask],
                axis=1,
            )
        logits = self.lm(embeds, attention_mask=mask,
                         deterministic=deterministic)
        return logits[:, prefix:]

    def loss(self, video_feats, text_ids, text_mask, response_mask,
             audio_feats=None, deterministic=True):
        """Next-token loss on positions where ``response_mask`` is 1."""
        logits = self(video_feats, text_ids, text_mask, audio_feats,
                      deterministic=deterministic)
        log_probs = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
        targets = text_ids[:, 1:]
        token_ll = jnp.take_along_axis(log_probs, targets[..., None], -1)[..., 0]
        w = (response_mask[:, 1:] * text_mask[:, 1:]).astype(jnp.float32)
        return -(token_ll * w).sum() / jnp.maximum(w.sum(), 1.0)
