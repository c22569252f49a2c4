"""ALPRO: video-text alignment model (flax).

Counterpart of the reference ALPRO family (``lavis/models/alpro_models/``,
~0.9k LoC): TimeSformer video encoder + BERT text encoder, video-text
contrastive alignment plus a multimodal fusion head for video-text matching
/ retrieval and video QA classification.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mr_blip_tpu.common.registry import registry
from mr_blip_tpu.models.layers import Dense
from mr_blip_tpu.models.med import MedConfig, MedModel, med_tiny_config
from mr_blip_tpu.models.timesformer import (
    TimeSformer,
    TimeSformerConfig,
    timesformer_tiny_config,
)


@dataclasses.dataclass(frozen=True)
class ALPROConfig:
    embed_dim: int = 256
    vision: TimeSformerConfig = dataclasses.field(default_factory=TimeSformerConfig)
    text: MedConfig = dataclasses.field(default_factory=MedConfig)
    temp: float = 0.07
    num_classes: int = 0  # >0 for video-QA classification heads


def alpro_base_config(**kw) -> ALPROConfig:
    # bert_config_alpro.json: 12 layers split at fusion_layer 6 (text
    # encoder below, video-text fusion above), vocab 30522
    defaults = dict(text=MedConfig(vocab_size=30522, fusion_layer=6))
    defaults.update(kw)
    return ALPROConfig(**defaults)


def alpro_tiny_config(**kw) -> ALPROConfig:
    defaults = dict(
        embed_dim=16,
        vision=timesformer_tiny_config(),
        text=med_tiny_config(encoder_width=32),
    )
    defaults.update(kw)
    return ALPROConfig(**defaults)


@registry.register_model("alpro_retrieval")
class ALPRO(nn.Module):
    config: ALPROConfig
    compute_dtype: Any = jnp.bfloat16

    def setup(self):
        cfg = self.config
        self.visual_encoder = TimeSformer(cfg.vision, self.compute_dtype,
                                          name="visual_encoder")
        self.text_encoder = MedModel(cfg.text, self.compute_dtype,
                                     name="text_encoder")
        self.vision_proj = Dense(cfg.embed_dim, compute_dtype=self.compute_dtype,
                                 name="vision_proj")
        self.text_proj = Dense(cfg.embed_dim, compute_dtype=self.compute_dtype,
                               name="text_proj")
        self.itm_head = Dense(2, compute_dtype=self.compute_dtype,
                              name="itm_head")
        if cfg.num_classes > 0:
            self.classifier = Dense(
                cfg.num_classes, compute_dtype=self.compute_dtype,
                name="classifier",
            )

    def vtc_features(self, video, text_ids, text_mask=None):
        vid = self.vision_proj(self.visual_encoder(video)[:, 0])
        txt = self.text_proj(
            self.text_encoder(text_ids, text_mask=text_mask, mode="text")[:, 0]
        )
        vid = vid / jnp.linalg.norm(vid.astype(jnp.float32), axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt.astype(jnp.float32), axis=-1, keepdims=True)
        return vid, txt

    def fused_cls(self, video, text_ids, text_mask=None):
        video_states = self.visual_encoder(video)
        if self.config.text.fusion_layer is not None:
            # reference ALPRO: text layers [0, 6) then fusion layers
            # [6, 12) cross-attending the video tokens
            h = self.text_encoder(text_ids, text_mask=text_mask, mode="text")
            fused = self.text_encoder(
                text_ids, text_mask=text_mask, image_states=video_states,
                mode="fusion", input_embeds=h,
            )
        else:
            fused = self.text_encoder(
                text_ids, text_mask=text_mask, image_states=video_states,
                mode="multimodal",
            )
        return fused[:, 0]

    def vtm_logits(self, video, text_ids, text_mask=None):
        return self.itm_head(self.fused_cls(video, text_ids, text_mask))

    def qa_logits(self, video, text_ids, text_mask=None):
        assert self.config.num_classes > 0
        return self.classifier(self.fused_cls(video, text_ids, text_mask))

    def __call__(self, video, text_ids, text_mask=None):
        vid_f, txt_f = self.vtc_features(video, text_ids, text_mask)
        sims = vid_f @ txt_f.T / self.config.temp
        n = sims.shape[0]
        labels = jnp.arange(n)
        vtc = (
            -jnp.take_along_axis(jax.nn.log_softmax(sims, -1), labels[:, None], 1).mean()
            - jnp.take_along_axis(jax.nn.log_softmax(sims.T, -1), labels[:, None], 1).mean()
        ) / 2
        vtm_logits = self.vtm_logits(video, text_ids, text_mask)
        out = {"vtc_loss": vtc, "vtm_logits": vtm_logits}
        if self.config.num_classes > 0:
            out["qa_logits"] = self.qa_logits(video, text_ids, text_mask)
        return out
