"""ALBEF: align-before-fuse image-text pretraining model (flax).

Counterpart of the reference ALBEF family (``lavis/models/albef_models/``,
~2.3k LoC): ViT image encoder + BERT text encoder with cross-attention
fusion, trained with the three ALBEF objectives —

* ITC: image-text contrastive over projected cls features (queue/momentum
  distillation is deployment-configurable; the in-batch form is computed
  here, matching the reference's non-distilled branch)
* ITM: image-text matching head on the fused cls token
* MLM is delegated to the MED LM head.

Used for retrieval / VQA / NLVR fine-tunes in the reference zoo.
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
from mr_blip_tpu.models.vit import BaseViTConfig, VisionTransformer


@dataclasses.dataclass(frozen=True)
class ALBEFConfig:
    embed_dim: int = 256
    vision: BaseViTConfig = dataclasses.field(default_factory=BaseViTConfig)
    text: MedConfig = dataclasses.field(default_factory=MedConfig)
    temp: float = 0.07


def albef_base_config() -> ALBEFConfig:
    return ALBEFConfig()


def albef_tiny_config() -> ALBEFConfig:
    return ALBEFConfig(
        embed_dim=16,
        vision=BaseViTConfig(img_size=28, patch_size=14, embed_dim=32, depth=2,
                             num_heads=2),
        text=med_tiny_config(encoder_width=32),
    )


@registry.register_model("albef_feature_extractor")
class ALBEF(nn.Module):
    config: ALBEFConfig
    compute_dtype: Any = jnp.bfloat16

    def setup(self):
        cfg = self.config
        self.visual_encoder = VisionTransformer(cfg.vision, self.compute_dtype,
                                                name="visual_encoder")
        self.text_encoder = MedModel(cfg.text, self.compute_dtype,
                                     name="text_encoder")
        self.vision_proj = Dense(cfg.embed_dim, compute_dtype=self.compute_dtype,
                                 name="vision_proj")
        self.text_proj = Dense(cfg.embed_dim, compute_dtype=self.compute_dtype,
                               name="text_proj")
        self.itm_head = Dense(2, compute_dtype=self.compute_dtype,
                              name="itm_head")

    def encode_image(self, images):
        return self.visual_encoder(images)  # (B, 1+P, D)

    def encode_text(self, text_ids, text_mask=None):
        return self.text_encoder(text_ids, text_mask=text_mask, mode="text")

    def itc_features(self, images, text_ids, text_mask=None):
        """L2-normalized contrastive features for both modalities."""
        img = self.vision_proj(self.encode_image(images)[:, 0])
        txt = self.text_proj(self.encode_text(text_ids, text_mask)[:, 0])
        img = img / jnp.linalg.norm(img.astype(jnp.float32), axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt.astype(jnp.float32), axis=-1, keepdims=True)
        return img, txt

    def itm_logits(self, images, text_ids, text_mask=None):
        """Image-text matching logits from the fused cls token."""
        image_states = self.encode_image(images)
        fused = self.text_encoder(
            text_ids, text_mask=text_mask, image_states=image_states,
            mode="multimodal",
        )
        return self.itm_head(fused[:, 0])

    def __call__(self, images, text_ids, text_mask=None):
        """Training objectives: ITC loss + ITM logits for in-batch pairs."""
        img_f, txt_f = self.itc_features(images, text_ids, text_mask)
        sims = img_f @ txt_f.T / self.config.temp
        n = sims.shape[0]
        labels = jnp.arange(n)
        itc = (
            -jnp.take_along_axis(jax.nn.log_softmax(sims, -1), labels[:, None], 1).mean()
            - jnp.take_along_axis(jax.nn.log_softmax(sims.T, -1), labels[:, None], 1).mean()
        ) / 2
        itm_logits = self.itm_logits(images, text_ids, text_mask)
        return {"itc_loss": itc, "itm_logits": itm_logits, "sims": sims}
