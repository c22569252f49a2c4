"""BLIP v1: captioning / retrieval / VQA over the MED backbone (flax).

Counterpart of the reference BLIP-v1 family (``lavis/models/blip_models/``,
~3.0k LoC incl. ``med.py`` and ``nlvr_encoder.py``): ViT image encoder with
the MED text stack in its three modes —

* retrieval: ITC features + ITM head (shared with ALBEF's recipe)
* captioning: causal MED decoder with LM head and greedy/beam decoding
* VQA: question encoded multimodally, answer decoded causally over it
* NLVR: two-image variant (both image token sets concatenated for
  cross-attention, reference nlvr_encoder.py's merged attention).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mr_blip_tpu.common.registry import registry
from mr_blip_tpu.models.layers import Dense
from mr_blip_tpu.models.med import MedConfig, MedLMHead, MedModel, med_tiny_config
from mr_blip_tpu.models.t5 import cross_entropy_lm_loss
from mr_blip_tpu.models.vit import BaseViTConfig, VisionTransformer


@dataclasses.dataclass(frozen=True)
class BLIPConfig:
    embed_dim: int = 256
    vision: BaseViTConfig = dataclasses.field(default_factory=BaseViTConfig)
    text: MedConfig = dataclasses.field(default_factory=MedConfig)
    temp: float = 0.07
    # >0 adds a classification head over the fused cls (reference
    # blip_classification.py cls_head; SNLI-VE uses 3)
    num_classes: int = 0


def blip_base_config() -> BLIPConfig:
    return BLIPConfig()


def blip_tiny_config() -> BLIPConfig:
    return BLIPConfig(
        embed_dim=16,
        vision=BaseViTConfig(img_size=28, patch_size=14, embed_dim=32, depth=2,
                             num_heads=2),
        text=med_tiny_config(encoder_width=32),
    )


@registry.register_model("blip_v1")
class BLIPv1(nn.Module):
    config: BLIPConfig
    compute_dtype: Any = jnp.bfloat16

    def setup(self):
        cfg = self.config
        self.visual_encoder = VisionTransformer(cfg.vision, self.compute_dtype,
                                                name="visual_encoder")
        self.text_encoder = MedModel(cfg.text, self.compute_dtype,
                                     name="text_encoder")
        self.text_decoder = MedModel(cfg.text, self.compute_dtype,
                                     name="text_decoder")
        self.lm_head = MedLMHead(cfg.text, self.compute_dtype, name="lm_head")
        self.vision_proj = Dense(cfg.embed_dim, compute_dtype=self.compute_dtype,
                                 name="vision_proj")
        self.text_proj = Dense(cfg.embed_dim, compute_dtype=self.compute_dtype,
                               name="text_proj")
        self.itm_head = Dense(2, compute_dtype=self.compute_dtype,
                              name="itm_head")
        if cfg.num_classes > 0:
            self.cls_head = Dense(cfg.num_classes,
                                  compute_dtype=self.compute_dtype,
                                  name="cls_head")

    def classify(self, images, text_ids, text_mask=None):
        """Fused-cls classification (reference blip_classification.py)."""
        assert self.config.num_classes > 0
        fused = self.question_states(images, text_ids, text_mask)
        return self.cls_head(fused[:, 0]).astype(jnp.float32)

    # ------------------------------------------------------ tower pieces
    def encode_image(self, images):
        """All visual tokens (B, N, H) — computed once, reused by the beam
        decode loop and ITM reranking."""
        return self.visual_encoder(images)

    def image_feat(self, images):
        """L2-normalized ITC image feature (B, embed_dim)."""
        f = self.vision_proj(self.visual_encoder(images)[:, 0])
        return f / jnp.linalg.norm(f.astype(jnp.float32), axis=-1, keepdims=True)

    def text_feat(self, text_ids, text_mask=None):
        """L2-normalized ITC text feature (B, embed_dim)."""
        f = self.text_proj(
            self.text_encoder(text_ids, text_mask=text_mask, mode="text")[:, 0]
        )
        return f / jnp.linalg.norm(f.astype(jnp.float32), axis=-1, keepdims=True)

    def itm_logits_from_states(self, image_states, text_ids, text_mask=None):
        """ITM head over precomputed visual tokens (rerank stage: the same
        image's tokens score many candidate texts without re-running ViT)."""
        fused = self.text_encoder(
            text_ids, text_mask=text_mask, image_states=image_states,
            mode="multimodal",
        )
        return self.itm_head(fused[:, 0])

    # ---------------------------------------------------------- retrieval
    def itc_features(self, images, text_ids, text_mask=None):
        img = self.vision_proj(self.visual_encoder(images)[:, 0])
        txt = self.text_proj(
            self.text_encoder(text_ids, text_mask=text_mask, mode="text")[:, 0]
        )
        img = img / jnp.linalg.norm(img.astype(jnp.float32), axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt.astype(jnp.float32), axis=-1, keepdims=True)
        return img, txt

    def itm_logits(self, images, text_ids, text_mask=None):
        image_states = self.visual_encoder(images)
        fused = self.text_encoder(
            text_ids, text_mask=text_mask, image_states=image_states,
            mode="multimodal",
        )
        return self.itm_head(fused[:, 0])

    # --------------------------------------------------------- captioning
    def caption_loss(self, images, caption_ids, caption_mask):
        """Teacher-forced LM loss; token 0 is the [DEC] prompt token."""
        image_states = self.visual_encoder(images)
        hidden = self.text_decoder(
            caption_ids[:, :-1], text_mask=caption_mask[:, :-1],
            image_states=image_states, mode="decoder",
        )
        logits = self.lm_head(hidden)
        labels = jnp.where(caption_mask[:, 1:] == 1, caption_ids[:, 1:], -100)
        return cross_entropy_lm_loss(logits, labels, caption_mask[:, 1:])

    def caption_step_logits(self, images, prefix_ids):
        """Logits for the next token after ``prefix_ids`` (greedy decoding
        driver lives host-side; BLIP captions are short)."""
        image_states = self.visual_encoder(images)
        hidden = self.text_decoder(
            prefix_ids, image_states=image_states, mode="decoder"
        )
        return self.lm_head(hidden)[:, -1]

    def caption_step_logits_at(self, images, buffer_ids, pos):
        """Next-token logits at ``pos`` of a fixed-size padded buffer —
        the causal mask ignores the not-yet-written tail, so one static
        shape serves every decode step (scan-friendly on TPU)."""
        image_states = self.visual_encoder(images)
        hidden = self.text_decoder(
            buffer_ids, image_states=image_states, mode="decoder"
        )
        step = jax.lax.dynamic_index_in_dim(hidden, pos, axis=1, keepdims=False)
        return self.lm_head(step)

    def caption_logits_from_states(self, image_states, buffer_ids, pos):
        """Same as ``caption_step_logits_at`` but over precomputed visual
        tokens — the beam-search decode step (ViT runs once, beams share
        the expanded states; MED has no KV cache, captions are short)."""
        hidden = self.text_decoder(
            buffer_ids, image_states=image_states, mode="decoder"
        )
        step = jax.lax.dynamic_index_in_dim(hidden, pos, axis=1, keepdims=False)
        return self.lm_head(step)

    # ---------------------------------------------------------------- VQA
    def vqa_answer_loss(self, images, question_ids, question_mask,
                        answer_ids, answer_mask):
        image_states = self.visual_encoder(images)
        q_states = self.text_encoder(
            question_ids, text_mask=question_mask, image_states=image_states,
            mode="multimodal",
        )
        hidden = self.text_decoder(
            answer_ids[:, :-1], text_mask=answer_mask[:, :-1],
            image_states=q_states, image_mask=question_mask, mode="decoder",
        )
        logits = self.lm_head(hidden)
        labels = jnp.where(answer_mask[:, 1:] == 1, answer_ids[:, 1:], -100)
        return cross_entropy_lm_loss(logits, labels, answer_mask[:, 1:])

    def extract_features(self, images=None, text_ids=None, text_mask=None,
                         mode="multimodal"):
        """Reference ``blip_feature_extractor.extract_features`` surface:
        mode "image" -> {image_embeds, image_embeds_proj}; "text" ->
        {text_embeds, text_embeds_proj}; "multimodal" ->
        {multimodal_embeds} (fused hidden states). Projected features are
        L2-normalized ITC vectors."""
        assert mode in ("image", "text", "multimodal")
        out = {}
        if mode == "image":
            states = self.visual_encoder(images)
            proj = self.vision_proj(states[:, 0])
            out["image_embeds"] = states
            out["image_embeds_proj"] = proj / jnp.linalg.norm(
                proj.astype(jnp.float32), axis=-1, keepdims=True)
        elif mode == "text":
            states = self.text_encoder(text_ids, text_mask=text_mask,
                                       mode="text")
            proj = self.text_proj(states[:, 0])
            out["text_embeds"] = states
            out["text_embeds_proj"] = proj / jnp.linalg.norm(
                proj.astype(jnp.float32), axis=-1, keepdims=True)
        else:
            image_states = self.visual_encoder(images)
            out["multimodal_embeds"] = self.text_encoder(
                text_ids, text_mask=text_mask, image_states=image_states,
                mode="multimodal",
            )
        return out

    def pretrain_states(self, images, text_ids, text_mask=None):
        """(image_states, img_feat, txt_feat) — the shared encoder pass of
        the pretraining objective. Same surface as ALBEF.pretrain_states so
        ``albef.albef_pretrain_losses`` (momentum distillation + queues +
        hard-negative ITM, reference blip_pretrain.py:90-180) drives BLIP
        unchanged: the momentum subtrees (visual_encoder / text_encoder /
        vision_proj / text_proj) exist under the same names here."""
        image_states = self.visual_encoder(images)
        img = self.vision_proj(image_states[:, 0])
        txt = self.text_proj(
            self.text_encoder(text_ids, text_mask=text_mask, mode="text")[:, 0]
        )
        img = img / jnp.linalg.norm(img.astype(jnp.float32), axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt.astype(jnp.float32), axis=-1, keepdims=True)
        return image_states, img, txt

    def itm_logits_with_states(self, image_states, text_ids, text_mask=None):
        """Alias matching ALBEF's method name (albef_pretrain_losses)."""
        return self.itm_logits_from_states(image_states, text_ids, text_mask)

    def question_states(self, images, question_ids, question_mask=None):
        """Fused question representation (shared surface with AlbefVQA so
        models/albef.py::rank_answers ranks candidate lists for BLIP too —
        the reference BLIP VQA uses the same two-stage recipe)."""
        image_states = self.visual_encoder(images)
        return self.text_encoder(
            question_ids, text_mask=question_mask, image_states=image_states,
            mode="multimodal",
        )

    def answer_logits(self, q_states, q_mask, answer_ids, answer_mask=None):
        hidden = self.text_decoder(
            answer_ids, text_mask=answer_mask, image_states=q_states,
            image_mask=q_mask, mode="decoder",
        )
        return self.lm_head(hidden)

    # --------------------------------------------------------------- NLVR
    def nlvr_logits(self, images_a, images_b, text_ids, text_mask=None):
        """Two-image reasoning: cross-attend to both images' tokens."""
        states = jnp.concatenate(
            [self.visual_encoder(images_a), self.visual_encoder(images_b)], axis=1
        )
        fused = self.text_encoder(
            text_ids, text_mask=text_mask, image_states=states, mode="multimodal"
        )
        return self.itm_head(fused[:, 0])

    def __call__(self, images, text_ids, text_mask=None):
        img_f, txt_f = self.itc_features(images, text_ids, text_mask)
        sims = img_f @ txt_f.T / self.config.temp
        n = sims.shape[0]
        labels = jnp.arange(n)
        itc = (
            -jnp.take_along_axis(jax.nn.log_softmax(sims, -1), labels[:, None], 1).mean()
            - jnp.take_along_axis(jax.nn.log_softmax(sims.T, -1), labels[:, None], 1).mean()
        ) / 2
        lm = self.caption_loss(images, text_ids, (text_mask if text_mask is not None
                                                  else jnp.ones_like(text_ids)))
        itm_logits = self.itm_logits(images, text_ids, text_mask)
        return {"itc_loss": itc, "lm_loss": lm, "itm_logits": itm_logits}
