"""BLIP-2 stage-1 (Q-Former pretraining) + feature-extractor / ITM heads.

Counterpart of the reference ``lavis/models/blip2_models/blip2_qformer.py``
(registered names ``blip2`` / ``blip2_feature_extractor``) and
``blip2_image_text_matching.py`` (``blip2_image_text_matching``): a frozen
ViT feeds the multimodal Q-Former, trained with the three-way objective —

* ITC: per-query image embeddings vs. text cls embedding, similarity is
  the max over queries (blip2_qformer.py:106-143);
* ITM: hard-negative image-text matching, 2-way head averaged over the
  query outputs (blip2_qformer.py:145-207);
* LM : image-grounded text generation — queries as a bidirectional prefix,
  text decoded causally over them (blip2_qformer.py:209-231).

TPU notes: everything is fixed-shape; the hard-negative sampling uses
Gumbel top-1 on the masked similarity rows (device-side, no host sync);
the caption decode loop is a ``lax.scan`` over a static buffer.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mr_blip_tpu.common.registry import registry
from mr_blip_tpu.models.eva_vit import EvaViT, ViTConfig, eva_vit_g_config, vit_tiny_config
from mr_blip_tpu.models.layers import Dense, LayerNormFP32
from mr_blip_tpu.models.qformer import QFormer, QFormerConfig
from mr_blip_tpu.models.t5 import cross_entropy_lm_loss


@dataclasses.dataclass(frozen=True)
class Blip2QformerConfig:
    embed_dim: int = 256
    temp: float = 0.07
    vision: ViTConfig = dataclasses.field(default_factory=eva_vit_g_config)
    qformer: QFormerConfig = dataclasses.field(
        default_factory=lambda: QFormerConfig(with_text=True)
    )


def blip2_qformer_base_config() -> Blip2QformerConfig:
    return Blip2QformerConfig()


def blip2_qformer_tiny_config() -> Blip2QformerConfig:
    from mr_blip_tpu.models.qformer import qformer_tiny_config

    q = dataclasses.replace(qformer_tiny_config(encoder_width=32),
                            with_text=True, vocab_size=992,
                            max_position_embeddings=64)
    return Blip2QformerConfig(embed_dim=16, vision=vit_tiny_config(),
                              qformer=q)


@registry.register_model("blip2_qformer")
class Blip2Qformer(nn.Module):
    config: Blip2QformerConfig
    compute_dtype: Any = jnp.bfloat16

    def setup(self):
        cfg = self.config
        self.visual_encoder = EvaViT(cfg.vision, self.compute_dtype,
                                     name="visual_encoder")
        self.ln_vision = LayerNormFP32(epsilon=1e-5, name="ln_vision")
        self.qformer = QFormer(cfg.qformer, self.compute_dtype, name="qformer")
        self.vision_proj = Dense(cfg.embed_dim, compute_dtype=self.compute_dtype,
                                 name="vision_proj")
        self.text_proj = Dense(cfg.embed_dim, compute_dtype=self.compute_dtype,
                               name="text_proj")
        self.itm_head = Dense(2, compute_dtype=self.compute_dtype,
                              name="itm_head")
        self.lm_head = Dense(cfg.qformer.vocab_size,
                             compute_dtype=self.compute_dtype, name="lm_head")

    # ------------------------------------------------------------- towers
    def encode_image(self, images):
        """Frozen-ViT tokens through ln_vision (B, N, W)."""
        return self.ln_vision(self.visual_encoder(images))

    def query_outputs(self, images):
        """Q-Former query outputs over the image (B, Q, H)."""
        return self.qformer(self.encode_image(images))

    def image_feat(self, images):
        """Per-query normalized ITC embeddings (B, Q, D)."""
        f = self.vision_proj(self.query_outputs(images)).astype(jnp.float32)
        return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    def text_feat(self, text_ids, text_mask=None):
        """Text cls ITC embedding (B, D) — text-only Q-Former pass."""
        h = self.qformer(text_ids=text_ids, text_mask=text_mask, mode="text")
        f = self.text_proj(h[:, 0]).astype(jnp.float32)
        return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    def itm_logits(self, images, text_ids, text_mask=None):
        """2-way match logits, averaged over query outputs (B, 2)."""
        states = self.encode_image(images)
        x = self.qformer(states, text_ids=text_ids, text_mask=text_mask,
                         mode="multimodal")
        q = x[:, : self.config.qformer.num_query_tokens]
        return self.itm_head(q).mean(axis=1).astype(jnp.float32)

    def itm_logits_from_states(self, image_states, text_ids, text_mask=None):
        """ITM over precomputed ln_vision'd tokens (retrieval rerank)."""
        x = self.qformer(image_states, text_ids=text_ids, text_mask=text_mask,
                         mode="multimodal")
        q = x[:, : self.config.qformer.num_query_tokens]
        return self.itm_head(q).mean(axis=1).astype(jnp.float32)

    # ----------------------------------------------------------------- LM
    def lm_logits(self, images, text_ids, text_mask=None):
        """Causal next-token logits over the text part (B, L, V)."""
        states = self.encode_image(images)
        x = self.qformer(states, text_ids=text_ids, text_mask=text_mask,
                         mode="lm")
        t = x[:, self.config.qformer.num_query_tokens:]
        return self.lm_head(t).astype(jnp.float32)

    def lm_loss(self, images, text_ids, text_mask):
        logits = self.lm_logits(images, text_ids[:, :-1], text_mask[:, :-1])
        labels = jnp.where(text_mask[:, 1:] == 1, text_ids[:, 1:], -100)
        return cross_entropy_lm_loss(logits, labels, text_mask[:, 1:])

    def lm_step_logits(self, image_states, buffer_ids, pos):
        """Next-token logits at ``pos`` of a static decode buffer (causal
        mask hides the unwritten tail; the greedy loop scans over pos)."""
        x = self.qformer(image_states, text_ids=buffer_ids, mode="lm")
        t = x[:, self.config.qformer.num_query_tokens:]
        step = jax.lax.dynamic_index_in_dim(t, pos, axis=1, keepdims=False)
        return self.lm_head(step).astype(jnp.float32)

    # ------------------------------------------------------ feature surface
    def extract_features(self, images=None, text_ids=None, text_mask=None,
                         mode="multimodal"):
        """Reference ``blip2_qformer.extract_features``: image ->
        {image_embeds (B,Q,H), image_embeds_proj}; text -> {text_embeds,
        text_embeds_proj}; multimodal -> {multimodal_embeds} (query part
        of the joint pass)."""
        assert mode in ("image", "text", "multimodal")
        out = {}
        if mode == "image":
            q = self.query_outputs(images)
            f = self.vision_proj(q).astype(jnp.float32)
            out["image_embeds"] = q
            out["image_embeds_proj"] = f / jnp.linalg.norm(f, axis=-1,
                                                           keepdims=True)
        elif mode == "text":
            h = self.qformer(text_ids=text_ids, text_mask=text_mask,
                             mode="text")
            f = self.text_proj(h[:, 0]).astype(jnp.float32)
            out["text_embeds"] = h
            out["text_embeds_proj"] = f / jnp.linalg.norm(f, axis=-1,
                                                          keepdims=True)
        else:
            states = self.encode_image(images)
            x = self.qformer(states, text_ids=text_ids, text_mask=text_mask,
                             mode="multimodal")
            out["multimodal_embeds"] = x[:, : self.config.qformer.num_query_tokens]
        return out

    # --------------------------------------------------- pretraining loss
    def __call__(self, images, text_ids, text_mask=None, rng=None):
        """Three-way stage-1 objective; ``rng`` drives hard-negative
        sampling (omitted -> in-batch shifted negatives, deterministic)."""
        cfg = self.config
        b = images.shape[0]
        image_states = self.encode_image(images)
        q = self.qformer(image_states)
        img_f = self.vision_proj(q).astype(jnp.float32)
        img_f = img_f / jnp.linalg.norm(img_f, axis=-1, keepdims=True)
        txt_f = self.text_feat(text_ids, text_mask)

        # ITC: (B, B, Q) query-text sims, max over queries
        sim = jnp.einsum("iqd,jd->ijq", img_f, txt_f).max(-1) / cfg.temp
        labels = jnp.arange(b)
        itc = (
            -jnp.take_along_axis(jax.nn.log_softmax(sim, -1),
                                 labels[:, None], 1).mean()
            - jnp.take_along_axis(jax.nn.log_softmax(sim.T, -1),
                                  labels[:, None], 1).mean()
        ) / 2

        # ITM with hard negatives from the masked similarity rows
        diag_mask = jnp.eye(b, dtype=bool)
        neg_sim = jnp.where(diag_mask, -1e4, sim)
        if rng is not None:
            g1, g2 = jax.random.split(rng)
            neg_txt = jnp.argmax(
                neg_sim + jax.random.gumbel(g1, neg_sim.shape), axis=1)
            neg_img = jnp.argmax(
                neg_sim.T + jax.random.gumbel(g2, neg_sim.shape), axis=1)
        else:
            neg_txt = (labels + 1) % b
            neg_img = (labels + 1) % b

        tm = text_mask if text_mask is not None else jnp.ones_like(text_ids)
        all_states = jnp.concatenate(
            [image_states, image_states, image_states[neg_img]], axis=0)
        all_ids = jnp.concatenate(
            [text_ids, text_ids[neg_txt], text_ids], axis=0)
        all_mask = jnp.concatenate([tm, tm[neg_txt], tm], axis=0)
        logits = self.itm_logits_from_states(all_states, all_ids, all_mask)
        itm_labels = jnp.concatenate(
            [jnp.ones(b, jnp.int32), jnp.zeros(2 * b, jnp.int32)])
        ll = jax.nn.log_softmax(logits, -1)
        itm = -jnp.take_along_axis(ll, itm_labels[:, None], 1).mean()

        lm = self.lm_loss(images, text_ids, tm)
        return {"loss": itc + itm + lm, "loss_itc": itc, "loss_itm": itm,
                "loss_lm": lm}
