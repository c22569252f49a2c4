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
        return self.vtc_features_with_states(
            self.visual_encoder(video), text_ids, text_mask)

    def vtc_features_with_states(self, video_states, text_ids,
                                 text_mask=None):
        vid = self.vision_proj(video_states[:, 0])
        txt = self.text_proj(
            self.text_encoder(text_ids, text_mask=text_mask, mode="text")[:, 0]
        )
        vid = vid / jnp.linalg.norm(vid.astype(jnp.float32), axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt.astype(jnp.float32), axis=-1, keepdims=True)
        return vid, txt

    def fused_cls(self, video, text_ids, text_mask=None):
        return self.fused_cls_with_states(
            self.visual_encoder(video), text_ids, text_mask)

    def vtm_logits(self, video, text_ids, text_mask=None):
        return self.itm_head(self.fused_cls(video, text_ids, text_mask))

    def fused_cls_with_states(self, video_states, text_ids, text_mask=None):
        """Fusion head over precomputed video token states — lets the
        hard-negative VTM driver reuse one visual encode for all rows."""
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

    def vtm_logits_with_states(self, video_states, text_ids, text_mask=None):
        return self.itm_head(
            self.fused_cls_with_states(video_states, text_ids, text_mask))

    def encode_video(self, video):
        return self.visual_encoder(video)

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


def alpro_retrieval_losses(module, params, rng, video, text_ids,
                           text_mask=None):
    """VTC + hard-negative VTM training losses.

    Counterpart of the reference's ``alpro_retrieval.py:109-243``
    (forward + ``compute_vtm``): in-batch VTC with symmetric CE, then a
    VTM pass over positives and HARD negatives mined from the VTC
    similarity — for each video a negative text sampled with probability
    softmax(sim_v2t) (self masked to -inf), and for each text a negative
    video likewise from sim_t2v (``:166-207``; the reference's
    per-row ``torch.multinomial(softmax(w))`` == ``jax.random.categorical``
    on the masked logits, the same driver shape as the ALBEF/BLIP ITM,
    models/albef.py). Rows: b positives, then (text_i, neg_video_i) and
    (neg_text_i, video_i) — labels [1]*b + [0]*2b (``:222-231``).

    The video tower runs ONCE: fusion rows reuse the token states via
    ``vtm_logits_with_states`` (the reference recomputes embeddings; the
    mining distribution is identical).

    Returns a dict with ``vtc_loss``, ``vtm_loss``, ``loss`` (sum, like
    the reference's ``loss = loss_vtc + loss_vtm``), plus the mined
    indices and masked weights for tests.
    """
    b = text_ids.shape[0]
    if text_mask is None:
        text_mask = jnp.ones_like(text_ids)

    video_states = module.apply({"params": params}, video,
                                method="encode_video")
    vid_f, txt_f = module.apply(
        {"params": params}, video_states, text_ids, text_mask,
        method="vtc_features_with_states",
    )
    sims = vid_f.astype(jnp.float32) @ txt_f.astype(jnp.float32).T
    sims = sims / module.config.temp
    labels = jnp.arange(b)
    vtc = (
        -jnp.take_along_axis(jax.nn.log_softmax(sims, -1),
                             labels[:, None], 1).mean()
        - jnp.take_along_axis(jax.nn.log_softmax(sims.T, -1),
                              labels[:, None], 1).mean()
    ) / 2

    # hard-negative mining from the VTC similarity, diagonal masked
    # (reference :172-181: fill_diagonal_(-inf) then softmax/multinomial)
    neg_inf = jnp.finfo(jnp.float32).min
    eye = jnp.eye(b, dtype=bool)
    w_v2t = jax.lax.stop_gradient(jnp.where(eye, neg_inf, sims))    # per video
    w_t2v = jax.lax.stop_gradient(jnp.where(eye, neg_inf, sims.T))  # per text
    r1, r2 = jax.random.split(rng)
    neg_text_idx = jax.random.categorical(r1, w_v2t, axis=-1)
    neg_video_idx = jax.random.categorical(r2, w_t2v, axis=-1)

    def vtm(states, ids, mask):
        return module.apply({"params": params}, states, ids, mask,
                            method="vtm_logits_with_states")

    pos = vtm(video_states, text_ids, text_mask)
    neg_v = vtm(video_states[neg_video_idx], text_ids, text_mask)
    neg_t = vtm(video_states, text_ids[neg_text_idx],
                text_mask[neg_text_idx])
    vtm_logits = jnp.concatenate([pos, neg_v, neg_t], axis=0)
    vtm_labels = jnp.concatenate(
        [jnp.ones(b, jnp.int32), jnp.zeros(2 * b, jnp.int32)])
    vtm_loss = -jnp.take_along_axis(
        jax.nn.log_softmax(vtm_logits.astype(jnp.float32), -1),
        vtm_labels[:, None], 1,
    ).mean()

    return {
        "loss": vtc + vtm_loss,
        "vtc_loss": vtc,
        "vtm_loss": vtm_loss,
        "vtm_logits": vtm_logits,
        "vtm_labels": vtm_labels,
        "neg_text_idx": neg_text_idx,
        "neg_video_idx": neg_video_idx,
        "w_v2t": w_v2t,
        "w_t2v": w_t2v,
    }
