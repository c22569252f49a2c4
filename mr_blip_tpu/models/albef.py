"""ALBEF: align-before-fuse image-text pretraining model (flax).

Counterpart of the reference ALBEF family (``lavis/models/albef_models/``,
~2.3k LoC): ViT image encoder + BERT text encoder with cross-attention
fusion, trained with the three ALBEF objectives —

* ITC: image-text contrastive over projected cls features, with momentum
  distillation + feature queues (``albef_pretrain_losses`` below mirrors
  albef_pretrain.py:105-310); ``__call__`` keeps the simple in-batch form
  used by the eval paths
* ITM: image-text matching head on the fused cls token, with hard-negative
  mining in the pretraining objective
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
    # med_config_albef.json: 12 layers split at fusion_layer 6 — layers 0-5
    # are the text encoder, 6-11 the multimodal fusion encoder
    return ALBEFConfig(
        text=MedConfig(vocab_size=30522, fusion_layer=6),
    )


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

    def image_feat(self, images):
        """L2-normalized ITC image feature (retrieval-wrapper surface)."""
        f = self.vision_proj(self.encode_image(images)[:, 0])
        return f / jnp.linalg.norm(f.astype(jnp.float32), axis=-1, keepdims=True)

    def text_feat(self, text_ids, text_mask=None):
        f = self.text_proj(self.encode_text(text_ids, text_mask)[:, 0])
        return f / jnp.linalg.norm(f.astype(jnp.float32), axis=-1, keepdims=True)

    def itm_logits_from_states(self, image_states, text_ids, text_mask=None):
        """Alias matching the BLIP retrieval-wrapper surface."""
        return self.itm_logits_with_states(image_states, text_ids, text_mask)

    def itm_logits(self, images, text_ids, text_mask=None):
        """Image-text matching logits from the fused cls token."""
        image_states = self.encode_image(images)
        return self.itm_logits_with_states(image_states, text_ids, text_mask)

    def fused_states(self, image_states, text_ids, text_mask=None):
        """Multimodal hidden states. With ``fusion_layer`` set (ALBEF: 6)
        this is the reference two-stage pass — text layers [0, 6) then
        fusion layers [6, 12) with cross-attention continuing from the
        text output (albef_pretrain.py mode="text" + mode="fusion");
        otherwise every layer cross-attends (BLIP behavior)."""
        if self.config.text.fusion_layer is not None:
            h = self.text_encoder(text_ids, text_mask=text_mask, mode="text")
            return self.text_encoder(
                text_ids, text_mask=text_mask, image_states=image_states,
                mode="fusion", input_embeds=h,
            )
        return self.text_encoder(
            text_ids, text_mask=text_mask, image_states=image_states,
            mode="multimodal",
        )

    def itm_logits_with_states(self, image_states, text_ids, text_mask=None):
        """ITM over precomputed image states (hard-negative pairing reuses
        gathered image token sets, albef_pretrain.py:236-274)."""
        fused = self.fused_states(image_states, text_ids, text_mask)
        return self.itm_head(fused[:, 0])

    def pretrain_states(self, images, text_ids, text_mask=None):
        """(image_states, img_feat, txt_feat): one encoder pass shared by
        the ITC and ITM objectives."""
        image_states = self.encode_image(images)
        img = self.vision_proj(image_states[:, 0])
        txt = self.text_proj(self.encode_text(text_ids, text_mask)[:, 0])
        img = img / jnp.linalg.norm(img.astype(jnp.float32), axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt.astype(jnp.float32), axis=-1, keepdims=True)
        return image_states, img, txt

    def extract_features(self, images=None, text_ids=None, text_mask=None,
                         mode="multimodal"):
        """Reference ``albef_feature_extractor`` surface (same contract as
        BLIP's: image/text modes return raw + L2-normalized projected
        features; multimodal returns the fused hidden states — through the
        fusion_layer split when configured)."""
        assert mode in ("image", "text", "multimodal")
        out = {}
        if mode == "image":
            states = self.encode_image(images)
            proj = self.vision_proj(states[:, 0])
            out["image_embeds"] = states
            out["image_embeds_proj"] = proj / jnp.linalg.norm(
                proj.astype(jnp.float32), axis=-1, keepdims=True)
        elif mode == "text":
            states = self.encode_text(text_ids, text_mask)
            proj = self.text_proj(states[:, 0])
            out["text_embeds"] = states
            out["text_embeds_proj"] = proj / jnp.linalg.norm(
                proj.astype(jnp.float32), axis=-1, keepdims=True)
        else:
            image_states = self.encode_image(images)
            out["multimodal_embeds"] = self.fused_states(
                image_states, text_ids, text_mask)
        return out

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


# ----------------------------------------------------------------------------
# ALBEF pretraining objectives with momentum distillation + feature queues
# (reference albef_pretrain.py:105-310), as pure functions over an explicit
# momentum state so the whole step stays jittable/donate-able on TPU.
# ----------------------------------------------------------------------------

MOMENTUM_SUBTREES = ("visual_encoder", "text_encoder", "vision_proj", "text_proj")


def init_momentum_state(params, embed_dim, queue_size=1024, seed=0):
    """EMA param copy + normalized random feature queues + ring pointer."""
    rng = jax.random.PRNGKey(seed)
    r1, r2 = jax.random.split(rng)
    iq = jax.random.normal(r1, (queue_size, embed_dim), jnp.float32)
    tq = jax.random.normal(r2, (queue_size, embed_dim), jnp.float32)
    iq = iq / jnp.linalg.norm(iq, axis=-1, keepdims=True)
    tq = tq / jnp.linalg.norm(tq, axis=-1, keepdims=True)
    return {
        "m_params": {k: params[k] for k in MOMENTUM_SUBTREES},
        "image_queue": iq,
        "text_queue": tq,
        "queue_ptr": jnp.zeros((), jnp.int32),
    }


def _ema(m_tree, tree, momentum):
    return jax.tree.map(
        lambda m, p: m * momentum + p.astype(m.dtype) * (1.0 - momentum),
        m_tree, tree,
    )


def _soft_ce(logits, targets):
    return -(targets * jax.nn.log_softmax(logits, axis=-1)).sum(-1).mean()


def albef_pretrain_losses(module, params, state, images, text_ids,
                          text_mask, rng, alpha=0.4, momentum=0.995):
    """One ALBEF pretraining objective evaluation.

    Returns (losses dict, new momentum state). Mirrors the reference:

    * EMA momentum encoders refresh first (albef_pretrain.py:167);
    * ITC logits score the batch against [momentum batch ‖ queue] features,
      targets = alpha * softmax(momentum sims) + (1-alpha) * one-hot;
    * hard-negative ITM: one negative text per image and one negative image
      per text, sampled from the in-batch similarity softmax with the
      diagonal masked (albef_pretrain.py:223-280), labels [1_B, 0_2B];
    * queues ring-enqueue the momentum features (queue_size % B == 0).

    ``alpha`` carries the caller's ramp-up schedule
    (reference _rampup_factor).
    """
    b = images.shape[0]
    temp = module.config.temp
    new_m = _ema(state["m_params"],
                 {k: params[k] for k in MOMENTUM_SUBTREES}, momentum)

    image_states, img_f, txt_f = module.apply(
        {"params": params}, images, text_ids, text_mask,
        method="pretrain_states",
    )
    m_params_full = {**params, **new_m}
    _, img_f_m, txt_f_m = module.apply(
        {"params": m_params_full}, images, text_ids, text_mask,
        method="pretrain_states",
    )
    img_f_m = jax.lax.stop_gradient(img_f_m.astype(jnp.float32))
    txt_f_m = jax.lax.stop_gradient(txt_f_m.astype(jnp.float32))

    image_feat_all = jnp.concatenate([img_f_m, state["image_queue"]], axis=0)
    text_feat_all = jnp.concatenate([txt_f_m, state["text_queue"]], axis=0)

    sim_i2t = img_f.astype(jnp.float32) @ text_feat_all.T / temp   # (B, B+Q)
    sim_t2i = txt_f.astype(jnp.float32) @ image_feat_all.T / temp
    sim_i2t_m = jax.lax.stop_gradient(img_f_m @ text_feat_all.T / temp)
    sim_t2i_m = jax.lax.stop_gradient(txt_f_m @ image_feat_all.T / temp)

    onehot = jax.nn.one_hot(jnp.arange(b), sim_i2t.shape[1])
    t_i2t = alpha * jax.nn.softmax(sim_i2t_m, -1) + (1 - alpha) * onehot
    t_t2i = alpha * jax.nn.softmax(sim_t2i_m, -1) + (1 - alpha) * onehot
    loss_itc = (_soft_ce(sim_i2t, t_i2t) + _soft_ce(sim_t2i, t_t2i)) / 2

    # hard negatives from the in-batch block, diagonal masked
    neg_inf = jnp.finfo(jnp.float32).min
    w_i2t = jnp.where(jnp.eye(b, dtype=bool), neg_inf, sim_i2t[:, :b])
    w_t2i = jnp.where(jnp.eye(b, dtype=bool), neg_inf, sim_t2i[:, :b])
    r1, r2 = jax.random.split(rng)
    neg_text_idx = jax.random.categorical(r1, w_i2t, axis=-1)   # per image
    neg_image_idx = jax.random.categorical(r2, w_t2i, axis=-1)  # per text

    if text_mask is None:
        text_mask = jnp.ones_like(text_ids)
    pos_logits = module.apply(
        {"params": params}, image_states, text_ids, text_mask,
        method="itm_logits_with_states",
    )
    # image with its hard-negative text; text with its hard-negative image
    neg1 = module.apply(
        {"params": params}, image_states, text_ids[neg_text_idx],
        text_mask[neg_text_idx], method="itm_logits_with_states",
    )
    neg2 = module.apply(
        {"params": params}, image_states[neg_image_idx], text_ids, text_mask,
        method="itm_logits_with_states",
    )
    itm_logits = jnp.concatenate([pos_logits, neg1, neg2], axis=0)
    itm_labels = jnp.concatenate(
        [jnp.ones(b, jnp.int32), jnp.zeros(2 * b, jnp.int32)]
    )
    loss_itm = -jnp.take_along_axis(
        jax.nn.log_softmax(itm_logits.astype(jnp.float32), -1),
        itm_labels[:, None], axis=1,
    ).mean()

    # ring enqueue (reference _dequeue_and_enqueue: queue_size % B == 0)
    q = state["image_queue"].shape[0]
    ptr = state["queue_ptr"]
    image_queue = jax.lax.dynamic_update_slice(state["image_queue"], img_f_m,
                                               (ptr, 0))
    text_queue = jax.lax.dynamic_update_slice(state["text_queue"], txt_f_m,
                                              (ptr, 0))
    new_state = {
        "m_params": new_m,
        "image_queue": image_queue,
        "text_queue": text_queue,
        "queue_ptr": (ptr + b) % q,
    }
    losses = {"loss_itc": loss_itc, "loss_itm": loss_itm,
              "loss": loss_itc + loss_itm}
    return losses, new_state


def rampup_factor(epoch, iters, num_iters_per_epoch):
    """Reference alpha warmup: linear over the first epoch
    (albef_pretrain.py _rampup_factor)."""
    return min(1.0, (epoch * num_iters_per_epoch + iters) / num_iters_per_epoch)


@registry.register_model("albef_nlvr")
class AlbefNLVR(nn.Module):
    """ALBEF NLVR2 head (reference ``albef_models/albef_nlvr.py:24-220``):
    both images encoded by the shared ViT; the text encoder cross-attends
    image0/image1 through interleaved layers (our MED pair mode — the
    functional equivalent of the reference's paired layers with shared
    k/v); a two-layer cls head scores true/false on the fused cls."""

    config: ALBEFConfig
    compute_dtype: Any = jnp.bfloat16
    num_classes: int = 2  # NLVR true/false; SNLI-VE uses 3

    def setup(self):
        cfg = self.config
        self.visual_encoder = VisionTransformer(cfg.vision, self.compute_dtype,
                                                name="visual_encoder")
        self.text_encoder = MedModel(cfg.text, self.compute_dtype,
                                     name="text_encoder")
        self.cls_hidden = Dense(cfg.text.hidden_size,
                                compute_dtype=self.compute_dtype,
                                name="cls_hidden")
        self.cls_out = Dense(self.num_classes,
                             compute_dtype=self.compute_dtype,
                             name="cls_out")

    def __call__(self, images0, images1, text_ids, text_mask=None):
        s0 = self.visual_encoder(images0)
        s1 = self.visual_encoder(images1)
        fused = self.text_encoder(
            text_ids, text_mask=text_mask, image_states=(s0, s1),
            mode="multimodal",
        )
        h = jax.nn.relu(self.cls_hidden(fused[:, 0]))
        return self.cls_out(h).astype(jnp.float32)

    def classify_single(self, images, text_ids, text_mask=None):
        """Single-image entailment head — the SNLI-VE / classification
        flavor (reference albef_classification.py): one image's tokens
        cross-attended by every layer."""
        states = self.visual_encoder(images)
        fused = self.text_encoder(
            text_ids, text_mask=text_mask, image_states=states,
            mode="multimodal",
        )
        h = jax.nn.relu(self.cls_hidden(fused[:, 0]))
        return self.cls_out(h).astype(jnp.float32)

    def loss(self, images0, images1, text_ids, targets, text_mask=None):
        logits = self(images0, images1, text_ids, text_mask)
        ll = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.take_along_axis(ll, targets[:, None], axis=1).mean()


def albef_nlvr_distill_loss(module, params, m_params, images0, images1,
                            text_ids, targets, text_mask=None, alpha=0.4,
                            momentum=0.995):
    """Reference AlbefNLVR training objective with momentum distillation
    (albef_nlvr.py:79-170, use_distill=True default):

        loss = (1 - alpha) * CE(logits, targets)
               - alpha * sum(log_softmax(logits) * softmax(logits_m))

    where logits_m come from the EMA momentum copy (refreshed first).
    Returns (loss, new_momentum_params); pass ``alpha`` through the
    caller's rampup schedule (reference _rampup_factor).
    """
    new_m = _ema(m_params, params, momentum)
    logits = module.apply({"params": params}, images0, images1, text_ids,
                          text_mask)
    logits_m = jax.lax.stop_gradient(module.apply(
        {"params": new_m}, images0, images1, text_ids, text_mask))
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, targets[:, None], axis=1).mean()
    kl = -(logp * jax.nn.softmax(logits_m.astype(jnp.float32), -1)).sum(-1).mean()
    return (1.0 - alpha) * ce + alpha * kl, new_m


@registry.register_model("albef_vqa")
class AlbefVQA(nn.Module):
    """ALBEF open-ended VQA (reference ``albef_models/albef_vqa.py``):
    question fused with the image multimodally, answers decoded by the MED
    causal decoder over the question states; inference ranks a candidate
    answer list (reference rank_answers: first-token probabilities select
    top-k candidates, the per-candidate teacher-forced LM loss picks the
    final answer)."""

    config: ALBEFConfig
    compute_dtype: Any = jnp.bfloat16

    def setup(self):
        cfg = self.config
        from mr_blip_tpu.models.med import MedLMHead

        self.visual_encoder = VisionTransformer(cfg.vision, self.compute_dtype,
                                                name="visual_encoder")
        self.text_encoder = MedModel(cfg.text, self.compute_dtype,
                                     name="text_encoder")
        self.text_decoder = MedModel(cfg.text, self.compute_dtype,
                                     name="text_decoder")
        self.lm_head = MedLMHead(cfg.text, self.compute_dtype, name="lm_head")

    def question_states(self, images, question_ids, question_mask=None):
        image_states = self.visual_encoder(images)
        return self.text_encoder(
            question_ids, text_mask=question_mask, image_states=image_states,
            mode="multimodal",
        )

    def answer_logits(self, q_states, q_mask, answer_ids, answer_mask=None):
        """(B, L-?, V) teacher-forced logits of the answers over the fused
        question states (answers start with the [DEC]/bos token)."""
        hidden = self.text_decoder(
            answer_ids, text_mask=answer_mask, image_states=q_states,
            image_mask=q_mask, mode="decoder",
        )
        return self.lm_head(hidden)

    def answer_loss(self, images, question_ids, question_mask,
                    answer_ids, answer_mask):
        from mr_blip_tpu.models.t5 import cross_entropy_lm_loss

        q = self.question_states(images, question_ids, question_mask)
        logits = self.answer_logits(q, question_mask, answer_ids[:, :-1],
                                    answer_mask[:, :-1])
        labels = jnp.where(answer_mask[:, 1:] == 1, answer_ids[:, 1:], -100)
        return cross_entropy_lm_loss(logits, labels, answer_mask[:, 1:])


def rank_answers(module, params, images, question_ids, question_mask,
                 answer_ids, answer_mask, k=8):
    """Reference two-stage answer ranking (albef_vqa.py:269-; BLIP uses the
    same recipe): score every candidate's FIRST content token from one
    decoder step, keep the top-k per question, then run the teacher-forced
    LM loss for those k candidates and take the argmin.

    ``answer_ids``: (A, L) tokenized candidates, [:, 0] = bos/[DEC].
    Returns (B,) indices into the candidate list.
    """
    import numpy as np

    a, l = answer_ids.shape
    k = min(k, a)
    q_states = module.apply(
        {"params": params}, images, question_ids, question_mask,
        method="question_states",
    )
    b = q_states.shape[0]
    bos = answer_ids[:1, :1]  # (1, 1)
    start = jnp.broadcast_to(bos, (b, 1))
    first_logits = module.apply(
        {"params": params}, q_states, question_mask, start, None,
        method="answer_logits",
    )[:, 0]  # (B, V)
    first_logp = jax.nn.log_softmax(first_logits.astype(jnp.float32), -1)
    first_tok = answer_ids[:, 1]                     # (A,)
    cand_scores = first_logp[:, first_tok]           # (B, A)
    topk = jax.lax.top_k(cand_scores, k)[1]          # (B, K)

    # per-(question, candidate) teacher-forced loss, flattened to B*K rows
    from mr_blip_tpu.models.t5 import cross_entropy_lm_loss  # noqa: F401

    q_rep = jnp.repeat(q_states, k, axis=0)
    qm_rep = (jnp.repeat(question_mask, k, axis=0)
              if question_mask is not None else None)
    ans = answer_ids[topk.reshape(-1)]               # (B*K, L)
    ans_m = answer_mask[topk.reshape(-1)]
    logits = module.apply(
        {"params": params}, q_rep, qm_rep, ans[:, :-1], ans_m[:, :-1],
        method="answer_logits",
    )
    labels = jnp.where(ans_m[:, 1:] == 1, ans[:, 1:], -100)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tok_ll = jnp.take_along_axis(
        logp, jnp.where(labels == -100, 0, labels)[..., None], axis=-1
    )[..., 0]
    mask = (labels != -100).astype(jnp.float32)
    per_pair = -(tok_ll * mask).sum(-1) / jnp.maximum(mask.sum(-1), 1.0)
    best = jnp.argmin(per_pair.reshape(b, k), axis=1)
    return np.asarray(jnp.take_along_axis(topk, best[:, None], axis=1)[:, 0])
