"""PNP-VQA and Img2Prompt: zero-shot VQA by model composition.

Counterparts of the reference ``lavis/models/pnp_vqa_models/`` and
``img2prompt_models/`` (~1.5k LoC): no new weights are trained — existing
models are plugged together.

PNP-VQA (three stages):
  1. **Interpret** — BLIP-ITM cross-attention gradcam localizes the image
     patches relevant to the question.
  2. **Caption** — patch subsets sampled from the relevance distribution
     seed diverse caption generation.
  3. **Read** — a T5 reader (UnifiedQA-style) answers the question from
     the concatenated captions (FiD-flavored: encode each caption context
     separately, concatenate encoder states for one decoder).

Img2Prompt builds few-shot QA exemplar prompts out of the generated
captions for a frozen LLM instead of a reader.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mr_blip_tpu.common.registry import registry


@registry.register_model("pnp_vqa")
class PNPVQA:
    """Host-side orchestration over (blip_itm, blip_caption, t5_reader)."""

    def __init__(self, blip_model, blip_params, reader_model, reader_params,
                 tokenizer, num_patches: int = 20, num_captions: int = 5,
                 rng_seed: int = 0):
        self.blip = blip_model
        self.blip_params = blip_params
        self.reader = reader_model
        self.reader_params = reader_params
        self.tokenizer = tokenizer
        self.num_patches = num_patches
        self.num_captions = num_captions
        self._rng = np.random.default_rng(rng_seed)

    # Stage 1: question-conditioned patch relevance ------------------------
    def patch_relevance(self, images, question_ids, question_mask=None):
        """Gradcam of the ITM score w.r.t. the fused cross-attention.

        Computed via the gradient of the ITM 'match' logit through the
        image tokens (a practical equivalent of layer-8 cross-attn gradcam
        in the reference pnp_vqa.py)."""

        def itm_match_score(image_states):
            logits = self.blip.apply(
                {"params": self.blip_params}, question_ids,
                text_mask=question_mask, image_states=image_states,
                mode="multimodal",
                method=lambda m, *a, **k: m.itm_head(m.text_encoder(*a, **k)[:, 0]),
            )
            return logits[:, 1].sum()

        image_states = self.blip.apply(
            {"params": self.blip_params}, images,
            method=lambda m, im: m.visual_encoder(im),
        )
        grads = jax.grad(itm_match_score)(image_states)
        # relevance per patch: |grad * activation| summed over channels
        rel = jnp.abs(grads * image_states).sum(-1)[:, 1:]  # drop cls
        rel = rel / jnp.maximum(rel.sum(-1, keepdims=True), 1e-8)
        return np.asarray(rel)

    # Stage 2: relevance-sampled captioning --------------------------------
    def generate_captions(self, images, relevance, max_len: int = 12):
        """Greedy captions conditioned on sampled relevant patches."""
        captions: List[List[str]] = [[] for _ in range(images.shape[0])]
        image_states = self.blip.apply(
            {"params": self.blip_params}, images,
            method=lambda m, im: m.visual_encoder(im),
        )
        n_patches = relevance.shape[1]
        k = min(self.num_patches, n_patches)
        bos = 0
        for _ in range(self.num_captions):
            # sample a patch subset per image from the relevance distribution
            masks = np.zeros((images.shape[0], n_patches + 1), np.float32)
            masks[:, 0] = 1.0  # keep cls
            for b in range(images.shape[0]):
                idx = self._rng.choice(
                    n_patches, size=k, replace=False, p=relevance[b]
                )
                masks[b, idx + 1] = 1.0
            states = image_states * jnp.asarray(masks)[..., None]

            ids = np.full((images.shape[0], 1), bos, np.int32)
            for _ in range(max_len):
                logits = self.blip.apply(
                    {"params": self.blip_params}, states, jnp.asarray(ids),
                    method=lambda m, st, pref: m.lm_head(
                        m.text_decoder(pref, image_states=st, mode="decoder")
                    )[:, -1],
                )
                nxt = np.asarray(jnp.argmax(logits, -1))[:, None]
                ids = np.concatenate([ids, nxt], axis=1)
            for b, row in enumerate(ids):
                captions[b].append(self.tokenizer.decode(
                    [int(t) for t in row[1:]], skip_special_tokens=True
                ))
        return captions

    # Stage 3: read answers from captions ----------------------------------
    def answer(self, questions: List[str], captions: List[List[str]],
               max_new_tokens: int = 8, fid: bool = True):
        """T5 reader over the generated captions.

        ``fid=True`` is the reference Fusion-in-Decoder recipe
        (pnp_unifiedqav2_fid.py:20-67): every "question: Q context: C_i"
        pair is ENCODED SEPARATELY and the decoder cross-attends over the
        concatenation of all K encodings — evidence fuses in the decoder,
        not in one overlong context string. ``fid=False`` joins the
        captions into a single context (cheaper, weaker).
        """
        answers = []
        for q, caps in zip(questions, captions):
            if fid and len(caps) > 0:
                prompts = [f"question: {q} context: {c}" for c in caps]
            else:
                prompts = [f"question: {q} context: {' '.join(caps)}"]
            enc = self.tokenizer(prompts, truncation=True, max_length=256,
                                 padding=True)
            ids_in = jnp.asarray(enc.input_ids)          # (K, L)
            mask_in = jnp.asarray(enc.attention_mask)
            embeds = self.reader.apply(
                {"params": self.reader_params}, ids_in, method="embed_tokens",
            )
            states = self.reader.apply(
                {"params": self.reader_params}, embeds,
                mask=mask_in, method="encode",
            )  # (K, L, D)
            k, l, d = states.shape
            fused = states.reshape(1, k * l, d)          # FiD: concat passages
            fused_mask = mask_in.reshape(1, k * l)
            ids = jnp.zeros((1, 1), jnp.int32)
            for _ in range(max_new_tokens):
                logits = self.reader.apply(
                    {"params": self.reader_params}, ids, fused,
                    encoder_mask=fused_mask, method="decode",
                )
                nxt = jnp.argmax(logits[:, -1:], -1)
                ids = jnp.concatenate([ids, nxt.astype(jnp.int32)], axis=1)
                if int(nxt[0, 0]) == self.tokenizer.eos_token_id:
                    break
            answers.append(
                self.tokenizer.decode([int(t) for t in np.asarray(ids)[0, 1:]],
                                      skip_special_tokens=True)
            )
        return answers

    def predict_answers(self, images, questions: List[str],
                        question_ids=None, question_mask=None):
        rel = self.patch_relevance(images, question_ids, question_mask)
        caps = self.generate_captions(images, rel)
        return self.answer(questions, caps)


@registry.register_model("img2prompt_vqa")
class Img2PromptVQA(PNPVQA):
    """Caption -> exemplar-prompt construction for a frozen LLM
    (reference img2prompt_models): instead of a reader, emit a few-shot
    text prompt the caller feeds to any causal LM."""

    def build_prompt(self, question: str, captions: List[str],
                     exemplars: Optional[List[tuple]] = None) -> str:
        context = " ".join(captions)
        lines = ["Contexts: " + context, ""]
        for q, a in exemplars or []:
            lines.append(f"Question: {q}")
            lines.append(f"Answer: {a}")
            lines.append("")
        lines.append(f"Question: {question}")
        lines.append("Answer:")
        return "\n".join(lines)
