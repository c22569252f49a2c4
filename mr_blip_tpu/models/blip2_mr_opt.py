"""BLIP2-MR-OPT: decoder-only variant (registered ``blip2_opt_mr``).

Counterpart of the reference ``lavis/models/blip2_mr_models/blip2_mr_opt.py``
(class at :33): the same ViT -> Q-Former -> projection front end feeds an
OPT causal LM with a non-interleaved prompt layout

    [video-prompt text | frame tokens | </vid> | query + task prompt | answer]

Training computes the LM loss on the answer region only; generation
prefills the prompt into the KV cache and beam-searches the continuation.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mr_blip_tpu.common.registry import registry
from mr_blip_tpu.models.blip2_mr import BLIP2_MR, _pad_to, _bucket, _zero_self_cache
from mr_blip_tpu.models.eva_vit import EvaViT
from mr_blip_tpu.models.generation import beam_search, expand_to_beams
from mr_blip_tpu.models.layers import Dense, LayerNormFP32
from mr_blip_tpu.models.opt import (
    OPTForCausalLM,
    opt_2_7b_config,
    opt_6_7b_config,
    opt_tiny_config,
)
from mr_blip_tpu.models.qformer import QFormer
from mr_blip_tpu.text.timestamps import format_timestamps


class Blip2OPTModule(nn.Module):
    vit_config: Any
    qformer_config: Any
    opt_config: Any
    compute_dtype: Any = jnp.bfloat16
    decode_cache_len: int = 512
    freeze_vit: bool = True

    def setup(self):
        self.visual_encoder = EvaViT(
            self.vit_config, self.compute_dtype, name="visual_encoder"
        )
        self.ln_vision = LayerNormFP32(name="ln_vision")
        self.qformer = QFormer(self.qformer_config, self.compute_dtype, name="qformer")
        self.opt_proj = Dense(
            self.opt_config.hidden_size, compute_dtype=self.compute_dtype,
            name="opt_proj",
        )
        self.opt = OPTForCausalLM(
            self.opt_config, self.compute_dtype,
            decode_cache_len=self.decode_cache_len, name="opt",
        )

    def encode_frames(self, frames, deterministic=True):
        b, t = frames.shape[0], frames.shape[1]
        if frames.dtype == jnp.uint8:
            # uint8 passthrough: processors emit raw bytes (host->HBM 4x
            # smaller than fp32); CLIP normalization fuses into the patch
            # conv here, same as Blip2MRModule.encode_frames.
            from mr_blip_tpu.processors.video_processors import CLIP_MEAN, CLIP_STD

            mean = jnp.asarray(CLIP_MEAN, self.compute_dtype) * 255.0
            std = jnp.asarray(CLIP_STD, self.compute_dtype) * 255.0
            frames = (frames.astype(self.compute_dtype) - mean) / std
        flat = frames.reshape((b * t,) + frames.shape[2:])
        image_embeds = self.visual_encoder(flat)
        if self.freeze_vit:
            image_embeds = jax.lax.stop_gradient(image_embeds)
        image_embeds = self.ln_vision(image_embeds)
        q = self.qformer(image_embeds, deterministic=deterministic)
        q = self.opt_proj(q)
        return q.reshape(b, t * q.shape[1], self.opt_config.hidden_size)

    def assemble(self, frames_for_opt, vid_ids, vid_mask, end_ids, end_mask,
                 text_ids, text_mask):
        embed = self.opt.embed_tokens_table
        vid_embs = embed(vid_ids).astype(frames_for_opt.dtype)
        end_embs = embed(end_ids).astype(frames_for_opt.dtype)
        text_embs = embed(text_ids).astype(frames_for_opt.dtype)
        frames_mask = jnp.ones(frames_for_opt.shape[:2], jnp.int32)
        embeds = jnp.concatenate(
            [vid_embs, frames_for_opt, end_embs, text_embs], axis=1
        )
        mask = jnp.concatenate([vid_mask, frames_mask, end_mask, text_mask], axis=1)
        return embeds, mask

    def loss(self, frames, vid_ids, vid_mask, end_ids, end_mask, text_ids,
             text_mask, answer_ids, answer_mask, deterministic=True):
        """Causal LM loss on the answer region only."""
        frames_for_opt = self.encode_frames(frames, deterministic=deterministic)
        prompt_embeds, prompt_mask = self.assemble(
            frames_for_opt, vid_ids, vid_mask, end_ids, end_mask, text_ids,
            text_mask,
        )
        answer_embeds = self.opt.embed_tokens_table(answer_ids).astype(
            prompt_embeds.dtype
        )
        embeds = jnp.concatenate([prompt_embeds, answer_embeds], axis=1)
        mask = jnp.concatenate([prompt_mask, answer_mask], axis=1)
        logits = self.opt(embeds, attention_mask=mask, deterministic=deterministic)

        # next-token prediction: logits at position p predict token p+1;
        # answer token j sits at prompt_len + j.
        p_len = prompt_embeds.shape[1]
        ans_logits = logits[:, p_len - 1 : -1]  # predicts answer_ids
        log_probs = jax.nn.log_softmax(ans_logits.astype(jnp.float32), axis=-1)
        token_ll = jnp.take_along_axis(log_probs, answer_ids[..., None], axis=-1)[..., 0]
        w = answer_mask.astype(jnp.float32)
        return -(token_ll * w).sum() / jnp.maximum(w.sum(), 1.0)

    def prefill(self, frames, vid_ids, vid_mask, end_ids, end_mask, text_ids,
                text_mask):
        """Prompt assembly for cached generation; returns (embeds, mask)."""
        frames_for_opt = self.encode_frames(frames)
        return self.assemble(
            frames_for_opt, vid_ids, vid_mask, end_ids, end_mask, text_ids,
            text_mask,
        )

    def decode_embeds(self, embeds, mask, position):
        return self.opt(embeds, attention_mask=mask, decode=True,
                        decode_position=position)

    def decode_step(self, tokens, full_mask, position):
        embeds = self.opt.embed_tokens_table(tokens).astype(self.compute_dtype)
        return self.opt(embeds, attention_mask=full_mask, decode=True,
                        decode_position=position)


@registry.register_model("blip2_opt_mr")
class BLIP2_MR_OPT(BLIP2_MR):
    """Decoder-only Mr. BLIP variant; reuses the BLIP2_MR host machinery."""

    PRETRAINED_MODEL_CONFIG_DICT = {
        "pretrain_opt2.7b": "configs/models/blip2/blip2_pretrain_opt2.7b.yaml",
        "tiny": "configs/models/blip2/blip2_tiny.yaml",
    }

    OPT_CONFIGS = {
        "opt-2.7b": opt_2_7b_config,
        "opt-6.7b": opt_6_7b_config,
        "tiny": opt_tiny_config,
    }

    def __init__(self, opt_model: str = "opt-2.7b", prompt_cache_len: int = 2048,
                 **kwargs):
        kwargs.setdefault("interleave_data", False)
        kwargs.setdefault("t5_model", "tiny")  # unused; base init needs it
        init_params = kwargs.pop("init_params", True)
        super().__init__(init_params=False, **kwargs)

        opt_kw = dict(lora_rank=8 if self.use_lora else 0)
        if kwargs.get("tokenizer_path") is None:
            opt_kw["vocab_size"] = self.tokenizer.vocab_size
        self.opt_config = self.OPT_CONFIGS[opt_model](**opt_kw)
        self.prompt_cache_len = prompt_cache_len

        self.module = Blip2OPTModule(
            vit_config=self.vit_config,
            qformer_config=self.qformer_config,
            opt_config=self.opt_config,
            compute_dtype=self.compute_dtype,
            decode_cache_len=prompt_cache_len,
            freeze_vit=self.freeze_vit,
        )
        if init_params:
            self.params = self.init_params(jax.random.PRNGKey(kwargs.get("seed", 42)))

    def init_params(self, rng):
        b, t = 1, 1
        frames = jnp.zeros((b, t, self.img_size, self.img_size, 3), jnp.float32)
        ids = jnp.zeros((b, 2), jnp.int32)
        mask = jnp.ones((b, 2), jnp.int32)
        variables = self.module.init(
            rng, frames, ids, mask, ids, mask, ids, mask, ids, mask,
            method="loss",
        )
        return variables["params"]

    def trainable_mask(self, params=None):
        params = params if params is not None else self.params
        qformer_frozen = "qformer_freeze" in self.task

        def fn(path, leaf):
            keys = [str(getattr(p, "key", p)) for p in path]
            if "visual_encoder" in keys:
                return not self.freeze_vit
            if "opt" in keys and "opt_proj" not in keys:
                if self.use_lora:
                    return any("lora_" in k for k in keys)
                return False
            if any(k in ("qformer", "opt_proj", "ln_vision") for k in keys):
                return not qformer_frozen
            return False

        return jax.tree_util.tree_map_with_path(fn, params)

    # ------------------------------------------------------------ host prep
    def prepare_opt_batch(self, samples, need_targets=True) -> Dict[str, Any]:
        video = np.asarray(samples["video"], np.float32)
        b = video.shape[0]
        timestamps = np.asarray(samples["timestamps"], np.float64)
        durations = np.asarray(samples["duration"], np.float64)
        video_prompt_end = list(samples["video_prompt_end"])
        query_prompt = list(samples["query_prompt"])
        task_prompt = list(samples["task_prompt"])

        if "only_frames" in self.task:
            video_prompts = ["<vid>" for _ in range(b)]
            video_prompt_end = ["<extra_id_0>\n" for _ in video_prompt_end]
        else:
            # OPT path remaps only via the annoying-number dict for
            # seconds_integers (blip2_mr_opt.py:653-685).
            _, _, video_prompts = format_timestamps(
                self.input_time_format, timestamps, durations,
                self.annoying_numbers_replacement_dict,
            )

        if "no_task_prompt" in self.task:
            text_prompt = [q for q in query_prompt]
        else:
            text_prompt = [q + tp for q, tp in zip(query_prompt, task_prompt)]

        tok = self.tokenizer
        vid_enc = tok(video_prompts, add_special_tokens=False,
                      truncation=True, max_length=self.max_txt_len)
        end_enc = tok(video_prompt_end, add_special_tokens=False,
                      truncation=True, max_length=self.max_txt_len)
        text_enc = tok(text_prompt, add_special_tokens=False,
                       truncation=True, max_length=self.max_txt_len)
        batch = {
            "frames": video,
            "vid_ids": vid_enc.input_ids, "vid_mask": vid_enc.attention_mask,
            "end_ids": end_enc.input_ids, "end_mask": end_enc.attention_mask,
            "text_ids": _pad_to(text_enc.input_ids, _bucket(text_enc.input_ids.shape[1])),
            "text_mask": _pad_to(text_enc.attention_mask, _bucket(text_enc.input_ids.shape[1])),
        }
        if need_targets and "relevant_windows" in samples:
            # answers carry an explicit EOS (blip2_mr_opt.py:227-236)
            ans = [a + "</s>" for a in samples["relevant_windows"]]
            ans_enc = tok(ans, add_special_tokens=False, truncation=True,
                          max_length=self.max_txt_len)
            batch["answer_ids"] = _pad_to(ans_enc.input_ids, _bucket(ans_enc.input_ids.shape[1], 8))
            batch["answer_mask"] = _pad_to(ans_enc.attention_mask, _bucket(ans_enc.attention_mask.shape[1], 8))
        return batch

    # the task layer calls prepare_mr_batch generically
    def prepare_mr_batch(self, samples, need_targets=True):
        return self.prepare_opt_batch(samples, need_targets=need_targets)

    @functools.cached_property
    def _jit_opt_loss(self):
        module = self.module

        def loss_fn(params, batch, dropout_rng=None):
            rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
            loss = module.apply(
                {"params": params}, batch["frames"], batch["vid_ids"],
                batch["vid_mask"], batch["end_ids"], batch["end_mask"],
                batch["text_ids"], batch["text_mask"], batch["answer_ids"],
                batch["answer_mask"], deterministic=dropout_rng is None,
                method="loss", rngs=rngs,
            )
            return loss, None

        return loss_fn

    @property
    def _loss_fn(self):
        return self._jit_opt_loss

    @functools.cached_property
    def _jit_opt_loss_compiled(self):
        return jax.jit(self._jit_opt_loss)

    def forward(self, samples):
        batch = self.prepare_opt_batch(samples)
        loss, _ = self._jit_opt_loss_compiled(self.params, batch)
        return {"loss": loss}

    __call__ = forward

    def logits_to_moments(self, logits):
        """Teacher-forced logit readout -> per-sample moment lists.

        Covers reference ``blip2_mr_opt.py:964-978`` (``logits_to_moments``):
        greedy-argmax the vocab axis, decode, keep the text between the
        first and second ``</s>`` (the decoder-only prompt echoes before the
        first EOS; the span prediction follows it), then run the shared
        span grammar (``text/span_grammar.py`` — the same regex set as the
        reference's class-local ``post_process``/``moment_str_to_list``,
        :980-1093). Two deliberate divergences: (a) a decode with no
        ``</s>`` at all maps to ``[[-1, -1]]`` instead of raising
        IndexError (the reference's own ``# TODO: handle the case where
        the </s> token is not part of the string``); (b) the reference's
        class-local copies carry two live typos the shared ``utils.py``
        versions don't: ``moment_str_to_list``'s ``if isinstance(i, int)``
        (``:1086`` — always true, zeroing EVERY window to ``[-1, -1]``;
        commented out in ``utils.py:334-339``) and ``post_process``'s
        window split on ``re.split(r"\\s+(?=\\])")`` (``:1011`` —
        lookahead on ``]`` instead of ``[``, so multi-window strings
        never split; ``utils.py:47`` uses ``(?=\\[)``). We follow the
        intended (utils.py / T5-flagship) semantics; parity is pinned in
        ``tests/test_opt_variant.py::TestLogitsToMoments``.

        Args:
            logits: ``(B, T, vocab)`` array (jnp or np).
        Returns:
            list of per-sample moment lists, e.g. ``[[[0.0, 1.5]], ...]``.
        """
        from mr_blip_tpu.text.span_grammar import moment_str_to_list

        ids = np.asarray(jnp.argmax(jnp.asarray(logits), axis=2))
        pred_strings = self.tokenizer.batch_decode(ids)
        moments = []
        for s in pred_strings:
            parts = s.split("</s>")
            seg = parts[1] if len(parts) > 1 else ""
            moments.append(moment_str_to_list(self.post_process(seg)))
        return moments

    @staticmethod
    def compute_IoU(pred, target):
        """Single-window IoU with the reference's exact conventions
        (``blip2_mr_opt.py:1094-1131``): disjoint windows short-circuit
        both overlap and union to 0, so the IoU of non-overlapping windows
        is 0 (never 0/positive-union). Shared impl: metrics/simple.py."""
        from mr_blip_tpu.metrics.simple import compute_IoU as _iou

        return _iou(pred, target)

    @functools.cached_property
    def _jit_opt_generate(self):
        base_module = self.module
        num_beams = self.num_beams
        max_new = self.max_new_tokens
        eos = self.tokenizer.eos_token_id
        pad = self.tokenizer.pad_token_id

        @functools.partial(jax.jit, static_argnames=("batch_size", "prompt_len"))
        def generate_fn(params, batch, start_tokens, batch_size: int,
                        prompt_len: int):
            # Cache spans the prefilled prompt (minus the seed token) plus
            # every generated position.
            cache_len = prompt_len - 1 + max_new + 1
            module = base_module.clone(decode_cache_len=cache_len, parent=None)

            embeds, mask = module.apply(
                {"params": params}, batch["frames"], batch["vid_ids"],
                batch["vid_mask"], batch["end_ids"], batch["end_mask"],
                batch["text_ids"], batch["text_mask"], method="prefill",
            )
            # drop the last (seed) position from the prefill
            embeds, mask = embeds[:, :-1], mask[:, :-1]
            embeds_b = expand_to_beams(embeds, num_beams)
            mask_b = expand_to_beams(mask, num_beams)
            full_mask = jnp.concatenate(
                [mask_b, jnp.ones((batch_size * num_beams, max_new + 1), jnp.int32)],
                axis=1,
            )[:, None, None, :].astype(bool)
            assert full_mask.shape[-1] == cache_len

            # init cache (zero) then write the prompt in one block-causal pass
            _, vars0 = module.apply(
                {"params": params}, embeds_b, full_mask, jnp.int32(0),
                method="decode_embeds", mutable=["cache"],
            )
            cache = _zero_self_cache(vars0["cache"])
            _, vars1 = module.apply(
                {"params": params, "cache": cache}, embeds_b, full_mask,
                jnp.int32(0), method="decode_embeds", mutable=["cache"],
            )
            cache = vars1["cache"]

            def decode_step(cache, tokens, position):
                logits, updated = module.apply(
                    {"params": params, "cache": cache}, tokens, full_mask,
                    position + prompt_len - 1, method="decode_step",
                    mutable=["cache"],
                )
                return logits[:, 0], updated["cache"]

            return beam_search(
                decode_step, cache, batch_size=batch_size, num_beams=num_beams,
                max_length=max_new, min_new_tokens=self.min_new_tokens,
                eos_token_id=eos, pad_token_id=pad,
                decoder_start_token_id=start_tokens,
            )

        return generate_fn

    def generate_dispatch(self, samples):
        """Host prep + async dispatch (pairs with the inherited
        ``generate_collect``, whose decode/grammar tail is identical)."""
        batch = self.prepare_opt_batch(samples, need_targets=False)
        # Left-pad the text block so the seed (= last prompt token) is real
        # for every sample.
        text_prompt_ids = batch["text_ids"]
        last_real = batch["text_mask"].sum(axis=1) - 1
        start_tokens = np.take_along_axis(
            text_prompt_ids, last_real[:, None], axis=1
        )[:, 0].astype(np.int32)
        # shift each row so real tokens are right-aligned
        L = text_prompt_ids.shape[1]
        shifted_ids = np.zeros_like(text_prompt_ids)
        shifted_mask = np.zeros_like(batch["text_mask"])
        for i in range(text_prompt_ids.shape[0]):
            n = int(batch["text_mask"][i].sum())
            shifted_ids[i, L - n:] = text_prompt_ids[i, :n]
            shifted_mask[i, L - n:] = 1
        batch["text_ids"], batch["text_mask"] = shifted_ids, shifted_mask

        b = batch["frames"].shape[0]
        prompt_len = (
            batch["vid_ids"].shape[1]
            + batch["frames"].shape[1] * self.qformer_config.num_query_tokens
            + batch["end_ids"].shape[1] + batch["text_ids"].shape[1]
        )
        seqs, scores = self._jit_opt_generate(
            self.params, batch, jnp.asarray(start_tokens), b, prompt_len
        )
        return {"seqs": seqs, "scores": scores, "samples": samples}

    def generate(self, samples):
        return self.generate_collect(self.generate_dispatch(samples))

    @classmethod
    def from_config(cls, cfg):
        model = cls(
            opt_model=cfg.get("opt_model", "opt-2.7b"),
            img_size=cfg.get("image_size", 224),
            vit_model=cfg.get("vit_model", "eva_vit_g"),
            tokenizer_path=cfg.get("tokenizer_path"),
            num_query_token=cfg.get("num_query_token", 32),
            num_beams=cfg.get("num_beams", 5),
            min_new_tokens=cfg.get("min_len", cfg.get("min_new_tokens", 0)),
            max_txt_len=cfg.get("max_len", 200),
            max_new_tokens=cfg.get("max_new_tokens", 50),
            input_time_format=cfg.get("input_time_format", "seconds_integers"),
            task=cfg.get("task", "qformer_freeze_lora"),
            freeze_vit=cfg.get("freeze_vit", True),
            compute_dtype=cfg.get("compute_dtype", "bfloat16"),
        )
        return model
