"""BLIP2-FMR: frame-level moment retrieval ablation (registered ``blip2_fmr``).

Counterpart of the reference ``lavis/models/blip2_models/blip2_fmr.py:19-396``
(SeViLA-style): each frame is scored independently for relevance — the T5
sees ``[Frame: | 32 frame tokens | query+options]`` and answers yes/no; the
relevance score is the "yes" logit at the first decode step.  Frames above
threshold form the predicted moments.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from mr_blip_tpu.common.registry import registry
from mr_blip_tpu.models.blip2_mr import BLIP2_MR, _zero_self_cache


@registry.register_model("blip2_fmr")
class Blip2FMR(BLIP2_MR):
    """Per-frame yes/no relevance scorer over the shared BLIP-2 stack."""

    def __init__(self, frame_prefix: str = "Frame: ", threshold: float = 0.0,
                 **kwargs):
        kwargs.setdefault("task", "fmr")
        super().__init__(**kwargs)
        self.frame_prefix = frame_prefix
        self.threshold = threshold
        # yes/no token ids resolved from the tokenizer (reference hardcodes
        # flan-t5 ids 4273/150, blip2_fmr.py:89).
        self.yes_id = self.tokenizer.encode("yes", add_special_tokens=False)[-1]
        self.no_id = self.tokenizer.encode("no", add_special_tokens=False)[-1]

    def _prepare(self, samples, with_targets: bool):
        video = np.asarray(samples["video"], np.float32)  # (B, T, H, W, C)
        b, t = video.shape[:2]
        text_input = list(samples["loc_input"])
        tok = self.tokenizer
        prefix_enc = tok([self.frame_prefix], add_special_tokens=False)
        text_enc = tok(text_input, truncation=True, max_length=self.max_txt_len)

        batch = {
            "frames": video,
            "prefix_ids": np.repeat(prefix_enc.input_ids, b * t, axis=0),
            "text_ids": np.repeat(text_enc.input_ids, t, axis=0),
            "text_mask": np.repeat(text_enc.attention_mask, t, axis=0),
        }
        if with_targets:
            # per-frame yes/no labels joined by "_" (reference qa_output)
            flat_answers = []
            for answers in samples["qa_output"]:
                flat_answers.extend(answers.split("_"))
            assert len(flat_answers) == b * t
            target_enc = tok(flat_answers)
            batch["target_ids"] = target_enc.input_ids
            batch["target_mask"] = target_enc.attention_mask
        return batch

    @functools.cached_property
    def _jit_fmr_loss(self):
        module = self.module

        @jax.jit
        def loss_fn(params, batch):
            def run(mod):
                frames_for_t5 = mod.encode_frames(batch["frames"])
                b, tn, d = frames_for_t5.shape
                n = mod.tokens_per_frame
                per_frame = frames_for_t5.reshape(b * (tn // n), n, d)
                embed = mod.t5.shared
                prefix = embed(batch["prefix_ids"]).astype(per_frame.dtype)
                text = embed(batch["text_ids"]).astype(per_frame.dtype)
                embeds = jnp.concatenate([prefix, per_frame, text], axis=1)
                mask = jnp.concatenate(
                    [
                        jnp.ones(prefix.shape[:2], jnp.int32),
                        jnp.ones(per_frame.shape[:2], jnp.int32),
                        batch["text_mask"],
                    ],
                    axis=1,
                )
                loss, _ = mod.loss_from_encoder_input(
                    embeds, mask, batch["target_ids"], batch["target_mask"]
                )
                return loss

            return module.apply({"params": params}, method=run)

        return loss_fn

    @functools.cached_property
    def _jit_fmr_score(self):
        module = self.module
        yes_id, no_id = self.yes_id, self.no_id

        @jax.jit
        def score_fn(params, batch):
            def run(mod):
                frames_for_t5 = mod.encode_frames(batch["frames"])
                b, tn, d = frames_for_t5.shape
                n = mod.tokens_per_frame
                per_frame = frames_for_t5.reshape(b * (tn // n), n, d)
                embed = mod.t5.shared
                prefix = embed(batch["prefix_ids"]).astype(per_frame.dtype)
                text = embed(batch["text_ids"]).astype(per_frame.dtype)
                embeds = jnp.concatenate([prefix, per_frame, text], axis=1)
                mask = jnp.concatenate(
                    [
                        jnp.ones(prefix.shape[:2], jnp.int32),
                        jnp.ones(per_frame.shape[:2], jnp.int32),
                        batch["text_mask"],
                    ],
                    axis=1,
                )
                enc = mod.encode(embeds, mask)
                start = jnp.zeros((embeds.shape[0], 1), jnp.int32)
                logits = mod.t5.decode(start, enc, encoder_mask=mask)
                return logits[:, 0, yes_id] - logits[:, 0, no_id]

            return module.apply({"params": params}, method=run)

        return score_fn

    def forward(self, samples) -> Dict[str, Any]:
        batch = self._prepare(samples, with_targets=True)
        return {"loss": self._jit_fmr_loss(self.params, batch)}

    __call__ = forward

    def generate(self, samples) -> Dict[str, Any]:
        """Per-frame relevance scores -> thresholded yes/no + moments."""
        batch = self._prepare(samples, with_targets=False)
        b, t = np.asarray(samples["video"]).shape[:2]
        scores = np.asarray(self._jit_fmr_score(self.params, batch)).reshape(b, t)
        pred = (scores > self.threshold).astype(int)

        timestamps = np.asarray(samples["timestamps"], np.float64)
        durations = np.asarray(samples["duration"], np.float64)
        moments = []
        for i in range(b):
            spans, start = [], None
            for j in range(t):
                if pred[i, j] and start is None:
                    start = timestamps[i, j]
                elif not pred[i, j] and start is not None:
                    spans.append([float(start), float(timestamps[i, j])])
                    start = None
            if start is not None:
                spans.append([float(start), float(durations[i])])
            moments.append(spans if spans else [[-1, -1]])

        return {
            "yes_score": scores,
            "pred_ans": pred.tolist(),
            "prediction": [str(m) for m in moments],
            "raw_prediction": [str(m) for m in moments],
            "answer": samples.get("relevant_windows"),
            "qid": samples.get("query_id"),
            "duration": [float(d) for d in durations],
        }
