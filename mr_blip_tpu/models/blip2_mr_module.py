"""Device-side BLIP2-MR computation graph (flax linen).

Composes the frozen EVA ViT frame encoder, fp32 vision LayerNorm, Q-Former
(32 query tokens/frame), the Q-Former->T5 projection, and the T5
encoder-decoder, mirroring the reference composition
(``lavis/models/blip2_mr_models/blip2_mr.py:433-570`` forward_mr and
``:826-946`` generate) with the prompt interleave as a batched gather
(see :mod:`mr_blip_tpu.models.prompt_assembly`).

Everything here is pure and jittable; string work happens in the host
wrapper (:mod:`mr_blip_tpu.models.blip2_mr`).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mr_blip_tpu.models.eva_vit import EvaViT, ViTConfig
from mr_blip_tpu.models.layers import Dense, LayerNormFP32
from mr_blip_tpu.models.prompt_assembly import interleave_on_device
from mr_blip_tpu.models.qformer import QFormer, QFormerConfig
from mr_blip_tpu.models.t5 import (
    T5Config,
    T5ForConditionalGeneration,
    cross_entropy_lm_loss,
    shift_right,
)


def _pad_seq_to_sublane(inputs_embeds, attn, mult: int = 8):
    """Right-pad the assembled encoder sequence to a sublane multiple.

    The padded positions carry ``attn == 0`` so they are -inf'd out of
    encoder self-attention and masked from decoder cross-attention —
    semantically inert. The win: at an 8-multiple length the TPU tiled
    (B, L, D) layout has no row padding, so the int8 encoder's
    2D <-> 3D token reshapes are free bitcasts instead of relayout
    copies (profiled ~26 ms/batch at L=2049), and batches bucket onto
    fewer distinct compile shapes.
    """
    pad = (-inputs_embeds.shape[1]) % mult
    if pad:
        inputs_embeds = jnp.pad(inputs_embeds, ((0, 0), (0, pad), (0, 0)))
        attn = jnp.pad(attn, ((0, 0), (0, pad)))
    return inputs_embeds, attn


class Blip2MRModule(nn.Module):
    vit_config: ViTConfig
    qformer_config: QFormerConfig
    t5_config: T5Config
    compute_dtype: Any = jnp.bfloat16
    decode_cache_len: int = 64
    frame_token_aggregation: Optional[str] = None  # None | "mean"
    freeze_vit: bool = True
    sequence_parallel: bool = False  # shard the B*T frame axis over dp

    def setup(self):
        self.visual_encoder = EvaViT(
            self.vit_config, self.compute_dtype, name="visual_encoder"
        )
        # torch nn.LayerNorm default eps (blip2.py:113 LayerNorm subclass).
        self.ln_vision = LayerNormFP32(epsilon=1e-5, name="ln_vision")
        self.qformer = QFormer(self.qformer_config, self.compute_dtype, name="qformer")
        self.t5_proj = Dense(
            self.t5_config.d_model, compute_dtype=self.compute_dtype, name="t5_proj"
        )
        self.t5 = T5ForConditionalGeneration(
            self.t5_config, self.compute_dtype,
            decode_cache_len=self.decode_cache_len, name="t5",
        )

    @property
    def tokens_per_frame(self) -> int:
        return 1 if self.frame_token_aggregation else self.qformer_config.num_query_tokens

    def encode_frames(self, frames, deterministic=True):
        """(B, T, H, W, C) frames -> (B, T*n, d_model) T5 tokens.

        Mirrors forward_mr's vision path (blip2_mr.py:444-510): ViT over the
        flattened B*T frame batch (one big MXU-friendly batch), fp32 LN,
        Q-Former compression to 32 tokens, linear projection, optional mean
        aggregation to 1 token/frame.

        uint8 frames are CLIP-normalized on device (fused into the patch
        conv by XLA) — processors emit raw bytes so host->HBM transfers are
        4x smaller than pre-normalized fp32.

        Sequence parallelism: the flattened B*T frame batch is sharded over
        the dp axis when ``sequence_parallel`` is set — so a single long
        video (B=1, T=60+) spreads its frames across chips for the ViT and
        Q-Former, and GSPMD inserts the all-gather before the interleave
        (the reference has no equivalent; SURVEY §5 long-context note).
        """
        b, t = frames.shape[0], frames.shape[1]
        if frames.dtype == jnp.uint8:
            from mr_blip_tpu.processors.video_processors import CLIP_MEAN, CLIP_STD

            mean = jnp.asarray(CLIP_MEAN, self.compute_dtype) * 255.0
            std = jnp.asarray(CLIP_STD, self.compute_dtype) * 255.0
            frames = (frames.astype(self.compute_dtype) - mean) / std
        flat = frames.reshape((b * t,) + frames.shape[2:])
        if self.sequence_parallel:
            from jax.sharding import PartitionSpec as P

            try:
                flat = jax.lax.with_sharding_constraint(flat, P("dp"))
            except RuntimeError:
                pass  # no mesh context (single-device run): constraint is moot
        image_embeds = self.visual_encoder(flat, deterministic)
        if self.freeze_vit:
            image_embeds = jax.lax.stop_gradient(image_embeds)
        image_embeds = self.ln_vision(image_embeds)
        # int8 ViT with keep_padded_tokens: the token axis arrives
        # sublane-padded (257 -> 264); mask the pad tokens out of the
        # Q-Former cross-attention instead of paying a slice + re-layout.
        n_real = self.vit_config.num_patches + 1
        frame_mask = None
        if image_embeds.shape[1] > n_real:
            frame_mask = (
                jnp.arange(image_embeds.shape[1]) < n_real
            )[None, :].astype(jnp.int32)
            frame_mask = jnp.broadcast_to(
                frame_mask, (image_embeds.shape[0], image_embeds.shape[1])
            )
        q = self.qformer(image_embeds, encoder_mask=frame_mask,
                         deterministic=deterministic)  # (B*T, nq, h)
        q = self.t5_proj(q)
        if self.frame_token_aggregation == "mean":
            q = q.mean(axis=1, keepdims=True)
        n = q.shape[1]
        return q.reshape(b, t * n, self.t5_config.d_model)

    def assemble_encoder_input(
        self,
        frames_for_t5,
        time_ids,
        src_type,
        src_idx,
        int_mask,
        end_ids,
        end_mask,
        text_ids,
        text_mask,
    ):
        """Interleave + concat -> (inputs_embeds, attention_mask).

        Layout matches prompt_concatenation (blip2_mr.py:759-783):
        [interleaved video prompt | video_prompt_end | query+task prompt].
        """
        embed = self.t5.shared
        time_embs = embed(time_ids)
        pad_emb = embed(jnp.full((), self.t5_config.pad_token_id, jnp.int32))
        inter = interleave_on_device(
            frames_for_t5, time_embs.astype(frames_for_t5.dtype),
            src_type, src_idx, pad_emb,
        )
        end_embs = embed(end_ids).astype(inter.dtype)
        text_embs = embed(text_ids).astype(inter.dtype)
        inputs_embeds = jnp.concatenate([inter, end_embs, text_embs], axis=1)
        attn = jnp.concatenate([int_mask, end_mask, text_mask], axis=1)
        return _pad_seq_to_sublane(inputs_embeds, attn)

    def assemble_encoder_input_noninterleaved(
        self,
        frames_for_t5,
        vid_ids,
        vid_mask,
        end_ids,
        end_mask,
        text_ids,
        text_mask,
    ):
        """Non-interleaved layout (blip2_mr.py:784-817):
        [video prompt text | frame tokens | video_prompt_end | text]."""
        embed = self.t5.shared
        vid_embs = embed(vid_ids).astype(frames_for_t5.dtype)
        end_embs = embed(end_ids).astype(frames_for_t5.dtype)
        text_embs = embed(text_ids).astype(frames_for_t5.dtype)
        frames_mask = jnp.ones(frames_for_t5.shape[:2], jnp.int32)
        inputs_embeds = jnp.concatenate(
            [vid_embs, frames_for_t5, end_embs, text_embs], axis=1
        )
        attn = jnp.concatenate([vid_mask, frames_mask, end_mask, text_mask], axis=1)
        return _pad_seq_to_sublane(inputs_embeds, attn)

    def qa_encoder_input(self, frames_for_t5, text_ids, text_mask):
        """Answerer layout (videoQA_answer, blip2_mr.py:1274-1278):
        [frame tokens | question+options]."""
        embed = self.t5.shared
        text_embs = embed(text_ids).astype(frames_for_t5.dtype)
        frames_mask = jnp.ones(frames_for_t5.shape[:2], jnp.int32)
        inputs_embeds = jnp.concatenate([frames_for_t5, text_embs], axis=1)
        attn = jnp.concatenate([frames_mask, text_mask], axis=1)
        return _pad_seq_to_sublane(inputs_embeds, attn)

    def encode(self, inputs_embeds, attn_mask, deterministic=True,
               position_bias=None):
        return self.t5.encode(inputs_embeds, mask=attn_mask,
                              deterministic=deterministic,
                              position_bias=position_bias)

    def loss_from_encoder_input(
        self, inputs_embeds, attn_mask, target_ids, target_mask,
        deterministic=True, position_bias=None,
    ):
        """Teacher-forced span LM loss (forward_mr, blip2_mr.py:523-544)."""
        labels = jnp.where(
            target_ids == self.t5_config.pad_token_id, -100, target_ids
        )
        decoder_input_ids = shift_right(
            labels,
            decoder_start_token_id=self.t5_config.decoder_start_token_id,
            pad_token_id=self.t5_config.pad_token_id,
        )
        enc = self.t5.encode(inputs_embeds, mask=attn_mask,
                             deterministic=deterministic,
                             position_bias=position_bias)
        logits = self.t5.decode(
            decoder_input_ids, enc,
            decoder_mask=target_mask, encoder_mask=attn_mask,
            deterministic=deterministic,
        )
        return cross_entropy_lm_loss(logits, labels, target_mask), logits

    def decode_step(self, tokens, encoder_states, encoder_mask, position):
        """One cached decoder step (used by beam search / greedy)."""
        return self.t5.decode(
            tokens, encoder_states,
            encoder_mask=encoder_mask,
            decode=True, decode_position=position,
        )
