"""Task-facing wrappers for the inherited LAVIS zoo models.

The zoo flax modules (BLIPv1, CLIP, ALBEF, GPTDialogue) are pure compute
graphs; these wrappers give them the reference model API the tasks drive —
``from_config``, ``model(samples) -> {"loss"}``, ``generate(samples)``,
``predict(samples)``, ``compute_sim_matrix(loader)`` — mirroring
``lavis/models/blip_models/blip_caption.py``, ``clip_models/model.py`` and
``gpt_models/gpt_dialogue.py`` at the interface level.

Text handling: CLIP uses the real byte-BPE when a merge table is available
(``model.bpe_path`` / MR_BLIP_CLIP_BPE); elsewhere a deterministic
word-level tokenizer keeps the paths runnable offline.
"""

from __future__ import annotations

import hashlib
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from mr_blip_tpu.common.registry import registry
from mr_blip_tpu.models.base import BaseModel


class WordTokenizer:
    """Deterministic hash-bucketed word tokenizer (offline zoo default).

    ids: 0 pad, 1 bos ([DEC]), 2 eos, 3 unk, 4.. hash buckets. Decoding uses
    the reverse map accumulated during encoding (sufficient for round-trip
    caption/dialogue evaluation in one process).
    """

    pad_token_id, bos_token_id, eos_token_id, unk_token_id = 0, 1, 2, 3

    def __init__(self, vocab_size: int = 992):
        self.vocab_size = vocab_size
        self._rev: Dict[int, str] = {}

    def _wid(self, w: str) -> int:
        h = int(hashlib.md5(w.encode()).hexdigest()[:8], 16)
        i = 4 + h % (self.vocab_size - 4)
        self._rev.setdefault(i, w)
        return i

    def encode(self, text: str, max_len: int = 25) -> List[int]:
        ids = [self.bos_token_id]
        ids += [self._wid(w) for w in text.lower().split()][: max_len - 2]
        return ids + [self.eos_token_id]

    def __call__(self, texts, max_len: int = 25):
        rows = [self.encode(t, max_len) for t in texts]
        n = max(len(r) for r in rows)
        ids = np.zeros((len(rows), n), np.int32)
        mask = np.zeros((len(rows), n), np.int32)
        for i, r in enumerate(rows):
            ids[i, : len(r)] = r
            mask[i, : len(r)] = 1
        return ids, mask

    def decode(self, ids) -> str:
        out = []
        for i in ids:
            i = int(i)
            if i == self.eos_token_id:
                break
            if i >= 4:
                out.append(self._rev.get(i, "<unk>"))
        return " ".join(out)


def _stack_images(samples):
    imgs = samples["image"]
    if isinstance(imgs, (list, tuple)):
        imgs = np.stack([np.asarray(i) for i in imgs])
    return jnp.asarray(imgs)


@registry.register_model("blip_caption")
class BlipCaptionModel(BaseModel):
    """BLIP-v1 captioner (reference ``blip_caption``): LM finetuning +
    greedy caption decoding through the MED causal decoder."""

    PRETRAINED_MODEL_CONFIG_DICT = {"base_coco": None, "tiny": None}

    def __init__(self, model_size: str = "tiny", max_txt_len: int = 25,
                 prompt: str = "", compute_dtype=jnp.float32, seed: int = 0):
        from mr_blip_tpu.models.blip_v1 import (
            BLIPv1, blip_base_config, blip_tiny_config,
        )

        cfg = blip_tiny_config() if model_size == "tiny" else blip_base_config()
        self.config = cfg
        self.max_txt_len = max_txt_len
        self.prompt = prompt
        self.tokenizer = WordTokenizer(vocab_size=cfg.text.vocab_size)
        self.module = BLIPv1(cfg, compute_dtype=compute_dtype)
        img = cfg.vision.img_size
        ids = jnp.zeros((1, 4), jnp.int32)
        self.params = self.module.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, img, img, 3)), ids,
        )["params"]

        self._loss = jax.jit(
            lambda p, im, ids, mask: self.module.apply(
                {"params": p}, im, ids, mask, method="caption_loss"
            )
        )

        def greedy(p, im, max_len):
            b = im.shape[0]
            buf = jnp.zeros((b, max_len), jnp.int32)
            buf = buf.at[:, 0].set(self.tokenizer.bos_token_id)

            def step(buf, t):
                logits = self.module.apply(
                    {"params": p}, im, buf, method="caption_step_logits_at",
                    pos=t,
                )
                nxt = jnp.argmax(logits, -1).astype(jnp.int32)
                return buf.at[:, t + 1].set(nxt), None

            buf, _ = jax.lax.scan(step, buf, jnp.arange(max_len - 1))
            return buf

        self._greedy = jax.jit(greedy, static_argnames=("max_len",))

    @classmethod
    def from_config(cls, cfg):
        return cls(
            model_size=cfg.get("model_size", "tiny"),
            max_txt_len=cfg.get("max_txt_len", 25),
            prompt=cfg.get("prompt", ""),
        )

    def forward(self, samples) -> Dict[str, Any]:
        ids, mask = self.tokenizer(
            [self.prompt + t for t in samples["text_input"]], self.max_txt_len
        )
        loss = self._loss(self.params, _stack_images(samples),
                          jnp.asarray(ids), jnp.asarray(mask))
        return {"loss": loss}

    __call__ = forward

    def generate(self, samples, max_length: int = 12) -> Dict[str, Any]:
        buf = self._greedy(self.params, _stack_images(samples), max_length)
        captions = [self.tokenizer.decode(row[1:]) for row in np.asarray(buf)]
        return {"captions": captions}


@registry.register_model("clip")
class ClipModel(BaseModel):
    """CLIP towers + contrastive training + gallery scoring (reference
    ``clip_models/model.py`` surface: encode_image/encode_text/forward,
    plus RetrievalTask's ``compute_sim_matrix``)."""

    PRETRAINED_MODEL_CONFIG_DICT = {"ViT-B-16": None, "tiny": None}

    def __init__(self, model_size: str = "tiny", bpe_path: str | None = None,
                 compute_dtype=jnp.float32, seed: int = 0):
        from mr_blip_tpu.models.clip import CLIP, clip_tiny_config, clip_vit_b16_config

        cfg = clip_tiny_config() if model_size == "tiny" else clip_vit_b16_config()
        self.config = cfg
        try:
            from mr_blip_tpu.text.clip_bpe import ClipBPETokenizer

            self.tokenizer = ClipBPETokenizer(
                bpe_path, context_length=cfg.context_length
            )
            if self.tokenizer.vocab_size > cfg.vocab_size:
                import dataclasses as _dc

                cfg = _dc.replace(cfg, vocab_size=self.tokenizer.vocab_size)
                self.config = cfg
        except FileNotFoundError:
            self.tokenizer = None  # word fallback below
        self._word_tok = WordTokenizer(vocab_size=cfg.vocab_size)
        self.module = CLIP(cfg, compute_dtype=compute_dtype)
        img = cfg.vision.img_size
        self.params = self.module.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, img, img, 3)),
            jnp.zeros((1, cfg.context_length), jnp.int32),
        )["params"]
        self._img_feat = jax.jit(
            lambda p, im: self.module.apply({"params": p}, im,
                                            method="encode_image")
        )
        self._txt_feat = jax.jit(
            lambda p, ids: self.module.apply({"params": p}, ids,
                                             method="encode_text")
        )
        self._fwd = jax.jit(
            lambda p, im, ids: self.module.apply({"params": p}, im, ids)
        )

    @classmethod
    def from_config(cls, cfg):
        return cls(model_size=cfg.get("model_size", "tiny"),
                   bpe_path=cfg.get("bpe_path"))

    def tokenize(self, texts):
        if self.tokenizer is not None:
            return jnp.asarray(self.tokenizer(texts))
        ids, _ = self._word_tok(texts, self.config.context_length)
        # CLIP pools text features at argmax(ids) (EOT = highest vocab id);
        # remap the word tokenizer's eos accordingly.
        ids = np.where(ids == self._word_tok.eos_token_id,
                       self.config.vocab_size - 1, ids)
        if ids.shape[1] < self.config.context_length:
            ids = np.pad(ids, ((0, 0),
                               (0, self.config.context_length - ids.shape[1])))
        return jnp.asarray(ids)

    def forward(self, samples) -> Dict[str, Any]:
        from mr_blip_tpu.models.clip import clip_contrastive_loss

        logits_per_image, _ = self._fwd(self.params, _stack_images(samples),
                                        self.tokenize(samples["text_input"]))
        return {"loss": clip_contrastive_loss(logits_per_image)}

    __call__ = forward

    def compute_sim_matrix(self, data_loader, k_test: int = 128):
        """Full-gallery similarity (RetrievalTask protocol): encode every
        image and caption, return the (N_img, N_txt) cosine matrix
        (features L2-normalized, matching the reference CLIP protocol)."""
        img_feats, txt_feats = [], []
        seen_images = {}
        for batch in data_loader:
            ids = self.tokenize(batch["text_input"])
            txt_feats.append(np.asarray(self._txt_feat(self.params, ids)))
            imgs = np.asarray(_stack_images(batch))
            for j, img_id in enumerate(batch["image_id"]):
                if img_id not in seen_images:
                    seen_images[img_id] = True
                    img_feats.append(
                        np.asarray(self._img_feat(self.params, imgs[j:j + 1]))[0]
                    )
        img = np.stack(img_feats)
        txt = np.concatenate(txt_feats)
        img = img / np.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / np.linalg.norm(txt, axis=-1, keepdims=True)
        return img @ txt.T


@registry.register_model("gpt_dialogue_model")
class GPTDialogueModel(BaseModel):
    """Video-grounded dialogue LM wrapper (reference gpt_dialogue):
    ``samples = {video_feats, text_input (history+response), response}``."""

    PRETRAINED_MODEL_CONFIG_DICT = {"base": None, "tiny": None}

    def __init__(self, model_size: str = "tiny", video_feature_dim: int = 32,
                 compute_dtype=jnp.float32, seed: int = 0):
        from mr_blip_tpu.models.gpt_dialogue import (
            GPTDialogue, gpt2_config, gpt2_tiny_config,
        )

        cfg = gpt2_tiny_config() if model_size == "tiny" else gpt2_config()
        self.config = cfg
        self.tokenizer = WordTokenizer(vocab_size=cfg.vocab_size)
        self.module = GPTDialogue(cfg, video_feature_dim=video_feature_dim,
                                  compute_dtype=compute_dtype)
        self.params = self.module.init(
            jax.random.PRNGKey(seed),
            jnp.zeros((1, 3, video_feature_dim)),
            jnp.zeros((1, 6), jnp.int32),
        )["params"]
        self._loss = jax.jit(
            lambda p, vf, ids, mask, resp: self.module.apply(
                {"params": p}, vf, ids, mask, resp, method="loss"
            )
        )

    @classmethod
    def from_config(cls, cfg):
        return cls(model_size=cfg.get("model_size", "tiny"),
                   video_feature_dim=cfg.get("video_feature_dim", 32))

    def forward(self, samples) -> Dict[str, Any]:
        """history + response -> LM loss on the response region only."""
        texts = [
            f"{h} {r}" for h, r in zip(samples["text_input"], samples["response"])
        ]
        ids, mask = self.tokenizer(texts, max_len=48)
        resp_mask = np.zeros_like(mask)
        for i, (h, r) in enumerate(
            zip(samples["text_input"], samples["response"])
        ):
            n_hist = 1 + len(h.lower().split())  # bos + history words
            n = int(mask[i].sum())
            resp_mask[i, n_hist:n] = 1
        vf = jnp.asarray(np.asarray(samples["video_feats"], np.float32))
        loss = self._loss(self.params, vf, jnp.asarray(ids), jnp.asarray(mask),
                          jnp.asarray(resp_mask))
        return {"loss": loss}

    __call__ = forward
