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
    # Hash buckets collide by construction: text metrics computed through
    # this tokenizer are pipeline smoke values, not comparable numbers.
    # Tasks surface this via ``tokenizer_fallback`` in their metric dicts.
    is_fallback = True

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



def _zoo_tokenizer(vocab_size: int):
    """Real BERT WordPiece when a vocab asset is supplied (MRBLIP_BERT_VOCAB,
    mirroring the reference's bert-base-uncased tokenizer) and it fits the
    model's embedding table; deterministic word-hash tokenizer otherwise
    (offline default)."""
    from mr_blip_tpu.text.wordpiece import BertWordPieceTokenizer

    tok = BertWordPieceTokenizer.from_env()
    if tok is not None and tok.vocab_size <= vocab_size:
        return tok
    import logging

    logging.warning(
        "no tokenizer asset (MRBLIP_BERT_VOCAB unset or vocab too large): "
        "using the hash-bucket WordTokenizer — text metrics will be smoke "
        "values only, and task metric dicts will carry tokenizer_fallback"
    )
    return WordTokenizer(vocab_size=vocab_size)

def _stack_images(samples):
    imgs = samples["image"]
    if isinstance(imgs, (list, tuple)):
        imgs = np.stack([np.asarray(i) for i in imgs])
    return jnp.asarray(imgs)


@registry.register_model("blip_caption")
class BlipCaptionModel(BaseModel):
    """BLIP-v1 captioner (reference ``blip_caption``): LM finetuning +
    greedy caption decoding through the MED causal decoder."""

    PRETRAINED_MODEL_CONFIG_DICT = {
        "tiny": None,
        "base_coco": "configs/models/blip/blip_caption_base_coco.yaml",
    }

    def __init__(self, model_size: str = "tiny", max_txt_len: int = 25,
                 prompt: str = "", compute_dtype=jnp.float32, seed: int = 0):
        from mr_blip_tpu.models.blip_v1 import (
            BLIPv1, blip_base_config, blip_tiny_config,
        )

        cfg = blip_tiny_config() if model_size == "tiny" else blip_base_config()
        self.config = cfg
        self.max_txt_len = max_txt_len
        self.prompt = prompt
        self.tokenizer = _zoo_tokenizer(cfg.text.vocab_size)
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

        def beam(p, im, max_len, num_beams, min_len, length_penalty):
            # HF-rule beam search (models/generation.py) with the token
            # buffer carried in the cache (MED has no KV cache; the decoder
            # recomputes over the short caption prefix each step, the ViT
            # runs once) — reference blip_caption.py generate(num_beams=3).
            from mr_blip_tpu.models.generation import beam_search, expand_to_beams

            b = im.shape[0]
            states = self.module.apply({"params": p}, im, method="encode_image")
            cache = {
                "buf": jnp.zeros((b * num_beams, max_len + 1), jnp.int32),
                "states": expand_to_beams(states, num_beams),
            }

            def decode_step(cache, cur_tokens, cur_len):
                buf = jax.lax.dynamic_update_slice(
                    cache["buf"], cur_tokens, (0, cur_len)
                )
                logits = self.module.apply(
                    {"params": p}, cache["states"], buf,
                    method="caption_logits_from_states", pos=cur_len,
                )
                return logits, dict(cache, buf=buf)

            seqs, _ = beam_search(
                decode_step, cache, b, num_beams=num_beams,
                max_length=max_len, min_new_tokens=min_len,
                eos_token_id=self.tokenizer.eos_token_id,
                pad_token_id=self.tokenizer.pad_token_id,
                decoder_start_token_id=self.tokenizer.bos_token_id,
                length_penalty=length_penalty,
            )
            return seqs

        self._beam = jax.jit(
            beam, static_argnames=("max_len", "num_beams", "min_len"),
        )

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

    def generate(self, samples, max_length: int = 12, num_beams: int = 1,
                 min_length: int = 0, length_penalty: float = 1.0,
                 ) -> Dict[str, Any]:
        ims = _stack_images(samples)
        if num_beams > 1:
            seqs = self._beam(self.params, ims, max_length, num_beams,
                              min_length, length_penalty)
            captions = [self.tokenizer.decode(row) for row in np.asarray(seqs)]
        else:
            buf = self._greedy(self.params, ims, max_length)
            captions = [self.tokenizer.decode(row[1:]) for row in np.asarray(buf)]
        return {"captions": captions}


@registry.register_model("clip")
class ClipModel(BaseModel):
    """CLIP towers + contrastive training + gallery scoring (reference
    ``clip_models/model.py`` surface: encode_image/encode_text/forward,
    plus RetrievalTask's ``compute_sim_matrix``)."""

    # every OpenCLIP geometry the reference ships JSONs for
    # (lavis/configs/models/clip/*.json) plus the tiny test size; RN*
    # names select the ModifiedResNet tower (models/clip_resnet.py)
    PRETRAINED_MODEL_CONFIG_DICT = {
        "tiny": None, "ViT-B-32": None, "ViT-B-32-quickgelu": None,
        "ViT-B-16": None, "ViT-B-16-plus-240": None, "ViT-L-14": None,
        "ViT-L-14-336": None, "ViT-H-14": None, "ViT-g-14": None,
        "RN50": None, "RN50-quickgelu": None, "RN101": None,
        "RN101-quickgelu": None, "RN50x4": None, "RN50x16": None,
    }

    def __init__(self, model_size: str = "tiny", bpe_path: str | None = None,
                 compute_dtype=jnp.float32, seed: int = 0):
        from mr_blip_tpu.models.clip import (
            CLIP, CLIP_MODEL_ZOO, CLIP_RESNET_ZOO, clip_config_from_name,
            clip_tiny_config, clip_vit_b16_config,
        )

        if model_size == "tiny":
            cfg = clip_tiny_config()
        elif model_size in CLIP_MODEL_ZOO or model_size in CLIP_RESNET_ZOO:
            cfg = clip_config_from_name(model_size)
        else:
            cfg = clip_vit_b16_config()
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
        img = (cfg.resnet.image_size if cfg.resnet is not None
               else cfg.vision.img_size)
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


@registry.register_model("blip_retrieval")
class BlipRetrievalModel(BaseModel):
    """BLIP-v1 retrieval (reference ``blip_models/blip_retrieval.py``):
    train = in-batch ITC + hard-negative ITM; eval = the two-stage LAVIS
    protocol — rank by the ITC cosine matrix, then rerank each row's top-k
    candidates with the ITM head (reference compute_sim_matrix:
    ``score[i, topk] = sim + softmax(itm_logits)[:, 1]``, rest -100)."""

    PRETRAINED_MODEL_CONFIG_DICT = {
        "tiny": None,
        "coco": "configs/models/blip/blip_retrieval_coco.yaml",
        "flickr": "configs/models/blip/blip_retrieval_flickr.yaml",
    }

    @staticmethod
    def _make_module(model_size, compute_dtype):
        from mr_blip_tpu.models.blip_v1 import (
            BLIPv1, blip_base_config, blip_tiny_config,
        )

        cfg = blip_tiny_config() if model_size == "tiny" else blip_base_config()
        return cfg, BLIPv1(cfg, compute_dtype=compute_dtype)

    def __init__(self, model_size: str = "tiny", max_txt_len: int = 25,
                 compute_dtype=jnp.float32, seed: int = 0):
        cfg, module = self._make_module(model_size, compute_dtype)
        self.config = cfg
        self.max_txt_len = max_txt_len
        self.tokenizer = _zoo_tokenizer(cfg.text.vocab_size)
        self.module = module
        img = cfg.vision.img_size
        self.params = self.module.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, img, img, 3)),
            jnp.zeros((1, 4), jnp.int32),
        )["params"]

        self._img_feat = jax.jit(lambda p, im: self.module.apply(
            {"params": p}, im, method="image_feat"))
        self._txt_feat = jax.jit(lambda p, ids, m: self.module.apply(
            {"params": p}, ids, m, method="text_feat"))
        self._img_states = jax.jit(lambda p, im: self.module.apply(
            {"params": p}, im, method="encode_image"))
        self._itm = jax.jit(lambda p, st, ids, m: self.module.apply(
            {"params": p}, st, ids, m, method="itm_logits_from_states"))

        def loss_fn(p, im, ids, mask):
            img_f = self.module.apply({"params": p}, im, method="image_feat")
            txt_f = self.module.apply({"params": p}, ids, mask,
                                      method="text_feat")
            sims = img_f @ txt_f.T / cfg.temp
            n = sims.shape[0]
            labels = jnp.arange(n)
            itc = (
                -jnp.take_along_axis(jax.nn.log_softmax(sims, -1),
                                     labels[:, None], 1).mean()
                - jnp.take_along_axis(jax.nn.log_softmax(sims.T, -1),
                                      labels[:, None], 1).mean()
            ) / 2
            # hard-negative ITM: for every image the most similar non-match
            # text and vice versa (reference samples from the softmax; the
            # argmax is its deterministic counterpart)
            neg_inf = jnp.finfo(sims.dtype).min
            off_diag = sims + jnp.where(jnp.eye(n, dtype=bool), neg_inf, 0.0)
            hard_txt = jnp.argmax(off_diag, axis=1)      # per image
            hard_img = jnp.argmax(off_diag, axis=0)      # per text
            states = self.module.apply({"params": p}, im, method="encode_image")
            pos = self.module.apply({"params": p}, states, ids, mask,
                                    method="itm_logits_from_states")
            neg_t = self.module.apply(
                {"params": p}, states, ids[hard_txt], mask[hard_txt],
                method="itm_logits_from_states")
            neg_i = self.module.apply(
                {"params": p}, states[hard_img], ids, mask,
                method="itm_logits_from_states")
            logits = jnp.concatenate([pos, neg_t, neg_i])
            itm_labels = jnp.concatenate(
                [jnp.ones((n,), jnp.int32), jnp.zeros((2 * n,), jnp.int32)])
            itm = -jnp.take_along_axis(
                jax.nn.log_softmax(logits, -1), itm_labels[:, None], 1
            ).mean()
            return itc + itm

        self._loss = jax.jit(loss_fn)

    @classmethod
    def from_config(cls, cfg):
        return cls(model_size=cfg.get("model_size", "tiny"),
                   max_txt_len=cfg.get("max_txt_len", 25))

    def forward(self, samples) -> Dict[str, Any]:
        ids, mask = self.tokenizer(samples["text_input"], self.max_txt_len)
        return {"loss": self._loss(self.params, _stack_images(samples),
                                   jnp.asarray(ids), jnp.asarray(mask))}

    __call__ = forward

    def compute_sim_matrix(self, data_loader, k_test: int = 128):
        """Two-stage scoring. Returns ``(score_i2t, score_t2i)`` —
        (N_img, N_txt) and (N_txt, N_img) reranked matrices; entries
        outside each row's top-k stay at -100 (reference protocol)."""
        img_feats, txt_feats, txt_ids, txt_masks = [], [], [], []
        images = []
        seen = set()
        for batch in data_loader:
            ids, mask = self.tokenizer(batch["text_input"], self.max_txt_len)
            txt_ids.append(ids)
            txt_masks.append(mask)
            txt_feats.append(np.asarray(
                self._txt_feat(self.params, jnp.asarray(ids), jnp.asarray(mask))
            ))
            imgs = np.asarray(_stack_images(batch))
            for j, img_id in enumerate(batch["image_id"]):
                if img_id not in seen:
                    seen.add(img_id)
                    images.append(imgs[j])
                    img_feats.append(np.asarray(
                        self._img_feat(self.params, imgs[j:j + 1]))[0])
        img_f = np.stack(img_feats)
        # ragged text batches: pad to one width before concatenating
        width = max(a.shape[1] for a in txt_ids)
        txt_ids = np.concatenate(
            [np.pad(a, ((0, 0), (0, width - a.shape[1]))) for a in txt_ids])
        txt_masks = np.concatenate(
            [np.pad(a, ((0, 0), (0, width - a.shape[1]))) for a in txt_masks])
        txt_f = np.concatenate(txt_feats)
        sims = img_f @ txt_f.T
        n_img, n_txt = sims.shape
        k = min(k_test, n_txt)

        score_i2t = np.full((n_img, n_txt), -100.0, np.float32)
        for i in range(n_img):
            topk = np.argsort(-sims[i])[:k]
            states = self._img_states(self.params, jnp.asarray(images[i][None]))
            states = jnp.broadcast_to(states, (k,) + states.shape[1:])
            logits = np.asarray(self._itm(
                self.params, states, jnp.asarray(txt_ids[topk]),
                jnp.asarray(txt_masks[topk])))
            probs = np.exp(logits[:, 1]) / np.exp(logits).sum(-1)
            score_i2t[i, topk] = probs + sims[i, topk]

        k = min(k_test, n_img)
        score_t2i = np.full((n_txt, n_img), -100.0, np.float32)
        for t in range(n_txt):
            topk = np.argsort(-sims[:, t])[:k]
            states = self._img_states(
                self.params, jnp.asarray(np.stack([images[j] for j in topk])))
            ids_rep = jnp.broadcast_to(jnp.asarray(txt_ids[t][None]),
                                       (len(topk), txt_ids.shape[1]))
            mask_rep = jnp.broadcast_to(jnp.asarray(txt_masks[t][None]),
                                        (len(topk), txt_masks.shape[1]))
            logits = np.asarray(self._itm(self.params, states, ids_rep, mask_rep))
            probs = np.exp(logits[:, 1]) / np.exp(logits).sum(-1)
            score_t2i[t, topk] = probs + sims[topk, t]

        return score_i2t, score_t2i


@registry.register_model("albef_nlvr_model")
class AlbefNLVRModel(BaseModel):
    """Task-facing ALBEF NLVR2 wrapper (reference ``albef_nlvr.py``):
    drives MultimodalClassificationTask — ``forward -> {"loss"}`` over
    {image, image2, text_input, label}, ``predict -> class indices``."""

    PRETRAINED_MODEL_CONFIG_DICT = {"nlvr": None, "tiny": None}

    def __init__(self, model_size: str = "tiny", max_txt_len: int = 25,
                 compute_dtype=jnp.float32, seed: int = 0):
        from mr_blip_tpu.models.albef import (
            AlbefNLVR, albef_base_config, albef_tiny_config,
        )

        cfg = albef_tiny_config() if model_size == "tiny" else albef_base_config()
        self.config = cfg
        self.max_txt_len = max_txt_len
        self.tokenizer = _zoo_tokenizer(cfg.text.vocab_size)
        self.module = AlbefNLVR(cfg, compute_dtype=compute_dtype)
        img = cfg.vision.img_size
        z = jnp.zeros((1, img, img, 3))
        self.params = self.module.init(
            jax.random.PRNGKey(seed), z, z, jnp.zeros((1, 4), jnp.int32)
        )["params"]
        self._logits = jax.jit(lambda p, a, b, ids, m: self.module.apply(
            {"params": p}, a, b, ids, m))
        self._loss = jax.jit(lambda p, a, b, ids, tgt, m: self.module.apply(
            {"params": p}, a, b, ids, tgt, m, method="loss"))

    @classmethod
    def from_config(cls, cfg):
        return cls(model_size=cfg.get("model_size", "tiny"),
                   max_txt_len=cfg.get("max_txt_len", 25))

    def _inputs(self, samples):
        ids, mask = self.tokenizer(samples["text_input"], self.max_txt_len)
        a = jnp.asarray(np.asarray(samples["image"], np.float32))
        b = jnp.asarray(np.asarray(samples["image2"], np.float32))
        return a, b, jnp.asarray(ids), jnp.asarray(mask)

    def forward(self, samples) -> Dict[str, Any]:
        a, b, ids, mask = self._inputs(samples)
        tgt = jnp.asarray(np.asarray(samples["label"], np.int32))
        return {"loss": self._loss(self.params, a, b, ids, tgt, mask)}

    __call__ = forward

    def predict(self, samples) -> Dict[str, Any]:
        a, b, ids, mask = self._inputs(samples)
        logits = np.asarray(self._logits(self.params, a, b, ids, mask))
        return {"predictions": logits.argmax(-1).tolist(),
                "targets": list(np.asarray(samples["label"], np.int64))}


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
        self.tokenizer = _zoo_tokenizer(cfg.vocab_size)
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


@registry.register_model("albef_retrieval")
class AlbefRetrievalModel(BlipRetrievalModel):
    """ALBEF retrieval: the same two-stage ITC + ITM-rerank protocol over
    the ALBEF towers (reference ``albef_models/albef_retrieval.py``; the
    fusion_layer split applies inside ITM when configured)."""

    PRETRAINED_MODEL_CONFIG_DICT = {
        "tiny": None,
        "coco": "configs/models/albef/albef_retrieval_coco.yaml",
        "flickr": "configs/models/albef/albef_retrieval_flickr.yaml",
    }

    @staticmethod
    def _make_module(model_size, compute_dtype):
        from mr_blip_tpu.models.albef import (
            ALBEF, albef_base_config, albef_tiny_config,
        )

        cfg = albef_tiny_config() if model_size == "tiny" else albef_base_config()
        return cfg, ALBEF(cfg, compute_dtype=compute_dtype)


@registry.register_model("albef_pretrain")
class AlbefPretrainModel(BaseModel):
    """ALBEF pretraining wrapper (reference ``albef_pretrain.py``): the full
    momentum-distillation + feature-queue + hard-negative-ITM objective
    with the EMA state carried inside the wrapper."""

    PRETRAINED_MODEL_CONFIG_DICT = {
        "tiny": None,
        "base": "configs/models/albef/albef_pretrain_base.yaml",
    }

    def __init__(self, model_size: str = "tiny", max_txt_len: int = 25,
                 queue_size: int = 64, alpha: float = 0.4,
                 compute_dtype=jnp.float32, seed: int = 0):
        from mr_blip_tpu.models.albef import (
            ALBEF, albef_base_config, albef_tiny_config,
            albef_pretrain_losses, init_momentum_state,
        )

        cfg = albef_tiny_config() if model_size == "tiny" else albef_base_config()
        self.config = cfg
        self.max_txt_len = max_txt_len
        self.alpha = alpha
        self.tokenizer = _zoo_tokenizer(cfg.text.vocab_size)
        self.module = ALBEF(cfg, compute_dtype=compute_dtype)
        img = cfg.vision.img_size
        self.params = self.module.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, img, img, 3)),
            jnp.zeros((1, 4), jnp.int32),
        )["params"]
        self.momentum_state = init_momentum_state(
            self.params, cfg.embed_dim, queue_size=queue_size, seed=seed)
        self._losses = albef_pretrain_losses
        self._rng = jax.random.PRNGKey(seed + 1)

    @classmethod
    def from_config(cls, cfg):
        return cls(model_size=cfg.get("model_size", "tiny"),
                   queue_size=cfg.get("queue_size", 64),
                   alpha=cfg.get("alpha", 0.4))

    def forward(self, samples) -> Dict[str, Any]:
        ids, mask = self.tokenizer(samples["text_input"], self.max_txt_len)
        self._rng, step_rng = jax.random.split(self._rng)
        losses, self.momentum_state = self._losses(
            self.module, self.params, self.momentum_state,
            jnp.asarray(np.asarray(samples["image"], np.float32)),
            jnp.asarray(ids), jnp.asarray(mask), step_rng, alpha=self.alpha,
        )
        return {"loss": losses["loss"], **losses}

    __call__ = forward


class _ClassificationWrapper(BaseModel):
    """Shared forward/predict for the single-image classification heads."""

    num_classes = 2

    def _inputs(self, samples):
        ids, mask = self.tokenizer(samples["text_input"], self.max_txt_len)
        return (jnp.asarray(np.asarray(samples["image"], np.float32)),
                jnp.asarray(ids), jnp.asarray(mask))

    def forward(self, samples) -> Dict[str, Any]:
        im, ids, mask = self._inputs(samples)
        logits = self._logits(self.params, im, ids, mask)
        tgt = jnp.asarray(np.asarray(samples["label"], np.int32))
        ll = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        loss = -jnp.take_along_axis(ll, tgt[:, None], axis=1).mean()
        return {"loss": loss}

    __call__ = forward

    def predict(self, samples) -> Dict[str, Any]:
        im, ids, mask = self._inputs(samples)
        logits = np.asarray(self._logits(self.params, im, ids, mask))
        return {"predictions": logits.argmax(-1).tolist(),
                "targets": list(np.asarray(samples["label"], np.int64))}


@registry.register_model("albef_classification")
class AlbefClassificationModel(_ClassificationWrapper):
    """Single-image entailment classification (reference
    ``albef_classification.py``; SNLI-VE = 3 classes)."""

    PRETRAINED_MODEL_CONFIG_DICT = {
        "tiny": None,
        "ve": "configs/models/albef/albef_classification_ve.yaml",
    }

    def __init__(self, model_size: str = "tiny", num_classes: int = 3,
                 max_txt_len: int = 25, compute_dtype=jnp.float32,
                 seed: int = 0):
        from mr_blip_tpu.models.albef import (
            AlbefNLVR, albef_base_config, albef_tiny_config,
        )

        cfg = albef_tiny_config() if model_size == "tiny" else albef_base_config()
        self.config = cfg
        self.num_classes = num_classes
        self.max_txt_len = max_txt_len
        self.tokenizer = _zoo_tokenizer(cfg.text.vocab_size)
        self.module = AlbefNLVR(cfg, compute_dtype=compute_dtype,
                                num_classes=num_classes)
        img = cfg.vision.img_size
        z = jnp.zeros((1, img, img, 3))
        self.params = self.module.init(
            jax.random.PRNGKey(seed), z, z, jnp.zeros((1, 4), jnp.int32)
        )["params"]
        self._logits = jax.jit(lambda p, im, ids, m: self.module.apply(
            {"params": p}, im, ids, m, method="classify_single"))

    @classmethod
    def from_config(cls, cfg):
        return cls(model_size=cfg.get("model_size", "tiny"),
                   num_classes=cfg.get("num_classes", 3))


@registry.register_model("blip_classification")
class BlipClassificationModel(_ClassificationWrapper):
    """BLIP single-image classification (reference
    ``blip_classification.py``): cls head over the fused cls token."""

    PRETRAINED_MODEL_CONFIG_DICT = {
        "tiny": None,
        "base": "configs/models/blip/blip_classification_base.yaml",
    }

    def __init__(self, model_size: str = "tiny", num_classes: int = 3,
                 max_txt_len: int = 25, compute_dtype=jnp.float32,
                 seed: int = 0):
        import dataclasses as _dc

        from mr_blip_tpu.models.blip_v1 import (
            BLIPv1, blip_base_config, blip_tiny_config,
        )

        cfg = blip_tiny_config() if model_size == "tiny" else blip_base_config()
        cfg = _dc.replace(cfg, num_classes=num_classes)
        self.config = cfg
        self.num_classes = num_classes
        self.max_txt_len = max_txt_len
        self.tokenizer = _zoo_tokenizer(cfg.text.vocab_size)
        self.module = BLIPv1(cfg, compute_dtype=compute_dtype)
        img = cfg.vision.img_size
        im0 = jnp.zeros((1, img, img, 3))
        ids0 = jnp.zeros((1, 4), jnp.int32)
        self.params = self.module.init(
            jax.random.PRNGKey(seed), im0, ids0, None, method="classify",
        )["params"]
        self._logits = jax.jit(lambda p, im, ids, m: self.module.apply(
            {"params": p}, im, ids, m, method="classify"))

    @classmethod
    def from_config(cls, cfg):
        return cls(model_size=cfg.get("model_size", "tiny"),
                   num_classes=cfg.get("num_classes", 3))


@registry.register_model("blip_nlvr")
class BlipNLVRModel(_ClassificationWrapper):
    """BLIP NLVR2 (reference ``blip_nlvr.py`` + nlvr_encoder.py's merged
    two-image cross-attention)."""

    PRETRAINED_MODEL_CONFIG_DICT = {
        "tiny": None,
        "nlvr": "configs/models/blip/blip_nlvr.yaml",
    }

    def __init__(self, model_size: str = "tiny", max_txt_len: int = 25,
                 compute_dtype=jnp.float32, seed: int = 0):
        from mr_blip_tpu.models.blip_v1 import (
            BLIPv1, blip_base_config, blip_tiny_config,
        )

        cfg = blip_tiny_config() if model_size == "tiny" else blip_base_config()
        self.config = cfg
        self.max_txt_len = max_txt_len
        self.tokenizer = _zoo_tokenizer(cfg.text.vocab_size)
        self.module = BLIPv1(cfg, compute_dtype=compute_dtype)
        img = cfg.vision.img_size
        self.params = self.module.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, img, img, 3)),
            jnp.zeros((1, 4), jnp.int32),
        )["params"]
        self._nlvr = jax.jit(lambda p, a, b, ids, m: self.module.apply(
            {"params": p}, a, b, ids, m, method="nlvr_logits"))

    @classmethod
    def from_config(cls, cfg):
        return cls(model_size=cfg.get("model_size", "tiny"))

    def _inputs2(self, samples):
        ids, mask = self.tokenizer(samples["text_input"], self.max_txt_len)
        return (jnp.asarray(np.asarray(samples["image"], np.float32)),
                jnp.asarray(np.asarray(samples["image2"], np.float32)),
                jnp.asarray(ids), jnp.asarray(mask))

    def forward(self, samples) -> Dict[str, Any]:
        a, b, ids, mask = self._inputs2(samples)
        logits = self._nlvr(self.params, a, b, ids, mask)
        tgt = jnp.asarray(np.asarray(samples["label"], np.int32))
        ll = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return {"loss": -jnp.take_along_axis(ll, tgt[:, None], axis=1).mean()}

    __call__ = forward

    def predict(self, samples) -> Dict[str, Any]:
        a, b, ids, mask = self._inputs2(samples)
        logits = np.asarray(self._nlvr(self.params, a, b, ids, mask))
        return {"predictions": logits.argmax(-1).tolist(),
                "targets": list(np.asarray(samples["label"], np.int64))}


@registry.register_model("blip_vqa")
class BlipVQAModel(BaseModel):
    """BLIP open-ended VQA (reference ``blip_vqa.py``): multimodal question
    encoding + answer decoding; inference ranks a candidate answer list
    with the shared two-stage ranker (albef.py::rank_answers)."""

    PRETRAINED_MODEL_CONFIG_DICT = {
        "tiny": None,
        "vqav2": "configs/models/blip/blip_vqav2.yaml",
    }

    def __init__(self, model_size: str = "tiny", max_txt_len: int = 25,
                 answer_list=None, compute_dtype=jnp.float32, seed: int = 0):
        from mr_blip_tpu.models.blip_v1 import (
            BLIPv1, blip_base_config, blip_tiny_config,
        )

        cfg = blip_tiny_config() if model_size == "tiny" else blip_base_config()
        self.config = cfg
        self.max_txt_len = max_txt_len
        self.tokenizer = _zoo_tokenizer(cfg.text.vocab_size)
        self.answer_list = answer_list or ["yes", "no"]
        self.module = BLIPv1(cfg, compute_dtype=compute_dtype)
        img = cfg.vision.img_size
        self.params = self.module.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, img, img, 3)),
            jnp.zeros((1, 4), jnp.int32),
        )["params"]
        self._loss = jax.jit(lambda p, im, q, qm, a, am: self.module.apply(
            {"params": p}, im, q, qm, a, am, method="vqa_answer_loss"))

    @classmethod
    def from_config(cls, cfg):
        return cls(model_size=cfg.get("model_size", "tiny"),
                   answer_list=cfg.get("answer_list"))

    def forward(self, samples) -> Dict[str, Any]:
        q_ids, q_mask = self.tokenizer(samples["text_input"], self.max_txt_len)
        answers = [a[0] if isinstance(a, (list, tuple)) else a
                   for a in samples["answers"]]
        a_ids, a_mask = self.tokenizer(answers, self.max_txt_len)
        loss = self._loss(
            self.params, _stack_images(samples), jnp.asarray(q_ids),
            jnp.asarray(q_mask), jnp.asarray(a_ids), jnp.asarray(a_mask))
        return {"loss": loss}

    __call__ = forward

    def predict_answers(self, samples, num_ans_candidates: int = 8):
        from mr_blip_tpu.models.albef import rank_answers

        q_ids, q_mask = self.tokenizer(samples["text_input"], self.max_txt_len)
        a_ids, a_mask = self.tokenizer(self.answer_list, self.max_txt_len)
        picks = rank_answers(
            self.module, self.params, _stack_images(samples),
            jnp.asarray(q_ids), jnp.asarray(q_mask), jnp.asarray(a_ids),
            jnp.asarray(a_mask), k=num_ans_candidates,
        )
        return [self.answer_list[int(i)] for i in picks]


@registry.register_model("blip_feature_extractor")
class BlipFeatureExtractorModel(BaseModel):
    """Reference ``blip_feature_extractor``: extract_features(samples,
    mode) over the BLIP towers."""

    PRETRAINED_MODEL_CONFIG_DICT = {
        "tiny": None,
        "base": "configs/models/blip/blip_feature_extractor_base.yaml",
    }

    def __init__(self, model_size: str = "tiny", max_txt_len: int = 25,
                 compute_dtype=jnp.float32, seed: int = 0):
        from mr_blip_tpu.models.blip_v1 import (
            BLIPv1, blip_base_config, blip_tiny_config,
        )

        cfg = blip_tiny_config() if model_size == "tiny" else blip_base_config()
        self.config = cfg
        self.max_txt_len = max_txt_len
        self.tokenizer = _zoo_tokenizer(cfg.text.vocab_size)
        self.module = BLIPv1(cfg, compute_dtype=compute_dtype)
        img = cfg.vision.img_size
        self.params = self.module.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, img, img, 3)),
            jnp.zeros((1, 4), jnp.int32),
        )["params"]

    @classmethod
    def from_config(cls, cfg):
        return cls(model_size=cfg.get("model_size", "tiny"))

    def extract_features(self, samples, mode="multimodal"):
        kwargs = {"mode": mode}
        if mode in ("image", "multimodal"):
            kwargs["images"] = _stack_images(samples)
        if mode in ("text", "multimodal"):
            ids, mask = self.tokenizer(samples["text_input"], self.max_txt_len)
            kwargs["text_ids"] = jnp.asarray(ids)
            kwargs["text_mask"] = jnp.asarray(mask)
        return self.module.apply({"params": self.params},
                                 method="extract_features", **kwargs)


@registry.register_model("blip_image_text_matching")
class BlipITMModel(BlipFeatureExtractorModel):
    """Reference ``blip_image_text_matching``: itm(samples,
    match_head='itm'|'itc') scoring."""

    PRETRAINED_MODEL_CONFIG_DICT = {
        "tiny": None,
        "base": "configs/models/blip/blip_itm_base.yaml",
        "large": "configs/models/blip/blip_itm_large.yaml",
    }

    def itm(self, samples, match_head: str = "itm"):
        ids, mask = self.tokenizer(samples["text_input"], self.max_txt_len)
        ims = _stack_images(samples)
        if match_head == "itm":
            return np.asarray(self.module.apply(
                {"params": self.params}, ims, jnp.asarray(ids),
                jnp.asarray(mask), method="itm_logits"))
        img_f, txt_f = self.module.apply(
            {"params": self.params}, ims, jnp.asarray(ids),
            jnp.asarray(mask), method="itc_features")
        return np.asarray((img_f * txt_f).sum(-1))


@registry.register_model("alpro_qa")
class AlproQAModel(BaseModel):
    """ALPRO video-QA classifier (reference ``alpro_qa.py``): fused cls ->
    answer-vocabulary logits; drives MultimodalClassificationTask."""

    PRETRAINED_MODEL_CONFIG_DICT = {
        "tiny": None,
        "msrvtt": "configs/models/alpro/alpro_qa_msrvtt.yaml",
        "msvd": "configs/models/alpro/alpro_qa_msvd.yaml",
    }

    def __init__(self, model_size: str = "tiny", num_classes: int = 16,
                 max_txt_len: int = 25, compute_dtype=jnp.float32,
                 seed: int = 0):
        from mr_blip_tpu.models.alpro import (
            ALPRO, alpro_base_config, alpro_tiny_config,
        )

        cfg = (alpro_tiny_config(num_classes=num_classes)
               if model_size == "tiny"
               else alpro_base_config(num_classes=num_classes))
        self.config = cfg
        self.max_txt_len = max_txt_len
        self.tokenizer = _zoo_tokenizer(cfg.text.vocab_size)
        self.module = ALPRO(cfg, compute_dtype=compute_dtype)
        t, img = cfg.vision.n_frms, cfg.vision.img_size
        self.params = self.module.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, t, img, img, 3)),
            jnp.zeros((1, 4), jnp.int32),
        )["params"]
        self._qa = jax.jit(lambda p, v, ids, m: self.module.apply(
            {"params": p}, v, ids, m, method="qa_logits"))

    @classmethod
    def from_config(cls, cfg):
        return cls(model_size=cfg.get("model_size", "tiny"),
                   num_classes=cfg.get("num_classes", 16))

    def _inputs(self, samples):
        ids, mask = self.tokenizer(samples["text_input"], self.max_txt_len)
        return (jnp.asarray(np.asarray(samples["image"], np.float32)),
                jnp.asarray(ids), jnp.asarray(mask))

    def forward(self, samples) -> Dict[str, Any]:
        v, ids, mask = self._inputs(samples)
        logits = self._qa(self.params, v, ids, mask)
        tgt = jnp.asarray(np.asarray(samples["label"], np.int32))
        ll = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return {"loss": -jnp.take_along_axis(ll, tgt[:, None], axis=1).mean()}

    __call__ = forward

    def predict(self, samples) -> Dict[str, Any]:
        v, ids, mask = self._inputs(samples)
        logits = np.asarray(self._qa(self.params, v, ids, mask))
        return {"predictions": logits.argmax(-1).tolist(),
                "targets": list(np.asarray(samples["label"], np.int64))}


# ---------------------------------------------------------------------------
# BLIP-2 image family (reference blip2_models/: blip2_qformer.py,
# blip2_image_text_matching.py, blip2_t5.py, blip2_opt.py)
# ---------------------------------------------------------------------------


@registry.register_model("blip2")
class Blip2Model(BaseModel):
    """Stage-1 BLIP-2 (reference ``blip2`` name = Blip2Qformer): ITC + ITM +
    LM pretraining over the multimodal Q-Former, plus the caption
    ``generate`` surface."""

    PRETRAINED_MODEL_CONFIG_DICT = {
        "tiny": None,
        "pretrain": "configs/models/blip2_zoo/blip2_stage1_pretrain.yaml",
        "coco": "configs/models/blip2_zoo/blip2_stage1_coco.yaml",
    }

    def __init__(self, model_size: str = "tiny", max_txt_len: int = 32,
                 compute_dtype=jnp.float32, seed: int = 0):
        from mr_blip_tpu.models.blip2_qformer import (
            Blip2Qformer, blip2_qformer_base_config, blip2_qformer_tiny_config,
        )

        cfg = (blip2_qformer_tiny_config() if model_size == "tiny"
               else blip2_qformer_base_config())
        self.config = cfg
        self.max_txt_len = max_txt_len
        self.tokenizer = _zoo_tokenizer(cfg.qformer.vocab_size)
        self.module = Blip2Qformer(cfg, compute_dtype=compute_dtype)
        img = cfg.vision.img_size
        self.params = self.module.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, img, img, 3)),
            jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32),
        )["params"]
        self._rng = jax.random.PRNGKey(seed + 1)
        self._loss = jax.jit(lambda p, im, ids, m, r: self.module.apply(
            {"params": p}, im, ids, m, rng=r))

        def greedy(p, im, max_len):
            states = self.module.apply({"params": p}, im,
                                       method="encode_image")
            b = im.shape[0]
            buf = jnp.zeros((b, max_len), jnp.int32)
            buf = buf.at[:, 0].set(self.tokenizer.bos_token_id)

            def step(buf, t):
                logits = self.module.apply(
                    {"params": p}, states, buf, t, method="lm_step_logits")
                return buf.at[:, t + 1].set(
                    jnp.argmax(logits, -1).astype(jnp.int32)), None

            buf, _ = jax.lax.scan(step, buf, jnp.arange(max_len - 1))
            return buf

        self._greedy = jax.jit(greedy, static_argnames=("max_len",))

    @classmethod
    def from_config(cls, cfg):
        return cls(model_size=cfg.get("model_size", "tiny"),
                   max_txt_len=cfg.get("max_txt_len", 32))

    def _text(self, samples):
        ids, mask = self.tokenizer(samples["text_input"], self.max_txt_len)
        return jnp.asarray(ids), jnp.asarray(mask)

    def forward(self, samples) -> Dict[str, Any]:
        ids, mask = self._text(samples)
        self._rng, r = jax.random.split(self._rng)
        out = self._loss(self.params, _stack_images(samples), ids, mask, r)
        return dict(out)

    __call__ = forward

    def generate(self, samples, max_length: int = 12, **_) -> Dict[str, Any]:
        buf = self._greedy(self.params, _stack_images(samples), max_length)
        return {"captions": [self.tokenizer.decode(r[1:])
                             for r in np.asarray(buf)]}

    def extract_features(self, samples, mode="multimodal"):
        kwargs = {"mode": mode}
        if mode in ("image", "multimodal"):
            kwargs["images"] = _stack_images(samples)
        if mode in ("text", "multimodal"):
            ids, mask = self._text(samples)
            kwargs["text_ids"], kwargs["text_mask"] = ids, mask
        return self.module.apply({"params": self.params},
                                 method="extract_features", **kwargs)


@registry.register_model("blip2_feature_extractor")
class Blip2FeatureExtractorModel(Blip2Model):
    """Reference ``blip2_feature_extractor`` — the same Blip2Qformer
    checkpoint exposed through extract_features only."""

    PRETRAINED_MODEL_CONFIG_DICT = {"pretrain": None, "tiny": None}


@registry.register_model("blip2_image_text_matching")
class Blip2ITMModel(Blip2Model):
    """Reference ``blip2_image_text_matching`` (Blip2ITM): itm / itc
    scoring heads over the stage-1 model."""

    PRETRAINED_MODEL_CONFIG_DICT = {"pretrain": None, "coco": None,
                                    "tiny": None}

    def itm(self, samples, match_head: str = "itm"):
        ids, mask = self._text(samples)
        ims = _stack_images(samples)
        if match_head == "itm":
            return np.asarray(self.module.apply(
                {"params": self.params}, ims, ids, mask,
                method="itm_logits"))
        img_f = self.module.apply({"params": self.params}, ims,
                                  method="image_feat")  # (B, Q, D)
        txt_f = self.module.apply({"params": self.params}, ids, mask,
                                  method="text_feat")   # (B, D)
        return np.asarray(
            jnp.einsum("bqd,bd->bq", img_f, txt_f).max(-1))


@registry.register_model("blip2_t5")
class Blip2T5Model(BaseModel):
    """Image BLIP-2 with a frozen flan-T5 LM (reference ``blip2_t5.py``):
    query tokens projected into the T5 encoder input, span LM loss,
    cached greedy generation. Built on the flagship Blip2MRModule with a
    single frame (the video MR stack is the same graph, T=1)."""

    PRETRAINED_MODEL_CONFIG_DICT = {"pretrain_flant5xl": None,
                                    "caption_coco_flant5xl": None,
                                    "tiny": None}

    def __init__(self, model_size: str = "tiny", max_txt_len: int = 25,
                 max_new_tokens: int = 12, compute_dtype=jnp.float32,
                 seed: int = 0):
        from mr_blip_tpu.models.blip2_mr_module import Blip2MRModule
        from mr_blip_tpu.models.eva_vit import eva_vit_g_config, vit_tiny_config
        from mr_blip_tpu.models.qformer import (
            qformer_base_config, qformer_tiny_config,
        )
        from mr_blip_tpu.models.t5 import t5_flan_xl_config, t5_tiny_config

        if model_size == "tiny":
            vit_cfg = vit_tiny_config()
            qf_cfg = qformer_tiny_config(encoder_width=32)
            t5_cfg = t5_tiny_config(vocab_size=992)
        else:
            vit_cfg = eva_vit_g_config()
            qf_cfg = qformer_base_config()
            t5_cfg = t5_flan_xl_config()
        self.t5_config = t5_cfg
        self.max_txt_len = max_txt_len
        self.max_new_tokens = max_new_tokens
        self.tokenizer = _zoo_tokenizer(t5_cfg.vocab_size)
        self.module = Blip2MRModule(
            vit_config=vit_cfg, qformer_config=qf_cfg, t5_config=t5_cfg,
            compute_dtype=compute_dtype, decode_cache_len=max_new_tokens,
        )
        img = vit_cfg.img_size
        frames = jnp.zeros((1, 1, img, img, 3), jnp.float32)
        v1 = self.module.init(jax.random.PRNGKey(seed), frames,
                              method="encode_frames")

        def t5_init(mod):
            loss, _ = mod.loss_from_encoder_input(
                jnp.zeros((1, 2, t5_cfg.d_model), jnp.float32),
                jnp.ones((1, 2), jnp.int32),
                jnp.zeros((1, 1), jnp.int32), jnp.ones((1, 1), jnp.int32))
            return loss

        v2 = self.module.init(jax.random.PRNGKey(seed), method=t5_init)
        self.params = {**v1["params"], **v2["params"]}

        def loss_fn(p, frames, t_ids, t_mask, a_ids, a_mask):
            def inner(mod):
                f = mod.encode_frames(frames)
                embeds, attn = mod.qa_encoder_input(f, t_ids, t_mask)
                loss, _ = mod.loss_from_encoder_input(embeds, attn, a_ids,
                                                      a_mask)
                return loss
            return self.module.apply({"params": p}, method=inner)

        self._loss = jax.jit(loss_fn)

        def gen_fn(p, frames, t_ids, t_mask, batch_size: int):
            from mr_blip_tpu.models.blip2_mr import (
                _merge_cache, _split_cache, _zero_self_cache,
            )
            from mr_blip_tpu.models.generation import greedy_decode_with_scores

            def encode(mod):
                f = mod.encode_frames(frames)
                embeds, attn = mod.qa_encoder_input(f, t_ids, t_mask)
                return mod.encode(embeds, attn), attn

            enc, attn = self.module.apply({"params": p}, method=encode)
            dummy = jnp.zeros((batch_size, 1), jnp.int32)
            _, vars0 = self.module.apply(
                {"params": p}, dummy, enc, attn, jnp.int32(0),
                method="decode_step", mutable=["cache"])
            self_cache, cross_cache = _split_cache(
                _zero_self_cache(vars0["cache"]))

            def decode_step(self_cache, tokens, position):
                logits, updated = self.module.apply(
                    {"params": p,
                     "cache": _merge_cache(self_cache, cross_cache)},
                    tokens, enc, attn, position,
                    method="decode_step", mutable=["cache"])
                return logits[:, 0], _split_cache(updated["cache"])[0]

            seqs, _ = greedy_decode_with_scores(
                decode_step, self_cache, batch_size=batch_size,
                max_length=self.max_new_tokens,
                eos_token_id=t5_cfg.eos_token_id,
                pad_token_id=t5_cfg.pad_token_id,
                decoder_start_token_id=t5_cfg.decoder_start_token_id,
                vocab_size=t5_cfg.vocab_size)
            return seqs

        self._gen = jax.jit(gen_fn, static_argnames=("batch_size",))

    @classmethod
    def from_config(cls, cfg):
        return cls(model_size=cfg.get("model_size", "tiny"),
                   max_txt_len=cfg.get("max_txt_len", 25))

    def _frames(self, samples):
        im = np.asarray(_stack_images(samples))
        return jnp.asarray(im[:, None])  # (B, 1, H, W, C)

    def forward(self, samples) -> Dict[str, Any]:
        t_ids, t_mask = self.tokenizer(samples["text_input"],
                                       self.max_txt_len)
        a_ids, a_mask = self.tokenizer(samples["text_output"],
                                       self.max_txt_len)
        loss = self._loss(self.params, self._frames(samples),
                          jnp.asarray(t_ids), jnp.asarray(t_mask),
                          jnp.asarray(a_ids), jnp.asarray(a_mask))
        return {"loss": loss}

    __call__ = forward

    def generate(self, samples, **_) -> Dict[str, Any]:
        t_ids, t_mask = self.tokenizer(samples["text_input"],
                                       self.max_txt_len)
        seqs = self._gen(self.params, self._frames(samples),
                         jnp.asarray(t_ids), jnp.asarray(t_mask),
                         t_ids.shape[0])
        return {"captions": [self.tokenizer.decode(r[1:])
                             for r in np.asarray(seqs)]}

    def predict_answers(self, samples, **kw):
        return self.generate(samples, **kw)["captions"]


@registry.register_model("blip2_opt")
class Blip2OPTModel(BaseModel):
    """Image BLIP-2 with a frozen OPT decoder (reference ``blip2_opt.py``):
    query tokens prefix the OPT embedding stream; answer-region causal LM
    loss; buffer-greedy generation (the cached path lives in the flagship
    ``blip2_opt_mr``)."""

    PRETRAINED_MODEL_CONFIG_DICT = {"pretrain_opt2.7b": None,
                                    "caption_coco_opt2.7b": None,
                                    "tiny": None}

    def __init__(self, model_size: str = "tiny", max_txt_len: int = 25,
                 compute_dtype=jnp.float32, seed: int = 0):
        from mr_blip_tpu.models.blip2_mr_opt import Blip2OPTModule
        from mr_blip_tpu.models.eva_vit import eva_vit_g_config, vit_tiny_config
        from mr_blip_tpu.models.opt import opt_2_7b_config, opt_tiny_config
        from mr_blip_tpu.models.qformer import (
            qformer_base_config, qformer_tiny_config,
        )

        if model_size == "tiny":
            vit_cfg = vit_tiny_config()
            qf_cfg = qformer_tiny_config(encoder_width=32)
            opt_cfg = opt_tiny_config(vocab_size=992)
        else:
            vit_cfg = eva_vit_g_config()
            qf_cfg = qformer_base_config()
            opt_cfg = opt_2_7b_config()
        self.opt_config = opt_cfg
        self.max_txt_len = max_txt_len
        self.tokenizer = _zoo_tokenizer(opt_cfg.vocab_size)
        self.module = Blip2OPTModule(
            vit_config=vit_cfg, qformer_config=qf_cfg, opt_config=opt_cfg,
            compute_dtype=compute_dtype)
        img = vit_cfg.img_size
        frames = jnp.zeros((1, 1, img, img, 3), jnp.float32)
        e0 = jnp.zeros((1, 0), jnp.int32)
        t0 = jnp.zeros((1, 2), jnp.int32)
        self.params = self.module.init(
            jax.random.PRNGKey(seed), frames, e0, e0, e0, e0, t0,
            jnp.ones_like(t0), t0, jnp.ones_like(t0), method="loss",
        )["params"]

        def loss_fn(p, frames, t_ids, t_mask, a_ids, a_mask):
            b = frames.shape[0]
            e = jnp.zeros((b, 0), jnp.int32)
            return self.module.apply(
                {"params": p}, frames, e, e, e, e, t_ids, t_mask,
                a_ids, a_mask, method="loss")

        self._loss = jax.jit(loss_fn)

        def greedy(p, frames, t_ids, t_mask, max_len):
            b = frames.shape[0]
            e = jnp.zeros((b, 0), jnp.int32)
            prompt, pmask = self.module.apply(
                {"params": p}, frames, e, e, e, e, t_ids, t_mask,
                method="prefill")
            p_len = prompt.shape[1]
            buf = jnp.zeros((b, max_len), jnp.int32)

            def step(buf, t):
                embeds = self.module.apply(
                    {"params": p}, buf,
                    method=lambda mod, ids: mod.opt.embed_tokens_table(ids)
                    .astype(prompt.dtype))
                full = jnp.concatenate([prompt, embeds], axis=1)
                fmask = jnp.concatenate(
                    [pmask, jnp.ones((b, max_len), jnp.int32)], axis=1)
                logits = self.module.apply(
                    {"params": p}, full, attention_mask=fmask,
                    method=lambda mod, x, attention_mask: mod.opt(
                        x, attention_mask=attention_mask))
                nxt = jnp.argmax(
                    jax.lax.dynamic_index_in_dim(
                        logits, p_len - 1 + t, axis=1, keepdims=False), -1)
                return buf.at[:, t].set(nxt.astype(jnp.int32)), None

            buf, _ = jax.lax.scan(step, buf, jnp.arange(max_len))
            return buf

        self._greedy = jax.jit(greedy, static_argnames=("max_len",))

    @classmethod
    def from_config(cls, cfg):
        return cls(model_size=cfg.get("model_size", "tiny"))

    def _frames(self, samples):
        return jnp.asarray(np.asarray(_stack_images(samples))[:, None])

    def forward(self, samples) -> Dict[str, Any]:
        t_ids, t_mask = self.tokenizer(samples["text_input"],
                                       self.max_txt_len)
        a_ids, a_mask = self.tokenizer(samples["text_output"],
                                       self.max_txt_len)
        loss = self._loss(self.params, self._frames(samples),
                          jnp.asarray(t_ids), jnp.asarray(t_mask),
                          jnp.asarray(a_ids), jnp.asarray(a_mask))
        return {"loss": loss}

    __call__ = forward

    def generate(self, samples, max_length: int = 8, **_) -> Dict[str, Any]:
        t_ids, t_mask = self.tokenizer(samples["text_input"],
                                       self.max_txt_len)
        buf = self._greedy(self.params, self._frames(samples),
                           jnp.asarray(t_ids), jnp.asarray(t_mask),
                           max_length)
        return {"captions": [self.tokenizer.decode(r)
                             for r in np.asarray(buf)]}


@registry.register_model("blip_pretrain")
class BlipPretrainModel(BaseModel):
    """BLIP-v1 pretraining (reference ``blip_pretrain.py``): the ALBEF
    momentum-distillation ITC + queue + hard-negative ITM recipe (shared
    loss driver, models/albef.py::albef_pretrain_losses — BLIP keeps the
    same objective) plus the caption LM loss of the text decoder."""

    PRETRAINED_MODEL_CONFIG_DICT = {
        "tiny": None,
        "base": "configs/models/blip/blip_pretrain_base.yaml",
    }

    def __init__(self, model_size: str = "tiny", max_txt_len: int = 25,
                 queue_size: int = 64, alpha: float = 0.4,
                 compute_dtype=jnp.float32, seed: int = 0):
        from mr_blip_tpu.models.albef import (
            albef_pretrain_losses, init_momentum_state,
        )
        from mr_blip_tpu.models.blip_v1 import (
            BLIPv1, blip_base_config, blip_tiny_config,
        )

        cfg = blip_tiny_config() if model_size == "tiny" else blip_base_config()
        self.config = cfg
        self.max_txt_len = max_txt_len
        self.alpha = alpha
        self.tokenizer = _zoo_tokenizer(cfg.text.vocab_size)
        self.module = BLIPv1(cfg, compute_dtype=compute_dtype)
        img = cfg.vision.img_size
        self.params = self.module.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, img, img, 3)),
            jnp.zeros((1, 4), jnp.int32),
        )["params"]
        self.momentum_state = init_momentum_state(
            self.params, cfg.embed_dim, queue_size=queue_size, seed=seed)
        self._losses = albef_pretrain_losses
        self._lm = jax.jit(lambda p, im, ids, m: self.module.apply(
            {"params": p}, im, ids, m, method="caption_loss"))
        self._rng = jax.random.PRNGKey(seed + 1)

    @classmethod
    def from_config(cls, cfg):
        return cls(model_size=cfg.get("model_size", "tiny"),
                   queue_size=cfg.get("queue_size", 64),
                   alpha=cfg.get("alpha", 0.4))

    def forward(self, samples) -> Dict[str, Any]:
        ids, mask = self.tokenizer(samples["text_input"], self.max_txt_len)
        im = _stack_images(samples)
        ids, mask = jnp.asarray(ids), jnp.asarray(mask)
        self._rng, r = jax.random.split(self._rng)
        losses, self.momentum_state = self._losses(
            self.module, self.params, self.momentum_state, im, ids, mask, r,
            alpha=self.alpha)
        lm = self._lm(self.params, im, ids, mask)
        return {"loss": losses["loss"] + lm, "loss_lm": lm, **losses}

    __call__ = forward


@registry.register_model("pnp_unifiedqav2_fid")
class PNPUnifiedQAv2FiD(BaseModel):
    """Fusion-in-Decoder T5 reader (reference ``pnp_vqa_models/
    pnp_unifiedqav2_fid.py``): every "question: Q context: C_i" pair is
    encoded separately; the decoder cross-attends over the concatenation
    of all passage encodings. Registered standalone so the reader stage of
    PNP-VQA is a zoo citizen (the orchestrated pipeline is
    ``pnp_vqa`` / models/pnp_vqa.py)."""

    PRETRAINED_MODEL_CONFIG_DICT = {
        "tiny": None,
        "base": "configs/models/pnp_vqa/pnp_unifiedqav2_fid_base.yaml",
    }

    def __init__(self, model_size: str = "tiny", max_new_tokens: int = 8,
                 compute_dtype=jnp.float32, seed: int = 0):
        from mr_blip_tpu.models.t5 import (
            T5ForConditionalGeneration, t5_flan_xl_config, t5_tiny_config,
        )

        cfg = (t5_tiny_config(vocab_size=992) if model_size == "tiny"
               else t5_flan_xl_config())
        self.config = cfg
        self.max_new_tokens = max_new_tokens
        self.tokenizer = _zoo_tokenizer(cfg.vocab_size)
        self.module = T5ForConditionalGeneration(cfg,
                                                 compute_dtype=compute_dtype)
        self.params = self.module.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, 4, cfg.d_model)),
            jnp.zeros((1, 2), jnp.int32),
        )["params"]

    @classmethod
    def from_config(cls, cfg):
        return cls(model_size=cfg.get("model_size", "tiny"))

    def predict_answers(self, samples, **_) -> List[str]:
        """samples: text_input (questions) + context (list of passage lists
        per question)."""
        answers = []
        for q, caps in zip(samples["text_input"], samples["context"]):
            caps = caps if caps else [""]
            prompts = [f"question: {q} context: {c}" for c in caps]
            ids, mask = self.tokenizer(prompts, 64)
            ids_in, mask_in = jnp.asarray(ids), jnp.asarray(mask)
            embeds = self.module.apply(
                {"params": self.params}, ids_in, method="embed_tokens")
            states = self.module.apply(
                {"params": self.params}, embeds, mask=mask_in,
                method="encode")
            k, l, d = states.shape
            fused = states.reshape(1, k * l, d)
            fused_mask = mask_in.reshape(1, k * l)
            out = jnp.full((1, 1), self.config.decoder_start_token_id,
                           jnp.int32)
            for _ in range(self.max_new_tokens):
                logits = self.module.apply(
                    {"params": self.params}, out, fused,
                    encoder_mask=fused_mask, method="decode")
                nxt = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
                out = jnp.concatenate([out, nxt], axis=1)
                if int(nxt[0, 0]) == self.config.eos_token_id:
                    break
            answers.append(self.tokenizer.decode(np.asarray(out)[0, 1:]))
        return answers
