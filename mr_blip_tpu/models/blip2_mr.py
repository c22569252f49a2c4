"""BLIP2-MR: host wrapper over the jitted computation graph.

The task-facing model API matches the reference
(``lavis/models/blip2_mr_models/blip2_mr.py:49-1608``): ``model(samples)``
returns ``{"loss"}``; ``model.generate(samples)`` returns prediction /
raw_prediction / answer / qid / duration; ``videoQA_generate`` runs the
two-stage localizer->answerer pipeline.  Strings, tokenization, timestamp
formatting, and the interleave *plan* happen here on host; every tensor op
runs in shape-bucketed jitted functions.

Task-string flags (reference semantics): ``lora`` (LoRA r=8 on all T5
linears), ``qformer_freeze``, ``QA`` (adds the answerer T5),
``with_localizer`` / ``oracle_localizer`` (QA stage-1 source),
``only_frames`` (no timestamps), ``add_duration``, ``no_task_prompt``.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from mr_blip_tpu.common.registry import registry
from mr_blip_tpu.models.base import BaseModel
from mr_blip_tpu.models.blip2_mr_module import Blip2MRModule
from mr_blip_tpu.models.eva_vit import eva_vit_g_config, vit_tiny_config
from mr_blip_tpu.models.generation import beam_search, greedy_decode_with_scores
from mr_blip_tpu.models.prompt_assembly import build_interleave_plan
from mr_blip_tpu.models.qformer import qformer_base_config, qformer_tiny_config
from mr_blip_tpu.models.t5 import t5_flan_xl_config, t5_flan_xxl_config, t5_tiny_config
from mr_blip_tpu.text.span_grammar import (
    convert_to_absolute_time,
    moment_str_to_list,
    post_process,
)
from mr_blip_tpu.text.timestamps import (
    find_annoying_numbers,
    find_annoying_numbers_replacement_dict,
    format_timestamps,
)
from mr_blip_tpu.text.tokenizer import load_tokenizer


def _zero_self_cache(cache):
    """Zero self-attention cache slots/indices, keep cross-attention K/V."""

    def fn(path, leaf):
        if any("cross_attention" in str(p) for p in path):
            return leaf
        return jnp.zeros_like(leaf)

    return jax.tree_util.tree_map_with_path(fn, cache)


def _split_cache(cache):
    """Partition the cache into (carried self-attn, static cross-attn).

    Cross-attention K/V never change during decoding; carrying them through
    the beam-search while_loop makes XLA copy ~GBs per step.  They are
    closed over instead and merged back before each apply.
    """
    from flax import traverse_util

    flat = traverse_util.flatten_dict(cache)
    self_part = {k: v for k, v in flat.items() if "cross_attention" not in k}
    cross_part = {k: v for k, v in flat.items() if "cross_attention" in k}
    return (
        traverse_util.unflatten_dict(self_part),
        cross_part,  # kept flat for cheap merging
    )


def _merge_cache(self_cache, cross_flat):
    from flax import traverse_util

    flat = dict(traverse_util.flatten_dict(self_cache))
    flat.update(cross_flat)
    return traverse_util.unflatten_dict(flat)


def _pad_to(arr: np.ndarray, length: int, axis: int = 1, value=0) -> np.ndarray:
    pad = length - arr.shape[axis]
    if pad <= 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(arr, widths, constant_values=value)


def _parse_scan_layers(v):
    """scan_layers value -> (vit: bool, t5: bool|"encoder"|"decoder").

    True/"all" scans everything; False/"none" nothing; otherwise a
    "+"-joined token set from {"vit", "t5", "t5enc", "t5dec"}. The t5
    element feeds T5Config.scan_layers verbatim."""
    if v in (True, "all"):
        return True, True
    if v in (False, None, "none"):
        return False, False
    toks = set(str(v).split("+"))
    bad = toks - {"vit", "t5", "t5enc", "t5dec"}
    if bad or ("t5" in toks and (toks & {"t5enc", "t5dec"})) or \
            {"t5enc", "t5dec"} <= toks:
        raise ValueError(f"scan_layers={v!r}")
    t5 = (True if "t5" in toks
          else "encoder" if "t5enc" in toks
          else "decoder" if "t5dec" in toks
          else False)
    return "vit" in toks, t5


def _bucket(n: int, multiple: int = 16) -> int:
    return ((n + multiple - 1) // multiple) * multiple


@registry.register_model("blip2_mr")
class BLIP2_MR(BaseModel):
    PRETRAINED_MODEL_CONFIG_DICT = {
        "pretrain_flant5xl": "configs/models/blip2/blip2_pretrain_flant5xl.yaml",
        "pretrain_flant5xxl": "configs/models/blip2/blip2_pretrain_flant5xxl.yaml",
        "tiny": "configs/models/blip2/blip2_tiny.yaml",
    }

    VIT_CONFIGS = {
        "eva_vit_g": eva_vit_g_config,
        "tiny": vit_tiny_config,
    }
    T5_CONFIGS = {
        "flan-t5-xl": t5_flan_xl_config,
        "flan-t5-xxl": t5_flan_xxl_config,
        "tiny": t5_tiny_config,
    }

    def __init__(
        self,
        img_size: int = 224,
        vit_model: str = "eva_vit_g",
        t5_model: str = "flan-t5-xl",
        tokenizer_path: str | None = None,
        num_query_token: int = 32,
        num_beams: int = 5,
        min_new_tokens: int = 0,
        max_txt_len: int = 200,
        max_new_tokens: int = 50,
        input_time_format: str = "seconds_integers",
        interleave_data: bool = True,
        frame_token_aggregation: str | None = None,
        task: str = "lora",
        num_frames_for_answer: int = 4,
        resample_frames: bool = False,
        freeze_vit: bool = True,
        use_grad_checkpoint: bool = False,
        remat_policy: str | None = None,
        drop_path_rate: float = 0.4,
        fast_gelu: bool = False,
        int8_decode: bool = False,
        int8_base: bool = False,
        relpos_in_kernel: bool = False,
        compute_dtype: str = "bfloat16",
        sequence_parallel: bool = False,
        seed: int = 42,
        init_params: bool = True,
        vocab_size: int | None = None,
        scan_layers: bool | str = True,
    ):
        # scan_layers: run the ViT and T5 block stacks under nn.scan —
        # one compiled block body per stack instead of a program linear in
        # depth (cold compile of the XL train step: ~15 min unrolled).
        # Params store per-layer leaves stacked on a leading axis; convert
        # flat trees with models/scan_utils.stack_blip2_mr_params.
        # Accepts True/"all", False/"none", or "+"-joined stack tokens from
        # {"vit", "t5", "t5enc"} — e.g. "vit", "t5", "vit+t5enc". The stacks
        # have different cost profiles: the ViT is fwd-only under freeze_vit
        # so scanning it is steady-state free; scanning the T5 encoder is
        # decode-invisible; scanning the T5 *decoder* makes the beam decode
        # loop's cache updates layer-major (~10% flagship end-to-end) and
        # changes the train backward's rematerialization freedom.
        scan_vit, scan_t5 = _parse_scan_layers(scan_layers)
        self.task = task
        self.use_lora = "lora" in task
        # Full-T5 finetuning (no LoRA) trains the rel-pos embedding too; the
        # flash backward emits the true dbias in that mode (lora_rank == 0
        # sets bias_grad=True in models/t5.py) — no XLA fallback needed.
        self.use_localizer = "with_localizer" in task
        self.use_oracle_localizer = "oracle_localizer" in task
        self.is_qa = "QA" in task
        self.input_time_format = input_time_format
        self.interleave_data = interleave_data
        self.frame_token_aggregation = frame_token_aggregation
        self.max_txt_len = max_txt_len
        self.max_new_tokens = max_new_tokens
        self.min_new_tokens = min_new_tokens
        self.num_beams = num_beams
        self.num_frames_for_answer = num_frames_for_answer
        self.resample_frames = resample_frames
        self.freeze_vit = freeze_vit
        self.post_process = post_process
        self.convert_to_absolute_time = convert_to_absolute_time
        self.img_size = img_size

        self.tokenizer = load_tokenizer(tokenizer_path)
        annoying, _ = find_annoying_numbers(self.tokenizer, 200)
        self.annoying_numbers_replacement_dict = (
            find_annoying_numbers_replacement_dict(annoying)
        )
        self.ANS_MAPPING_C_TO_I = {"A": 0, "B": 1, "C": 2, "D": 3, "E": 4}
        self.ANS_MAPPING_I_TO_C = {0: "A", 1: "B", 2: "C", 3: "D", 4: "E"}
        # Token ids scoring A..E at the answerer's second logits step
        # (reference uses fixed flan-t5 ids [71, 272, 205, 309, 262]).
        self.answer_ids = [
            self.tokenizer.encode(letter, add_special_tokens=False)[-1]
            for letter in "ABCDE"
        ]

        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[compute_dtype]
        self.compute_dtype = dtype
        vit_cfg = self.VIT_CONFIGS[vit_model](
            img_size=img_size, use_checkpoint=use_grad_checkpoint,
            fast_gelu=fast_gelu,
            # reference default for unfrozen training (eva_vit.py:415);
            # the frozen flagship path never samples it (eval = identity)
            drop_path_rate=drop_path_rate if not freeze_vit else 0.0,
            scan_layers=scan_vit,
        ) if vit_model == "eva_vit_g" else dataclasses.replace(
            self.VIT_CONFIGS[vit_model](img_size=img_size),
            scan_layers=scan_vit,
        )
        qf_cfg = (
            qformer_base_config(vit_cfg.embed_dim, num_query_token)
            if vit_model == "eva_vit_g"
            else qformer_tiny_config(vit_cfg.embed_dim)
        )
        t5_kw = dict(
            lora_rank=8 if self.use_lora else 0,
            use_remat=use_grad_checkpoint,
            remat_policy=remat_policy,
            int8_decode=int8_decode,
            # QLoRA-style frozen int8 T5 base under LoRA training: halves
            # T5 weight HBM so bigger per-chip batches fit
            int8_base=int8_base,
            # O(N)-memory encoder rel-pos bias for long contexts
            # (ANet-120s+): the flash kernel computes it from the table
            relpos_in_kernel=relpos_in_kernel,
            scan_layers=scan_t5,
        )
        self.scan_layers = scan_layers
        self.scan_vit = scan_vit
        self.scan_t5 = scan_t5
        self.int8_decode = int8_decode
        self.int8_base = int8_base
        if vocab_size is not None:
            # Explicit override: build the T5 at the true checkpoint vocab
            # even when no tokenizer asset exists (weight porting /
            # full-geometry rehearsal; token ids from a smaller fallback
            # tokenizer still index validly into the larger table).
            t5_kw["vocab_size"] = int(vocab_size)
        elif tokenizer_path is None:
            t5_kw["vocab_size"] = self.tokenizer.vocab_size
        else:
            # Model vocab = max(config default, tokenizer vocab padded to a
            # lane multiple) — mirrors flan-t5's 32100-piece tokenizer vs
            # 32128-row embedding; also lets tiny configs host test
            # tokenizers larger than their default vocab.
            default_vocab = self.T5_CONFIGS[t5_model]().vocab_size
            padded = -(-self.tokenizer.vocab_size // 128) * 128
            t5_kw["vocab_size"] = max(default_vocab, padded)
        t5_cfg = self.T5_CONFIGS[t5_model](**t5_kw)

        self.vit_config, self.qformer_config, self.t5_config = vit_cfg, qf_cfg, t5_cfg
        self.module = Blip2MRModule(
            vit_config=vit_cfg,
            qformer_config=qf_cfg,
            t5_config=t5_cfg,
            compute_dtype=dtype,
            decode_cache_len=max_new_tokens,
            frame_token_aggregation=frame_token_aggregation,
            freeze_vit=freeze_vit,
            sequence_parallel=sequence_parallel,
        )
        # The answerer reuses the same module class; QA tasks carry separate
        # T5 params for it (reference loads a second T5, blip2_mr.py:150-160).
        self.params = None
        self.mesh = None  # set_mesh() shards generate/eval over local chips
        self.answerer_params = None
        if init_params:
            self.params = self.init_params(jax.random.PRNGKey(seed))
            if self.is_qa:
                self.answerer_params = self.init_params(jax.random.PRNGKey(seed + 1))

    # ------------------------------------------------------------------ init
    def init_params_fast(self, rng, dtype=jnp.bfloat16, scale=0.02,
                         mode="random"):
        """Full-size params straight to device in ``dtype``.

        For benchmarks and compile checks: avoids materializing the fp32
        flax init (flan-t5-xl + ViT-g would need ~16 GB) by eval_shape-ing
        the real init and building leaves directly in the target dtype.

        ``mode="zeros"`` creates kernels as device-side zeros (norm scales
        as ones) with no host generation or transfer at all — throughput
        timing is value-independent, so benchmarks use this. ``"random"``
        draws small normals on host (slower: ~N seconds per billion params
        on this 1-core host).
        """
        import ml_dtypes

        shapes = jax.eval_shape(lambda: self.init_params(rng))
        leaves, treedef = jax.tree_util.tree_flatten(shapes)
        np_dtype = ml_dtypes.bfloat16 if dtype == jnp.bfloat16 else np.float32

        if mode == "zeros":
            out = [
                (jnp.ones if (jnp.issubdtype(l.dtype, jnp.floating)
                              and len(l.shape) == 1) else jnp.zeros)(
                    l.shape,
                    dtype if jnp.issubdtype(l.dtype, jnp.floating) else l.dtype,
                )
                for l in leaves
            ]
            return jax.tree_util.tree_unflatten(treedef, out)

        host_rng = np.random.default_rng(int(jax.random.key_data(rng)[-1]))
        out = []
        for leaf in leaves:
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                # Norm scales start at 1, everything else small-normal.
                if len(leaf.shape) == 1:
                    arr = np.ones(leaf.shape, np_dtype)
                else:
                    arr = (
                        host_rng.standard_normal(leaf.shape, np.float32) * scale
                    ).astype(np_dtype)
            else:
                arr = np.zeros(leaf.shape, jnp.dtype(leaf.dtype))
            out.append(arr)
        # One batched transfer: per-leaf device_put pays a round trip per
        # tensor (minutes over the remote TPU tunnel for ~2k leaves).
        tree = jax.tree_util.tree_unflatten(treedef, out)
        return jax.device_put(tree)

    def init_params(self, rng):
        frames = jnp.zeros((1, 1, self.img_size, self.img_size, 3), jnp.float32)
        variables = self.module.init(
            rng, frames, method="encode_frames", deterministic=True
        )
        # T5 params are not touched by encode_frames; init them with a
        # minimal encoder/decoder pass and merge.
        d_model = self.t5_config.d_model
        dummy_embeds = jnp.zeros((1, 2, d_model), jnp.float32)
        dummy_ids = jnp.zeros((1, 1), jnp.int32)

        def t5_init(mod):
            loss, _ = mod.loss_from_encoder_input(
                dummy_embeds, jnp.ones((1, 2), jnp.int32),
                dummy_ids, jnp.ones((1, 1), jnp.int32),
            )
            return loss

        variables_t5 = self.module.init(rng, method=t5_init)
        params = {**variables["params"], **variables_t5["params"]}
        return params

    def trainable_mask(self, params=None) -> Any:
        """Pytree of bools: which params receive gradients.

        Reference policy (blip2_mr.py:132-298): ViT always frozen; with LoRA
        the T5 base is frozen and only lora_a/lora_b train; Q-Former +
        projection + query tokens train unless ``qformer_freeze``.
        """
        params = params if params is not None else self.params
        qformer_frozen = "qformer_freeze" in self.task

        def fn(path, leaf):
            keys = [str(getattr(p, "key", p)) for p in path]
            if "visual_encoder" in keys:
                return not self.freeze_vit
            if "t5" in keys:
                if self.use_lora:
                    return any("lora_" in k for k in keys)
                return False
            if any(k in ("qformer", "t5_proj", "ln_vision") for k in keys):
                return not qformer_frozen
            return False

        return jax.tree_util.tree_map_with_path(fn, params)

    # ------------------------------------------------------ host batch prep
    def prepare_mr_batch(self, samples: Dict[str, Any], need_targets: bool = True) -> Dict[str, Any]:
        """Strings + sampling metadata -> padded numpy arrays + plan."""
        video = samples["video"]  # (B, T, H, W, C) float32/uint8, np or device
        if not isinstance(video, jax.Array):
            video = np.asarray(video)
            if video.dtype != np.uint8:
                video = video.astype(np.float32)
        b, t = video.shape[:2]
        timestamps = np.asarray(samples["timestamps"], np.float64)
        durations = np.asarray(samples["duration"], np.float64)
        video_prompt_end = list(samples["video_prompt_end"])
        query_prompt = list(samples["query_prompt"])
        task_prompt = list(samples["task_prompt"])

        if "only_frames" in self.task:
            fmt_ts, fmt_dur = None, None
            video_prompts = ["<vid>" for _ in range(b)]
            video_prompt_end = ["<extra_id_0>\n" for _ in video_prompt_end]
        else:
            if "add_duration" in self.task:
                video_prompt_end = [
                    ">{}<extra_id_0>\n".format(round(float(d), 2)) for d in durations
                ]
            fmt_ts, fmt_dur, video_prompts = format_timestamps(
                self.input_time_format, timestamps, durations,
                self.annoying_numbers_replacement_dict,
            )

        if "no_task_prompt" in self.task:
            text_prompt = [q for q in query_prompt]
        else:
            text_prompt = [q + tp for q, tp in zip(query_prompt, task_prompt)]

        tok = self.tokenizer
        end_enc = tok(video_prompt_end, add_special_tokens=False,
                      truncation=True, max_length=self.max_txt_len)
        text_enc = tok(text_prompt, truncation=True, max_length=self.max_txt_len)

        batch = {
            "frames": video,
            "end_ids": end_enc.input_ids,
            "end_mask": end_enc.attention_mask,
            "text_ids": _pad_to(text_enc.input_ids, _bucket(text_enc.input_ids.shape[1])),
            "text_mask": _pad_to(text_enc.attention_mask, _bucket(text_enc.input_ids.shape[1])),
        }

        if self.interleave_data and "only_frames" not in self.task:
            plan = build_interleave_plan(
                tok, fmt_ts, fmt_dur, self.module.tokens_per_frame
            )
            batch.update(
                time_ids=plan.time_ids,
                src_type=plan.src_type,
                src_idx=plan.src_idx,
                int_mask=plan.attn_mask,
            )
            video_prompts = plan.video_prompts
        else:
            vid_enc = tok(video_prompts, add_special_tokens=False,
                          truncation=True, max_length=self.max_txt_len)
            batch.update(vid_ids=vid_enc.input_ids, vid_mask=vid_enc.attention_mask)

        if need_targets and "relevant_windows" in samples:
            target_enc = tok(
                list(samples["relevant_windows"]), truncation=True,
                max_length=self.max_txt_len,
            )
            batch["target_ids"] = _pad_to(
                target_enc.input_ids, _bucket(target_enc.input_ids.shape[1], 8)
            )
            batch["target_mask"] = _pad_to(
                target_enc.attention_mask, _bucket(target_enc.attention_mask.shape[1], 8)
            )

        batch["video_prompt"] = video_prompts
        return batch

    # ------------------------------------------------------- jitted kernels
    @functools.cached_property
    def _loss_fn(self):
        module = self.module
        interleaved = self.interleave_data and "only_frames" not in self.task
        freeze_vit = self.freeze_vit

        def loss_fn(params, batch, dropout_rng=None):
            if freeze_vit:
                # Param-level stop-grad on the frozen ViT: semantically
                # identical to the module's stop_gradient(image_embeds)
                # (the mask already zeroes these grads), but it also keeps
                # autodiff from linearizing through the ViT internals —
                # which is what lets the forward-only int8 Pallas kernels
                # (quantize_vit, no custom VJP) run INSIDE a train step
                # (``model.int8_vit: True`` in a train config).
                params = dict(params)
                params["visual_encoder"] = jax.lax.stop_gradient(
                    params["visual_encoder"]
                )
            if dropout_rng is not None:
                dropout_rng, dp_rng = jax.random.split(dropout_rng)
                rngs = {"dropout": dropout_rng, "drop_path": dp_rng}
            else:
                rngs = None
            deterministic = dropout_rng is None

            def run(mod):
                frames_for_t5 = mod.encode_frames(
                    batch["frames"], deterministic=deterministic
                )
                if interleaved:
                    embeds, attn = mod.assemble_encoder_input(
                        frames_for_t5, batch["time_ids"], batch["src_type"],
                        batch["src_idx"], batch["int_mask"], batch["end_ids"],
                        batch["end_mask"], batch["text_ids"], batch["text_mask"],
                    )
                else:
                    embeds, attn = mod.assemble_encoder_input_noninterleaved(
                        frames_for_t5, batch["vid_ids"], batch["vid_mask"],
                        batch["end_ids"], batch["end_mask"], batch["text_ids"],
                        batch["text_mask"],
                    )
                loss, logits = mod.loss_from_encoder_input(
                    embeds, attn, batch["target_ids"], batch["target_mask"],
                    deterministic=deterministic,
                    position_bias=batch.get("enc_bias"),
                )
                return loss, logits

            return module.apply({"params": params}, method=run, rngs=rngs)

        return loss_fn

    @functools.cached_property
    def _jit_loss(self):
        return jax.jit(self._loss_fn)

    @functools.cached_property
    def _jit_generate(self):
        module = self.module
        interleaved = self.interleave_data and "only_frames" not in self.task
        num_beams = self.num_beams
        max_len = self.max_new_tokens
        eos = self.t5_config.eos_token_id
        pad = self.t5_config.pad_token_id
        start = self.t5_config.decoder_start_token_id

        @functools.partial(jax.jit, static_argnames=("batch_size",))
        def generate_fn(params, batch, batch_size: int, enc_bias=None):
            def encode(mod):
                frames_for_t5 = mod.encode_frames(batch["frames"])
                if interleaved:
                    embeds, attn = mod.assemble_encoder_input(
                        frames_for_t5, batch["time_ids"], batch["src_type"],
                        batch["src_idx"], batch["int_mask"], batch["end_ids"],
                        batch["end_mask"], batch["text_ids"], batch["text_mask"],
                    )
                else:
                    embeds, attn = mod.assemble_encoder_input_noninterleaved(
                        frames_for_t5, batch["vid_ids"], batch["vid_mask"],
                        batch["end_ids"], batch["end_mask"], batch["text_ids"],
                        batch["text_mask"],
                    )
                return mod.encode(embeds, attn, position_bias=enc_bias), attn

            enc, attn = module.apply({"params": params}, method=encode)
            # Cross-attention K/V stay at batch rows (beam-deduplicated in
            # T5Attention); only self-attention caches carry B*K rows.
            dummy = jnp.zeros((batch_size * num_beams, 1), jnp.int32)
            _, vars0 = module.apply(
                {"params": params}, dummy, enc, attn, jnp.int32(0),
                method="decode_step", mutable=["cache"],
            )
            self_cache, cross_cache = _split_cache(_zero_self_cache(vars0["cache"]))

            def decode_step(self_cache, tokens, position):
                logits, updated = module.apply(
                    {"params": params, "cache": _merge_cache(self_cache, cross_cache)},
                    tokens, enc, attn, position,
                    method="decode_step", mutable=["cache"],
                )
                new_self, _ = _split_cache(updated["cache"])
                return logits[:, 0], new_self

            return beam_search(
                decode_step, self_cache, batch_size=batch_size,
                num_beams=num_beams, max_length=max_len,
                min_new_tokens=self.min_new_tokens,
                eos_token_id=eos, pad_token_id=pad,
                decoder_start_token_id=start,
                cache_layer_major=self.t5_config.scan_decoder,
            )

        return generate_fn

    # ------------------------------------------------------------- task API
    def forward(self, samples) -> Dict[str, Any]:
        if self.is_qa:
            return self.forward_QA(samples)
        batch = self.prepare_mr_batch(samples)
        batch.pop("video_prompt")
        loss, _ = self._jit_loss(self.params, batch)
        return {"loss": loss}

    __call__ = forward

    def set_mesh(self, mesh):
        """Shard generate/eval over a device mesh (single process, many
        chips): params replicated over ``dp`` (Megatron-sharded over ``tp``
        when the mesh has one), batch rows split over ``dp`` by GSPMD.

        Reference parity: the reference evaluates 8-way data-parallel via
        ``DistributedSampler`` + per-rank merge
        (``runner_base.py:522-531``, ``base_task.py:250-288``); on a
        one-process TPU host the same chips are reached by sharding the
        eval batch instead. ``generate_dispatch`` pads the batch up to a
        ``dp`` multiple and ``generate_collect`` drops the padded rows.
        """
        self.mesh = mesh
        if mesh is not None and self.params is not None:
            if dict(mesh.shape).get("tp", 1) > 1:
                from mr_blip_tpu.parallel.sharding_rules import shard_params

                self.params = shard_params(self.params, mesh)
            else:
                from mr_blip_tpu.parallel.mesh import replicate

                self.params = replicate(self.params, mesh)
        # drop jitted closures traced with the old placement
        for attr in ("_jit_loss", "_jit_generate", "_jit_qa_answer",
                     "_jit_qa_loss"):
            self.__dict__.pop(attr, None)
        return self

    def _encoder_bias_for(self, batch):
        """Per-length cached (1, H, L, L) encoder rel-pos bias.

        The in-graph ``table[buckets]`` gather lowers to a ~24 ms
        while-loop on TPU per encode yet is input-independent, so it is
        materialized once per sequence length outside the step graph
        (models/t5.py::materialize_encoder_relpos_bias) and fed through
        ``encode(position_bias=...)``. Returns None when the length cannot
        be derived host-side or under ``relpos_in_kernel`` (the O(N) long-
        context path computes the bias in-kernel). The cache keys on the
        table array identity so param reloads invalidate it; entries are
        bounded (bf16 bias is ~O(L^2 * H) — 270 MB at L=2056).
        """
        cfg = self.t5_config
        if cfg.relpos_in_kernel:
            return None
        try:
            if self.interleave_data and "only_frames" not in self.task:
                L = (batch["int_mask"].shape[1] + batch["end_ids"].shape[1]
                     + batch["text_ids"].shape[1])
            else:
                tpf = 1 if self.frame_token_aggregation == "mean" else 32
                L = (batch["vid_ids"].shape[1]
                     + batch["frames"].shape[1] * tpf
                     + batch["end_ids"].shape[1]
                     + batch["text_ids"].shape[1])
            table = self.params["t5"]["encoder"]["rel_bias"]["rel_embedding"]
        except (KeyError, TypeError):
            return None
        L = -(-L // 8) * 8  # assemble right-pads to a sublane multiple
        cache = self.__dict__.setdefault("_enc_bias_cache", {})
        if cache.get("_table") is not table:
            cache.clear()
            cache["_table"] = table
        if L not in cache:
            from mr_blip_tpu.models.t5 import materialize_encoder_relpos_bias

            if len([k for k in cache if k != "_table"]) >= 3:
                cache.pop(next(k for k in cache if k != "_table"))
            cache[L] = jax.jit(
                materialize_encoder_relpos_bias,
                static_argnums=(1, 2, 3),
            )(table, L, cfg.relative_attention_num_buckets,
              cfg.relative_attention_max_distance).astype(self.compute_dtype)
        return cache[L]

    def attach_train_bias(self, batch):
        """Attach the per-length cached encoder bias to a TRAIN batch
        (``batch["enc_bias"]``) — sound under LoRA (the rel-pos table is
        frozen, reference blip2_mr.py:183-237 trains lora_a/lora_b only),
        a no-op otherwise.

        NOT wired into the default train loop: on the bench chip the
        cached-bias step measured SLOWER (0.697 vs 0.650 s/step) despite
        removing the ~24 ms in-graph gather — the extra ~270 MB resident
        bias buffer degrades the near-capacity training allocation (the
        same leftover-buffer sensitivity bench.py documents for the
        inference phase). Kept as an opt-in for memory-rich topologies;
        the generate/eval path caching (measured win) is always on."""
        if not self.use_lora:
            return batch
        bias = self._encoder_bias_for(batch)
        if bias is not None:
            batch["enc_bias"] = bias
        return batch

    def generate_dispatch(self, samples) -> Dict[str, Any]:
        """Host prep + asynchronous device dispatch; pair with
        ``generate_collect``.

        JAX dispatch is async, so the returned handle's arrays compute in
        the background while the caller tokenizes/preps the next batch —
        host/device pipelining the reference only had for H2D transfers
        (PrefetchLoader, dataloader_utils.py:46-124).
        """
        batch = self.prepare_mr_batch(samples, need_targets=False)
        batch.pop("video_prompt")
        b_real = batch["frames"].shape[0]
        enc_bias = self._encoder_bias_for(batch)
        if self.mesh is not None:
            from mr_blip_tpu.parallel.mesh import (
                pad_batch_to_multiple, shard_batch,
            )

            dp = dict(self.mesh.shape).get("dp", 1)
            batch, _ = pad_batch_to_multiple(batch, dp)
            batch = shard_batch(batch, self.mesh)
            with jax.set_mesh(self.mesh):
                seqs, scores = self._jit_generate(
                    self.params, batch, batch["frames"].shape[0],
                    enc_bias,
                )
        else:
            seqs, scores = self._jit_generate(self.params, batch, b_real,
                                              enc_bias)
        return {"seqs": seqs, "scores": scores, "samples": samples,
                "b_real": b_real}

    def generate_collect(self, handle) -> Dict[str, Any]:
        """Block on a ``generate_dispatch`` handle and post-process."""
        samples = handle["samples"]
        out: Dict[str, Any] = {}
        seqs = np.asarray(handle["seqs"])[: handle.get("b_real", None)]
        pred_ans = self.tokenizer.batch_decode(
            seqs, skip_special_tokens=True
        )

        durations = samples["duration"]
        out["duration"] = [float(d) for d in np.asarray(durations)]
        if self.input_time_format in ("relative_integers", "relative_floats"):
            prediction = [self.post_process(p) for p in pred_ans]
            out["prediction"] = self.convert_to_absolute_time(
                prediction, out["duration"], self.input_time_format
            )
        else:
            out["prediction"] = [self.post_process(p) for p in pred_ans]
        out["raw_prediction"] = pred_ans
        out["answer"] = samples.get("relevant_windows")
        out["qid"] = samples.get("query_id")
        return out

    def generate(self, samples) -> Dict[str, Any]:
        """Span generation: beam search -> decode -> grammar repair."""
        return self.generate_collect(self.generate_dispatch(samples))

    # --------------------------------------------------------- QA two-stage
    def get_relevant_frames(self, samples, relevant_moments_out, n_frames):
        """Crop already-decoded frames to predicted windows
        (blip2_mr.py:1101-1165)."""
        durations = np.asarray(samples["duration"], np.float64)
        relevant_moments = []
        for i, sample in enumerate(relevant_moments_out):
            m = moment_str_to_list(sample)
            if m == [[-1, -1]]:
                m = [0, float(durations[i])]
            else:
                m = m[0]
            if m[1] > durations[i]:
                m[1] = round(float(durations[i]))
            relevant_moments.append(m)
        frames = self.extract_frames(samples, relevant_moments, n_frames)
        return relevant_moments, frames

    def extract_frames(self, samples, relevant_moments, n_frames):
        # Keep uint8 passthrough intact: casting raw bytes to float32 here
        # would skip the answerer's dtype-keyed on-device normalization.
        video = np.asarray(samples["video"])
        if video.dtype != np.uint8:
            video = video.astype(np.float32)
        timestamps = np.asarray(samples["timestamps"], np.float64)
        durations = np.asarray(samples["duration"], np.float64)
        out = []
        for i, (start, end) in enumerate(relevant_moments):
            if start >= end:
                end = float(durations[i])
            start_idx = int(np.argmin(np.abs(timestamps[i] - start)))
            end_idx = int(np.argmin(np.abs(timestamps[i] - end)))
            frames = video[i, start_idx : end_idx + 1]
            assert frames.shape[0] > 0, "No frames found for the relevant moment."
            if frames.shape[0] < n_frames:
                pad = np.repeat(frames[-1:], n_frames - frames.shape[0], axis=0)
                frames = np.concatenate([frames, pad])
            elif frames.shape[0] > n_frames:
                idxs = np.linspace(0, frames.shape[0] - 1, n_frames).astype(int)
                frames = frames[idxs]
            out.append(frames)
        return np.stack(out)

    def submit_window_redecodes(self, samples, relevant_moments, n_frames):
        """Submit every sample's predicted-window re-decode to the native
        decode pool (non-blocking). Returns (moments, pending) where
        ``pending`` is consumed by :meth:`collect_window_redecodes` — the
        C++ workers decode while the caller keeps the chip busy (e.g.
        dispatching the next batch's localizer)."""
        from mr_blip_tpu.processors.video_processors import BlipVideoEvalProcessor

        durations = np.asarray(samples["duration"], np.float64)
        moments = []
        if relevant_moments and isinstance(relevant_moments[0], str):
            for i, sample in enumerate(relevant_moments):
                m = moment_str_to_list(sample)
                if m == [[-1, -1]]:
                    m = [0, round(float(durations[i]))]
                else:
                    m = m[0]
                if m[1] > durations[i]:
                    m[1] = round(float(durations[i]))
                moments.append(m)
        else:
            moments = [list(m) for m in relevant_moments]

        # uint8 passthrough: window frames go to the answerer as raw bytes
        # (normalization fuses on device), halving the mid-inference H2D.
        processor = BlipVideoEvalProcessor(
            image_size=self.img_size, n_frms=n_frames, normalize=False
        )
        from mr_blip_tpu.datasets.sampling import sample_frame_indices
        from mr_blip_tpu.datasets.video_reader import VideoReader

        readers, tickets = [], []
        for i, (start, end) in enumerate(moments):
            if start >= end:
                end = float(durations[i])
            vr = VideoReader(samples["video_path"][i],
                             width=self.img_size, height=self.img_size)
            indices = sample_frame_indices(
                vlen=len(vr), fps=vr.get_avg_fps(), n_frms=n_frames,
                sampling="uniform", clip_proposal=[start, end],
            )
            readers.append(vr)
            tickets.append(vr.get_batch_async(indices))
        return moments, (readers, tickets, processor)

    def collect_window_redecodes(self, pending):
        readers, tickets, processor = pending
        frames = []
        for vr, ticket in zip(readers, tickets):
            frames.append(processor._finish(ticket.result()))
            vr.close()
        return np.stack(frames)

    def get_relevant_frames_resampled(self, samples, relevant_moments, n_frames):
        """Re-decode the predicted window from the source video
        (blip2_mr.py:1167-1230): the eval processor samples ``n_frames``
        uniformly inside [start, end] via clip_proposal seek-decode. The
        batch's re-decodes overlap each other in the native pool instead
        of the reference's serial per-sample loop blocking mid-inference."""
        moments, pending = self.submit_window_redecodes(
            samples, relevant_moments, n_frames)
        return moments, self.collect_window_redecodes(pending)

    @functools.cached_property
    def _jit_qa_answer(self):
        module = self.module
        max_len = self.max_new_tokens
        vocab = self.t5_config.vocab_size

        @functools.partial(jax.jit, static_argnames=("batch_size", "min_new_tokens"))
        def qa_fn(params, frames, text_ids, text_mask, batch_size: int,
                  min_new_tokens: int):
            def encode(mod):
                frames_for_t5 = mod.encode_frames(frames)
                embeds, attn = mod.qa_encoder_input(frames_for_t5, text_ids, text_mask)
                return mod.encode(embeds, attn), attn

            enc, attn = module.apply({"params": params}, method=encode)
            dummy = jnp.zeros((batch_size, 1), jnp.int32)
            _, vars0 = module.apply(
                {"params": params}, dummy, enc, attn, jnp.int32(0),
                method="decode_step", mutable=["cache"],
            )
            self_cache, cross_cache = _split_cache(_zero_self_cache(vars0["cache"]))

            def decode_step(self_cache, tokens, position):
                logits, updated = module.apply(
                    {"params": params, "cache": _merge_cache(self_cache, cross_cache)},
                    tokens, enc, attn, position,
                    method="decode_step", mutable=["cache"],
                )
                new_self, _ = _split_cache(updated["cache"])
                return logits[:, 0], new_self

            return greedy_decode_with_scores(
                decode_step, self_cache, batch_size=batch_size, max_length=max_len,
                min_new_tokens=min_new_tokens,
                eos_token_id=self.t5_config.eos_token_id,
                pad_token_id=self.t5_config.pad_token_id, vocab_size=vocab,
            )

        return qa_fn

    def videoQA_answer(self, samples) -> Dict[str, Any]:
        """Answerer: score A..E at the second decoding step
        (blip2_mr.py:1232-1314)."""
        qa_input = list(samples["qa_input"])
        answer = samples["qa_output"]
        frames = np.asarray(samples["relevant_frames"])
        if frames.dtype != np.uint8:  # keep uint8 passthrough intact
            frames = frames.astype(np.float32)
        enc = self.tokenizer(qa_input, truncation=True, max_length=self.max_txt_len)
        params = self.answerer_params if self.answerer_params is not None else self.params
        # Vision/Q-Former come from the main params; the answerer T5 params
        # override the t5 subtree when present.
        if self.answerer_params is not None:
            params = {**self.params, "t5": self.answerer_params["t5"]}
        _seqs, scores = self._jit_qa_answer(
            params, frames, enc.input_ids, enc.attention_mask,
            frames.shape[0], 8,
        )
        # scores: (max_len, B, V); step 1 logits score the answer letter.
        step1 = np.asarray(scores)[1]  # (B, V)
        pred = np.argmax(step1[:, self.answer_ids], axis=-1).tolist()
        return {
            "output_text": pred,
            "answer": answer,
            "qid": samples.get("question_id"),
            "relevant_moments_gt": samples.get("relevant_windows"),
        }

    # Three-phase split so an eval loop can overlap batch i's host window
    # re-decode with batch i+1's device localizer (the reference's
    # mid-model re-decode, blip2_mr.py:1167-1230, serializes host and GPU):
    #   dispatch  — stage-1 localizer enqueued on device (non-blocking)
    #   redecode  — localizer collected, window decodes SUBMITTED to the
    #               native pool (non-blocking); caller may now dispatch the
    #               next batch before...
    #   collect   — decodes awaited, stage-2 answerer run.
    def videoQA_dispatch(self, samples) -> Dict[str, Any]:
        samples = dict(samples)
        if "relevant_windows" not in samples:
            samples["relevant_windows"] = [[0, 0]]
        samples["query_id"] = samples["question_id"]
        handle: Dict[str, Any] = {"samples": samples}
        if self.use_localizer:
            handle["loc"] = self.generate_dispatch(samples)
        return handle

    def videoQA_redecode(self, handle) -> Dict[str, Any]:
        samples = handle["samples"]
        durations = np.asarray(samples["duration"], np.float64)
        n = self.num_frames_for_answer
        if self.use_localizer:
            out_mr = self.generate_collect(handle.pop("loc"))
            if self.resample_frames:
                moments, pending = self.submit_window_redecodes(
                    samples, out_mr["prediction"], n)
                handle["pending"] = pending
            else:
                moments, handle["frames"] = self.get_relevant_frames(
                    samples, out_mr["prediction"], n)
        elif not self.use_oracle_localizer:
            moments = [[0, float(d)] for d in durations]
            handle["frames"] = self.extract_frames(samples, moments, n)
        else:
            moments = [list(m[0])
                       for m in np.asarray(samples["relevant_windows"])]
            if self.resample_frames:
                moments, pending = self.submit_window_redecodes(
                    samples, moments, n)
                handle["pending"] = pending
            else:
                handle["frames"] = self.extract_frames(samples, moments, n)
        handle["moments"] = moments
        return handle

    def videoQA_collect(self, handle) -> Dict[str, Any]:
        samples = handle["samples"]
        frames = handle.get("frames")
        if frames is None:
            frames = self.collect_window_redecodes(handle["pending"])
        samples["relevant_frames"] = frames
        out_ans = self.videoQA_answer(samples)
        out_ans["relevant_moments"] = [handle["moments"]]
        return out_ans

    def videoQA_generate(self, samples) -> Dict[str, Any]:
        return self.videoQA_collect(self.videoQA_redecode(
            self.videoQA_dispatch(samples)))

    def forward_QA(self, samples) -> Dict[str, Any]:
        """Answerer training loss (forward_QA, blip2_mr.py:309-431)."""
        samples = dict(samples)
        samples["relevant_windows"] = samples.get("relevant_windows", [[0, 0]])
        samples["query_id"] = samples["question_id"]

        durations = np.asarray(samples["duration"], np.float64)
        if self.use_localizer:
            out_mr = self.generate(samples)
            _, relevant_frames = self.get_relevant_frames(
                samples, out_mr["prediction"], self.num_frames_for_answer
            )
        else:
            relevant_moments = [[0, float(d)] for d in durations]
            relevant_frames = self.extract_frames(
                samples, relevant_moments, self.num_frames_for_answer
            )
        samples["relevant_frames"] = relevant_frames

        enc = self.tokenizer(
            list(samples["qa_input"]), truncation=True, max_length=self.max_txt_len
        )
        target = self.tokenizer(
            list(samples["qa_output"]), truncation=True, max_length=self.max_txt_len
        )
        params = self.params
        if self.answerer_params is not None:
            params = {**self.params, "t5": self.answerer_params["t5"]}
        relevant_frames = np.asarray(relevant_frames)
        if relevant_frames.dtype != np.uint8:  # keep uint8 passthrough
            relevant_frames = relevant_frames.astype(np.float32)
        loss = self._jit_qa_loss(
            params, relevant_frames,
            enc.input_ids, enc.attention_mask,
            target.input_ids, target.attention_mask,
        )
        return {"loss": loss}

    @functools.cached_property
    def _jit_qa_loss(self):
        module = self.module

        @jax.jit
        def qa_loss(params, frames, text_ids, text_mask, target_ids, target_mask):
            def run(mod):
                frames_for_t5 = mod.encode_frames(frames)
                embeds, attn = mod.qa_encoder_input(frames_for_t5, text_ids, text_mask)
                loss, _ = mod.loss_from_encoder_input(
                    embeds, attn, target_ids, target_mask
                )
                return loss

            return module.apply({"params": params}, method=run)

        return qa_loss

    def quantize_for_decode(self):
        """Convert the loaded float T5 decoder + LM head to int8 weight-only
        storage and rebuild the module with ``int8_decode=True``.

        Inference-only (decode is weight-bandwidth-bound; see
        models/quantize.py). Call AFTER loading float checkpoints and BEFORE
        the first generate (the jitted decode closures trace the module).

        Also enables the int8 cross-attention K/V cache
        (``T5Config.int8_cross_cache``): the cache read is the decode
        step's other big HBM term (1.6 GB/step bf16 at the flagship
        shape) and is quantized at prefill with per-channel scales.
        """
        import dataclasses

        from mr_blip_tpu.models.quantize import quantize_t5_decoder_params

        assert self.params is not None, "load/init params before quantizing"
        assert not self.t5_config.int8_decode, "already quantized"
        self.int8_decode = True
        self.t5_config = dataclasses.replace(
            self.t5_config, int8_decode=True, int8_cross_cache=True)
        self.module = Blip2MRModule(
            vit_config=self.vit_config,
            qformer_config=self.qformer_config,
            t5_config=self.t5_config,
            compute_dtype=self.compute_dtype,
            decode_cache_len=self.max_new_tokens,
            frame_token_aggregation=self.frame_token_aggregation,
            freeze_vit=self.freeze_vit,
            sequence_parallel=self.module.sequence_parallel,
        )
        params = dict(self.params)
        params["t5"] = quantize_t5_decoder_params(params["t5"])
        self.params = params
        if self.answerer_params is not None:
            ap = dict(self.answerer_params)
            ap["t5"] = quantize_t5_decoder_params(ap["t5"])
            self.answerer_params = ap
        # drop any jitted closures traced against the float module
        for attr in ("_loss_fn", "_jit_loss", "_jit_generate",
                     "_jit_qa_answer", "_jit_qa_loss"):
            self.__dict__.pop(attr, None)
        return self

    def quantize_vit(self):
        """Convert the loaded float ViT to the W8A8 int8 layout and rebuild
        the module with ``int8_matmul=True`` (per-token activation quant
        happens inside the Pallas kernels — no calibration pass).

        The frozen EVA ViT dominates inference (73% of the 60-frame batch)
        and the v5e MXU's int8 peak is ~2x bf16; the fused kernels hit
        ~2x on the MLP (ops/int8_matmul.py). Opt-in, off the bit-parity
        path. Also valid INSIDE a train step while the ViT is frozen
        (``model.int8_vit: True`` in a train config): _loss_fn stop-grads
        the ViT params so autodiff never touches the forward-only kernels.
        Call AFTER loading float checkpoints."""
        import dataclasses

        from mr_blip_tpu.models.quantize import quantize_vit_params

        assert self.params is not None, "load/init params before quantizing"
        assert not self.vit_config.int8_matmul, "already quantized"
        # keep_padded_tokens: hand the sublane-padded (.., 264, C) tokens
        # straight to the Q-Former (which masks them in cross-attention)
        # instead of slicing back to 257 — the slice and the Q-Former-side
        # 257-row relayouts both disappear (encode_frames builds the mask).
        self.vit_config = dataclasses.replace(
            self.vit_config, int8_matmul=True, keep_padded_tokens=True)
        self.module = Blip2MRModule(
            vit_config=self.vit_config,
            qformer_config=self.qformer_config,
            t5_config=self.t5_config,
            compute_dtype=self.compute_dtype,
            decode_cache_len=self.max_new_tokens,
            frame_token_aggregation=self.frame_token_aggregation,
            freeze_vit=self.freeze_vit,
            sequence_parallel=self.module.sequence_parallel,
        )
        params = dict(self.params)
        params["visual_encoder"] = quantize_vit_params(params["visual_encoder"])
        self.params = params
        if self.answerer_params is not None:
            ap = dict(self.answerer_params)
            if "visual_encoder" in ap:
                ap["visual_encoder"] = quantize_vit_params(ap["visual_encoder"])
            self.answerer_params = ap
        for attr in ("_loss_fn", "_jit_loss", "_jit_generate",
                     "_jit_qa_answer", "_jit_qa_loss"):
            self.__dict__.pop(attr, None)
        return self

    def quantize_encoder(self):
        """Convert the loaded float T5 ENCODER to the W8A8 int8 layout and
        rebuild the module with ``int8_encoder=True``. LoRA deltas are
        merged into the quantized kernels (same function as base + delta).

        The encoder is the #2 inference consumer after the ViT (~280 ms of
        the 60-frame batch: profiled scripts/profile_inference.py) and its
        projections/FFN hit the same ~2x int8 MXU peak as the ViT kernels.
        Inference-only, opt-in: off the bit-parity path. Call AFTER loading
        float checkpoints."""
        import dataclasses

        from mr_blip_tpu.models.quantize import quantize_t5_encoder_params

        assert self.params is not None, "load/init params before quantizing"
        assert not self.t5_config.int8_encoder, "already quantized"
        self.t5_config = dataclasses.replace(self.t5_config,
                                             int8_encoder=True)
        self.module = Blip2MRModule(
            vit_config=self.vit_config,
            qformer_config=self.qformer_config,
            t5_config=self.t5_config,
            compute_dtype=self.compute_dtype,
            decode_cache_len=self.max_new_tokens,
            frame_token_aggregation=self.frame_token_aggregation,
            freeze_vit=self.freeze_vit,
            sequence_parallel=self.module.sequence_parallel,
        )
        params = dict(self.params)
        params["t5"] = quantize_t5_encoder_params(
            params["t5"], lora_alpha=self.t5_config.lora_alpha
        )
        self.params = params
        if self.answerer_params is not None:
            ap = dict(self.answerer_params)
            ap["t5"] = quantize_t5_encoder_params(
                ap["t5"], lora_alpha=self.t5_config.lora_alpha
            )
            self.answerer_params = ap
        for attr in ("_loss_fn", "_jit_loss", "_jit_generate",
                     "_jit_qa_answer", "_jit_qa_loss"):
            self.__dict__.pop(attr, None)
        return self

    def quantize_qformer(self):
        """Convert the Q-Former's cross-attention K/V projections to the
        packed W8A8 int8 layout and rebuild with ``int8_cross=True``. The
        (B*T*257, 1408) K/V matmuls dominate the Q-Former stage; q/output
        projections and FFNs stay float (post-LN residuals, small rows).
        Inference-only, opt-in. Call AFTER loading float checkpoints."""
        import dataclasses

        from mr_blip_tpu.models.quantize import quantize_qformer_cross_params

        assert self.params is not None, "load/init params before quantizing"
        assert not self.qformer_config.int8_cross, "already quantized"
        self.qformer_config = dataclasses.replace(self.qformer_config,
                                                  int8_cross=True)
        self.module = Blip2MRModule(
            vit_config=self.vit_config,
            qformer_config=self.qformer_config,
            t5_config=self.t5_config,
            compute_dtype=self.compute_dtype,
            decode_cache_len=self.max_new_tokens,
            frame_token_aggregation=self.frame_token_aggregation,
            freeze_vit=self.freeze_vit,
            sequence_parallel=self.module.sequence_parallel,
        )
        params = dict(self.params)
        params["qformer"] = quantize_qformer_cross_params(params["qformer"])
        self.params = params
        if self.answerer_params is not None:
            ap = dict(self.answerer_params)
            if "qformer" in ap:
                ap["qformer"] = quantize_qformer_cross_params(ap["qformer"])
            self.answerer_params = ap
        for attr in ("_loss_fn", "_jit_loss", "_jit_generate",
                     "_jit_qa_answer", "_jit_qa_loss"):
            self.__dict__.pop(attr, None)
        return self

    def quantize_for_inference(self):
        """Production int8 inference mode: W8A8 ViT + W8A8 Q-Former cross
        K/V + W8A8 T5 encoder + weight-only int8 decoder/LM-head in one
        call (the opt-in conversions; see each method's docstring for the
        measured wins)."""
        return (self.quantize_vit().quantize_qformer().quantize_encoder()
                .quantize_for_decode())

    def quantize_base_for_train(self):
        """QLoRA-style conversion: the whole frozen T5 base (encoder AND
        decoder blocks + LM head) to int8 weight-only storage; LoRA deltas
        stay fp32 and trainable. Halves T5 weight HBM (~3 GB on flan-t5-xl)
        so a larger per-chip train batch fits. Call AFTER loading float
        checkpoints and BEFORE building the train step."""
        import dataclasses

        from mr_blip_tpu.models.quantize import quantize_t5_params

        assert self.params is not None, "load/init params before quantizing"
        assert not self.t5_config.int8_base, "already quantized"
        assert self.use_lora, "int8 base training requires LoRA (frozen base)"
        self.int8_base = True
        self.t5_config = dataclasses.replace(self.t5_config, int8_base=True)
        self.module = Blip2MRModule(
            vit_config=self.vit_config,
            qformer_config=self.qformer_config,
            t5_config=self.t5_config,
            compute_dtype=self.compute_dtype,
            decode_cache_len=self.max_new_tokens,
            frame_token_aggregation=self.frame_token_aggregation,
            freeze_vit=self.freeze_vit,
            sequence_parallel=self.module.sequence_parallel,
        )
        params = dict(self.params)
        params["t5"] = quantize_t5_params(params["t5"])
        self.params = params
        if self.answerer_params is not None:
            ap = dict(self.answerer_params)
            ap["t5"] = quantize_t5_params(ap["t5"])
            self.answerer_params = ap
        for attr in ("_loss_fn", "_jit_loss", "_jit_generate",
                     "_jit_qa_answer", "_jit_qa_loss"):
            self.__dict__.pop(attr, None)
        return self

    # --------------------------------------------------------------- config
    @classmethod
    def from_config(cls, cfg):
        # Production full-geometry loading: ``model.params_dtype: bfloat16``
        # stores params on device in bf16 (ViT-g + Flan-T5-XL fp32 would be
        # ~16 GB — over a v5e's HBM; the reference's analog is its fp16 ViT
        # cast, eva_vit.py:429-436). Params init as device-side zeros and
        # the checkpoint load overwrites every tensor (ported msgpacks carry
        # the full tree); fp32 LN/RMS statistics are unaffected (compute-
        # time policy, layers.py).
        params_dtype = cfg.get("params_dtype")
        model = cls(
            img_size=cfg.get("image_size", 224),
            vit_model=cfg.get("vit_model", "eva_vit_g"),
            t5_model=cfg.get("t5_model", "flan-t5-xl"),
            tokenizer_path=cfg.get("tokenizer_path"),
            num_query_token=cfg.get("num_query_token", 32),
            num_beams=cfg.get("num_beams", 5),
            min_new_tokens=cfg.get("min_len", cfg.get("min_new_tokens", 0)),
            max_txt_len=cfg.get("max_len", 200),
            max_new_tokens=cfg.get("max_new_tokens", 50),
            input_time_format=cfg.get("input_time_format", "seconds_integers"),
            interleave_data=cfg.get("interleave_data", True),
            frame_token_aggregation=cfg.get("frame_token_aggregation"),
            task=cfg.get("task", "qformer_freeze_lora"),
            num_frames_for_answer=cfg.get("num_frames_for_answer", 4),
            resample_frames=cfg.get("resample_frames", False),
            freeze_vit=cfg.get("freeze_vit", True),
            drop_path_rate=cfg.get("drop_path_rate", 0.4),
            fast_gelu=cfg.get("fast_gelu", False),
            relpos_in_kernel=cfg.get("relpos_in_kernel", False),
            use_grad_checkpoint=cfg.get("use_grad_checkpoint", False),
            remat_policy=cfg.get("remat_policy"),
            compute_dtype=cfg.get("compute_dtype", "bfloat16"),
            sequence_parallel=cfg.get("sequence_parallel", False),
            init_params=params_dtype is None,
            vocab_size=cfg.get("vocab_size"),
            scan_layers=cfg.get("scan_layers", True),
        )
        if params_dtype is not None:
            dtype = {"bfloat16": jnp.bfloat16,
                     "float32": jnp.float32}[params_dtype]
            logging.info(
                "params_dtype=%s: zero-init on device; checkpoint load must "
                "cover the tree", params_dtype,
            )
            model.params = model.init_params_fast(
                jax.random.PRNGKey(cfg.get("seed", 42)), dtype=dtype,
                mode="zeros",
            )
            if model.is_qa:
                model.answerer_params = model.init_params_fast(
                    jax.random.PRNGKey(cfg.get("seed", 42) + 1), dtype=dtype,
                    mode="zeros",
                )
        finetuned = cfg.get("finetuned")
        pretrained = cfg.get("pretrained")
        load_finetuned = cfg.get("load_finetuned", False)
        if pretrained:
            try:
                model.params = model.load_params_nonstrict(model.params, pretrained)
                logging.info("loaded pretrained weights from %s", pretrained)
            except FileNotFoundError:
                logging.warning("pretrained checkpoint %s not found", pretrained)
        if load_finetuned and finetuned:
            try:
                model.params = model.load_params_nonstrict(model.params, finetuned)
                logging.info("loaded finetuned weights from %s", finetuned)
            except FileNotFoundError:
                logging.warning("finetuned checkpoint %s not found", finetuned)
        # quantize AFTER float checkpoints are merged (the converters read
        # float kernels). ``int8_inference: True`` is the production
        # inference mode (ViT + T5 encoder + decode in one flag).
        if cfg.get("int8_inference", False):
            model.quantize_for_inference()
        else:
            if cfg.get("int8_decode", False):
                model.quantize_for_decode()
            if cfg.get("int8_vit", False):
                model.quantize_vit()
            if cfg.get("int8_qformer", False):
                model.quantize_qformer()
            if cfg.get("int8_encoder", False):
                model.quantize_encoder()
        if cfg.get("int8_base", False):
            model.quantize_base_for_train()
        return model
