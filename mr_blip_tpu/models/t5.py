"""T5 encoder-decoder (flax linen) for span generation.

Covers the reference's vendored HF T5 (``lavis/models/blip2_models/
modeling_t5.py:350-2063``) as used by Mr. BLIP: Flan-T5-XL/XXL geometry,
relative-position-bucket attention bias (shared from layer 0), RMSNorm,
gated FFN with the exact-GELU override (``dense_act_fn="gelu"``,
blip2_mr.py:144-148), untied LM head, and ``inputs_embeds`` encoder input
(the interleaved frame/timestamp prompt enters as embeddings, not ids).

TPU-first: bf16 matmuls with fp32 RMSNorm and fp32 logits; decoding uses a
static-shape KV cache (flax mutable "cache" collection) so the whole
autoregressive loop stays inside one ``lax.while_loop`` jit; LoRA deltas are
injected into every Dense when ``lora_rank > 0`` (reference: LoRA r=8 on all
T5 Linears, blip2_mr.py:183-237).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mr_blip_tpu.models.layers import Dense, RMSNormFP32
from mr_blip_tpu.ops.attention import dot_product_attention
from mr_blip_tpu.ops.relpos import relative_position_bucket


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 2048
    d_kv: int = 64
    d_ff: int = 5120
    num_layers: int = 24
    num_decoder_layers: int = 24
    num_heads: int = 32
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    dropout_rate: float = 0.1
    layer_norm_epsilon: float = 1e-6
    dense_act_fn: str = "gelu"  # exact GELU (reference override)
    is_gated_act: bool = True
    tie_word_embeddings: bool = False
    use_remat: bool = False  # rematerialize blocks (trade FLOPs for HBM)
    # Remat checkpoint policy (only meaningful with use_remat):
    #   None            -> save nothing, recompute the whole block backward
    #   "dots_kernels"  -> save every dot_general / Pallas-kernel output
    #                      (the MXU work), recompute only the cheap VPU ops
    #                      (norm upcasts, GELU products, dropout masks).
    # "dots_kernels" targets scan_layers training: XLA's auto-remat cannot
    # recompute across a while-loop boundary, so the scanned backward must
    # shed residuals explicitly — but re-running the MXU work (full remat)
    # costs real step time; recomputing only elementwise ops is ~free.
    remat_policy: Optional[str] = None
    pad_token_id: int = 0
    eos_token_id: int = 1
    decoder_start_token_id: int = 0
    lora_rank: int = 0
    lora_alpha: float = 8.0
    lora_dropout: float = 0.05
    # Compute the encoder rel-pos bias inside the flash kernel instead of
    # materializing the (1, H, N, N) tensor — O(N) memory, required for
    # long-context (ANet-120s+) sequences where the bias would not fit HBM.
    relpos_in_kernel: bool = False
    # int8 weight-only decoder + LM head (inference-only; decode is weight-
    # bandwidth-bound). Convert float params with
    # models/quantize.py::quantize_t5_decoder_params.
    int8_decode: bool = False
    # Store the decode-time cross-attention K/V cache int8 with per-channel
    # scales (computed once at prefill). The cache read is the decode
    # step's largest HBM term after the weights (24 layers x 2 x
    # (B, 2049, 2048) bf16 = 1.6 GB PER STEP at the flagship shape) — int8
    # halves it. The K scale folds into q before QK^T and the V scale
    # applies after PV (both commute with the contraction), so the int8
    # tensors feed the dots directly. Set alongside int8_decode by
    # BLIP2_MR.quantize_for_decode(); no weight conversion needed (the
    # quantization happens at cache build inside the first decode_step).
    int8_cross_cache: bool = False
    # W8A8 int8 ENCODER (inference-only): every encoder-block projection and
    # the gated FFN run on fused Pallas int8 MXU kernels with in-kernel
    # per-token activation quantization (ops/int8_matmul.py); LoRA deltas
    # are merged into the kernels at conversion time. Convert float params
    # with models/quantize.py::quantize_t5_encoder_params. Attention
    # (flash + rel-pos bias) stays bf16.
    int8_encoder: bool = False
    # QLoRA-style int8 base for TRAINING: every encoder AND decoder block
    # kernel (and the LM head) stored int8 + per-channel scales; the LoRA
    # deltas stay fp32 and trainable. Frees ~half the T5 weight HBM so
    # larger per-chip batches fit. Convert float params with
    # models/quantize.py::quantize_t5_params.
    int8_base: bool = False
    # HF T5 also drops the attention WEIGHTS during training
    # (modeling_t5.py F.dropout(attn_weights)). Opt-in: active dropout
    # forces the XLA attention backend (flash kernels are deterministic),
    # whose fp32 logits + dropout masks at ~2k tokens/24 layers make the
    # XL training graph infeasible on one 16 GB chip (measured:
    # ResourceExhausted, and the standalone compile crashes this
    # environment's remote compiler) — the default keeps flash +
    # residual-only dropout; enable for bit-parity regularization at small
    # geometry or when dp/tp sharding provides the headroom.
    attn_weight_dropout: bool = False
    # Run the encoder/decoder block stacks under nn.scan (one compiled
    # block body instead of a program linear in depth — cold compiles drop
    # ~an order of magnitude). Params store per-layer leaves STACKED on a
    # leading axis under "block" instead of "block_{i}" subtrees; convert
    # with models/scan_utils.{stack,unstack}_t5_blocks. The decode cache
    # stacks the same way (generation gathers beams on axis 1 then).
    # True scans both sides; "encoder"/"decoder" scans only that side:
    # scanning the decoder turns the beam decode loop's per-step cache
    # updates layer-major, which costs ~10% flagship end-to-end, while the
    # encoder scan is decode-invisible — so inference wants "encoder"
    # (compile win only) and training wants True (backward compile win).
    scan_layers: bool | str = False

    @property
    def scan_encoder(self) -> bool:
        return self.scan_layers in (True, "encoder")

    @property
    def scan_decoder(self) -> bool:
        return self.scan_layers in (True, "decoder")


def _checkpoint_policy(cfg: "T5Config"):
    """Map T5Config.remat_policy to a jax.checkpoint policy callable."""
    if cfg.remat_policy is None:
        return None
    if cfg.remat_policy == "dots_kernels":
        def policy(prim, *_, **__):
            # Save MXU work (matmuls, Pallas flash kernels and their
            # residual stats); recompute VPU-only ops (fp32 norm upcasts,
            # GELU products, dropout multiplies, residual adds).
            return prim.name in (
                "dot_general", "pallas_call",
                "custom_vjp_call", "custom_vjp_call_jaxpr",
            )
        return policy
    raise ValueError(f"remat_policy={cfg.remat_policy!r}")


def _remat_block(cfg: "T5Config"):
    return nn.remat(T5Block, static_argnums=(6, 7),
                    policy=_checkpoint_policy(cfg))


def t5_flan_xl_config(**kw) -> T5Config:
    return T5Config(**kw)


def t5_flan_xxl_config(**kw) -> T5Config:
    return T5Config(d_model=4096, d_ff=10240, num_heads=64, **kw)


def t5_tiny_config(**kw) -> T5Config:
    defaults = dict(
        vocab_size=256, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, dropout_rate=0.0,
    )
    defaults.update(kw)
    return T5Config(**defaults)


class T5RelativeBias(nn.Module):
    """Relative position bias embedding (owned by layer 0, shared onward)."""

    config: T5Config
    bidirectional: bool

    def setup(self):
        cfg = self.config
        self.table = self.param(
            "rel_embedding",
            nn.initializers.normal(1.0),
            (cfg.relative_attention_num_buckets, cfg.num_heads),
            jnp.float32,
        )

    def __call__(self, query_positions, key_positions):
        cfg = self.config
        rel = key_positions[None, :] - query_positions[:, None]  # (Nq, Nk)
        buckets = relative_position_bucket(
            rel,
            bidirectional=self.bidirectional,
            num_buckets=cfg.relative_attention_num_buckets,
            max_distance=cfg.relative_attention_max_distance,
        )
        bias = self.table[buckets]  # (Nq, Nk, H)
        return bias.transpose(2, 0, 1)[None]  # (1, H, Nq, Nk)

    def head_major_table(self):
        """(H, num_buckets) fp32 table for the in-kernel relpos path."""
        return self.table.T


def materialize_encoder_relpos_bias(table, length, num_buckets=32,
                                    max_distance=128):
    """(1, H, N, N) bidirectional bias from the raw (num_buckets, H)
    ``rel_embedding`` param — bit-identical to T5RelativeBias.__call__.

    For per-length caching OUTSIDE the step graph: the in-graph
    ``table[buckets]`` gather lowers to a ~24 ms while-loop on TPU per
    encode, yet depends only on (length, table) — constant at inference
    (and under LoRA, where the table is frozen). BLIP2_MR caches the
    result per length and feeds it through ``encode(position_bias=...)``.
    """
    positions = jnp.arange(length)
    rel = positions[None, :] - positions[:, None]
    buckets = relative_position_bucket(
        rel, bidirectional=True, num_buckets=num_buckets,
        max_distance=max_distance,
    )
    return table[buckets].transpose(2, 0, 1)[None]


class T5Attention(nn.Module):
    """Multi-head attention without scaling (T5 folds the scale into init)."""

    config: T5Config
    causal: bool = False
    compute_dtype: Any = jnp.bfloat16
    decode_cache_len: int = 0
    quantize_dense: bool = False  # int8 weight-only kernels (decoder/infer)
    w8a8: bool = False  # fused W8A8 Pallas projections (encoder inference)

    @nn.compact
    def __call__(
        self,
        x,
        kv_states=None,
        mask=None,
        position_bias=None,
        decode: bool = False,
        deterministic: bool = True,
        relpos_table=None,
        norm_scale=None,
        residual=None,
    ):
        cfg = self.config
        inner = cfg.num_heads * cfg.d_kv
        is_cross = kv_states is not None

        if self.w8a8:
            # W8A8 encoder projections: 2D token flow around the Pallas
            # kernels; LoRA is merged into kernel_q at conversion
            # (quantize_t5_encoder_params), so no delta here. q/k/v are
            # PACKED into one (d, 3*inner) kernel — one in-kernel quant
            # pass over x and one larger grid instead of three (measured
            # 0.96 vs 1.09+ ms/layer at XL shapes).
            assert not is_cross and not decode, "w8a8 is encoder-only"
            from mr_blip_tpu.models.layers import QDenseParams
            from mr_blip_tpu.ops.int8_matmul import w8a8_linear

            wq3, sw3, _ = QDenseParams(
                3 * inner, x.shape[-1], use_bias=False, name="qkv_packed"
            )()
            norm = (None if norm_scale is None else
                    ("rms", norm_scale, None, cfg.layer_norm_epsilon))
            qkv2 = w8a8_linear(x.reshape(-1, x.shape[-1]), wq3, sw3,
                               norm=norm)
            _packed = {"q": 0, "k": 1, "v": 2}

            def dense(name):
                def apply(t, deterministic=True):
                    if name in _packed:
                        i = _packed[name]
                        return qkv2[:, i * inner:(i + 1) * inner].reshape(
                            t.shape[:-1] + (inner,)
                        )
                    wq, sw, _ = QDenseParams(
                        inner, t.shape[-1], use_bias=False, name=name
                    )()
                    # "o": the block's skip add rides the kernel epilogue
                    r = (residual.reshape(-1, inner) if residual is not None
                         else None)
                    y = w8a8_linear(t.reshape(-1, t.shape[-1]), wq, sw,
                                    residual=r)
                    return y.reshape(t.shape[:-1] + (inner,))
                return apply
        else:
            dense = lambda name: Dense(
                inner, use_bias=False, compute_dtype=self.compute_dtype,
                lora_rank=cfg.lora_rank, lora_alpha=cfg.lora_alpha,
                lora_dropout=cfg.lora_dropout, quantize=self.quantize_dense,
                name=name,
            )
        b, n, _ = x.shape
        q = dense("q")(x, deterministic=deterministic).reshape(b, n, cfg.num_heads, cfg.d_kv)

        # Caches are stored flattened (b, L, heads*d_kv): the TPU tiled
        # layout pads the last dim to 128 lanes, so a (.., 32, 64) cache
        # would cost 2x HBM; (.., 2048) is padding-free.
        if decode and is_cross:
            # Cross K/V are constant across decode steps: computed once when
            # the cache variable is created (init_cache pass), reused after.
            # Stored at the ENCODER batch size — beams share them (queries
            # are folded into the length axis at attention time).
            quant = cfg.int8_cross_cache
            already_cached = self.has_variable("cache", "cached_key")
            if already_cached:
                k_flat = self.variable("cache", "cached_key", None).value
                v_flat = self.variable("cache", "cached_value", None).value
                if quant:
                    k_scale = self.variable(
                        "cache", "cached_key_scale", None).value
                    v_scale = self.variable(
                        "cache", "cached_value_scale", None).value
            else:
                b_enc = kv_states.shape[0]
                k_flat = dense("k")(kv_states, deterministic=deterministic).reshape(
                    b_enc, -1, inner
                )
                v_flat = dense("v")(kv_states, deterministic=deterministic).reshape(
                    b_enc, -1, inner
                )
                if quant:
                    # Per-(batch, channel) symmetric int8 over the length
                    # axis; the scales ride the cache next to the tensors.
                    def _q8(t):
                        tf = t.astype(jnp.float32)
                        s = jnp.maximum(
                            jnp.max(jnp.abs(tf), axis=1, keepdims=True), 1e-6
                        ) / 127.0
                        qv = jnp.clip(jnp.round(tf / s), -127, 127)
                        return qv.astype(jnp.int8), s
                    k_flat, k_scale = _q8(k_flat)
                    v_flat, v_scale = _q8(v_flat)
                    self.variable("cache", "cached_key_scale",
                                  lambda: k_scale)
                    self.variable("cache", "cached_value_scale",
                                  lambda: v_scale)
                self.variable("cache", "cached_key", lambda: k_flat)
                self.variable("cache", "cached_value", lambda: v_flat)
            b_enc, m = k_flat.shape[0], k_flat.shape[1]
            k = k_flat.reshape(b_enc, m, cfg.num_heads, cfg.d_kv)
            v = v_flat.reshape(b_enc, m, cfg.num_heads, cfg.d_kv)
            if b_enc != b or quant:
                # q rows may be beam-expanded: fold beams into the query
                # length (beams == 1 degenerates to plain attention).
                beams = b // b_enc
                q = q.reshape(b_enc, beams * n, cfg.num_heads, cfg.d_kv)
                if mask is not None and mask.shape[0] == b:
                    mask = mask.reshape((b_enc, beams) + mask.shape[1:])[:, 0]
                if quant:
                    # int8 K/V feed the dots directly (XLA fuses the
                    # int8->bf16 convert into the dot's operand read, so
                    # HBM traffic stays int8). T5 applies no 1/sqrt(d)
                    # scale, so none here; the per-channel K scale folds
                    # into q (it is constant over the contraction's m
                    # axis) and the V scale applies after PV.
                    qk = (q.astype(jnp.float32)
                          * k_scale.reshape(b_enc, 1, cfg.num_heads,
                                            cfg.d_kv)).astype(q.dtype)
                    logits = jnp.einsum(
                        "bnhd,bmhd->bhnm", qk, k.astype(qk.dtype),
                        preferred_element_type=jnp.float32,
                    )
                    if mask is not None:
                        logits = jnp.where(
                            mask, logits, jnp.finfo(jnp.float32).min)
                    p = jax.nn.softmax(logits, axis=-1)
                    ctx = jnp.einsum(
                        "bhnm,bmhd->bnhd", p.astype(qk.dtype),
                        v.astype(qk.dtype),
                        preferred_element_type=jnp.float32,
                    )
                    out = (ctx * v_scale.reshape(
                        b_enc, 1, cfg.num_heads, cfg.d_kv)).astype(q.dtype)
                else:
                    # T5 applies no 1/sqrt(d) scale: pre-multiply q by
                    # sqrt(d) to cancel the scale inside
                    # dot_product_attention — same as the main path below
                    # (this early-return branch used to skip it, silently
                    # shrinking cross-attention logits 8x during beam
                    # decode; caught by the dedup-vs-expanded equivalence
                    # test, tests/test_generation.py).
                    out = dot_product_attention(
                        q * (cfg.d_kv ** 0.5), k, v, bias=position_bias,
                        mask=mask, bias_grad=cfg.lora_rank == 0,
                    )
                out = out.reshape(b, n, inner)
                return dense("o")(out, deterministic=deterministic)
        else:
            kv = kv_states if is_cross else x
            k = dense("k")(kv, deterministic=deterministic).reshape(
                b, -1, cfg.num_heads, cfg.d_kv
            )
            v = dense("v")(kv, deterministic=deterministic).reshape(
                b, -1, cfg.num_heads, cfg.d_kv
            )

        if decode and not is_cross:
            # Static-shape autoregressive cache (flax standard pattern).
            max_len = self.decode_cache_len
            assert max_len > 0, "decode=True requires decode_cache_len > 0"
            cached_key = self.variable(
                "cache", "cached_key", jnp.zeros, (b, max_len, inner), k.dtype,
            )
            cached_value = self.variable(
                "cache", "cached_value", jnp.zeros, (b, max_len, inner), v.dtype,
            )
            cache_index = self.variable(
                "cache", "cache_index", lambda: jnp.zeros((), jnp.int32)
            )
            idx = cache_index.value
            cached_key.value = jax.lax.dynamic_update_slice(
                cached_key.value, k.reshape(b, n, inner), (0, idx, 0)
            )
            cached_value.value = jax.lax.dynamic_update_slice(
                cached_value.value, v.reshape(b, n, inner), (0, idx, 0)
            )
            cache_index.value = idx + n
            k = cached_key.value.reshape(b, max_len, cfg.num_heads, cfg.d_kv)
            v = cached_value.value.reshape(b, max_len, cfg.num_heads, cfg.d_kv)
            # Mask out cache slots at or beyond the write frontier.
            valid = jnp.arange(max_len)[None, None, None, :] < (idx + n)
            mask = valid if mask is None else jnp.logical_and(mask, valid)

        if self.causal and not decode:
            causal = jnp.tril(jnp.ones((n, n), bool))[None, None]
            mask = causal if mask is None else jnp.logical_and(mask, causal)

        # T5 applies no 1/sqrt(d) scale; pre-multiply q by sqrt(d) to cancel
        # the scale inside dot_product_attention.
        q = q * (cfg.d_kv ** 0.5)
        drop_kw = {}
        if (not deterministic and cfg.dropout_rate > 0.0
                and cfg.attn_weight_dropout):
            drop_kw = dict(dropout_rate=cfg.dropout_rate,
                           dropout_rng=self.make_rng("dropout"))
        if relpos_table is not None:
            from mr_blip_tpu.ops.attention import relpos_attention

            out = relpos_attention(
                q, k, v, relpos_table,
                kv_mask=None if mask is None else mask[:, 0, 0, :],
                num_buckets=cfg.relative_attention_num_buckets,
                max_distance=cfg.relative_attention_max_distance,
                table_grad=cfg.lora_rank == 0, **drop_kw,
            )
        else:
            out = dot_product_attention(q, k, v, bias=position_bias, mask=mask,
                                        bias_grad=cfg.lora_rank == 0,
                                        **drop_kw)
        out = out.reshape(b, n, inner)
        return dense("o")(out, deterministic=deterministic)


class T5FeedForward(nn.Module):
    config: T5Config
    compute_dtype: Any = jnp.bfloat16
    quantize_dense: bool = False
    w8a8: bool = False  # fused W8A8 gated-MLP kernel (encoder inference)

    @nn.compact
    def __call__(self, x, deterministic=True, norm_scale=None,
                 residual=None):
        cfg = self.config
        if self.w8a8:
            # one fused Pallas kernel: gelu(x@wi_0) * (x@wi_1) @ wo with the
            # gated hidden resident in VMEM (int8 MXU ~2x bf16 on v5e);
            # tanh-GELU in-kernel (Mosaic has no erf; below int8 noise)
            assert cfg.is_gated_act and cfg.dense_act_fn.startswith("gelu")
            from mr_blip_tpu.models.layers import QDenseParams
            from mr_blip_tpu.ops.int8_matmul import w8a8_mlp_gated

            w0q, s0, _ = QDenseParams(cfg.d_ff, cfg.d_model, use_bias=False,
                                      name="wi_0")()
            w1q, s1, _ = QDenseParams(cfg.d_ff, cfg.d_model, use_bias=False,
                                      name="wi_1")()
            woq, so, _ = QDenseParams(cfg.d_model, cfg.d_ff, use_bias=False,
                                      name="wo")()
            shp = x.shape
            norm = (None if norm_scale is None else
                    ("rms", norm_scale, None, cfg.layer_norm_epsilon))
            r = (residual.reshape(-1, shp[-1]) if residual is not None
                 else None)
            y = w8a8_mlp_gated(x.reshape(-1, shp[-1]), w0q, s0, w1q, s1,
                               woq, so, norm=norm, residual=r)
            return y.reshape(shp)
        act = {
            "gelu": lambda y: nn.gelu(y, approximate=False),
            "gelu_new": lambda y: nn.gelu(y, approximate=True),
            "relu": nn.relu,
        }[cfg.dense_act_fn]
        dense = lambda feats, name: Dense(
            feats, use_bias=False, compute_dtype=self.compute_dtype,
            lora_rank=cfg.lora_rank, lora_alpha=cfg.lora_alpha,
            lora_dropout=cfg.lora_dropout, quantize=self.quantize_dense,
            name=name,
        )
        if cfg.is_gated_act:
            h = act(dense(cfg.d_ff, "wi_0")(x, deterministic=deterministic))
            h = h * dense(cfg.d_ff, "wi_1")(x, deterministic=deterministic)
        else:
            h = act(dense(cfg.d_ff, "wi")(x, deterministic=deterministic))
        if cfg.dropout_rate > 0.0:
            h = nn.Dropout(rate=cfg.dropout_rate)(h, deterministic=deterministic)
        return dense(cfg.d_model, "wo")(h, deterministic=deterministic)


class T5Block(nn.Module):
    config: T5Config
    causal: bool
    has_cross_attention: bool
    compute_dtype: Any = jnp.bfloat16
    decode_cache_len: int = 0
    quantize_dense: bool = False
    w8a8: bool = False
    # nn.scan body form: return (x, None) so one block definition serves
    # both the unrolled loop and the scan-over-layers path.
    as_scan_body: bool = False

    @nn.compact
    def __call__(
        self,
        x,
        encoder_states=None,
        self_mask=None,
        cross_mask=None,
        position_bias=None,
        decode=False,
        deterministic=True,
        relpos_table=None,
    ):
        # NOTE: argument order is load-bearing — nn.remat wraps this with
        # static_argnums=(6, 7) for (decode, deterministic) (arg 0 = module);
        # relpos_table must stay AFTER them (it is a traced pytree leaf).
        out = self._body(x, encoder_states, self_mask, cross_mask,
                         position_bias, decode, deterministic, relpos_table)
        return (out, None) if self.as_scan_body else out

    def _body(self, x, encoder_states, self_mask, cross_mask, position_bias,
              decode, deterministic, relpos_table):
        cfg = self.config
        drop = (
            (lambda y: nn.Dropout(rate=cfg.dropout_rate)(y, deterministic=deterministic))
            if cfg.dropout_rate > 0.0
            else (lambda y: y)
        )
        if self.w8a8:
            # pre-RMSNorms fold into the int8 kernels' in-VMEM quant step;
            # params keep the float tree's {self_attn,ff}_norm/scale paths
            from mr_blip_tpu.models.layers import RMSParamsScope

            # skip adds ride the int8 kernels' epilogue (``residual=``) —
            # w8a8 is inference-only, so the residual dropout is identity
            assert deterministic, "w8a8 is an inference mode"
            ns = RMSParamsScope(cfg.d_model, name="self_attn_norm")()
            x = T5Attention(cfg, causal=self.causal,
                            compute_dtype=self.compute_dtype,
                            w8a8=True, name="self_attention")(
                x, mask=self_mask, position_bias=position_bias,
                decode=decode, deterministic=deterministic,
                relpos_table=relpos_table, norm_scale=ns, residual=x,
            )
            fs = RMSParamsScope(cfg.d_model, name="ff_norm")()
            return T5FeedForward(cfg, compute_dtype=self.compute_dtype,
                                 w8a8=True, name="ff")(
                x, deterministic=deterministic, norm_scale=fs, residual=x,
            )
        h = RMSNormFP32(epsilon=cfg.layer_norm_epsilon, name="self_attn_norm")(x)
        h = T5Attention(cfg, causal=self.causal, compute_dtype=self.compute_dtype,
                        decode_cache_len=self.decode_cache_len,
                        quantize_dense=self.quantize_dense,
                        name="self_attention")(
            h, mask=self_mask, position_bias=position_bias, decode=decode,
            deterministic=deterministic, relpos_table=relpos_table,
        )
        x = x + drop(h)
        if self.has_cross_attention:
            h = RMSNormFP32(epsilon=cfg.layer_norm_epsilon, name="cross_attn_norm")(x)
            h = T5Attention(cfg, compute_dtype=self.compute_dtype,
                            quantize_dense=self.quantize_dense,
                            name="cross_attention")(
                h, kv_states=encoder_states, mask=cross_mask, decode=decode,
                deterministic=deterministic,
            )
            x = x + drop(h)
        h = RMSNormFP32(epsilon=cfg.layer_norm_epsilon, name="ff_norm")(x)
        h = T5FeedForward(cfg, compute_dtype=self.compute_dtype,
                          quantize_dense=self.quantize_dense, name="ff")(
            h, deterministic=deterministic
        )
        return x + drop(h)


class T5Encoder(nn.Module):
    config: T5Config
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, inputs_embeds, mask=None, deterministic=True,
                 position_bias=None):
        cfg = self.config
        n = inputs_embeds.shape[1]
        positions = jnp.arange(n)
        rel_mod = T5RelativeBias(cfg, bidirectional=True, name="rel_bias")
        if position_bias is not None:
            # Precomputed (1, H, N, N) bias passed in: the table gather is
            # a ~24 ms/batch while-loop on TPU and is input-independent, so
            # inference paths cache it per length (BLIP2_MR._relpos_bias).
            # The module's own rel_bias param still exists (rel_mod above)
            # so the param tree is identical either way.
            assert position_bias.shape[-1] == n, (position_bias.shape, n)
            relpos_table = None
            position_bias = position_bias.astype(self.compute_dtype)
        elif cfg.relpos_in_kernel:
            # O(N)-memory path: the bias never materializes; the flash
            # kernel computes it from the table (XLA fallback materializes).
            position_bias = None
            relpos_table = rel_mod.head_major_table()
        else:
            relpos_table = None
            position_bias = rel_mod(positions, positions).astype(
                self.compute_dtype  # bf16 bias halves HBM traffic/footprint
            )
        attn_mask = None
        if mask is not None:
            attn_mask = mask[:, None, None, :].astype(bool)  # (B,1,1,N)

        x = inputs_embeds.astype(self.compute_dtype)
        if cfg.dropout_rate > 0.0:
            x = nn.Dropout(rate=cfg.dropout_rate)(x, deterministic=deterministic)
        block_cls = T5Block
        if cfg.use_remat:
            # remat_policy=None: keep only block boundaries (fp32 attention
            # logits recomputed in the backward); "dots_kernels": keep MXU
            # outputs, recompute elementwise only
            block_cls = _remat_block(cfg)
        if cfg.scan_encoder:
            if cfg.int8_encoder:
                # W8A8 kernels emit bf16 whatever the input dtype; the scan
                # carry must be type-invariant (see eva_vit.py).
                x = x.astype(jnp.bfloat16)
            scanned = nn.scan(
                block_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast,) * 7,
                length=cfg.num_layers,
            )(cfg, causal=False, has_cross_attention=False,
              compute_dtype=self.compute_dtype,
              quantize_dense=cfg.int8_base, w8a8=cfg.int8_encoder,
              as_scan_body=True, name="block")
            x, _ = scanned(x, None, attn_mask, None, position_bias,
                           False, deterministic, relpos_table)
        else:
            for i in range(cfg.num_layers):
                x = block_cls(
                    cfg, causal=False, has_cross_attention=False,
                    compute_dtype=self.compute_dtype,
                    quantize_dense=cfg.int8_base, w8a8=cfg.int8_encoder,
                    name=f"block_{i}",
                )(x, None, attn_mask, None, position_bias,
                  False, deterministic, relpos_table)
        x = RMSNormFP32(epsilon=cfg.layer_norm_epsilon, name="final_norm")(x)
        if cfg.dropout_rate > 0.0:
            x = nn.Dropout(rate=cfg.dropout_rate)(x, deterministic=deterministic)
        return x


class T5Decoder(nn.Module):
    config: T5Config
    compute_dtype: Any = jnp.bfloat16
    decode_cache_len: int = 0

    @nn.compact
    def __call__(
        self,
        decoder_inputs_embeds,
        encoder_states,
        decoder_mask=None,
        encoder_mask=None,
        decode=False,
        decode_position=None,
        deterministic=True,
    ):
        cfg = self.config
        n = decoder_inputs_embeds.shape[1]

        if decode:
            assert decode_position is not None
            q_pos = decode_position + jnp.arange(n)
            # Cache length is static; bias spans all cache slots.
            k_pos = jnp.arange(self.decode_cache_len)
        else:
            q_pos = jnp.arange(n)
            k_pos = q_pos
        position_bias = T5RelativeBias(cfg, bidirectional=False, name="rel_bias")(
            q_pos, k_pos
        ).astype(self.compute_dtype)

        self_mask = None
        if decoder_mask is not None and not decode:
            self_mask = decoder_mask[:, None, None, :].astype(bool)
        cross_mask = None
        if encoder_mask is not None:
            cross_mask = encoder_mask[:, None, None, :].astype(bool)

        x = decoder_inputs_embeds.astype(self.compute_dtype)
        if cfg.dropout_rate > 0.0:
            x = nn.Dropout(rate=cfg.dropout_rate)(x, deterministic=deterministic)
        block_cls = T5Block
        if cfg.use_remat and not decode:
            block_cls = _remat_block(cfg)
        if cfg.scan_decoder:
            # The decode cache stacks per layer too (variable_axes cache=0):
            # self-attn cache leaves become (L, B*K, max_len, inner), so
            # beam gathering selects on axis 1 (generation.py
            # cache_layer_major).
            scanned = nn.scan(
                block_cls,
                variable_axes={"params": 0, "cache": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast,) * 6,
                length=cfg.num_decoder_layers,
            )(cfg, causal=True, has_cross_attention=True,
              compute_dtype=self.compute_dtype,
              decode_cache_len=self.decode_cache_len,
              quantize_dense=cfg.int8_decode or cfg.int8_base,
              as_scan_body=True, name="block")
            x, _ = scanned(x, encoder_states, self_mask, cross_mask,
                           position_bias, decode, deterministic)
        else:
            for i in range(cfg.num_decoder_layers):
                x = block_cls(
                    cfg, causal=True, has_cross_attention=True,
                    compute_dtype=self.compute_dtype,
                    decode_cache_len=self.decode_cache_len,
                    quantize_dense=cfg.int8_decode or cfg.int8_base,
                    name=f"block_{i}",
                )(
                    x, encoder_states, self_mask,
                    cross_mask, position_bias,
                    decode, deterministic,
                )
        x = RMSNormFP32(epsilon=cfg.layer_norm_epsilon, name="final_norm")(x)
        if cfg.dropout_rate > 0.0:
            x = nn.Dropout(rate=cfg.dropout_rate)(x, deterministic=deterministic)
        return x


class T5ForConditionalGeneration(nn.Module):
    """Full encoder-decoder with shared token embedding and untied LM head."""

    config: T5Config
    compute_dtype: Any = jnp.bfloat16
    decode_cache_len: int = 0  # static max decode length for cached decoding

    def setup(self):
        cfg = self.config
        self.shared = nn.Embed(
            cfg.vocab_size, cfg.d_model,
            embedding_init=nn.initializers.normal(1.0),
            param_dtype=jnp.float32, name="shared",
        )
        self.encoder = T5Encoder(cfg, self.compute_dtype, name="encoder")
        self.decoder = T5Decoder(
            cfg, self.compute_dtype, decode_cache_len=self.decode_cache_len,
            name="decoder",
        )
        if not cfg.tie_word_embeddings:
            self.lm_head = Dense(
                cfg.vocab_size, use_bias=False, compute_dtype=self.compute_dtype,
                lora_rank=cfg.lora_rank, lora_alpha=cfg.lora_alpha,
                lora_dropout=cfg.lora_dropout,
                quantize=cfg.int8_decode or cfg.int8_base,
                name="lm_head",
            )

    def embed_tokens(self, input_ids):
        return self.shared(input_ids)

    def encode(self, inputs_embeds, mask=None, deterministic=True,
               position_bias=None):
        return self.encoder(inputs_embeds, mask=mask,
                            deterministic=deterministic,
                            position_bias=position_bias)


    def decode(
        self,
        decoder_input_ids,
        encoder_states,
        decoder_mask=None,
        encoder_mask=None,
        decode=False,
        decode_position=None,
        deterministic=True,
    ):
        x = self.shared(decoder_input_ids)
        x = self.decoder(
            x, encoder_states, decoder_mask=decoder_mask, encoder_mask=encoder_mask,
            decode=decode, decode_position=decode_position,
            deterministic=deterministic,
        )
        if self.config.tie_word_embeddings:
            x = x * (self.config.d_model ** -0.5)
            logits = self.shared.attend(x.astype(jnp.float32))
        else:
            logits = self.lm_head(x, deterministic=deterministic)
        return logits.astype(jnp.float32)

    def __call__(
        self,
        inputs_embeds,
        decoder_input_ids,
        encoder_mask=None,
        decoder_mask=None,
        deterministic=True,
    ):
        encoder_states = self.encode(
            inputs_embeds, mask=encoder_mask, deterministic=deterministic
        )
        return self.decode(
            decoder_input_ids, encoder_states,
            decoder_mask=decoder_mask, encoder_mask=encoder_mask,
            deterministic=deterministic,
        )


def shift_right(labels, decoder_start_token_id=0, pad_token_id=0):
    """Teacher-forcing decoder inputs: prepend start token, drop last label."""
    shifted = jnp.roll(labels, 1, axis=-1)
    shifted = shifted.at[:, 0].set(decoder_start_token_id)
    return jnp.where(shifted == -100, pad_token_id, shifted)


def cross_entropy_lm_loss(logits, labels, label_mask):
    """Mean token-level cross entropy over unmasked label positions."""
    vocab = logits.shape[-1]
    labels_clipped = jnp.where(labels == -100, 0, labels)
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    token_ll = jnp.take_along_axis(
        log_probs, labels_clipped[..., None], axis=-1
    )[..., 0]
    mask = label_mask.astype(jnp.float32) * (labels != -100).astype(jnp.float32)
    return -(token_ll * mask).sum() / jnp.maximum(mask.sum(), 1.0)
