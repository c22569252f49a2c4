"""int8 weight-only quantization for inference (decode is weight-bound).

Autoregressive decode reads every decoder weight once per step (~2.7 GB
bf16/step for Flan-T5-XL at beam 5) and does almost no math — it runs at
the HBM bandwidth floor. Storing those kernels as int8 with a
per-output-channel fp32 scale halves the traffic; the dequant convert
fuses into the XLA dot and the scale commutes with the contraction
(applied after the matmul in fp32, see layers.Dense ``quantize``).

Opt-in and inference-only: training keeps float kernels. LoRA deltas,
norms, embeddings, and the rel-pos table stay float (tiny). Symmetric
round-to-nearest per output channel:

    scale[o] = max_i |w[i, o]| / 127        wq = round(w / scale)

Use :func:`quantize_t5_decoder_params` to convert a float
T5ForConditionalGeneration tree for a model built with
``T5Config(int8_decode=True)``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def quantize_dense(dense_tree):
    """{Dense_0: {kernel[, bias]}, lora_*...} -> {kernel_q, kernel_scale,
    [bias,] lora_*...} (the layout layers.Dense(quantize=True) expects).

    Pure jnp ops: runs where the weights live (no host round-trip when
    converting a device-resident tree)."""
    inner = dense_tree["Dense_0"]
    w = jnp.asarray(inner["kernel"], jnp.float32)
    # axis=-2 (the input dim) so stacked scan-layout kernels (L, in, out)
    # quantize layerwise exactly like flat (in, out) ones
    scale = jnp.maximum(jnp.abs(w).max(axis=-2), 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale[..., None, :]), -127, 127).astype(jnp.int8)
    out = {k: v for k, v in dense_tree.items() if k != "Dense_0"}
    out["kernel_q"] = q
    out["kernel_scale"] = scale.astype(jnp.float32)
    if "bias" in inner:
        out["bias"] = inner["bias"]
    return out


def dequantize_dense(qtree):
    """Inverse layout transform (float kernel reconstructed from int8)."""
    w = np.asarray(qtree["kernel_q"], np.float32) * np.asarray(
        qtree["kernel_scale"], np.float32
    )[..., None, :]
    out = {k: v for k, v in qtree.items()
           if k not in ("kernel_q", "kernel_scale", "bias")}
    inner = {"kernel": jnp.asarray(w)}
    if "bias" in qtree:
        inner["bias"] = qtree["bias"]
    out["Dense_0"] = inner
    return out


def quantize_vit_params(vit_params):
    """Float EVA/base-ViT params -> the tree a ``ViTConfig(int8_matmul=True)``
    model expects: every block's qkv/proj/fc1/fc2 kernel stored int8 with
    per-output-channel scales (W8A8 — activations are quantized per token
    inside the Pallas kernels, no calibration state needed). patch_embed,
    cls_token, pos_embed, LayerNorms, and the q/v bias vectors stay float."""
    out = dict(vit_params)
    for name, block in list(out.items()):
        # "blocks" = stacked scan layout (one subtree, leading layer axis);
        # the per-channel quant math is identical, vectorized over layers.
        if not (name.startswith("blocks_") or name == "blocks"):
            continue
        block = dict(block)
        attn = dict(block["attn"])
        for d in ("qkv", "proj"):
            if d in attn and "Dense_0" in attn[d]:
                attn[d] = quantize_dense(attn[d])
        block["attn"] = attn
        mlp = dict(block["mlp"])
        for d in ("fc1", "fc2"):
            if d in mlp and "Dense_0" in mlp[d]:
                mlp[d] = quantize_dense(mlp[d])
        block["mlp"] = mlp
        out[name] = block
    return out


_DECODER_DENSE = ("q", "k", "v", "o")
_FF_DENSE = ("wi", "wi_0", "wi_1", "wo")


def _quantize_section_blocks(section):
    """Quantize every block_* Dense in an encoder/decoder param section."""
    sec = dict(section)
    for name, block in list(sec.items()):
        if not (name.startswith("block_") or name == "block"):
            continue
        block = dict(block)
        for attn_key in ("self_attention", "cross_attention"):
            if attn_key not in block:
                continue
            attn = dict(block[attn_key])
            for d in _DECODER_DENSE:
                if d in attn:
                    attn[d] = quantize_dense(attn[d])
            block[attn_key] = attn
        if "ff" in block:
            ff = dict(block["ff"])
            for d in _FF_DENSE:
                if d in ff:
                    ff[d] = quantize_dense(ff[d])
            block["ff"] = ff
        sec[name] = block
    return sec


def quantize_t5_params(t5_params):
    """Float T5 params -> the tree a ``T5Config(int8_base=True)`` model
    expects: every ENCODER and DECODER block Dense plus the LM head int8;
    shared embedding, norms, rel-pos tables, and LoRA deltas stay float —
    the QLoRA-style training layout (frozen int8 base + fp32 LoRA)."""
    out = dict(t5_params)
    out["encoder"] = _quantize_section_blocks(t5_params["encoder"])
    out["decoder"] = _quantize_section_blocks(t5_params["decoder"])
    if "lm_head" in out:
        out["lm_head"] = quantize_dense(out["lm_head"])
    return out


def quantize_t5_decoder_params(t5_params):
    """Float T5ForConditionalGeneration params -> the tree a
    ``T5Config(int8_decode=True)`` model expects: every decoder-block Dense
    and the LM head quantized; encoder, shared embedding, norms and
    rel-pos tables untouched."""
    out = dict(t5_params)
    dec = dict(t5_params["decoder"])
    for name, block in list(dec.items()):
        if not (name.startswith("block_") or name == "block"):
            continue
        block = dict(block)
        for attn_key in ("self_attention", "cross_attention"):
            if attn_key not in block:
                continue
            attn = dict(block[attn_key])
            for d in _DECODER_DENSE:
                if d in attn:
                    attn[d] = quantize_dense(attn[d])
            block[attn_key] = attn
        if "ff" in block:
            ff = dict(block["ff"])
            for d in _FF_DENSE:
                if d in ff:
                    ff[d] = quantize_dense(ff[d])
            block["ff"] = ff
        dec[name] = block
    out["decoder"] = dec
    if "lm_head" in out:
        out["lm_head"] = quantize_dense(out["lm_head"])
    return out


def merge_quantize_dense(dense_tree, lora_alpha: float = 8.0):
    """Dense tree (float kernel + optional LoRA delta) -> W8A8 layout with
    the LoRA update MERGED into the quantized kernel:

        w' = w + lora_a @ lora_b * (alpha / rank)

    Used by the int8 encoder path, where the Pallas kernels consume the
    whole weight (no separate bf16 delta like ``layers.Dense(quantize=
    True)`` keeps). Mathematically the same function as float base + delta
    (PEFT's merge_and_unload identity), then quantized per output channel.
    """
    inner = dense_tree["Dense_0"]
    w = jnp.asarray(inner["kernel"], jnp.float32)
    if "lora_a" in dense_tree:
        a = jnp.asarray(dense_tree["lora_a"], jnp.float32)
        b = jnp.asarray(dense_tree["lora_b"], jnp.float32)
        w = w + (a @ b) * (lora_alpha / a.shape[-1])
    scale = jnp.maximum(jnp.abs(w).max(axis=-2), 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale[..., None, :]), -127, 127).astype(jnp.int8)
    out = {"kernel_q": q, "kernel_scale": scale.astype(jnp.float32)}
    if "bias" in inner:
        out["bias"] = inner["bias"]
    return out


def _merged_float_kernel(dense_tree, lora_alpha):
    w = jnp.asarray(dense_tree["Dense_0"]["kernel"], jnp.float32)
    if "lora_a" in dense_tree:
        a = jnp.asarray(dense_tree["lora_a"], jnp.float32)
        b = jnp.asarray(dense_tree["lora_b"], jnp.float32)
        w = w + (a @ b) * (lora_alpha / a.shape[-1])
    return w


def quantize_t5_encoder_params(t5_params, lora_alpha: float = 8.0):
    """Float T5 params -> the tree a ``T5Config(int8_encoder=True)`` model
    expects: every ENCODER block projection and gated-FFN kernel
    (wi_0/wi_1/wo) stored int8 with per-channel scales, LoRA deltas merged
    in (W8A8 — activations quantize per token inside the Pallas kernels).
    q/k/v merge into one packed (d, 3*inner) ``qkv_packed`` kernel (one
    quant pass + one kernel launch; per-output-channel scales make the
    concat-then-quantize identical to quantize-then-concat). Decoder,
    shared embedding, norms, and rel-pos tables untouched."""
    out = dict(t5_params)
    enc = dict(t5_params["encoder"])
    for name, block in list(enc.items()):
        if not (name.startswith("block_") or name == "block"):
            continue
        block = dict(block)
        attn = dict(block["self_attention"])
        w = jnp.concatenate(
            [_merged_float_kernel(attn.pop(d), lora_alpha)
             for d in ("q", "k", "v")], axis=-1,
        )
        scale = jnp.maximum(jnp.abs(w).max(axis=-2), 1e-8) / 127.0
        attn["qkv_packed"] = {
            "kernel_q": jnp.clip(jnp.round(w / scale[..., None, :]),
                                 -127, 127).astype(jnp.int8),
            "kernel_scale": scale.astype(jnp.float32),
        }
        attn["o"] = merge_quantize_dense(attn["o"], lora_alpha)
        block["self_attention"] = attn
        ff = dict(block["ff"])
        for d in _FF_DENSE:
            if d in ff:
                ff[d] = merge_quantize_dense(ff[d], lora_alpha)
        block["ff"] = ff
        enc[name] = block
    out["encoder"] = enc
    return out


def quantize_qformer_cross_params(qf_params):
    """Float Q-Former params -> the tree a ``QFormerConfig(int8_cross=
    True)`` model expects: each cross-attention layer's key/value Dense
    pair packed into one int8 ``kv_packed`` kernel (per-output-channel
    scales + concatenated bias). Everything else (query/output Dense,
    norms, query tokens, FFNs) stays float."""
    out = dict(qf_params)
    for name, layer in list(out.items()):
        if not name.startswith("layer_") or "cross_attention" not in layer:
            continue
        layer = dict(layer)
        cross = dict(layer["cross_attention"])
        w = jnp.concatenate(
            [jnp.asarray(cross.pop(d)["Dense_0"]["kernel"], jnp.float32)
             for d in ("key", "value")], axis=1,
        )
        bias = jnp.concatenate(
            [jnp.asarray(layer["cross_attention"][d]["Dense_0"]["bias"],
                         jnp.float32)
             for d in ("key", "value")],
        )
        scale = jnp.maximum(jnp.abs(w).max(axis=0), 1e-8) / 127.0
        cross["kv_packed"] = {
            "kernel_q": jnp.clip(jnp.round(w / scale), -127, 127).astype(
                jnp.int8),
            "kernel_scale": scale.astype(jnp.float32),
            "bias": bias,
        }
        layer["cross_attention"] = cross
        out[name] = layer
    return out
