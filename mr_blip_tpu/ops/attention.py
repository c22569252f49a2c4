"""Attention core with pluggable backends.

Every attention site in the framework (ViT self-attn, Q-Former self/cross,
T5 self/cross with relative-position bias) funnels through
``dot_product_attention`` so the backend can be swapped globally:

* ``"xla"``  — einsum + fp32 softmax; XLA fuses this well for short
  sequences and it works on any platform.
* ``"flash"`` — Pallas TPU flash-attention kernel (see
  :mod:`mr_blip_tpu.ops.flash_attention`): O(N) memory, blockwise online
  softmax on the MXU. Selected automatically on TPU for long sequences.

Shapes follow the (batch, length, heads, head_dim) convention.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_BACKEND = os.environ.get("MR_BLIP_ATTENTION_BACKEND", "auto")

# Below this many query positions the fusion wins over a hand-rolled kernel.
_FLASH_MIN_SEQ = 256


def set_attention_backend(name: str):
    """Override attention backend globally: "auto" | "xla" | "flash"."""
    global _BACKEND
    assert name in ("auto", "xla", "flash")
    _BACKEND = name


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def xla_attention(q, k, v, bias=None, mask=None, dropout_rate=0.0,
                  dropout_rng=None):
    """Reference attention: bf16 matmuls, fp32 softmax accumulation.

    ``dropout_rate``/``dropout_rng``: attention-WEIGHT dropout (HF T5
    semantics, modeling_t5.py T5Attention: F.dropout(attn_weights)) —
    applied to the softmax probabilities, inverted scaling.
    """
    head_dim = q.shape[-1]
    scale = head_dim ** -0.5
    # (B, H, N, M) logits in fp32 for a stable softmax.
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if mask is not None:
        big_neg = jnp.finfo(jnp.float32).min
        logits = jnp.where(mask, logits, big_neg)
    probs = jax.nn.softmax(logits, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                    probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum("bhnm,bmhd->bnhd", probs.astype(v.dtype), v)
    return out


def dot_product_attention(q, k, v, bias=None, mask=None, bias_grad=False,
                          dropout_rate=0.0, dropout_rng=None):
    """Multi-head attention with automatic backend selection.

    Args:
        q: (B, N, H, D) queries (already scaled by the caller? no — scaling
           happens inside, by D**-0.5).
        k, v: (B, M, H, D) keys/values.
        bias: optional additive logits bias, broadcastable to (B, H, N, M).
        mask: optional boolean mask, broadcastable to (B, H, N, M);
            True = attend.
        bias_grad: static; set when the bias itself is trained so the flash
            backward emits the true dbias (XLA backend always does).
        dropout_rate / dropout_rng: attention-weight dropout (training
            only). Active dropout forces the XLA backend — the flash
            kernels are deterministic; inference is unaffected.
    Returns:
        (B, N, H, D) attention output in v.dtype.
    """
    if dropout_rate > 0.0 and dropout_rng is not None:
        return xla_attention(q, k, v, bias=bias, mask=mask,
                             dropout_rate=dropout_rate,
                             dropout_rng=dropout_rng)
    backend = _BACKEND
    long_q = q.shape[1] >= _FLASH_MIN_SEQ
    # K-only masks (B, 1, 1, M) ride the bias kernel's validity vector.
    k_only_mask = (
        mask is not None
        and mask.ndim == 4
        and mask.shape[1] == 1
        and mask.shape[2] == 1
    )
    if backend == "auto" and _on_tpu() and long_q:
        from mr_blip_tpu.ops.flash_attention import (
            flash_attention,
            flash_attention_bias,
        )

        if bias is None and mask is None:
            # The mask-free kernel streams K/V blocks from kv_len
            # independently of q_len, so rectangular (q_len != k_len)
            # cross-attention prefill takes the flash path too.
            return flash_attention(q, k, v)
        if (
            bias is not None and bias.shape[0] == 1
            and q.shape[1] == k.shape[1]
            and (mask is None or k_only_mask)
        ):
            # DISPATCH CONSTRAINTS (bias kernel, measured in
            # docs/performance.md "Rel-pos bias economics"):
            # * bias.shape[0] == 1 — the kernel reuses one batch-broadcast
            #   bias tile across the batch-innermost grid (the tile is the
            #   dominant per-tile HBM term; per-batch bias would refetch
            #   bq x M bytes per batch row and erase the win). T5's rel-pos
            #   bias is (1, H, N, M) by construction, so the constraint is
            #   free on every current call site.
            # * q_len == k_len — the T5 encoder (the only bias site) is
            #   self-attention. Rectangular bias shapes (decoder
            #   cross-attn prefill, Q-Former 32x257) fall back to XLA,
            #   which is at its fusion ceiling for short q (<256 rows:
            #   the (B, H, N, M) logits fit in VMEM and XLA fuses
            #   softmax+matmul; measured parity at these shapes).
            # Long-context QA prefill (4k+) with rectangular shapes would
            # land on relpos_attention / the mask-free kernel above, not
            # here.
            kv_mask = None
            if mask is not None:
                kv_mask = jnp.broadcast_to(
                    mask[:, 0, 0, :], (q.shape[0], k.shape[1])
                )
            # block_h=2: two heads per program give Mosaic independent
            # chains to overlap the VPU softmax with the next head's MXU
            # matmul — 4.50 vs 4.86 ms/layer at the 2049-token T5-XL
            # shape, bitwise-identical output (scripts/probe_flash_bias.py;
            # the wrapper VMEM heuristic shrinks the q-block to fit, and
            # block_h falls back to 1 when it doesn't divide H). The
            # gradient path keeps its single-head 512-block stats/backward
            # kernels either way — block_h shapes only the no-grad fwd.
            return flash_attention_bias(q, k, v, bias, kv_mask,
                                        bias_grad=bias_grad, block_h=2)
    if backend == "flash":
        from mr_blip_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, mask=mask)
    return xla_attention(q, k, v, bias=bias, mask=mask)


def relpos_attention(q, k, v, table, kv_mask=None, num_buckets=32,
                     max_distance=128, table_grad=False, dropout_rate=0.0,
                     dropout_rng=None):
    """Attention with the T5 bidirectional rel-pos bias derived from a
    (H, num_buckets) table.

    On TPU with a long sequence this dispatches to the Pallas kernel that
    computes the bias in-kernel (O(N) memory, no (1, H, N, M) tensor); on
    other platforms / short sequences it materializes the bias and uses the
    XLA path — numerically identical (same bucket function and constants).

    ``kv_mask``: optional (B, M) K-side validity. ``table_grad`` (static)
    makes the kernel backward accumulate the true dtable (full finetuning;
    the XLA fallback always produces it).
    """
    backend = _BACKEND
    dropout_active = dropout_rate > 0.0 and dropout_rng is not None
    if (backend in ("auto", "flash") and _on_tpu() and not dropout_active
            and q.shape[1] >= _FLASH_MIN_SEQ and q.shape[1] == k.shape[1]):
        from mr_blip_tpu.ops.flash_attention import flash_attention_relpos

        return flash_attention_relpos(
            q, k, v, table, kv_mask=kv_mask,
            num_buckets=num_buckets, max_distance=max_distance,
            table_grad=table_grad,
        )
    from mr_blip_tpu.ops.relpos import materialize_relpos_bias

    bias = materialize_relpos_bias(
        table.T, jnp.arange(q.shape[1]), jnp.arange(k.shape[1]),
        bidirectional=True, num_buckets=num_buckets, max_distance=max_distance,
    )
    mask = None if kv_mask is None else kv_mask.astype(bool)[:, None, None, :]
    return xla_attention(q, k, v, bias=bias, mask=mask,
                         dropout_rate=dropout_rate, dropout_rng=dropout_rng)


def make_causal_mask(length: int, dtype=jnp.bool_):
    """(1, 1, N, N) lower-triangular causal mask."""
    idx = jnp.arange(length)
    return (idx[:, None] >= idx[None, :])[None, None].astype(dtype)
