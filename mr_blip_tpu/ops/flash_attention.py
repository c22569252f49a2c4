"""Pallas TPU flash attention (blockwise online-softmax).

Replaces the O(N^2)-memory attention for long sequences (T5 encoder over
~2k interleaved tokens, 60-frame batched ViT): logits never materialize in
HBM; each (q-block, k-block) tile streams through VMEM and the MXU with the
running-max/denominator rescaling trick.

Forward is a Pallas kernel; the backward pass currently recomputes with the
XLA attention inside a ``jax.custom_vjp`` (flash is primarily used on the
no-grad inference paths — generate/beam-search prefill — where the forward
memory saving is what matters).  Shapes are (B, N, H, D) like
:func:`mr_blip_tpu.ops.attention.xla_attention`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 512


def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, causal: bool):
    """One (batch*head, q-block) program: stream K/V blocks, online softmax.

    Matmuls keep the input dtype (bf16 on the fast MXU path) with fp32
    accumulation via preferred_element_type; only the softmax statistics
    run in fp32.
    """
    q = q_ref[0]  # (block_q, d), input dtype
    block_q, d = q.shape
    kv_len = k_ref.shape[1]
    q_scaled = q * jnp.asarray(d ** -0.5, q.dtype)

    num_k_blocks = pl.cdiv(kv_len, block_k)
    q_block_idx = pl.program_id(1)

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        logits = jnp.dot(q_scaled, k.T,
                         preferred_element_type=jnp.float32)  # (bq, bk) fp32
        # pl.ds clamps the last partial block's start (when kv_len is not a
        # block multiple), re-reading rows already covered by the previous
        # block — mask the re-read prefix out of this block's softmax.
        start = jnp.minimum(i * block_k, kv_len - block_k)
        k_pos = start + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        if kv_len % block_k:
            logits = jnp.where(k_pos >= i * block_k, logits, -jnp.inf)
        if causal:
            q_pos = q_block_idx * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            logits = jnp.where(q_pos >= k_pos, logits, -jnp.inf)

        m_cur = jnp.max(logits, axis=-1, keepdims=True)  # (bq, 1)
        m_new = jnp.maximum(m_prev, m_cur)
        # Guard fully-masked rows: exp(-inf - -inf) -> nan otherwise.
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        p = jnp.exp(logits - m_safe)
        p = jnp.where(jnp.isfinite(logits), p, 0.0)
        correction = jnp.exp(jnp.where(jnp.isfinite(m_prev), m_prev - m_safe, -jnp.inf))
        correction = jnp.where(jnp.isfinite(m_prev), correction, 0.0)
        l_new = l_prev * correction + jnp.sum(p, axis=-1, keepdims=True)
        # p in the input dtype rides the fast MXU path; acc stays fp32.
        acc = acc * correction + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    if causal:
        # Only K blocks at or before this Q block's diagonal contribute.
        num_relevant = jnp.minimum(
            num_k_blocks, (q_block_idx + 1) * block_q // block_k + 1
        )
    else:
        num_relevant = num_k_blocks

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_relevant, body, (acc0, m0, l0))

    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_fwd(q_bhnd, k_bhnd, v_bhnd, causal, block_q, block_k):
    """q/k/v: (BH, N, D) -> (BH, N, D)."""
    bh, n, d = q_bhnd.shape
    kv_len = k_bhnd.shape[1]
    block_q = min(block_q, n)
    block_k = min(block_k, kv_len)

    grid = (bh, pl.cdiv(n, block_q))
    kernel = functools.partial(_flash_fwd_kernel, block_k=block_k, causal=causal)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_len, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_len, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q_bhnd.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * n * kv_len * d,
            bytes_accessed=2 * bh * (n + 2 * kv_len) * d * q_bhnd.dtype.itemsize,
            transcendentals=bh * n * kv_len,
        ),
    )(q_bhnd, k_bhnd, v_bhnd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_attention(q, k, v, causal, block_q, block_k):
    b, n, h, d = q.shape
    kv_len = k.shape[1]
    qt = q.transpose(0, 2, 1, 3).reshape(b * h, n, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * h, kv_len, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * h, kv_len, d)
    out = _flash_fwd(qt, kt, vt, causal, block_q, block_k)
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)


def _flash_vjp_fwd(q, k, v, causal, block_q, block_k):
    return _flash_attention(q, k, v, causal, block_q, block_k), (q, k, v)


def _flash_vjp_bwd(causal, block_q, block_k, residuals, g):
    # Recompute-based backward (XLA attention); exact, O(N^2) memory but
    # only on the training path where sequences are short.
    from mr_blip_tpu.ops.attention import make_causal_mask, xla_attention

    q, k, v = residuals
    mask = make_causal_mask(q.shape[1]) if causal else None

    def f(q, k, v):
        return xla_attention(q, k, v, mask=mask)

    _, vjp = jax.vjp(f, q, k, v)
    return vjp(g)


_flash_attention.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def _flash_bias_kernel(q_ref, k_ref, v_ref, bias_ref, kvmask_ref, o_ref,
                       *, block_k: int):
    """Bias+mask variant, one (batch, head, q-block) program.

    bias_ref: (1, 1, block_q, M) additive logits bias (head-sliced);
    kvmask_ref: (1, 1, M) int8 K-side validity (batch-sliced; the leading
    singleton keeps the TPU block-shape rules happy).
    """
    q = q_ref[0, 0]  # (block_q, d)
    block_q, d = q.shape
    kv_len = k_ref.shape[2]
    q_scaled = q * jnp.asarray(d ** -0.5, q.dtype)
    num_k_blocks = pl.cdiv(kv_len, block_k)

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, 0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, 0, pl.ds(i * block_k, block_k), :]
        logits = jnp.dot(q_scaled, k.T, preferred_element_type=jnp.float32)
        logits += bias_ref[0, 0, :, pl.ds(i * block_k, block_k)].astype(jnp.float32)
        # 2-D load: Mosaic rejects 1-D vector intermediates
        valid = kvmask_ref[0, :, pl.ds(i * block_k, block_k)] != 0  # (1, bk)
        if kv_len % block_k:
            # pl.ds clamps the last partial block's start; mask the re-read
            # prefix so those K rows are not double-counted. Full-2D iota:
            # Mosaic can't sublane-broadcast a (1, bk) intermediate.
            k_pos = jnp.minimum(i * block_k, kv_len - block_k) + (
                jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            )
            valid = valid & (k_pos >= i * block_k)
        logits = jnp.where(valid, logits, -jnp.inf)

        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        p = jnp.exp(logits - m_safe)
        p = jnp.where(jnp.isfinite(logits), p, 0.0)
        correction = jnp.exp(jnp.where(jnp.isfinite(m_prev), m_prev - m_safe, -jnp.inf))
        correction = jnp.where(jnp.isfinite(m_prev), correction, 0.0)
        l_new = l_prev * correction + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * correction + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_k_blocks, body, (acc0, m0, l0))
    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _flash_attention_bias(q, k, v, bias, kv_mask, block_q, block_k):
    """q/k/v: (B, N|M, H, D); bias: (1, H, N, M); kv_mask: (B, M) int8."""
    b, n, h, d = q.shape
    m = k.shape[1]
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    block_q = min(block_q, n)
    block_k = min(block_k, m)
    grid = (b, h, pl.cdiv(n, block_q))
    kernel = functools.partial(_flash_bias_kernel, block_k=block_k)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, m), lambda bi, hi, qi: (0, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda bi, hi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda bi, hi, qi: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, n, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * m * d,
            bytes_accessed=2 * b * h * (n + 2 * m) * d * q.dtype.itemsize,
            transcendentals=b * h * n * m,
        ),
    )(qt, kt, vt, bias, kv_mask[:, None, :])
    return out.transpose(0, 2, 1, 3)


def _flash_bias_stats_kernel(q_ref, k_ref, v_ref, bias_ref, kvmask_ref,
                             o_ref, lse_ref, *, block_k: int):
    """Forward that additionally writes the row logsumexp (for backward)."""
    q = q_ref[0, 0]
    block_q, d = q.shape
    kv_len = k_ref.shape[2]
    q_scaled = q * jnp.asarray(d ** -0.5, q.dtype)
    num_k_blocks = pl.cdiv(kv_len, block_k)

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, 0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, 0, pl.ds(i * block_k, block_k), :]
        logits = jnp.dot(q_scaled, k.T, preferred_element_type=jnp.float32)
        logits += bias_ref[0, 0, :, pl.ds(i * block_k, block_k)].astype(jnp.float32)
        valid = kvmask_ref[0, :, pl.ds(i * block_k, block_k)] != 0
        if kv_len % block_k:
            # pl.ds clamps the last partial block's start; mask the re-read
            # prefix so those K rows are not double-counted. Full-2D iota:
            # Mosaic can't sublane-broadcast a (1, bk) intermediate.
            k_pos = jnp.minimum(i * block_k, kv_len - block_k) + (
                jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            )
            valid = valid & (k_pos >= i * block_k)
        logits = jnp.where(valid, logits, -jnp.inf)

        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        p = jnp.exp(logits - m_safe)
        p = jnp.where(jnp.isfinite(logits), p, 0.0)
        correction = jnp.exp(jnp.where(jnp.isfinite(m_prev), m_prev - m_safe, -jnp.inf))
        correction = jnp.where(jnp.isfinite(m_prev), correction, 0.0)
        l_new = l_prev * correction + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * correction + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_k_blocks, body, (acc0, m0, l0))
    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    lse_ref[0, 0] = (m_safe + jnp.log(jnp.maximum(l, 1e-30))).T  # (1, bq)


def _flash_bias_fwd_stats(qt, kt, vt, bias, kvmask, block_q, block_k):
    """qt/kt/vt: (B, H, N|M, D). Returns (out (B,H,N,D), lse (B,H,N))."""
    b, h, n, d = qt.shape
    m = kt.shape[2]
    grid = (b, h, pl.cdiv(n, block_q))
    kernel = functools.partial(_flash_bias_stats_kernel, block_k=block_k)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, m), lambda bi, hi, qi: (0, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda bi, hi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, block_q), lambda bi, hi, qi: (bi, hi, 0, qi),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, n, d), qt.dtype),
            jax.ShapeDtypeStruct((b, h, 1, n), jnp.float32),
        ),
    )(qt, kt, vt, bias, kvmask)


def _flash_bias_bwd_dq_kernel(q_ref, k_ref, v_ref, bias_ref, kvmask_ref,
                              do_ref, lse_ref, delta_ref, dq_ref,
                              *, block_k: int):
    """dq for one (b, h, q-block): stream K/V, recompute p from the saved
    logsumexp, ds = p * (dO v^T - delta), dq = ds k * scale."""
    q = q_ref[0, 0]
    block_q, d = q.shape
    kv_len = k_ref.shape[2]
    scale = jnp.asarray(d ** -0.5, jnp.float32)
    q_scaled = q * scale.astype(q.dtype)
    do = do_ref[0, 0]
    lse = lse_ref[0, 0].T                  # (bq, 1) fp32
    delta = delta_ref[0, 0].T              # (bq, 1) fp32
    num_k_blocks = pl.cdiv(kv_len, block_k)

    def body(i, dq_acc):
        k = k_ref[0, 0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, 0, pl.ds(i * block_k, block_k), :]
        logits = jnp.dot(q_scaled, k.T, preferred_element_type=jnp.float32)
        logits += bias_ref[0, 0, :, pl.ds(i * block_k, block_k)].astype(jnp.float32)
        valid = kvmask_ref[0, :, pl.ds(i * block_k, block_k)] != 0
        if kv_len % block_k:
            # pl.ds clamps the last partial block's start; mask the re-read
            # prefix so those K rows are not double-counted. Full-2D iota:
            # Mosaic can't sublane-broadcast a (1, bk) intermediate.
            k_pos = jnp.minimum(i * block_k, kv_len - block_k) + (
                jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            )
            valid = valid & (k_pos >= i * block_k)
        p = jnp.where(valid, jnp.exp(logits - lse), 0.0)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return dq_acc + jnp.dot(
            ds.astype(k.dtype), k, preferred_element_type=jnp.float32
        )

    dq = jax.lax.fori_loop(
        0, num_k_blocks, body, jnp.zeros((block_q, d), jnp.float32)
    )
    dq_ref[0, 0] = (dq * scale).astype(dq_ref.dtype)


def _flash_bias_bwd_dkv_kernel(q_ref, k_ref, v_ref, bias_ref, kvmask_ref,
                               do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
                               *, block_q: int):
    """dk/dv for one (b, h, k-block): stream Q blocks, recompute p^T."""
    k = k_ref[0, 0]
    block_k, d = k.shape
    n = q_ref.shape[2]
    scale = jnp.asarray(d ** -0.5, jnp.float32)
    valid = kvmask_ref[0, :, :] != 0       # (1, bk)
    num_q_blocks = pl.cdiv(n, block_q)

    def body(i, carry):
        dk_acc, dv_acc = carry
        q = q_ref[0, 0, pl.ds(i * block_q, block_q), :]
        do = do_ref[0, 0, pl.ds(i * block_q, block_q), :]
        lse = lse_ref[0, 0, :, pl.ds(i * block_q, block_q)].T    # (bq, 1)
        delta = delta_ref[0, 0, :, pl.ds(i * block_q, block_q)].T
        q_scaled = q * scale.astype(q.dtype)
        logits = jnp.dot(q_scaled, k.T, preferred_element_type=jnp.float32)
        logits += bias_ref[0, 0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        row_ok = valid
        if n % block_q:
            # mask Q rows re-read by the clamped last partial block
            q_pos = jnp.minimum(i * block_q, n - block_q) + (
                jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
            )
            row_ok = row_ok & (q_pos >= i * block_q)
        p = jnp.where(row_ok, jnp.exp(logits - lse), 0.0)  # (bq, bk)
        dv_acc = dv_acc + jnp.dot(
            p.T.astype(do.dtype), do, preferred_element_type=jnp.float32
        )
        dp = jnp.dot(do, v_ref[0, 0].T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dk_acc = dk_acc + jnp.dot(
            ds.T.astype(q.dtype), q, preferred_element_type=jnp.float32
        )
        return dk_acc, dv_acc

    zeros = jnp.zeros((block_k, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_q_blocks, body, (zeros, zeros))
    dk_ref[0, 0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _flash_bias_vjp_fwd(q, k, v, bias, kv_mask, block_q, block_k):
    b, n, h, d = q.shape
    m = k.shape[1]
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    bq = min(block_q, n)
    bk = min(block_k, m)
    out_t, lse = _flash_bias_fwd_stats(qt, kt, vt, bias, kv_mask[:, None, :], bq, bk)
    out = out_t.transpose(0, 2, 1, 3)
    return out, (q, k, v, bias, kv_mask, out, lse)


def _flash_bias_vjp_bwd(block_q, block_k, residuals, g):
    """Pallas two-pass backward: dq pass + dk/dv pass with recomputed p.

    The rel-pos bias gradient is NOT produced (returned as zeros): under the
    reference's LoRA training the relative_attention_bias embedding is
    frozen (blip2_mr.py:183-237 trains lora_a/lora_b only), so its gradient
    is discarded by the optimizer anyway. Full-finetuning of rel-pos biases
    requires the XLA attention backend (set MR_BLIP_ATTENTION_BACKEND=xla).
    """
    q, k, v, bias, kv_mask, out, lse = residuals
    b, n, h, d = q.shape
    m = k.shape[1]
    bq = min(block_q, n)
    bk = min(block_k, m)

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    got = g.transpose(0, 2, 1, 3)
    # delta = rowsum(dO * O) per (b, h, n) — cheap elementwise in XLA.
    delta = jnp.einsum(
        "bnhd,bnhd->bhn", g.astype(jnp.float32), out.astype(jnp.float32)
    )[:, :, None, :]  # (B, H, 1, N): lane-major rows for the kernels
    kvm = kv_mask[:, None, :]

    dq_t = pl.pallas_call(
        functools.partial(_flash_bias_bwd_dq_kernel, block_k=bk),
        grid=(b, h, pl.cdiv(n, bq)),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, m), lambda bi, hi, qi: (0, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda bi, hi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, bq), lambda bi, hi, qi: (bi, hi, 0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, bq), lambda bi, hi, qi: (bi, hi, 0, qi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, n, d), q.dtype),
    )(qt, kt, vt, bias, kvm, got, lse, delta)

    dk_t, dv_t = pl.pallas_call(
        functools.partial(_flash_bias_bwd_dkv_kernel, block_q=bq),
        grid=(b, h, pl.cdiv(m, bk)),
        in_specs=[
            pl.BlockSpec((1, 1, n, d), lambda bi, hi, ki: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, d), lambda bi, hi, ki: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, d), lambda bi, hi, ki: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n, bk), lambda bi, hi, ki: (0, hi, 0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk), lambda bi, hi, ki: (bi, 0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n, d), lambda bi, hi, ki: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, n), lambda bi, hi, ki: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, n), lambda bi, hi, ki: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, bk, d), lambda bi, hi, ki: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, d), lambda bi, hi, ki: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, m, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, m, d), v.dtype),
        ),
    )(qt, kt, vt, bias, kvm, got, lse, delta)

    dq = dq_t.transpose(0, 2, 1, 3)
    dk = dk_t.transpose(0, 2, 1, 3)
    dv = dv_t.transpose(0, 2, 1, 3)
    return dq, dk, dv, jnp.zeros_like(bias), None


_flash_attention_bias.defvjp(_flash_bias_vjp_fwd, _flash_bias_vjp_bwd)


def flash_attention_bias(q, k, v, bias, kv_mask=None,
                         block_q=DEFAULT_BLOCK_Q, block_k=DEFAULT_BLOCK_K):
    """Flash attention with an additive (1, H, N, M) bias and an optional
    (B, M) K-side validity mask — the T5-encoder shape (rel-pos bias +
    padding mask)."""
    b, n, h, d = q.shape
    m = k.shape[1]
    assert bias.shape[0] == 1 and bias.shape[1] == h
    if kv_mask is None:
        kv_mask = jnp.ones((b, m), jnp.int8)
    return _flash_attention_bias(
        q, k, v, bias, kv_mask.astype(jnp.int8), block_q, block_k
    )


def _qkv_packed_kernel(qkv_ref, o_ref, *, num_heads: int, head_dim: int):
    """Self-attention straight off the packed (rows, 3*H*D) QKV projection.

    One program per image: q/k/v and every head are sliced in VMEM, so the
    (B, N, 3HD) -> 3x(B, N, H, D) split/transpose copies never hit HBM.
    """
    blk = qkv_ref[0]
    hd = num_heads * head_dim
    scale = jnp.asarray(head_dim ** -0.5, blk.dtype)
    for h in range(num_heads):
        q = blk[:, h * head_dim:(h + 1) * head_dim] * scale
        k = blk[:, hd + h * head_dim:hd + (h + 1) * head_dim]
        v = blk[:, 2 * hd + h * head_dim:2 * hd + (h + 1) * head_dim]
        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[0, :, h * head_dim:(h + 1) * head_dim] = jnp.dot(
            p.astype(blk.dtype), v, preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _flash_qkv_packed(qkv, num_heads, head_dim):
    b, n, three_hd = qkv.shape
    kernel = functools.partial(
        _qkv_packed_kernel, num_heads=num_heads, head_dim=head_dim
    )
    hd = three_hd // 3
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, three_hd), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, hd), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, hd), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * n * hd,
            bytes_accessed=b * n * (three_hd + hd) * qkv.dtype.itemsize,
            transcendentals=b * n * n * num_heads,
        ),
    )(qkv)


def _qkv_packed_reference(qkv, num_heads, head_dim):
    hd = num_heads * head_dim
    q, k, v = qkv[..., :hd], qkv[..., hd:2 * hd], qkv[..., 2 * hd:]
    return _mha_reference(q, k, v, num_heads, head_dim)


def _qkv_vjp_fwd(qkv, num_heads, head_dim):
    return _flash_qkv_packed(qkv, num_heads, head_dim), qkv


def _qkv_vjp_bwd(num_heads, head_dim, qkv, g):
    _, vjp = jax.vjp(lambda q: _qkv_packed_reference(q, num_heads, head_dim), qkv)
    return vjp(g)


_flash_qkv_packed.defvjp(_qkv_vjp_fwd, _qkv_vjp_bwd)


def flash_attention_qkv_packed(qkv, num_heads: int):
    """Self-attention over the packed (B, N, 3*H*D) QKV tensor; the whole
    sequence must fit VMEM (N * 3HD * itemsize ≲ 4 MB — e.g. ViT's 257
    tokens at d=1408)."""
    b, n, three_hd = qkv.shape
    assert three_hd % (3 * num_heads) == 0
    return _flash_qkv_packed(qkv, num_heads, three_hd // (3 * num_heads))


def _mha_reference(q, k, v, num_heads, head_dim):
    from mr_blip_tpu.ops.attention import xla_attention

    b, n, hd = q.shape
    m = k.shape[1]
    out = xla_attention(
        q.reshape(b, n, num_heads, head_dim),
        k.reshape(b, m, num_heads, head_dim),
        v.reshape(b, m, num_heads, head_dim),
    )
    return out.reshape(b, n, hd)


def flash_attention(q, k, v, mask=None, causal=False,
                    block_q=DEFAULT_BLOCK_Q, block_k=DEFAULT_BLOCK_K):
    """Flash attention over (B, N, H, D) tensors.

    ``mask`` other than causal is not supported by the kernel; callers with
    padding masks use the XLA backend instead (the dispatcher in
    ``ops.attention`` enforces this).
    """
    if mask is not None:
        raise NotImplementedError(
            "flash_attention supports causal masking only; use xla_attention "
            "for arbitrary masks"
        )
    return _flash_attention(q, k, v, causal, block_q, block_k)
