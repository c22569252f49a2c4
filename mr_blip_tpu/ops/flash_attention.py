"""Pallas TPU flash attention (blockwise online-softmax).

Replaces the O(N^2)-memory attention for long sequences (T5 encoder over
~2k interleaved tokens, 60-frame batched ViT): logits never materialize in
HBM; each (q-block, k-block) tile streams through VMEM and the MXU with the
running-max/denominator rescaling trick.

Forward passes are Pallas kernels throughout. Backward: the bias/rel-pos
variants used on the training path (``flash_attention_bias``,
``flash_attention_relpos``) have full Pallas backward kernels — blockwise
dQ/dK/dV plus dbias/dtable reductions (see ``_flash_bias_bwd_*`` below);
only the plain no-bias variant falls back to recomputing with XLA
attention inside its ``jax.custom_vjp`` (it is used on no-grad inference
paths — generate/beam-search prefill — where the forward memory saving is
what matters).  Shapes are (B, N, H, D) like
:func:`mr_blip_tpu.ops.attention.xla_attention`.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 512


def _pad_axis(x, axis, mult, value=0.0):
    """Zero-(or value-)pad ``x`` along ``axis`` up to a multiple of ``mult``.

    The kernels in this file require block-divisible sequence lengths:
    in-kernel ``pl.ds`` slices do NOT clamp at the array edge on TPU
    hardware (they read tile-padding garbage — measured as
    nondeterministic NaNs at the T5 2049-token shape), and Mosaic rejects
    non-8/128-aligned dynamic starts, so boundary handling CANNOT live
    inside the kernel. Every wrapper pads instead; padded keys are masked
    via kv_mask (or an explicit tail mask) and padded query rows are
    neutralized with +inf logsumexp before being sliced away.
    """
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int,
                      causal: bool, kv_valid: int):
    """One (batch*head, q-block) program: stream K/V blocks, online softmax.

    Matmuls keep the input dtype (bf16 on the fast MXU path) with fp32
    accumulation via preferred_element_type; only the softmax statistics
    run in fp32.

    ``kv_valid``: the real (unpadded) key count — the wrapper pads K/V up
    to a block multiple (see _pad_axis: in-kernel pl.ds cannot handle the
    boundary on hardware) and the tail keys are masked here.
    """
    q = q_ref[0]  # (block_q, d), input dtype
    block_q, d = q.shape
    kv_len = k_ref.shape[1]
    assert kv_len % block_k == 0, "wrapper must pad kv to a block multiple"
    q_scaled = q * jnp.asarray(d ** -0.5, q.dtype)

    num_k_blocks = kv_len // block_k
    q_block_idx = pl.program_id(1)

    def body(i, carry):
        acc, m_prev, l_prev = carry
        start = i * block_k
        k = k_ref[0, pl.ds(start, block_k), :]
        v = v_ref[0, pl.ds(start, block_k), :]
        logits = jnp.dot(q_scaled, k.T,
                         preferred_element_type=jnp.float32)  # (bq, bk) fp32
        k_pos = start + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        if kv_valid != kv_len:
            logits = jnp.where(k_pos < kv_valid, logits, -jnp.inf)
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
    kv_valid = k_bhnd.shape[1]
    block_q = min(block_q, n)
    block_k = min(block_k, kv_valid)
    # pad K/V to a block multiple (tail keys masked in-kernel); q-side
    # partial blocks ride the grid BlockSpec boundary machinery, which IS
    # well-defined (unlike in-kernel pl.ds — see _pad_axis)
    k_bhnd = _pad_axis(k_bhnd, 1, block_k)
    v_bhnd = _pad_axis(v_bhnd, 1, block_k)
    kv_len = k_bhnd.shape[1]

    grid = (bh, pl.cdiv(n, block_q))
    kernel = functools.partial(_flash_fwd_kernel, block_k=block_k,
                               causal=causal, kv_valid=kv_valid)
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
                       *, block_k: int, tail: int = 0):
    """Bias+mask variant, one (batch, head, q-block) program.

    bias_ref: (1, 1, block_q, M) additive logits bias (head-sliced);
    kvmask_ref: (1, 1, M) int8 K-side validity (batch-sliced; the leading
    singleton keeps the TPU block-shape rules happy).

    ``tail``: static 128-aligned remainder of the key length. The wrapper
    pads keys only to a LANE multiple (128); the loop covers the
    ``block_k``-sized full blocks and one final ``tail``-sized block with a
    static start — so at the T5-encoder 2049-token shape the kernel touches
    2176 keys instead of a full-block-padded 2560 (~15% less MXU+VPU work;
    in-kernel ``pl.ds`` never overhangs, which it cannot do on hardware —
    see _pad_axis).
    """
    q = q_ref[0, 0]  # (block_q, d)
    block_q, d = q.shape
    kv_len = k_ref.shape[2]
    q_scaled = q * jnp.asarray(d ** -0.5, q.dtype)
    num_full = (kv_len - tail) // block_k

    def process(start, bk, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, 0, pl.ds(start, bk), :]
        v = v_ref[0, 0, pl.ds(start, bk), :]
        logits = jnp.dot(q_scaled, k.T, preferred_element_type=jnp.float32)
        logits += bias_ref[0, 0, :, pl.ds(start, bk)].astype(jnp.float32)
        # 2-D load: Mosaic rejects 1-D vector intermediates
        valid = kvmask_ref[0, :, pl.ds(start, bk)] != 0  # (1, bk)
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
    carry = jax.lax.fori_loop(
        0, num_full, lambda i, c: process(i * block_k, block_k, c),
        (acc0, m0, l0),
    )
    if tail:
        carry = process(num_full * block_k, tail, carry)
    acc, m, l = carry
    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_bias_kernel_mh(q_ref, k_ref, v_ref, bias_ref, kvmask_ref, o_ref,
                          *, block_k: int, block_h: int, tail: int = 0):
    """Head-blocked bias variant: one (head-block, q-block, batch) program
    runs ``block_h`` independent online-softmax chains. The per-head
    chains share no data, so Mosaic overlaps head h's VPU softmax with
    head h+1's MXU logits matmul — the same MXU<->VPU pipelining trick as
    the packed ViT kernel (flash_attention_qkv_packed), which is what the
    D=64 single-K-tile matmuls need to stop serializing against the
    softmax (measured numbers in docs/performance.md).

    ``tail``: static 128-aligned key-length remainder processed as one
    final static-start block (see _flash_bias_kernel).
    """
    kv_len = k_ref.shape[2]
    d = q_ref.shape[3]
    scale = jnp.asarray(d ** -0.5, jnp.float32)
    num_full = (kv_len - tail) // block_k
    q_scaled = [
        (q_ref[0, hh].astype(jnp.float32) * scale).astype(q_ref.dtype)
        for hh in range(block_h)
    ]

    def process(start, bk, carry):
        valid = kvmask_ref[0, :, pl.ds(start, bk)] != 0
        new = []
        for hh in range(block_h):
            acc, m_prev, l_prev = carry[hh]
            k = k_ref[0, hh, pl.ds(start, bk), :]
            v = v_ref[0, hh, pl.ds(start, bk), :]
            logits = jnp.dot(q_scaled[hh], k.T,
                             preferred_element_type=jnp.float32)
            logits += bias_ref[0, hh, :, pl.ds(start, bk)].astype(
                jnp.float32
            )
            logits = jnp.where(valid, logits, -jnp.inf)

            m_cur = jnp.max(logits, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
            p = jnp.exp(logits - m_safe)
            p = jnp.where(jnp.isfinite(logits), p, 0.0)
            correction = jnp.exp(
                jnp.where(jnp.isfinite(m_prev), m_prev - m_safe, -jnp.inf)
            )
            correction = jnp.where(jnp.isfinite(m_prev), correction, 0.0)
            l_new = l_prev * correction + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * correction + jnp.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            )
            new.append((acc, m_new, l_new))
        return tuple(new)

    block_q = q_ref.shape[2]
    init = tuple(
        (jnp.zeros((block_q, d), jnp.float32),
         jnp.full((block_q, 1), -jnp.inf, jnp.float32),
         jnp.zeros((block_q, 1), jnp.float32))
        for _ in range(block_h)
    )
    carry = jax.lax.fori_loop(
        0, num_full, lambda i, c: process(i * block_k, block_k, c), init
    )
    if tail:
        carry = process(num_full * block_k, tail, carry)
    for hh in range(block_h):
        acc, _m, l = carry[hh]
        o_ref[0, hh] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _choose_bias_blocks(m, d, block_q, block_k, block_h):
    """Shrink (block_q, block_h) until the bias-kernel scoped working set
    fits VMEM. Every in/out spec is double-buffered by Mosaic, and the
    kernel holds fp32 softmax scratch (p-matrix + accumulator). An earlier
    version omitted the scratch terms and overflowed by 72 KB at the
    (B4, H32, 2040, 2048) T5 encoder shape — a compile-time OOM on
    hardware, invisible to CPU CI (tests/test_attention.py locks this)."""

    def scoped_vmem(bq, bh):
        return (
            2 * bh * bq * m * 2              # bias, double-buffered
            + 2 * 2 * bh * m * d * 2         # K and V, double-buffered
            + 2 * 2 * bh * bq * d * 2        # q and out, double-buffered
            + 2 * bh * bq * min(block_k, m) * 4  # fp32 p/exp scratch
            + bh * bq * d * 4                # fp32 output accumulator
        )

    budget = 14 * 2 ** 20
    while block_q > 128 and scoped_vmem(block_q, block_h) > budget:
        block_q //= 2
    while block_h > 1 and scoped_vmem(block_q, block_h) > budget:
        block_h //= 2  # powers of two, so H-divisibility is preserved
    return block_q, block_h


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash_attention_bias(q, k, v, bias, kv_mask, block_q, block_k,
                          bias_grad, block_h=1):
    """q/k/v: (B, N|M, H, D); bias: (1, H, N, M); kv_mask: (B, M) int8.

    Grid order is (head, q-block, batch) with batch innermost: the bias
    block's index map is constant across batch, so Pallas keeps the tile
    resident in VMEM and the O(N*M) bias is fetched once per (h, q-block)
    instead of once per (b, h, q-block) — bias HBM traffic is the largest
    per-tile term (bq*M bytes vs m*d for K/V).

    ``block_h`` > 1 runs that many heads per program (independent chains
    Mosaic can pipeline across the MXU/VPU — see _flash_bias_kernel_mh);
    it must divide H and the bias block VMEM grows block_h-fold.
    """
    b, n, h, d = q.shape
    block_q = min(block_q, n)
    # Pad the key side only to a LANE multiple (128); padded keys carry
    # kv_mask=0 so the kernels -inf them out. The kernels process
    # ``m // block_k`` full blocks plus one static ``tail`` block of the
    # 128-aligned remainder — full-block padding (2049 -> 2560 at the T5
    # encoder shape) measured ~15% extra MXU+VPU work vs the tail block
    # (2049 -> 2176). In-kernel pl.ds never overhangs (it cannot on
    # hardware — see _pad_axis).
    k = _pad_axis(k, 1, 128)
    v = _pad_axis(v, 1, 128)
    bias = _pad_axis(bias, 3, 128)
    kv_mask = _pad_axis(kv_mask, 1, 128)
    m = k.shape[1]
    block_k = min(block_k, m)
    tail = m % block_k
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    if h % block_h:
        block_h = 1
    block_q, block_h = _choose_bias_blocks(m, d, block_q, block_k, block_h)
    grid = (h // block_h, pl.cdiv(n, block_q), b)
    if block_h > 1:
        kernel = functools.partial(_flash_bias_kernel_mh, block_k=block_k,
                                   block_h=block_h, tail=tail)
    else:
        kernel = functools.partial(_flash_bias_kernel, block_k=block_k,
                                   tail=tail)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_h, block_q, d),
                         lambda hi, qi, bi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_h, m, d), lambda hi, qi, bi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_h, m, d), lambda hi, qi, bi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_h, block_q, m),
                         lambda hi, qi, bi: (0, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda hi, qi, bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_h, block_q, d),
                               lambda hi, qi, bi: (bi, hi, qi, 0),
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
                             o_ref, lse_ref, *, block_k: int, tail: int = 0):
    """Forward that additionally writes the row logsumexp (for backward).

    ``tail``: static 128-aligned key remainder processed as one final
    static-start block (see _flash_bias_kernel) — keys pad to a lane
    multiple only, not a full block_k multiple."""
    q = q_ref[0, 0]
    block_q, d = q.shape
    kv_len = k_ref.shape[2]
    q_scaled = q * jnp.asarray(d ** -0.5, q.dtype)

    def process(start, bk, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, 0, pl.ds(start, bk), :]
        v = v_ref[0, 0, pl.ds(start, bk), :]
        logits = jnp.dot(q_scaled, k.T, preferred_element_type=jnp.float32)
        logits += bias_ref[0, 0, :, pl.ds(start, bk)].astype(jnp.float32)
        valid = kvmask_ref[0, :, pl.ds(start, bk)] != 0
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
    num_full = (kv_len - tail) // block_k
    carry = jax.lax.fori_loop(
        0, num_full, lambda i, c: process(i * block_k, block_k, c),
        (acc0, m0, l0),
    )
    if tail:
        carry = process(num_full * block_k, tail, carry)
    acc, m, l = carry
    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    lse_ref[0, 0] = (m_safe + jnp.log(jnp.maximum(l, 1e-30))).T  # (1, bq)


def _flash_bias_fwd_stats(qt, kt, vt, bias, kvmask, block_q, block_k,
                          tail=0):
    """qt/kt/vt: (B, H, N|M, D). Returns (out (B,H,N,D), lse (B,H,N))."""
    b, h, n, d = qt.shape
    m = kt.shape[2]
    grid = (h, pl.cdiv(n, block_q), b)  # batch innermost: bias tile reused
    kernel = functools.partial(_flash_bias_stats_kernel, block_k=block_k,
                               tail=tail)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda hi, qi, bi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m, d), lambda hi, qi, bi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m, d), lambda hi, qi, bi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, m), lambda hi, qi, bi: (0, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda hi, qi, bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q, d), lambda hi, qi, bi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, block_q), lambda hi, qi, bi: (bi, hi, 0, qi),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, n, d), qt.dtype),
            jax.ShapeDtypeStruct((b, h, 1, n), jnp.float32),
        ),
    )(qt, kt, vt, bias, kvmask)


def _flash_bias_bwd_dq_kernel(q_ref, k_ref, v_ref, bias_ref, kvmask_ref,
                              do_ref, lse_ref, delta_ref, dq_ref,
                              *, block_k: int, tail: int = 0):
    """dq for one (b, h, q-block): stream K/V, recompute p from the saved
    logsumexp, ds = p * (dO v^T - delta), dq = ds k * scale. ``tail``:
    static 128-aligned key remainder (see _flash_bias_kernel)."""
    q = q_ref[0, 0]
    block_q, d = q.shape
    kv_len = k_ref.shape[2]
    scale = jnp.asarray(d ** -0.5, jnp.float32)
    q_scaled = q * scale.astype(q.dtype)
    do = do_ref[0, 0]
    lse = lse_ref[0, 0].T                  # (bq, 1) fp32
    delta = delta_ref[0, 0].T              # (bq, 1) fp32

    def process(start, bk, dq_acc):
        k = k_ref[0, 0, pl.ds(start, bk), :]
        v = v_ref[0, 0, pl.ds(start, bk), :]
        logits = jnp.dot(q_scaled, k.T, preferred_element_type=jnp.float32)
        logits += bias_ref[0, 0, :, pl.ds(start, bk)].astype(jnp.float32)
        valid = kvmask_ref[0, :, pl.ds(start, bk)] != 0
        p = jnp.where(valid, jnp.exp(logits - lse), 0.0)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return dq_acc + jnp.dot(
            ds.astype(k.dtype), k, preferred_element_type=jnp.float32
        )

    num_full = (kv_len - tail) // block_k
    dq = jax.lax.fori_loop(
        0, num_full, lambda i, a: process(i * block_k, block_k, a),
        jnp.zeros((block_q, d), jnp.float32),
    )
    if tail:
        dq = process(num_full * block_k, tail, dq)
    dq_ref[0, 0] = (dq * scale).astype(dq_ref.dtype)


def _flash_bias_bwd_dq_dbias_kernel(q_ref, k_ref, v_ref, bias_ref, kvmask_ref,
                                    do_ref, lse_ref, delta_ref,
                                    dq_ref, dbias_ref, *, block_k: int,
                                    tail: int = 0):
    """dq + dbias for one (h, q-block, b) program.

    dbias[h, i, j] = sum_b ds[b, h, i, j]; with batch innermost in the grid
    the dbias block's index map is constant across b, so the block stays in
    VMEM and is accumulated in place (zeroed at b == 0, flushed after the
    last batch element).
    """
    q = q_ref[0, 0]
    block_q, d = q.shape
    kv_len = k_ref.shape[2]
    scale = jnp.asarray(d ** -0.5, jnp.float32)
    q_scaled = q * scale.astype(q.dtype)
    do = do_ref[0, 0]
    lse = lse_ref[0, 0].T                  # (bq, 1) fp32
    delta = delta_ref[0, 0].T              # (bq, 1) fp32
    bi = pl.program_id(2)

    @pl.when(bi == 0)
    def _():
        dbias_ref[0, 0] = jnp.zeros_like(dbias_ref[0, 0])

    def process(start, bk, dq_acc):
        k = k_ref[0, 0, pl.ds(start, bk), :]
        v = v_ref[0, 0, pl.ds(start, bk), :]
        logits = jnp.dot(q_scaled, k.T, preferred_element_type=jnp.float32)
        logits += bias_ref[0, 0, :, pl.ds(start, bk)].astype(jnp.float32)
        valid = kvmask_ref[0, :, pl.ds(start, bk)] != 0
        p = jnp.where(valid, jnp.exp(logits - lse), 0.0)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dbias_ref[0, 0, :, pl.ds(start, bk)] += ds.astype(dbias_ref.dtype)
        return dq_acc + jnp.dot(
            ds.astype(k.dtype), k, preferred_element_type=jnp.float32
        )

    num_full = (kv_len - tail) // block_k
    dq = jax.lax.fori_loop(
        0, num_full, lambda i, a: process(i * block_k, block_k, a),
        jnp.zeros((block_q, d), jnp.float32),
    )
    if tail:
        dq = process(num_full * block_k, tail, dq)
    dq_ref[0, 0] = (dq * scale).astype(dq_ref.dtype)


def _flash_bias_bwd_dkv_kernel(q_ref, k_ref, v_ref, bias_ref, kvmask_ref,
                               do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
                               *, block_q: int, q_tail: int = 0):
    """dk/dv for one (b, h, k-block): stream Q blocks, recompute p^T.

    ``q_tail``: static 128-aligned Q-length remainder processed as one
    final static-start block (queries pad to a lane multiple only; padded
    q rows carry lse=+1e30 so their p underflows to exactly 0)."""
    k = k_ref[0, 0]
    block_k, d = k.shape
    n = q_ref.shape[2]
    scale = jnp.asarray(d ** -0.5, jnp.float32)
    valid = kvmask_ref[0, :, :] != 0       # (1, bk)

    def process(start, bq, carry):
        dk_acc, dv_acc = carry
        q = q_ref[0, 0, pl.ds(start, bq), :]
        do = do_ref[0, 0, pl.ds(start, bq), :]
        lse = lse_ref[0, 0, :, pl.ds(start, bq)].T    # (bq, 1)
        delta = delta_ref[0, 0, :, pl.ds(start, bq)].T
        q_scaled = q * scale.astype(q.dtype)
        logits = jnp.dot(q_scaled, k.T, preferred_element_type=jnp.float32)
        logits += bias_ref[0, 0, pl.ds(start, bq), :].astype(jnp.float32)
        p = jnp.where(valid, jnp.exp(logits - lse), 0.0)  # (bq, bk)
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
    num_full = (n - q_tail) // block_q
    dk, dv = jax.lax.fori_loop(
        0, num_full, lambda i, c: process(i * block_q, block_q, c),
        (zeros, zeros),
    )
    if q_tail:
        dk, dv = process(num_full * block_q, q_tail, (dk, dv))
    dk_ref[0, 0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _flash_bias_vjp_fwd(q, k, v, bias, kv_mask, block_q, block_k, bias_grad,
                        block_h=1):
    # block_h only shapes the no-grad forward; the stats/backward kernels
    # keep their single-head grids.
    b, n, h, d = q.shape
    bq = min(block_q, n)
    # key side padded to a LANE multiple (128) only; the kernel runs full
    # block_k blocks plus one static tail block (see _flash_bias_kernel).
    # Padded keys carry kv_mask=0. Residuals keep the UNPADDED tensors.
    kp = _pad_axis(k, 1, 128)
    vp = _pad_axis(v, 1, 128)
    biasp = _pad_axis(bias, 3, 128)
    kvmp = _pad_axis(kv_mask, 1, 128)
    bk = min(block_k, kp.shape[1])
    tail = kp.shape[1] % bk
    qt = q.transpose(0, 2, 1, 3)
    kt = kp.transpose(0, 2, 1, 3)
    vt = vp.transpose(0, 2, 1, 3)
    out_t, lse = _flash_bias_fwd_stats(qt, kt, vt, biasp, kvmp[:, None, :],
                                       bq, bk, tail)
    out = out_t.transpose(0, 2, 1, 3)
    return out, (q, k, v, bias, kv_mask, out, lse)


def _flash_bias_vjp_bwd(block_q, block_k, bias_grad, block_h, residuals, g):
    """Pallas two-pass backward: dq pass + dk/dv pass with recomputed p.

    When ``bias_grad`` the dq pass additionally accumulates
    dbias = sum_b ds into a (1, H, N, M) fp32 output (batch innermost in
    the grid, block accumulated in VMEM). When not set it is skipped and
    zeros are returned: under the reference's LoRA training the
    relative_attention_bias embedding is frozen (blip2_mr.py:183-237
    trains lora_a/lora_b only), so its gradient is discarded by the
    optimizer anyway and the O(H*N*M) fp32 buffer is pure waste.
    """
    q, k, v, bias, kv_mask, out, lse = residuals
    b, n_real, h, d = q.shape
    m_real = k.shape[1]
    bq = min(block_q, n_real)
    if bias_grad and bq * m_real * 4 > 4 * 2 ** 20:
        # dbias fp32 output block (bq, m) rides VMEM next to the bias block;
        # shrink the q-block to keep the working set under the VMEM budget.
        bq = max(128, bq // 2)

    # Pad BOTH sides to LANE multiples (128) — the kernels run full
    # blocks plus one static tail block each way (see _flash_bias_kernel).
    # Padded keys carry kv_mask=0; padded query rows carry lse=+big so
    # the recomputed p = exp(logits - lse) underflows to exactly 0,
    # zeroing their ds.
    k = _pad_axis(k, 1, 128)
    v = _pad_axis(v, 1, 128)
    bias = _pad_axis(_pad_axis(bias, 3, 128), 2, 128)
    kvm_p = _pad_axis(kv_mask, 1, 128)
    qp = _pad_axis(q, 1, 128)
    gp = _pad_axis(g, 1, 128)
    outp = _pad_axis(out, 1, 128)
    lse = _pad_axis(lse, 3, 128, value=1e30)  # (B, H, 1, N)
    n = qp.shape[1]
    m = k.shape[1]
    bk = min(block_k, m)
    bq = min(bq, n)
    kv_tail = m % bk
    q_tail = n % bq

    qt = qp.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    got = gp.transpose(0, 2, 1, 3)
    # delta = rowsum(dO * O) per (b, h, n) — cheap elementwise in XLA.
    delta = jnp.einsum(
        "bnhd,bnhd->bhn", gp.astype(jnp.float32), outp.astype(jnp.float32)
    )[:, :, None, :]  # (B, H, 1, N): lane-major rows for the kernels
    kvm = kvm_p[:, None, :]

    dq_in_specs = [
        pl.BlockSpec((1, 1, bq, d), lambda hi, qi, bi: (bi, hi, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, m, d), lambda hi, qi, bi: (bi, hi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, m, d), lambda hi, qi, bi: (bi, hi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bq, m), lambda hi, qi, bi: (0, hi, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, m), lambda hi, qi, bi: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bq, d), lambda hi, qi, bi: (bi, hi, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, bq), lambda hi, qi, bi: (bi, hi, 0, qi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, bq), lambda hi, qi, bi: (bi, hi, 0, qi),
                     memory_space=pltpu.VMEM),
    ]
    dq_out_spec = pl.BlockSpec((1, 1, bq, d), lambda hi, qi, bi: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM)
    if bias_grad:
        dq_t, dbias = pl.pallas_call(
            functools.partial(_flash_bias_bwd_dq_dbias_kernel, block_k=bk,
                              tail=kv_tail),
            grid=(h, pl.cdiv(n, bq), b),
            in_specs=dq_in_specs,
            out_specs=(
                dq_out_spec,
                pl.BlockSpec((1, 1, bq, m), lambda hi, qi, bi: (0, hi, qi, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b, h, n, d), q.dtype),
                jax.ShapeDtypeStruct((1, h, n, m), jnp.float32),
            ),
        )(qt, kt, vt, bias, kvm, got, lse, delta)
        dbias = dbias[:, :, :n_real, :m_real].astype(bias.dtype)
    else:
        dq_t = pl.pallas_call(
            functools.partial(_flash_bias_bwd_dq_kernel, block_k=bk,
                              tail=kv_tail),
            grid=(h, pl.cdiv(n, bq), b),
            in_specs=dq_in_specs,
            out_specs=dq_out_spec,
            out_shape=jax.ShapeDtypeStruct((b, h, n, d), q.dtype),
        )(qt, kt, vt, bias, kvm, got, lse, delta)
        dbias = jnp.zeros((1, h, n_real, m_real), bias.dtype)

    dk_t, dv_t = pl.pallas_call(
        functools.partial(_flash_bias_bwd_dkv_kernel, block_q=bq,
                          q_tail=q_tail),
        grid=(h, pl.cdiv(m, bk), b),
        in_specs=[
            pl.BlockSpec((1, 1, n, d), lambda hi, ki, bi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, d), lambda hi, ki, bi: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, d), lambda hi, ki, bi: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n, bk), lambda hi, ki, bi: (0, hi, 0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk), lambda hi, ki, bi: (bi, 0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n, d), lambda hi, ki, bi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, n), lambda hi, ki, bi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, n), lambda hi, ki, bi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, bk, d), lambda hi, ki, bi: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, d), lambda hi, ki, bi: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, m, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, m, d), v.dtype),
        ),
    )(qt, kt, vt, bias, kvm, got, lse, delta)

    dq = dq_t.transpose(0, 2, 1, 3)[:, :n_real]
    dk = dk_t.transpose(0, 2, 1, 3)[:, :m_real]
    dv = dv_t.transpose(0, 2, 1, 3)[:, :m_real]
    return dq, dk, dv, dbias, None


_flash_attention_bias.defvjp(_flash_bias_vjp_fwd, _flash_bias_vjp_bwd)


def flash_attention_bias(q, k, v, bias, kv_mask=None,
                         block_q=DEFAULT_BLOCK_Q, block_k=DEFAULT_BLOCK_K,
                         bias_grad=False, block_h=1):
    """Flash attention with an additive (1, H, N, M) bias and an optional
    (B, M) K-side validity mask — the T5-encoder shape (rel-pos bias +
    padding mask).

    ``bias_grad`` (static) makes the backward pass emit the true dbias
    (needed when the rel-pos embedding itself is trained, i.e. full
    finetuning); off by default because it materializes an O(H*N*M) fp32
    buffer that LoRA training (frozen bias, reference blip2_mr.py:183-237)
    never reads.
    """
    b, n, h, d = q.shape
    m = k.shape[1]
    assert bias.shape[0] == 1 and bias.shape[1] == h
    if kv_mask is None:
        kv_mask = jnp.ones((b, m), jnp.int8)
    return _flash_attention_bias(
        q, k, v, bias, kv_mask.astype(jnp.int8), block_q, block_k,
        bool(bias_grad), int(block_h)
    )


# ---------------------------------------------------------------------------
# In-kernel T5 relative-position bias ("relpos" kernels).
#
# For long sequences the materialized (1, H, N, M) bias is the dominant HBM
# cost of encoder attention (O(N^2 * H) bytes — 4 GB at N=8192 bf16) and an
# O(N^2) memory footprint that caps context length. These kernels never
# materialize it: the bias is computed from the (num_buckets, H) embedding
# table inside the kernel. The T5 bucket function is CONSTANT for
# |rel| >= max_distance (see ops/relpos.py), so the K loop is split into
# three segments — far-past (scalar bias), near-diagonal (exact per-element
# buckets via a num_buckets-way select), far-future (scalar bias). Only
# O(N / block) tiles pay the select cost; everything else adds a scalar.
# Bidirectional (encoder) flavor only — the causal decoder path is short
# (span strings) and keeps the XLA backend.
# ---------------------------------------------------------------------------


def _relpos_bias_tile(tab_ref, head, q_start, k_start, shape, *, nb, maxd):
    """fp32 (bq, bk) bias tile = table[bucket(k_pos - q_pos), head].

    Bucket math must match ops.relpos.relative_position_bucket bit-for-bit
    (bidirectional flavor), including the 1e-6 epsilon inside the log.
    """
    ri = q_start + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    ci = k_start + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    rel = ci - ri  # key - query
    num_b = nb // 2
    ret = (rel > 0).astype(jnp.int32) * num_b  # n = -rel < 0
    nrel = jnp.abs(rel)
    max_exact = num_b // 2
    val_if_large = max_exact + (
        jnp.log(nrel.astype(jnp.float32) / max_exact + 1e-6)
        / math.log(maxd / max_exact) * (num_b - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_b - 1)
    bucket = ret + jnp.where(nrel < max_exact, nrel, val_if_large)
    bias = jnp.zeros(shape, jnp.float32)
    for u in range(nb):
        bias = jnp.where(bucket == u, tab_ref[head, u], bias)
    return bias


def _relpos_segments(q_start, block_q, block_k, kv_len, num_k_blocks, maxd):
    """K-block loop bounds: [0, lo) far-past, [lo, hi) near, [hi, nkb) far-future."""
    # far-past: whole tile has rel <= -maxd, i.e. i*bk + bk-1 - q_start <= -maxd
    lo = (q_start - maxd - block_k + 1) // block_k + 1
    lo = jnp.clip(lo, 0, num_k_blocks)
    # far-future: whole tile has rel >= maxd, i.e. i*bk - (q_start + bq - 1) >= maxd
    hi = -((q_start + block_q - 1 + maxd) // -block_k)  # ceil div
    hi = jnp.clip(hi, lo, num_k_blocks)
    return lo, hi


def _flash_relpos_stats_kernel(q_ref, k_ref, v_ref, tab_ref, kvmask_ref,
                               o_ref, lse_ref, *, block_k, nb, maxd):
    q = q_ref[0, 0]
    block_q, d = q.shape
    kv_len = k_ref.shape[2]
    q_scaled = q * jnp.asarray(d ** -0.5, q.dtype)
    num_k_blocks = pl.cdiv(kv_len, block_k)
    head = pl.program_id(0)
    qi = pl.program_id(1)
    q_start = qi * block_q
    num_b = nb // 2
    far_past = tab_ref[head, num_b - 1]
    far_future = tab_ref[head, nb - 1]
    lo, hi = _relpos_segments(q_start, block_q, block_k, kv_len,
                              num_k_blocks, maxd)

    def make_body(mode):
        def body(i, carry):
            acc, m_prev, l_prev = carry
            # explicit start clamp: pl.ds does NOT clamp on hardware (OOB
            # slices read tile-pad garbage — see _flash_fwd_kernel); the
            # bias tile uses the same clamped key positions so columns
            # line up with the rows actually loaded.
            k_start = (jnp.minimum(i * block_k, kv_len - block_k)
                       if kv_len % block_k else i * block_k)
            k = k_ref[0, 0, pl.ds(k_start, block_k), :]
            v = v_ref[0, 0, pl.ds(k_start, block_k), :]
            logits = jnp.dot(q_scaled, k.T, preferred_element_type=jnp.float32)
            if mode == "near":
                logits += _relpos_bias_tile(
                    tab_ref, head, q_start, k_start, logits.shape,
                    nb=nb, maxd=maxd,
                )
            elif mode == "past":
                logits += far_past
            else:
                logits += far_future
            valid = kvmask_ref[0, :, pl.ds(k_start, block_k)] != 0
            if kv_len % block_k:
                # mask the re-read prefix so those K rows are not
                # double-counted.
                k_pos = k_start + (
                    jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
                )
                valid = valid & (k_pos >= i * block_k)
            logits = jnp.where(valid, logits, -jnp.inf)

            m_cur = jnp.max(logits, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
            p = jnp.exp(logits - m_safe)
            p = jnp.where(jnp.isfinite(logits), p, 0.0)
            correction = jnp.exp(
                jnp.where(jnp.isfinite(m_prev), m_prev - m_safe, -jnp.inf))
            correction = jnp.where(jnp.isfinite(m_prev), correction, 0.0)
            l_new = l_prev * correction + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * correction + jnp.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            )
            return acc, m_new, l_new
        return body

    carry = (
        jnp.zeros((block_q, d), jnp.float32),
        jnp.full((block_q, 1), -jnp.inf, jnp.float32),
        jnp.zeros((block_q, 1), jnp.float32),
    )
    carry = jax.lax.fori_loop(0, lo, make_body("past"), carry)
    carry = jax.lax.fori_loop(lo, hi, make_body("near"), carry)
    carry = jax.lax.fori_loop(hi, num_k_blocks, make_body("future"), carry)
    acc, m, l = carry
    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    lse_ref[0, 0] = (m_safe + jnp.log(jnp.maximum(l, 1e-30))).T


def _flash_relpos_fwd_stats(qt, kt, vt, table, kvmask, block_q, block_k,
                            nb, maxd):
    b, h, n, d = qt.shape
    m = kt.shape[2]
    grid = (h, pl.cdiv(n, block_q), b)
    kernel = functools.partial(
        _flash_relpos_stats_kernel, block_k=block_k, nb=nb, maxd=maxd)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda hi, qi, bi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m, d), lambda hi, qi, bi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m, d), lambda hi, qi, bi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, m), lambda hi, qi, bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q, d), lambda hi, qi, bi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, block_q), lambda hi, qi, bi: (bi, hi, 0, qi),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, n, d), qt.dtype),
            jax.ShapeDtypeStruct((b, h, 1, n), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * m * d,
            bytes_accessed=2 * b * h * (n + 2 * m) * d * qt.dtype.itemsize,
            transcendentals=b * h * n * m,
        ),
    )(qt, kt, vt, table, kvmask)


def _relpos_bucket_tile(q_start, k_start, shape, *, nb, maxd):
    """(bq, bk) int32 bucket ids (bidirectional) — shared by the bias tile
    and the dtable reduction."""
    ri = q_start + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    ci = k_start + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    rel = ci - ri
    num_b = nb // 2
    ret = (rel > 0).astype(jnp.int32) * num_b
    nrel = jnp.abs(rel)
    max_exact = num_b // 2
    val_if_large = max_exact + (
        jnp.log(nrel.astype(jnp.float32) / max_exact + 1e-6)
        / math.log(maxd / max_exact) * (num_b - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_b - 1)
    return ret + jnp.where(nrel < max_exact, nrel, val_if_large)


def _flash_relpos_bwd_dq_dtab_kernel(q_ref, k_ref, v_ref, tab_ref, kvmask_ref,
                                     do_ref, lse_ref, delta_ref,
                                     dq_ref, dtab_ref, *, block_k, nb, maxd):
    """dq + dtable for one (h, q-block, b) program.

    dtable[u] = sum of ds over every (i, j) with bucket(j - i) == u. The
    (8, 128) output block's index map is constant across (q-block, batch)
    — the two inner grid dims — so it accumulates in VMEM; bucket u lives
    at [u % 8, u // 8]. Far segments contribute to the two capped buckets
    with a single whole-tile reduction; near tiles pay an nb-way masked
    reduction (O(N/block) of them).
    """
    q = q_ref[0, 0]
    block_q, d = q.shape
    kv_len = k_ref.shape[2]
    scale = jnp.asarray(d ** -0.5, jnp.float32)
    q_scaled = q * scale.astype(q.dtype)
    do = do_ref[0, 0]
    lse = lse_ref[0, 0].T
    delta = delta_ref[0, 0].T
    num_k_blocks = pl.cdiv(kv_len, block_k)
    head = pl.program_id(0)
    qi = pl.program_id(1)
    bi = pl.program_id(2)
    q_start = qi * block_q
    num_b = nb // 2
    far_past = tab_ref[head, num_b - 1]
    far_future = tab_ref[head, nb - 1]
    lo, hi = _relpos_segments(q_start, block_q, block_k, kv_len,
                              num_k_blocks, maxd)

    @pl.when((qi == 0) & (bi == 0))
    def _():
        dtab_ref[0] = jnp.zeros_like(dtab_ref[0])

    def slot(u):
        # one-hot from iota comparisons (Pallas rejects captured array
        # constants and Mosaic has no scatter)
        r = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        return ((r == u % 8) & (c == u // 8)).astype(jnp.float32)

    def make_body(mode):
        def body(i, carry):
            dq_acc, dtab_acc = carry
            # explicit start clamp: pl.ds does NOT clamp on hardware
            k_start = (jnp.minimum(i * block_k, kv_len - block_k)
                       if kv_len % block_k else i * block_k)
            k = k_ref[0, 0, pl.ds(k_start, block_k), :]
            v = v_ref[0, 0, pl.ds(k_start, block_k), :]
            logits = jnp.dot(q_scaled, k.T, preferred_element_type=jnp.float32)
            bucket = None
            if mode == "near":
                bucket = _relpos_bucket_tile(
                    q_start, k_start, logits.shape, nb=nb, maxd=maxd
                )
                bias = jnp.zeros(logits.shape, jnp.float32)
                for u in range(nb):
                    bias = jnp.where(bucket == u, tab_ref[head, u], bias)
                logits += bias
            elif mode == "past":
                logits += far_past
            else:
                logits += far_future
            valid = kvmask_ref[0, :, pl.ds(k_start, block_k)] != 0
            if kv_len % block_k:
                k_pos = k_start + (
                    jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
                )
                valid = valid & (k_pos >= i * block_k)
            p = jnp.where(valid, jnp.exp(logits - lse), 0.0)
            dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
            ds = p * (dp - delta)
            ds_tab = ds
            if kv_len % block_q:
                # padded q-tail rows (q blocks come via BlockSpec padding)
                # must not leak into the accumulated table gradient;
                # q_len == kv_len on this self-attention-only path.
                q_pos = q_start + jax.lax.broadcasted_iota(
                    jnp.int32, ds.shape, 0
                )
                ds_tab = jnp.where(q_pos < kv_len, ds, 0.0)
            if mode == "near":
                for u in range(nb):
                    s_u = jnp.sum(jnp.where(bucket == u, ds_tab, 0.0))
                    dtab_acc = dtab_acc + s_u * slot(u)
            elif mode == "past":
                dtab_acc = dtab_acc + jnp.sum(ds_tab) * slot(num_b - 1)
            else:
                dtab_acc = dtab_acc + jnp.sum(ds_tab) * slot(nb - 1)
            dq_acc = dq_acc + jnp.dot(
                ds.astype(k.dtype), k, preferred_element_type=jnp.float32
            )
            return dq_acc, dtab_acc
        return body

    carry = (jnp.zeros((block_q, d), jnp.float32),
             jnp.zeros((8, 128), jnp.float32))
    carry = jax.lax.fori_loop(0, lo, make_body("past"), carry)
    carry = jax.lax.fori_loop(lo, hi, make_body("near"), carry)
    carry = jax.lax.fori_loop(hi, num_k_blocks, make_body("future"), carry)
    dq, dtab = carry
    dq_ref[0, 0] = (dq * scale).astype(dq_ref.dtype)
    dtab_ref[0] += dtab


def _flash_relpos_bwd_dq_kernel(q_ref, k_ref, v_ref, tab_ref, kvmask_ref,
                                do_ref, lse_ref, delta_ref, dq_ref,
                                *, block_k, nb, maxd):
    q = q_ref[0, 0]
    block_q, d = q.shape
    kv_len = k_ref.shape[2]
    scale = jnp.asarray(d ** -0.5, jnp.float32)
    q_scaled = q * scale.astype(q.dtype)
    do = do_ref[0, 0]
    lse = lse_ref[0, 0].T
    delta = delta_ref[0, 0].T
    num_k_blocks = pl.cdiv(kv_len, block_k)
    head = pl.program_id(0)
    qi = pl.program_id(1)
    q_start = qi * block_q
    num_b = nb // 2
    far_past = tab_ref[head, num_b - 1]
    far_future = tab_ref[head, nb - 1]
    lo, hi = _relpos_segments(q_start, block_q, block_k, kv_len,
                              num_k_blocks, maxd)

    def make_body(mode):
        def body(i, dq_acc):
            # explicit start clamp: pl.ds does NOT clamp on hardware
            k_start = (jnp.minimum(i * block_k, kv_len - block_k)
                       if kv_len % block_k else i * block_k)
            k = k_ref[0, 0, pl.ds(k_start, block_k), :]
            v = v_ref[0, 0, pl.ds(k_start, block_k), :]
            logits = jnp.dot(q_scaled, k.T, preferred_element_type=jnp.float32)
            if mode == "near":
                logits += _relpos_bias_tile(
                    tab_ref, head, q_start, k_start, logits.shape,
                    nb=nb, maxd=maxd,
                )
            elif mode == "past":
                logits += far_past
            else:
                logits += far_future
            valid = kvmask_ref[0, :, pl.ds(k_start, block_k)] != 0
            if kv_len % block_k:
                k_pos = k_start + (
                    jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
                )
                valid = valid & (k_pos >= i * block_k)
            p = jnp.where(valid, jnp.exp(logits - lse), 0.0)
            dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
            ds = p * (dp - delta)
            return dq_acc + jnp.dot(
                ds.astype(k.dtype), k, preferred_element_type=jnp.float32
            )
        return body

    dq = jnp.zeros((block_q, d), jnp.float32)
    dq = jax.lax.fori_loop(0, lo, make_body("past"), dq)
    dq = jax.lax.fori_loop(lo, hi, make_body("near"), dq)
    dq = jax.lax.fori_loop(hi, num_k_blocks, make_body("future"), dq)
    dq_ref[0, 0] = (dq * scale).astype(dq_ref.dtype)


def _flash_relpos_bwd_dkv_kernel(q_ref, k_ref, v_ref, tab_ref, kvmask_ref,
                                 do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
                                 *, block_q, nb, maxd):
    k = k_ref[0, 0]
    block_k, d = k.shape
    n = q_ref.shape[2]
    scale = jnp.asarray(d ** -0.5, jnp.float32)
    valid_k = kvmask_ref[0, :, :] != 0  # (1, bk)
    num_q_blocks = pl.cdiv(n, block_q)
    head = pl.program_id(0)
    ki = pl.program_id(1)
    k_start = ki * block_k
    num_b = nb // 2
    far_past = tab_ref[head, num_b - 1]     # rel = k - q <= -maxd (late q)
    far_future = tab_ref[head, nb - 1]      # rel >= maxd (early q)
    # Segments over Q blocks: [0, lo) all-future bias, [lo, hi) near,
    # [hi, nqb) all-past bias (q far after k).
    lo = (k_start - maxd - block_q + 1) // block_q + 1
    lo = jnp.clip(lo, 0, num_q_blocks)
    hi = -((k_start + block_k - 1 + maxd) // -block_q)
    hi = jnp.clip(hi, lo, num_q_blocks)

    def make_body(mode):
        def body(i, carry):
            dk_acc, dv_acc = carry
            # explicit start clamp: pl.ds does NOT clamp on hardware
            q_blk_start = (jnp.minimum(i * block_q, n - block_q)
                           if n % block_q else i * block_q)
            q = q_ref[0, 0, pl.ds(q_blk_start, block_q), :]
            do = do_ref[0, 0, pl.ds(q_blk_start, block_q), :]
            lse = lse_ref[0, 0, :, pl.ds(q_blk_start, block_q)].T
            delta = delta_ref[0, 0, :, pl.ds(q_blk_start, block_q)].T
            q_scaled = q * scale.astype(q.dtype)
            logits = jnp.dot(q_scaled, k.T, preferred_element_type=jnp.float32)
            if mode == "near":
                logits += _relpos_bias_tile(
                    tab_ref, head, q_blk_start, k_start, logits.shape,
                    nb=nb, maxd=maxd,
                )
            elif mode == "future":
                logits += far_future
            else:
                logits += far_past
            row_ok = valid_k
            if n % block_q:
                q_pos = q_blk_start + (
                    jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
                )
                row_ok = row_ok & (q_pos >= i * block_q)
            p = jnp.where(row_ok, jnp.exp(logits - lse), 0.0)
            dv_acc = dv_acc + jnp.dot(
                p.T.astype(do.dtype), do, preferred_element_type=jnp.float32
            )
            dp = jnp.dot(do, v_ref[0, 0].T, preferred_element_type=jnp.float32)
            ds = p * (dp - delta)
            dk_acc = dk_acc + jnp.dot(
                ds.T.astype(q.dtype), q, preferred_element_type=jnp.float32
            )
            return dk_acc, dv_acc
        return body

    zeros = jnp.zeros((block_k, d), jnp.float32)
    carry = (zeros, zeros)
    carry = jax.lax.fori_loop(0, lo, make_body("future"), carry)
    carry = jax.lax.fori_loop(lo, hi, make_body("near"), carry)
    carry = jax.lax.fori_loop(hi, num_q_blocks, make_body("past"), carry)
    dk, dv = carry
    dk_ref[0, 0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _flash_attention_relpos(q, k, v, table, kv_mask, num_buckets,
                            max_distance, block_q, block_k, table_grad):
    b, n, h, d = q.shape
    bk = min(block_k, k.shape[1])
    # key side padded to a block multiple; padded keys carry kv_mask=0
    # (in-kernel pl.ds cannot handle boundaries on hardware — _pad_axis)
    kp = _pad_axis(k, 1, bk)
    vp = _pad_axis(v, 1, bk)
    kvmp = _pad_axis(kv_mask, 1, bk)
    qt = q.transpose(0, 2, 1, 3)
    kt = kp.transpose(0, 2, 1, 3)
    vt = vp.transpose(0, 2, 1, 3)
    out, _ = _flash_relpos_fwd_stats(
        qt, kt, vt, table, kvmp[:, None, :],
        min(block_q, n), bk, num_buckets, max_distance,
    )
    return out.transpose(0, 2, 1, 3)


def _flash_relpos_vjp_fwd(q, k, v, table, kv_mask, num_buckets, max_distance,
                          block_q, block_k, table_grad):
    b, n, h, d = q.shape
    bk = min(block_k, k.shape[1])
    kp = _pad_axis(k, 1, bk)
    vp = _pad_axis(v, 1, bk)
    kvmp = _pad_axis(kv_mask, 1, bk)
    qt = q.transpose(0, 2, 1, 3)
    kt = kp.transpose(0, 2, 1, 3)
    vt = vp.transpose(0, 2, 1, 3)
    out_t, lse = _flash_relpos_fwd_stats(
        qt, kt, vt, table, kvmp[:, None, :],
        min(block_q, n), bk, num_buckets, max_distance,
    )
    out = out_t.transpose(0, 2, 1, 3)
    return out, (q, k, v, table, kv_mask, out, lse)


def _flash_relpos_vjp_bwd(num_buckets, max_distance, block_q, block_k,
                          table_grad, residuals, g):
    """dq/dk/dv with the bias recomputed in-kernel.

    ``table_grad`` additionally accumulates dtable inside the dq pass
    (per-bucket masked reductions over the near tiles, whole-tile sums for
    the two capped far buckets) — full finetuning of the rel-pos embedding
    works on the long-context path too. Off by default: under the
    reference's LoRA training the embedding is frozen
    (blip2_mr.py:183-237)."""
    q, k, v, table, kv_mask, out, lse = residuals
    b, n_real, h, d = q.shape
    m_real = k.shape[1]
    bq = min(block_q, n_real)
    bk = min(block_k, m_real)

    # pad both sides to block multiples (see _flash_bias_vjp_bwd): padded
    # keys carry kv_mask=0, padded query rows carry lse=+big so their
    # recomputed p underflows to 0.
    kp = _pad_axis(k, 1, bk)
    vp = _pad_axis(v, 1, bk)
    kvm_p = _pad_axis(kv_mask, 1, bk)
    qp = _pad_axis(q, 1, bq)
    gp = _pad_axis(g, 1, bq)
    outp = _pad_axis(out, 1, bq)
    lse = _pad_axis(lse, 3, bq, value=1e30)
    n = qp.shape[1]
    m = kp.shape[1]

    qt = qp.transpose(0, 2, 1, 3)
    kt = kp.transpose(0, 2, 1, 3)
    vt = vp.transpose(0, 2, 1, 3)
    got = gp.transpose(0, 2, 1, 3)
    delta = jnp.einsum(
        "bnhd,bnhd->bhn", gp.astype(jnp.float32), outp.astype(jnp.float32)
    )[:, :, None, :]
    kvm = kvm_p[:, None, :]

    dq_in_specs = [
        pl.BlockSpec((1, 1, bq, d), lambda hi, qi, bi: (bi, hi, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, m, d), lambda hi, qi, bi: (bi, hi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, m, d), lambda hi, qi, bi: (bi, hi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, m), lambda hi, qi, bi: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bq, d), lambda hi, qi, bi: (bi, hi, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, bq), lambda hi, qi, bi: (bi, hi, 0, qi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, bq), lambda hi, qi, bi: (bi, hi, 0, qi),
                     memory_space=pltpu.VMEM),
    ]
    dq_out_spec = pl.BlockSpec((1, 1, bq, d), lambda hi, qi, bi: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM)
    if table_grad:
        dq_t, dtab_packed = pl.pallas_call(
            functools.partial(_flash_relpos_bwd_dq_dtab_kernel, block_k=bk,
                              nb=num_buckets, maxd=max_distance),
            grid=(h, pl.cdiv(n, bq), b),
            in_specs=dq_in_specs,
            out_specs=(
                dq_out_spec,
                pl.BlockSpec((1, 8, 128), lambda hi, qi, bi: (hi, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b, h, n, d), q.dtype),
                jax.ShapeDtypeStruct((h, 8, 128), jnp.float32),
            ),
        )(qt, kt, vt, table, kvm, got, lse, delta)
        flat = dtab_packed.reshape(h, 8 * 128)
        idx = jnp.asarray([(u % 8) * 128 + u // 8 for u in range(num_buckets)])
        dtable = flat[:, idx].astype(table.dtype)  # (H, nb)
    else:
        dq_t = pl.pallas_call(
            functools.partial(_flash_relpos_bwd_dq_kernel, block_k=bk,
                              nb=num_buckets, maxd=max_distance),
            grid=(h, pl.cdiv(n, bq), b),
            in_specs=dq_in_specs,
            out_specs=dq_out_spec,
            out_shape=jax.ShapeDtypeStruct((b, h, n, d), q.dtype),
        )(qt, kt, vt, table, kvm, got, lse, delta)
        dtable = jnp.zeros_like(table)

    dk_t, dv_t = pl.pallas_call(
        functools.partial(_flash_relpos_bwd_dkv_kernel, block_q=bq,
                          nb=num_buckets, maxd=max_distance),
        grid=(h, pl.cdiv(m, bk), b),
        in_specs=[
            pl.BlockSpec((1, 1, n, d), lambda hi, ki, bi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, d), lambda hi, ki, bi: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, d), lambda hi, ki, bi: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, bk), lambda hi, ki, bi: (bi, 0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n, d), lambda hi, ki, bi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, n), lambda hi, ki, bi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, n), lambda hi, ki, bi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, bk, d), lambda hi, ki, bi: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, d), lambda hi, ki, bi: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, m, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, m, d), v.dtype),
        ),
    )(qt, kt, vt, table, kvm, got, lse, delta)

    dq = dq_t.transpose(0, 2, 1, 3)[:, :n_real]
    dk = dk_t.transpose(0, 2, 1, 3)[:, :m_real]
    dv = dv_t.transpose(0, 2, 1, 3)[:, :m_real]
    return dq, dk, dv, dtable, None


_flash_attention_relpos.defvjp(_flash_relpos_vjp_fwd, _flash_relpos_vjp_bwd)


def flash_attention_relpos(q, k, v, table, kv_mask=None, num_buckets=32,
                           max_distance=128,
                           block_q=DEFAULT_BLOCK_Q, block_k=DEFAULT_BLOCK_K,
                           table_grad=False):
    """Flash attention with the T5 bidirectional relative-position bias
    computed in-kernel from a (H, num_buckets) table — O(N) memory, no
    materialized (1, H, N, M) bias. For the T5 encoder at long context
    (reference bias semantics: modeling_t5.py T5Attention.compute_bias).

    ``table`` is (H, num_buckets) fp32 — note the transpose relative to the
    flax param (num_buckets, H). ``table_grad`` (static) makes the backward
    accumulate the true dtable in-kernel (full finetuning); off for LoRA
    where the embedding is frozen. Note: the dtable kernel's per-bucket
    scalar reductions are slow for Mosaic to COMPILE (minutes, once per
    shape — cached afterwards); runtime cost is confined to the O(N/block)
    near-diagonal tiles.
    """
    b, n, h, d = q.shape
    m = k.shape[1]
    assert table.shape == (h, num_buckets), table.shape
    if kv_mask is None:
        kv_mask = jnp.ones((b, m), jnp.int8)
    return _flash_attention_relpos(
        q, k, v, table.astype(jnp.float32), kv_mask.astype(jnp.int8),
        num_buckets, max_distance, block_q, block_k, bool(table_grad),
    )


def _qkv_packed_kernel(qkv_ref, o_ref, *, num_heads: int, head_dim: int,
                       n_valid: int = 0):
    """Self-attention straight off the packed (rows, 3*H*D) QKV projection.

    One program per image: q/k/v and every head are sliced in VMEM, so the
    (B, N, 3HD) -> 3x(B, N, H, D) split/transpose copies never hit HBM.

    Phase-batched: all heads' QK^T matmuls are issued back-to-back, then
    the softmaxes, then the PV matmuls — grouping the MXU work lets Mosaic
    overlap the VPU softmax of one head with the matmul of the next
    (measured 21% faster than the interleaved per-head loop at the ViT-g
    shape; the per-head serial MXU<->VPU ping-pong was the bottleneck,
    not tile alignment).

    ``n_valid`` > 0 masks key columns >= n_valid (-inf before softmax):
    the int8 ViT pads the token axis to a sublane multiple (257 -> 264)
    so the 2D<->3D reshapes around this kernel are free bitcasts, and the
    pad tokens must not receive attention weight.
    """
    blk = qkv_ref[0]
    n = blk.shape[0]
    hd = num_heads * head_dim
    scale = jnp.asarray(head_dim ** -0.5, blk.dtype)
    key_pad = None
    if n_valid and n_valid < n:
        key_pad = (
            jax.lax.broadcasted_iota(jnp.int32, (n, n), 1) >= n_valid
        )
    logits = []
    for h in range(num_heads):
        q = blk[:, h * head_dim:(h + 1) * head_dim] * scale
        k = blk[:, hd + h * head_dim:hd + (h + 1) * head_dim]
        l = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if key_pad is not None:
            l = jnp.where(key_pad, -jnp.inf, l)
        logits.append(l)
    probs = []
    for h in range(num_heads):
        m = jnp.max(logits[h], axis=-1, keepdims=True)
        p = jnp.exp(logits[h] - m)
        p = jnp.where(jnp.isfinite(logits[h]), p, 0.0)
        probs.append((p / jnp.sum(p, axis=-1, keepdims=True)).astype(blk.dtype))
    for h in range(num_heads):
        v = blk[:, 2 * hd + h * head_dim:2 * hd + (h + 1) * head_dim]
        o_ref[0, :, h * head_dim:(h + 1) * head_dim] = jnp.dot(
            probs[h], v, preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _flash_qkv_packed(qkv, num_heads, head_dim, n_valid=0):
    b, n, three_hd = qkv.shape
    kernel = functools.partial(
        _qkv_packed_kernel, num_heads=num_heads, head_dim=head_dim,
        n_valid=n_valid,
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


def _qkv_packed_reference(qkv, num_heads, head_dim, n_valid=0):
    hd = num_heads * head_dim
    q, k, v = qkv[..., :hd], qkv[..., hd:2 * hd], qkv[..., 2 * hd:]
    if n_valid and n_valid < qkv.shape[1]:
        from mr_blip_tpu.ops.attention import xla_attention

        b, n, _ = q.shape
        mask = (jnp.arange(n) < n_valid)[None, None, None, :]
        out = xla_attention(
            q.reshape(b, n, num_heads, head_dim),
            k.reshape(b, n, num_heads, head_dim),
            v.reshape(b, n, num_heads, head_dim),
            mask=mask,
        )
        return out.reshape(b, n, hd)
    return _mha_reference(q, k, v, num_heads, head_dim)


def _qkv_vjp_fwd(qkv, num_heads, head_dim, n_valid=0):
    return _flash_qkv_packed(qkv, num_heads, head_dim, n_valid), qkv


def _qkv_vjp_bwd(num_heads, head_dim, n_valid, qkv, g):
    _, vjp = jax.vjp(
        lambda q: _qkv_packed_reference(q, num_heads, head_dim, n_valid), qkv
    )
    return vjp(g)


_flash_qkv_packed.defvjp(_qkv_vjp_fwd, _qkv_vjp_bwd)


def flash_attention_qkv_packed(qkv, num_heads: int, n_valid: int = 0):
    """Self-attention over the packed (B, N, 3*H*D) QKV tensor; the whole
    sequence must fit VMEM (N * 3HD * itemsize ≲ 4 MB — e.g. ViT's 257
    tokens at d=1408). ``n_valid`` > 0 masks key columns >= n_valid (the
    int8 ViT pads N to a sublane multiple for free reshapes)."""
    b, n, three_hd = qkv.shape
    assert three_hd % (3 * num_heads) == 0
    return _flash_qkv_packed(qkv, num_heads, three_hd // (3 * num_heads),
                             int(n_valid or 0))


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
