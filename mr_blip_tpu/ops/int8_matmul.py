"""W8A8 int8 matmul kernels for the frozen-ViT inference path.

The v5e MXU's int8 peak is ~2x its bf16 peak, but XLA cannot exploit it for
the ViT: an int8 ``dot_general`` materializes its int32 output in HBM (2x
the bf16 bytes) and the dequant -> GELU -> requant chain between fc1 and
fc2 runs as separate HBM passes, eating the MXU win (measured: XLA W8A8
MLP 12.1 ms vs 14.9 bf16 at EVA-g shapes — only +19%). These Pallas
kernels fuse the whole epilogue in VMEM:

- :func:`w8a8_linear`: per-token activation quantization (computed
  in-kernel, no calibration), int8 MXU dot, rank-1 dequant
  ``int32 * (scale_act[m] x scale_w[n])`` + bias, bf16 out.
- :func:`w8a8_mlp`: the full ViT MLP — fc1 int8 dot, dequant+bias, GELU,
  per-token requant of each hidden chunk, fc2 int8 dot, fp32 accumulation
  — the (M, 6144) hidden activation never leaves VMEM. Measured 7.25 ms
  vs 14.9 bf16 (2.05x) at EVA-g shapes, cosine 0.9995 vs the exact-erf
  bf16 reference.

Quantization scheme: symmetric round-to-nearest; weights per output
channel (``scale[o] = max_i |w[i,o]| / 127``, models/quantize.py),
activations per token (``scale[m] = max_k |x[m,k]| / 127``), both exact in
the jnp reference used off-TPU. GELU inside the kernel is tanh-approximate
(Mosaic cannot lower erf/erfc); the int8 path is an opt-in perf mode that
is already off bit-parity, and the tanh-vs-erf delta is below the int8
quantization noise.

Weight layout matches ``layers.Dense(quantize=True)``: ``kernel_q`` int8
``(in, out)`` + ``kernel_scale`` fp32 ``(out,)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_M = 512
DEFAULT_BLOCK_N = 1408
DEFAULT_BLOCK_H = 1536
# The XLA default scoped-vmem limit (16 MB) rejects the best block shapes;
# the v5e physically has headroom (32 MB verified on-chip: all probed block
# configs compile and run; bm=512/bh=1536 measured fastest at 7.17 ms vs
# 14.9 bf16 for the EVA-g MLP).
_VMEM_LIMIT = 32 * 2**20


def _pick_block(n: int, default: int) -> int:
    """Largest divisor of ``n`` that is <= ``default`` and lane-aligned.

    T5 shapes (d=2048, d_ff=5120) don't divide the EVA-tuned defaults
    (1408/1536); the grid needs an exact divisor on the N/H axis (only the
    M axis rides ragged boundary masking)."""
    if n <= default:
        return n
    for d in range(default - default % 128, 127, -128):
        if n % d == 0:
            return d
    return n  # no aligned divisor: single block (small n only)


def _quant_rows(x):
    """Per-row symmetric int8 quantization in fp32. Returns (q, scale)."""
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-6) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


def _norm_rows(xf, norm_kind, ls, lb, eps):
    """Fused pre-norm in fp32 (LayerNorm or T5 RMSNorm) on a row block.

    The normalized activation is produced INSIDE the kernel right before
    quantization — the standalone norm pass (read x + write normed x, a
    full HBM round-trip per call: ~0.44 ms at the 240-frame ViT shape)
    disappears, and the fp32 statistics match LayerNormFP32/RMSNormFP32.
    """
    if norm_kind == "ln":
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        return (xf - mu) * jax.lax.rsqrt(var + eps) * ls + lb
    if norm_kind == "rms":
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        return xf * jax.lax.rsqrt(var + eps) * ls
    assert norm_kind is None
    return xf


def _norm_args(norm, k):
    """(norm_kind, eps, ls_arr(1,k), lb_arr(1,k)) from the public ``norm``
    tuple ``None | ("ln", scale, bias, eps) | ("rms", scale, None, eps)``."""
    if norm is None:
        return None, 0.0, jnp.ones((1, k), jnp.float32), jnp.zeros(
            (1, k), jnp.float32)
    kind, scale, bias, eps = norm
    ls = scale.reshape(1, k).astype(jnp.float32)
    lb = (bias.reshape(1, k).astype(jnp.float32) if bias is not None
          else jnp.zeros((1, k), jnp.float32))
    return kind, float(eps), ls, lb


def _norm_ref(x, norm):
    if norm is None:
        return x
    kind, scale, bias, eps = norm
    xf = x.astype(jnp.float32)
    return _norm_rows(
        xf, kind, scale.reshape(1, -1).astype(jnp.float32),
        bias.reshape(1, -1).astype(jnp.float32) if bias is not None else 0.0,
        eps,
    )


# --------------------------------------------------------------- linear


def _linear_kernel(x_ref, w_ref, sw_ref, b_ref, ls_ref, lb_ref, r_ref,
                   o_ref, xq_ref, sa_ref, *, has_bias: bool, norm_kind, eps,
                   has_residual: bool):
    n_idx = pl.program_id(1)

    @pl.when(n_idx == 0)
    def _():
        xf = _norm_rows(x_ref[:].astype(jnp.float32), norm_kind,
                        ls_ref[:], lb_ref[:], eps)
        q, s = _quant_rows(xf)
        xq_ref[:] = q
        sa_ref[:] = s

    acc = jnp.dot(xq_ref[:], w_ref[:], preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (sa_ref[:] * sw_ref[:])
    if has_bias:
        y = y + b_ref[:]
    if has_residual:
        y = y + r_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(jnp.bfloat16)


def _w8a8_linear_tpu(x, wq, sw, bias, block_m, block_n, norm=None,
                     residual=None, interpret=False):
    m, k = x.shape
    n = wq.shape[1]
    block_n = _pick_block(n, block_n)
    norm_kind, eps, ls, lb = _norm_args(norm, k)
    has_residual = residual is not None
    if residual is None:
        residual = jnp.zeros((1, 1), jnp.bfloat16)
        r_spec = pl.BlockSpec((1, 1), lambda i, j: (0, 0))
    else:
        r_spec = pl.BlockSpec((block_m, block_n), lambda i, j: (i, j))
    # Ragged M rides Pallas boundary-block masking (same contract the
    # flash kernels rely on): the tail block reads padded garbage rows
    # whose per-row scales only affect those rows, and their writes are
    # masked. An explicit jnp.pad would cost a full HBM copy of x per
    # call (profiled: pad+slice was 123 ms/run across the 39-block ViT).
    grid = (pl.cdiv(m, block_m), n // block_n)
    has_bias = bias is not None
    if bias is None:
        bias = jnp.zeros((1, n), jnp.float32)
    out = pl.pallas_call(
        functools.partial(_linear_kernel, has_bias=has_bias,
                          norm_kind=norm_kind, eps=eps,
                          has_residual=has_residual),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, block_n), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j)),
            pl.BlockSpec((1, k), lambda i, j: (0, 0)),
            pl.BlockSpec((1, k), lambda i, j: (0, 0)),
            r_spec,
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((block_m, k), jnp.int8),
            pltpu.VMEM((block_m, 1), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
    )(x, wq, sw.reshape(1, n).astype(jnp.float32), bias.reshape(1, n),
      ls, lb, residual)
    return out


def _w8a8_linear_ref(x, wq, sw, bias):
    """jnp emulation with identical quantization arithmetic (CPU path)."""
    q, sa = _quant_rows(x)
    acc = jax.lax.dot_general(
        q, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = acc.astype(jnp.float32) * (sa * sw.reshape(1, -1).astype(jnp.float32))
    if bias is not None:
        y = y + bias.reshape(1, -1)
    return y.astype(jnp.bfloat16)


def w8a8_linear(x, wq, sw, bias=None, *, norm=None, residual=None,
                block_m=DEFAULT_BLOCK_M,
                block_n=DEFAULT_BLOCK_N, interpret=False):
    """``bf16 (M,K) @ int8 (K,N) -> bf16 (M,N)`` with in-kernel per-token
    activation quantization. ``sw``: per-output-channel weight scales (N,);
    ``bias``: optional fp32 (N,). ``norm``: optional fused PRE-norm applied
    to x inside the kernel — ``("ln", scale, bias, eps)`` or
    ``("rms", scale, None, eps)``. ``interpret=True`` runs the Pallas
    kernel in interpreter mode (CPU testing)."""
    if jax.default_backend() == "tpu" or interpret:
        return _w8a8_linear_tpu(x, wq, sw, bias, block_m, block_n, norm,
                                residual, interpret)
    y = _w8a8_linear_ref(_norm_ref(x, norm), wq, sw, bias)
    if residual is not None:
        y = (y.astype(jnp.float32) + residual.astype(jnp.float32)).astype(
            jnp.bfloat16)
    return y


# ------------------------------------------------------------------ mlp


def _mlp_kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                ls_ref, lb_ref, r_ref, o_ref, xq_ref, sa_ref, acc_ref,
                *, num_h: int, norm_kind, eps, has_residual: bool):
    h_idx = pl.program_id(1)

    @pl.when(h_idx == 0)
    def _():
        xf = _norm_rows(x_ref[:].astype(jnp.float32), norm_kind,
                        ls_ref[:], lb_ref[:], eps)
        q, s = _quant_rows(xf)
        xq_ref[:] = q
        sa_ref[:] = s
        acc_ref[:] = jnp.zeros_like(acc_ref)

    h32 = jnp.dot(xq_ref[:], w1_ref[:], preferred_element_type=jnp.int32)
    h = h32.astype(jnp.float32) * (sa_ref[:] * s1_ref[:]) + b1_ref[:]
    h = _gelu_tanh(h)
    hq, sh = _quant_rows(h)
    y32 = jnp.dot(hq, w2_ref[:], preferred_element_type=jnp.int32)
    acc_ref[:] += y32.astype(jnp.float32) * (sh * s2_ref[:])

    @pl.when(h_idx == num_h - 1)
    def _():
        y = acc_ref[:] + b2_ref[:]
        if has_residual:
            y = y + r_ref[:].astype(jnp.float32)
        o_ref[:] = y.astype(jnp.bfloat16)


def _residual_spec(residual, block_m, d):
    if residual is None:
        return jnp.zeros((1, 1), jnp.bfloat16), pl.BlockSpec(
            (1, 1), lambda i, j: (0, 0))
    return residual, pl.BlockSpec((block_m, d), lambda i, j: (i, 0))


def _w8a8_mlp_tpu(x, w1q, s1, b1, w2q, s2, b2, block_m, block_h,
                  norm=None, residual=None, interpret=False):
    m, d = x.shape
    hdim = w1q.shape[1]
    block_h = _pick_block(hdim, block_h)
    norm_kind, eps, ls, lb = _norm_args(norm, d)
    has_residual = residual is not None
    residual, r_spec = _residual_spec(residual, block_m, d)
    num_h = hdim // block_h
    grid = (pl.cdiv(m, block_m), num_h)  # ragged M: boundary-masked
    out = pl.pallas_call(
        functools.partial(_mlp_kernel, num_h=num_h, norm_kind=norm_kind,
                          eps=eps, has_residual=has_residual),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
            pl.BlockSpec((d, block_h), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_h), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_h), lambda i, j: (0, j)),
            pl.BlockSpec((block_h, d), lambda i, j: (j, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
            r_spec,
        ],
        out_specs=pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, d), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((block_m, d), jnp.int8),
            pltpu.VMEM((block_m, 1), jnp.float32),
            pltpu.VMEM((block_m, d), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
    )(
        x,
        w1q, s1.reshape(1, hdim).astype(jnp.float32), b1.reshape(1, hdim),
        w2q, s2.reshape(1, d).astype(jnp.float32), b2.reshape(1, d),
        ls, lb, residual,
    )
    return out


def _w8a8_mlp_ref(x, w1q, s1, b1, w2q, s2, b2, block_h):
    """jnp emulation: identical math incl. the per-(token, h-chunk)
    requantization of the hidden activation."""
    q, sa = _quant_rows(x)
    d = x.shape[-1]
    hdim = w1q.shape[1]
    block_h = _pick_block(hdim, block_h)
    acc = jnp.zeros((x.shape[0], d), jnp.float32)
    for j in range(hdim // block_h):
        sl = slice(j * block_h, (j + 1) * block_h)
        h32 = jax.lax.dot_general(
            q, w1q[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        h = h32.astype(jnp.float32) * (
            sa * s1.reshape(1, -1)[:, sl].astype(jnp.float32)
        ) + b1.reshape(1, -1)[:, sl]
        h = _gelu_tanh(h)
        hq, sh = _quant_rows(h)
        y32 = jax.lax.dot_general(
            hq, w2q[sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc = acc + y32.astype(jnp.float32) * (sh * s2.reshape(1, -1))
    return (acc + b2.reshape(1, -1)).astype(jnp.bfloat16)


def w8a8_mlp(x, w1q, s1, b1, w2q, s2, b2, *, norm=None, residual=None,
             block_m=DEFAULT_BLOCK_M,
             block_h=DEFAULT_BLOCK_H, interpret=False):
    """Fused int8 GELU MLP: ``gelu(x @ w1 + b1) @ w2 + b2`` with both
    matmuls on the int8 MXU and the hidden activation resident in VMEM.
    ``norm``: optional fused pre-norm on x; ``residual``: optional (M, N)
    tensor added in the epilogue (skip connection without the extra HBM
    round-trip of a separate add)."""
    if jax.default_backend() == "tpu" or interpret:
        return _w8a8_mlp_tpu(x, w1q, s1, b1, w2q, s2, b2, block_m, block_h,
                             norm, residual, interpret)
    y = _w8a8_mlp_ref(_norm_ref(x, norm), w1q, s1, b1, w2q, s2, b2, block_h)
    if residual is not None:
        y = (y.astype(jnp.float32) + residual.astype(jnp.float32)).astype(
            jnp.bfloat16)
    return y


# ------------------------------------------------------------ gated mlp


def _gated_mlp_kernel(x_ref, w0_ref, s0_ref, w1_ref, s1_ref, wo_ref, so_ref,
                      ls_ref, lb_ref, r_ref, o_ref, xq_ref, sa_ref, acc_ref,
                      *, num_h: int, norm_kind, eps, has_residual: bool):
    h_idx = pl.program_id(1)

    @pl.when(h_idx == 0)
    def _():
        xf = _norm_rows(x_ref[:].astype(jnp.float32), norm_kind,
                        ls_ref[:], lb_ref[:], eps)
        q, s = _quant_rows(xf)
        xq_ref[:] = q
        sa_ref[:] = s
        acc_ref[:] = jnp.zeros_like(acc_ref)

    g32 = jnp.dot(xq_ref[:], w0_ref[:], preferred_element_type=jnp.int32)
    g = _gelu_tanh(g32.astype(jnp.float32) * (sa_ref[:] * s0_ref[:]))
    u32 = jnp.dot(xq_ref[:], w1_ref[:], preferred_element_type=jnp.int32)
    h = g * (u32.astype(jnp.float32) * (sa_ref[:] * s1_ref[:]))
    hq, sh = _quant_rows(h)
    y32 = jnp.dot(hq, wo_ref[:], preferred_element_type=jnp.int32)
    acc_ref[:] += y32.astype(jnp.float32) * (sh * so_ref[:])

    @pl.when(h_idx == num_h - 1)
    def _():
        y = acc_ref[:]
        if has_residual:
            y = y + r_ref[:].astype(jnp.float32)
        o_ref[:] = y.astype(jnp.bfloat16)


def _w8a8_mlp_gated_tpu(x, w0q, s0, w1q, s1, woq, so, block_m, block_h,
                        norm=None, residual=None, interpret=False):
    m, d = x.shape
    hdim = w0q.shape[1]
    block_h = _pick_block(hdim, block_h)
    # Three weight operands (vs two in w8a8_mlp) and T5's d_model=2048 push
    # the EVA-tuned bm=512 past the VMEM budget (measured: Mosaic stack OOM
    # at XL shapes; bm=256/bh=640 runs 1.83 ms for the 24-layer-chained
    # (8196, 2048, 5120) FFN = 282 int8 TOP/s). Shrink block_m until the
    # estimate (double-buffered inputs + scratch, with Mosaic's own stack
    # slack behind the 0.75 factor) fits.
    while block_m > 128:
        weights = 3 * d * block_h  # int8: w0 + w1 + wo blocks
        est = (2 * (block_m * d * 2 + weights)   # pipelined input buffers
               + block_m * d * (2 + 1 + 4))      # out bf16 + xq int8 + acc f32
        if est <= _VMEM_LIMIT * 3 // 4:
            break
        block_m //= 2
    norm_kind, eps, ls, lb = _norm_args(norm, d)
    has_residual = residual is not None
    residual, r_spec = _residual_spec(residual, block_m, d)
    num_h = hdim // block_h
    grid = (pl.cdiv(m, block_m), num_h)  # ragged M: boundary-masked
    out = pl.pallas_call(
        functools.partial(_gated_mlp_kernel, num_h=num_h,
                          norm_kind=norm_kind, eps=eps,
                          has_residual=has_residual),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
            pl.BlockSpec((d, block_h), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_h), lambda i, j: (0, j)),
            pl.BlockSpec((d, block_h), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_h), lambda i, j: (0, j)),
            pl.BlockSpec((block_h, d), lambda i, j: (j, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
            r_spec,
        ],
        out_specs=pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, d), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((block_m, d), jnp.int8),
            pltpu.VMEM((block_m, 1), jnp.float32),
            pltpu.VMEM((block_m, d), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
    )(
        x,
        w0q, s0.reshape(1, hdim).astype(jnp.float32),
        w1q, s1.reshape(1, hdim).astype(jnp.float32),
        woq, so.reshape(1, d).astype(jnp.float32),
        ls, lb, residual,
    )
    return out


def _w8a8_mlp_gated_ref(x, w0q, s0, w1q, s1, woq, so, block_h):
    """jnp emulation: identical chunking + requant arithmetic (CPU path)."""
    q, sa = _quant_rows(x)
    d = x.shape[-1]
    hdim = w0q.shape[1]
    block_h = _pick_block(hdim, block_h)
    acc = jnp.zeros((x.shape[0], d), jnp.float32)
    s0f = s0.reshape(1, -1).astype(jnp.float32)
    s1f = s1.reshape(1, -1).astype(jnp.float32)
    sof = so.reshape(1, -1).astype(jnp.float32)
    for j in range(hdim // block_h):
        sl = slice(j * block_h, (j + 1) * block_h)
        g32 = jax.lax.dot_general(
            q, w0q[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        g = _gelu_tanh(g32.astype(jnp.float32) * (sa * s0f[:, sl]))
        u32 = jax.lax.dot_general(
            q, w1q[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        h = g * (u32.astype(jnp.float32) * (sa * s1f[:, sl]))
        hq, sh = _quant_rows(h)
        y32 = jax.lax.dot_general(
            hq, woq[sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc = acc + y32.astype(jnp.float32) * (sh * sof)
    return acc.astype(jnp.bfloat16)


def w8a8_mlp_gated(x, w0q, s0, w1q, s1, woq, so, *, norm=None,
                   residual=None, block_m=DEFAULT_BLOCK_M,
                   block_h=640, interpret=False):
    """Fused int8 gated-GELU MLP (T5 ``gelu(x@wi_0) * (x@wi_1) @ wo``,
    bias-free): all three matmuls on the int8 MXU, the gated hidden
    activation resident in VMEM with per-(token, chunk) requantization.
    block_h=640 measured fastest at Flan-T5-XL shapes (1.83 ms vs 5.21 for
    1280 single-shot at (8196, 2048, 5120) on v5e).
    Covers the Flan-T5 encoder FFN (reference modeling_t5.py
    T5DenseGatedActDense with the dense_act_fn="gelu" override)."""
    if jax.default_backend() == "tpu" or interpret:
        return _w8a8_mlp_gated_tpu(x, w0q, s0, w1q, s1, woq, so, block_m,
                                   block_h, norm, residual, interpret)
    y = _w8a8_mlp_gated_ref(_norm_ref(x, norm), w0q, s0, w1q, s1, woq, so,
                            block_h)
    if residual is not None:
        y = (y.astype(jnp.float32) + residual.astype(jnp.float32)).astype(
            jnp.bfloat16)
    return y


# ------------------------------------------------- fused ViT attention block


def _attn_block_kernel(x_ref, wqkv_ref, sqkv_ref, qb_ref, wp_ref, sp_ref,
                       pb_ref, ls_ref, lb_ref, o_ref, attn_ref,
                       *, num_heads: int, eps: float, n_valid: int,
                       head_group: int, img_group: int):
    """``img_group`` images per program: LN -> per-token quant -> int8
    qkv -> phase-batched attention -> per-token quant -> int8 proj ->
    +residual, all resident in VMEM.

    The qkv projection output, the attention intermediate, and the proj
    input never leave VMEM — the separate-kernel chain writes + rereads
    them in HBM (~1.4 GB of intermediate traffic per EVA-g layer at 240
    frames). Weights ride constant-index BlockSpecs so Pallas fetches
    them once per launch, not per image.

    Structure is three phases — all images' qkv dots, then attention,
    then all proj dots — and attention itself is ``head_group``-phased
    (QK^T for the group back-to-back, then softmaxes, then PV): grouping
    the MXU work gives Mosaic independent chains so one image/head's VPU
    softmax overlaps the next one's matmul (the trick from
    flash_attention._qkv_packed_kernel; img_group=2 measured 5.33 vs
    5.55 ms/layer single-image and 5.77 for the separate chain).
    ``n_valid`` masks pad key columns (the sublane-padded token axis).
    """
    n, c = x_ref.shape[1], x_ref.shape[2]
    hd = c // num_heads
    scale = jnp.asarray(hd ** -0.5, jnp.bfloat16)
    key_pad = None
    if n_valid and n_valid < n:
        key_pad = (
            jax.lax.broadcasted_iota(jnp.int32, (n, n), 1) >= n_valid
        )

    qkvs, xfs = [], []
    for g in range(img_group):
        xf = x_ref[g].astype(jnp.float32)
        normed = _norm_rows(xf, "ln", ls_ref[:], lb_ref[:], eps)
        xq, xs = _quant_rows(normed)
        acc = jnp.dot(xq, wqkv_ref[:], preferred_element_type=jnp.int32)
        qkv = acc.astype(jnp.float32) * (xs * sqkv_ref[:]) + qb_ref[:]
        qkvs.append(qkv.astype(jnp.bfloat16))  # (N, 3C)
        xfs.append(xf)

    for g in range(img_group):
        qkv = qkvs[g]
        for g0 in range(0, num_heads, head_group):
            heads = range(g0, min(g0 + head_group, num_heads))
            logits = []
            for h in heads:
                q = qkv[:, h * hd:(h + 1) * hd] * scale
                k = qkv[:, c + h * hd:c + (h + 1) * hd]
                l = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if key_pad is not None:
                    l = jnp.where(key_pad, -jnp.inf, l)
                logits.append(l)
            probs = []
            for l in logits:
                m = jnp.max(l, axis=-1, keepdims=True)
                p = jnp.exp(l - m)
                p = jnp.where(jnp.isfinite(l), p, 0.0)
                probs.append(
                    (p / jnp.sum(p, axis=-1, keepdims=True)).astype(
                        jnp.bfloat16)
                )
            for i, h in enumerate(heads):
                v = qkv[:, 2 * c + h * hd:2 * c + (h + 1) * hd]
                attn_ref[g, :, h * hd:(h + 1) * hd] = jnp.dot(
                    probs[i], v, preferred_element_type=jnp.float32
                ).astype(attn_ref.dtype)

    for g in range(img_group):
        aq, a_s = _quant_rows(attn_ref[g].astype(jnp.float32))
        acc2 = jnp.dot(aq, wp_ref[:], preferred_element_type=jnp.int32)
        y = acc2.astype(jnp.float32) * (a_s * sp_ref[:]) + pb_ref[:]
        y = y + xfs[g]  # residual: the pre-norm input, already in VMEM
        o_ref[g] = y.astype(o_ref.dtype)


def _attn_block_ref(x, wqkv, sqkv, qkv_bias, wproj, sproj, proj_bias,
                    ls, lb, eps, num_heads, n_valid):
    """jnp reference with the exact same quantization math (off-TPU path
    and the differential target for the on-chip checker)."""
    b, n, c = x.shape
    hd = c // num_heads
    xf = x.astype(jnp.float32)
    normed = _norm_rows(xf, "ln", ls, lb, eps)
    xq, xs = _quant_rows(normed)
    qkv = (
        jnp.einsum("bnc,cd->bnd", xq.astype(jnp.float32),
                   wqkv.astype(jnp.float32))
        * (xs * sqkv.reshape(1, 1, -1)) + qkv_bias.reshape(1, 1, -1)
    )
    q = qkv[..., :c].reshape(b, n, num_heads, hd) * (hd ** -0.5)
    k = qkv[..., c:2 * c].reshape(b, n, num_heads, hd)
    v = qkv[..., 2 * c:].reshape(b, n, num_heads, hd)
    logits = jnp.einsum(
        "bnhd,bmhd->bhnm", q.astype(jnp.bfloat16).astype(jnp.float32),
        k.astype(jnp.bfloat16).astype(jnp.float32))
    if n_valid and n_valid < n:
        logits = jnp.where(jnp.arange(n)[None, None, None, :] >= n_valid,
                           -jnp.inf, logits)
    p = jax.nn.softmax(logits, axis=-1)
    a = jnp.einsum("bhnm,bmhd->bnhd", p.astype(jnp.bfloat16).astype(
        jnp.float32), v.astype(jnp.bfloat16).astype(jnp.float32))
    a = a.reshape(b, n, c).astype(jnp.bfloat16)
    aq, a_s = _quant_rows(a.astype(jnp.float32))
    y = (
        jnp.einsum("bnc,cd->bnd", aq.astype(jnp.float32),
                   wproj.astype(jnp.float32))
        * (a_s * sproj.reshape(1, 1, -1)) + proj_bias.reshape(1, 1, -1)
    )
    return (y + xf).astype(jnp.bfloat16)


def w8a8_attn_block(x, wqkv, sqkv, qkv_bias, wproj, sproj, proj_bias, *,
                    norm, num_heads, n_valid=0, head_group=8,
                    img_group=2, interpret=False):
    """Fused int8 ViT attention block over (B, N, C) tokens:
    ``out = x + bias + W8A8_proj(attn(W8A8_qkv(LN(x)) + qkv_bias))``.

    The whole per-image working set must sit in VMEM (EVA-g's 264-token
    1408-wide shape at img_group=2 uses ~40 MB with both weight
    matrices). Falls back to the jnp reference off-TPU.
    """
    b, n, c = x.shape
    kind, ls, lb, eps = norm
    assert kind == "ln"
    if b % img_group:
        img_group = 1
    ls2 = ls.reshape(1, c).astype(jnp.float32)
    lb2 = lb.reshape(1, c).astype(jnp.float32)
    qb = (qkv_bias if qkv_bias is not None
          else jnp.zeros((3 * c,), jnp.float32)).reshape(1, 3 * c).astype(
              jnp.float32)
    pb = (proj_bias if proj_bias is not None
          else jnp.zeros((c,), jnp.float32)).reshape(1, c).astype(jnp.float32)
    if not (jax.default_backend() == "tpu" or interpret):
        return _attn_block_ref(x, wqkv, sqkv, qb, wproj, sproj, pb,
                               ls2, lb2, eps, num_heads, n_valid)
    kernel = functools.partial(
        _attn_block_kernel, num_heads=num_heads, eps=float(eps),
        n_valid=int(n_valid or 0), head_group=head_group,
        img_group=img_group,
    )
    return pl.pallas_call(
        kernel,
        grid=(b // img_group,),
        in_specs=[
            pl.BlockSpec((img_group, n, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((c, 3 * c), lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * c), lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * c), lambda i: (0, 0)),
            pl.BlockSpec((c, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((img_group, n, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, c), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((img_group, n, c), jnp.bfloat16)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * c * (3 * c + c) + 4 * b * n * n * c,
            bytes_accessed=2 * b * n * c * 2 + b * (3 * c * c + c * c),
            transcendentals=b * n * n * num_heads,
        ),
        interpret=interpret,
    )(x, wqkv, sqkv.reshape(1, 3 * c).astype(jnp.float32), qb,
      wproj, sproj.reshape(1, c).astype(jnp.float32), pb, ls2, lb2)
