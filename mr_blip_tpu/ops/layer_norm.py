"""Pallas fused LayerNorm: bf16 in/out, fp32 statistics, one HBM round trip.

XLA lowers the fp32-LayerNorm pattern (``blip2.py:113-119`` semantics) as
convert→reduce→normalize fusions that materialize an fp32 copy of the
activations; at ViT-g scale (39 blocks × 2 LNs × 174 MB bf16 activations)
those extra passes cost ~24% of the encoder's runtime. This kernel reads
the bf16 tile once, computes mean/variance in fp32 registers, and writes
the normalized bf16 tile — the fp32 semantics without the fp32 traffic.

Backward uses the standard LayerNorm VJP via recompute (the ViT is frozen
in Mr. BLIP finetuning, so this path is inference-hot, not grad-hot).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_ROWS = 256


def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)  # (rows, d) upcast in registers
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[0].astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_layer_norm(x2d, scale, bias, eps):
    rows, d = x2d.shape
    block = min(DEFAULT_BLOCK_ROWS, rows)
    grid = (pl.cdiv(rows, block),)
    return pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, d), x2d.dtype),
        cost_estimate=pl.CostEstimate(
            flops=8 * rows * d,
            bytes_accessed=2 * rows * d * x2d.dtype.itemsize,
            transcendentals=rows,
        ),
    )(x2d, scale.reshape(1, d), bias.reshape(1, d))


def _ln_reference(x2d, scale, bias, eps):
    x = x2d.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x2d.dtype)


def _ln_vjp_fwd(x2d, scale, bias, eps):
    return _fused_layer_norm(x2d, scale, bias, eps), (x2d, scale, bias)


def _ln_vjp_bwd(eps, residuals, g):
    x2d, scale, bias = residuals
    _, vjp = jax.vjp(lambda x, s, b: _ln_reference(x, s, b, eps), x2d, scale, bias)
    return vjp(g)


_fused_layer_norm.defvjp(_ln_vjp_fwd, _ln_vjp_bwd)


def fused_layer_norm(x, scale, bias, eps: float = 1e-6):
    """LayerNorm over the last axis with fp32 statistics.

    Uses the Pallas kernel on TPU for 16-bit inputs (where the fp32
    materialization is the bottleneck); falls back to the jnp reference
    elsewhere — both compute the same function.
    """
    d = x.shape[-1]
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu or x.dtype not in (jnp.bfloat16, jnp.float16) or d % 128:
        return _ln_reference(x.reshape(-1, d), scale, bias, eps).reshape(x.shape)
    return _fused_layer_norm(x.reshape(-1, d), scale, bias, eps).reshape(x.shape)
