"""T5 relative-position bucketing, shared between the XLA path and kernels.

The bucket function reproduces the reference's vendored HF T5
(``lavis/models/blip2_models/modeling_t5.py`` ``T5Attention.
_relative_position_bucket``): exact buckets up to ``max_exact``, log-spaced
up to ``max_distance``, capped beyond. The key structural fact the
long-context kernel exploits: for ``|relative_position| >= max_distance``
the bucket is CONSTANT (``num_buckets//2 - 1`` for keys in the past,
``num_buckets - 1`` for keys in the future, bidirectional flavor) — so only
attention tiles near the diagonal need per-element bucket computation.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def relative_position_bucket(relative_position, bidirectional, num_buckets,
                             max_distance):
    """T5 bucket function (modeling_t5.py:T5Attention._relative_position_bucket).

    ``relative_position`` = key_position - query_position (any int array).
    """
    ret = 0
    n = -relative_position
    if bidirectional:
        num_buckets //= 2
        ret += (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    # Denominator as a host-side double (HF uses math.log) so the XLA path
    # and the in-kernel path share the exact same constant.
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    ret += jnp.where(is_small, n, val_if_large)
    return ret


def materialize_relpos_bias(table, q_positions, k_positions, bidirectional,
                            num_buckets, max_distance):
    """(1, H, Nq, Nk) additive bias from a (num_buckets, H) table — the XLA
    fallback for :func:`mr_blip_tpu.ops.flash_attention.flash_attention_relpos`."""
    rel = k_positions[None, :] - q_positions[:, None]
    buckets = relative_position_bucket(
        rel, bidirectional=bidirectional, num_buckets=num_buckets,
        max_distance=max_distance,
    )
    bias = table[buckets]  # (Nq, Nk, H)
    return bias.transpose(2, 0, 1)[None]
