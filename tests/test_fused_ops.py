"""Numerics of the fused Pallas ops (LayerNorm, folded-head attention).

The kernels run in interpreter mode on CPU (the dispatchers pick the jnp
reference off-TPU; these tests force the kernel bodies so TPU behavior is
pinned by the same suite).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from mr_blip_tpu.ops.attention import xla_attention
from mr_blip_tpu.ops.layer_norm import _fused_layer_norm, _ln_reference


class TestFusedLayerNorm:
    def test_kernel_matches_reference_fp32(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((300, 256)).astype(np.float32) * 3 + 1.5
        scale = rng.standard_normal(256).astype(np.float32)
        bias = rng.standard_normal(256).astype(np.float32)
        want = _ln_reference(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), 1e-6)
        with pltpu.force_tpu_interpret_mode():
            got = _fused_layer_norm(
                jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), 1e-6
            )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_kernel_matches_reference_bf16(self):
        """bf16 in/out with fp32 stats — the TPU production configuration."""
        rng = np.random.default_rng(1)
        x = (rng.standard_normal((64, 128)) * 2).astype(jnp.bfloat16)
        scale = rng.standard_normal(128).astype(np.float32)
        bias = rng.standard_normal(128).astype(np.float32)
        want = _ln_reference(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), 1e-5)
        with pltpu.force_tpu_interpret_mode():
            got = _fused_layer_norm(
                jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), 1e-5
            )
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32), atol=2e-2
        )

    def test_reference_matches_flax_layernorm(self):
        """The jnp reference (CPU path) computes flax's fp32 LayerNorm."""
        import flax.linen as nn

        rng = np.random.default_rng(2)
        x = rng.standard_normal((10, 64)).astype(np.float32)
        scale = rng.standard_normal(64).astype(np.float32)
        bias = rng.standard_normal(64).astype(np.float32)
        ln = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, param_dtype=jnp.float32)
        want = ln.apply(
            {"params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}},
            jnp.asarray(x),
        )
        got = _ln_reference(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), 1e-6)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_gradients_flow(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((8, 128)).astype(np.float32))
        scale = jnp.asarray(rng.standard_normal(128).astype(np.float32))
        bias = jnp.asarray(rng.standard_normal(128).astype(np.float32))

        with pltpu.force_tpu_interpret_mode():
            g = jax.grad(lambda x, s, b: _fused_layer_norm(x, s, b, 1e-6).sum(),
                         argnums=(0, 1, 2))(x, scale, bias)
        g_ref = jax.grad(lambda x, s, b: _ln_reference(x, s, b, 1e-6).sum(),
                         argnums=(0, 1, 2))(x, scale, bias)
        for a, b_ in zip(g, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


class TestPackedQKVAttention:
    def test_matches_reference(self):
        from mr_blip_tpu.ops.flash_attention import (
            _flash_qkv_packed,
            _qkv_packed_reference,
        )

        rng = np.random.default_rng(2)
        B, N, H, D = 2, 65, 4, 24
        qkv = rng.standard_normal((B, N, 3 * H * D)).astype(np.float32)
        want = _qkv_packed_reference(jnp.asarray(qkv), H, D)
        with pltpu.force_tpu_interpret_mode():
            got = _flash_qkv_packed(jnp.asarray(qkv), H, D)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_gradients_match(self):
        from mr_blip_tpu.ops.flash_attention import (
            _flash_qkv_packed,
            _qkv_packed_reference,
        )

        rng = np.random.default_rng(3)
        B, N, H, D = 1, 16, 2, 8
        qkv = jnp.asarray(rng.standard_normal((B, N, 3 * H * D)).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            g = jax.grad(lambda q: _flash_qkv_packed(q, H, D).sum())(qkv)
        g_ref = jax.grad(lambda q: _qkv_packed_reference(q, H, D).sum())(qkv)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=2e-5)
