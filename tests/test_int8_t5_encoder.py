"""W8A8 int8 T5 encoder inference path.

Covers: the fused gated-MLP kernel logic == jnp reference (Pallas
interpreter mode), block-size selection for non-EVA shapes, the
LoRA-merging quantized layout transform, fidelity of the int8 encoder
forward vs float+LoRA on random weights, and the
BLIP2_MR.quantize_encoder()/quantize_for_inference() integration.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mr_blip_tpu.ops.int8_matmul import (
    _pick_block,
    _w8a8_mlp_gated_ref,
    w8a8_mlp_gated,
)


def _qw(rng, k, n):
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    s = np.maximum(np.abs(w).max(0), 1e-8) / 127.0
    q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
    return jnp.asarray(q), jnp.asarray(s), w


class TestPickBlock:
    def test_exact_divisors(self):
        assert _pick_block(6144, 1536) == 1536   # EVA MLP hidden
        assert _pick_block(5120, 1536) == 1280   # T5-XL d_ff
        assert _pick_block(2048, 1408) == 1024   # T5-XL d_model/inner
        assert _pick_block(10240, 1536) == 1280  # T5-XXL d_ff
        assert _pick_block(4096, 1408) == 1024   # T5-XXL d_model
        assert _pick_block(64, 1536) == 64       # tiny: single block

    def test_divides(self):
        for n in (256, 2048, 5120, 6144, 10240, 1408):
            for default in (512, 1024, 1408, 1536):
                assert n % _pick_block(n, default) == 0


class TestGatedKernelVsReference:
    def test_gated_mlp_matches_ref(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((32, 128)), jnp.bfloat16)
        w0q, s0, _ = _qw(rng, 128, 256)
        w1q, s1, _ = _qw(rng, 128, 256)
        woq, so, _ = _qw(rng, 256, 128)
        ker = w8a8_mlp_gated(x, w0q, s0, w1q, s1, woq, so, block_m=16,
                             block_h=128, interpret=True)
        ref = _w8a8_mlp_gated_ref(x, w0q, s0, w1q, s1, woq, so, block_h=128)
        np.testing.assert_allclose(
            np.asarray(ker, np.float32), np.asarray(ref, np.float32),
            rtol=0.05, atol=0.05,
        )

    def test_ragged_m(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((21, 128)), jnp.bfloat16)
        w0q, s0, _ = _qw(rng, 128, 128)
        w1q, s1, _ = _qw(rng, 128, 128)
        woq, so, _ = _qw(rng, 128, 128)
        ker = w8a8_mlp_gated(x, w0q, s0, w1q, s1, woq, so, block_m=16,
                             block_h=128, interpret=True)
        ref = _w8a8_mlp_gated_ref(x, w0q, s0, w1q, s1, woq, so, block_h=128)
        assert ker.shape == (21, 128)
        np.testing.assert_allclose(
            np.asarray(ker, np.float32), np.asarray(ref, np.float32),
            rtol=0.05, atol=0.05,
        )

    def test_gated_fidelity_vs_float(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((64, 128)), jnp.bfloat16)
        w0q, s0, w0 = _qw(rng, 128, 256)
        w1q, s1, w1 = _qw(rng, 128, 256)
        woq, so, wo = _qw(rng, 256, 128)
        got = np.asarray(
            w8a8_mlp_gated(x, w0q, s0, w1q, s1, woq, so), np.float32)
        xf = np.asarray(x, np.float32)
        h = jax.nn.gelu(xf @ w0, approximate=False) * (xf @ w1)
        want = np.asarray(h @ wo, np.float32)
        cos = (got.ravel() @ want.ravel()) / (
            np.linalg.norm(got) * np.linalg.norm(want))
        assert cos > 0.99, cos


class TestInt8T5Encoder:
    def _encoder_pair(self, lora_rank=8):
        from mr_blip_tpu.models.quantize import quantize_t5_encoder_params
        from mr_blip_tpu.models.t5 import (
            T5ForConditionalGeneration, t5_tiny_config,
        )

        cfg = t5_tiny_config(lora_rank=lora_rank)
        t5 = T5ForConditionalGeneration(cfg, compute_dtype=jnp.float32)
        rng = np.random.default_rng(3)
        embeds = jnp.asarray(rng.standard_normal((2, 10, 32)), jnp.float32)
        mask = jnp.ones((2, 10), jnp.int32)
        params = t5.init(jax.random.PRNGKey(0), embeds, mask=mask,
                         method="encode")["params"]

        # non-trivial LoRA deltas (lora_b inits to zero -> merge would be
        # vacuous otherwise)
        def fill_lora(path, leaf):
            if path[-1].key == "lora_b":
                return 0.05 * jnp.asarray(
                    np.random.default_rng(11).standard_normal(leaf.shape),
                    leaf.dtype)
            return leaf
        params = jax.tree_util.tree_map_with_path(fill_lora, params)

        qcfg = dataclasses.replace(cfg, int8_encoder=True)
        qt5 = T5ForConditionalGeneration(qcfg, compute_dtype=jnp.float32)
        qparams = dict(params)
        qparams.update(quantize_t5_encoder_params(
            params, lora_alpha=cfg.lora_alpha))
        return t5, params, qt5, qparams, embeds, mask

    def test_quantized_layout(self):
        _, params, qt5, qparams, embeds, mask = self._encoder_pair()
        blk = qparams["encoder"]["block_0"]
        packed = blk["self_attention"]["qkv_packed"]
        assert packed["kernel_q"].dtype == jnp.int8
        assert packed["kernel_q"].shape[1] == 3 * packed["kernel_q"].shape[0]
        assert "q" not in blk["self_attention"]  # packed + merged
        assert "lora_a" not in blk["self_attention"]["o"]  # merged
        assert blk["ff"]["wi_0"]["kernel_q"].dtype == jnp.int8
        assert blk["ff"]["wo"]["kernel_scale"].dtype == jnp.float32
        out = qt5.apply({"params": qparams}, embeds, mask=mask,
                        method="encode")
        assert out.shape == (2, 10, 32)

    def test_int8_encoder_fidelity(self):
        """int8 encoder (LoRA merged) tracks float base+LoRA on random
        weights — the proxy test prescribed for every int8 mode."""
        t5, params, qt5, qparams, embeds, mask = self._encoder_pair()
        want = np.asarray(t5.apply({"params": params}, embeds, mask=mask,
                                   method="encode"), np.float32)
        got = np.asarray(qt5.apply({"params": qparams}, embeds, mask=mask,
                                   method="encode"), np.float32)
        cos = (got.ravel() @ want.ravel()) / (
            np.linalg.norm(got) * np.linalg.norm(want))
        assert cos > 0.99, cos
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel < 0.15, rel

    def test_no_lora_variant(self):
        t5, params, qt5, qparams, embeds, mask = self._encoder_pair(
            lora_rank=0)
        want = np.asarray(t5.apply({"params": params}, embeds, mask=mask,
                                   method="encode"), np.float32)
        got = np.asarray(qt5.apply({"params": qparams}, embeds, mask=mask,
                                   method="encode"), np.float32)
        cos = (got.ravel() @ want.ravel()) / (
            np.linalg.norm(got) * np.linalg.norm(want))
        assert cos > 0.99, cos


class TestBlip2MRQuantizeInference:
    def _samples(self, b=1, t=2):
        rng = np.random.default_rng(0)
        return {
            "video": rng.standard_normal((b, t, 28, 28, 3)).astype(np.float32),
            "timestamps": np.stack([np.linspace(0.0, 10.0, t)] * b),
            "duration": np.full((b,), 10.0),
            "query_id": ["q0"] * b,
            "video_prompt_end": ["<extra_id_0>"] * b,
            "query_prompt": ["Query: something\n"] * b,
            "task_prompt": ["Find it.\nRelevant windows: "] * b,
            "relevant_windows": ["[[1, 2]]"] * b,
        }

    def test_quantize_encoder_generate(self):
        from mr_blip_tpu.models.blip2_mr import BLIP2_MR

        model = BLIP2_MR(
            img_size=28, vit_model="tiny", t5_model="tiny", task="lora",
            num_beams=2, max_new_tokens=6, compute_dtype="float32",
        )
        samples = self._samples()
        float_out = model.generate(samples)
        model.quantize_encoder()
        assert model.t5_config.int8_encoder
        enc = model.params["t5"]["encoder"]
        attn = (enc["block"] if "block" in enc else enc["block_0"])[
            "self_attention"]
        assert attn["qkv_packed"]["kernel_q"].dtype == jnp.int8
        int8_out = model.generate(samples)
        assert isinstance(int8_out["prediction"][0], str)
        assert len(int8_out["prediction"]) == len(float_out["prediction"])

    def test_quantize_for_inference_chain(self):
        from mr_blip_tpu.models.blip2_mr import BLIP2_MR

        model = BLIP2_MR(
            img_size=28, vit_model="tiny", t5_model="tiny", task="lora",
            num_beams=2, max_new_tokens=6, compute_dtype="float32",
        )
        model.quantize_for_inference()
        assert model.vit_config.int8_matmul
        assert model.t5_config.int8_encoder
        assert model.t5_config.int8_decode
        out = model.generate(self._samples())
        assert isinstance(out["prediction"][0], str)
        with pytest.raises(AssertionError):
            model.quantize_encoder()


class TestInt8QFormerCross:
    """Packed W8A8 cross-attention K/V for the Q-Former."""

    def _pair(self):
        from mr_blip_tpu.models.qformer import QFormer, qformer_tiny_config
        from mr_blip_tpu.models.quantize import quantize_qformer_cross_params

        cfg = qformer_tiny_config(encoder_width=48)
        cfg = dataclasses.replace(cfg, dropout=0.0)
        qf = QFormer(cfg, compute_dtype=jnp.float32)
        rng = np.random.default_rng(5)
        enc = jnp.asarray(rng.standard_normal((3, 7, 48)), jnp.float32)
        params = qf.init(jax.random.PRNGKey(0), enc)["params"]
        qcfg = dataclasses.replace(cfg, int8_cross=True)
        qqf = QFormer(qcfg, compute_dtype=jnp.float32)
        qparams = quantize_qformer_cross_params(params)
        return qf, params, qqf, qparams, enc

    def test_layout_and_fidelity(self):
        qf, params, qqf, qparams, enc = self._pair()
        cross = qparams["layer_0"]["cross_attention"]
        assert cross["kv_packed"]["kernel_q"].dtype == jnp.int8
        assert "key" not in cross and "value" not in cross
        # self-attention layers untouched
        assert "Dense_0" in qparams["layer_0"]["self_attention"]["key"]

        want = np.asarray(qf.apply({"params": params}, enc), np.float32)
        got = np.asarray(qqf.apply({"params": qparams}, enc), np.float32)
        cos = (got.ravel() @ want.ravel()) / (
            np.linalg.norm(got) * np.linalg.norm(want))
        assert cos > 0.99, cos

    def test_blip2_chain_includes_qformer(self):
        from mr_blip_tpu.models.blip2_mr import BLIP2_MR

        model = BLIP2_MR(
            img_size=28, vit_model="tiny", t5_model="tiny", task="lora",
            num_beams=2, max_new_tokens=6, compute_dtype="float32",
        )
        model.quantize_for_inference()
        assert model.qformer_config.int8_cross
        cross = model.params["qformer"]["layer_0"]["cross_attention"]
        assert cross["kv_packed"]["kernel_q"].dtype == jnp.int8
        out = model.generate(TestBlip2MRQuantizeInference._samples(
            TestBlip2MRQuantizeInference()))
        assert isinstance(out["prediction"][0], str)
