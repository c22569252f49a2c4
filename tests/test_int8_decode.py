"""int8 weight-only decode: layout converter + T5 decoder fidelity."""

import jax
import jax.numpy as jnp
import numpy as np

from mr_blip_tpu.models.layers import Dense
from mr_blip_tpu.models.quantize import (
    dequantize_dense,
    quantize_dense,
    quantize_t5_decoder_params,
)
from mr_blip_tpu.models.t5 import T5ForConditionalGeneration, t5_tiny_config


class TestDenseQuantize:
    def test_quantized_dense_matches_manual_dequant(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((3, 16)), jnp.float32)
        dense = Dense(8, use_bias=True, compute_dtype=jnp.float32)
        params = dense.init(jax.random.PRNGKey(0), x)["params"]

        qparams = quantize_dense(params)
        qdense = Dense(8, use_bias=True, compute_dtype=jnp.float32,
                       quantize=True)
        got = qdense.apply({"params": qparams}, x)

        w = np.asarray(qparams["kernel_q"], np.float32) * np.asarray(
            qparams["kernel_scale"])
        want = np.asarray(x) @ w + np.asarray(params["Dense_0"]["bias"])
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)

    def test_roundtrip_error_bounded(self):
        rng = np.random.default_rng(1)
        w = rng.standard_normal((64, 32)).astype(np.float32)
        tree = {"Dense_0": {"kernel": jnp.asarray(w)}}
        back = dequantize_dense(quantize_dense(tree))
        w2 = np.asarray(back["Dense_0"]["kernel"])
        # symmetric per-channel int8: error <= scale/2 per element
        scale = np.abs(w).max(axis=0) / 127.0
        assert (np.abs(w - w2) <= scale / 2 + 1e-7).all()

    def test_lora_delta_survives_quantization(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((2, 16)), jnp.float32)
        dense = Dense(8, use_bias=False, compute_dtype=jnp.float32,
                      lora_rank=2)
        params = jax.tree.map(
            lambda a: jnp.asarray(rng.standard_normal(a.shape), a.dtype)
            if a.dtype == jnp.float32 else a,
            dense.init(jax.random.PRNGKey(0), x)["params"],
        )
        qparams = quantize_dense(params)
        assert "lora_a" in qparams and "lora_b" in qparams
        qdense = Dense(8, use_bias=False, compute_dtype=jnp.float32,
                       lora_rank=2, quantize=True)
        got = qdense.apply({"params": qparams}, x)
        # manual: dequant kernel + lora delta
        w = np.asarray(qparams["kernel_q"], np.float32) * np.asarray(
            qparams["kernel_scale"])
        delta = (np.asarray(x) @ np.asarray(params["lora_a"])
                 @ np.asarray(params["lora_b"])) * (8.0 / 2)
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(x) @ w + delta,
                                   rtol=1e-4, atol=1e-4)


class TestT5Int8Decode:
    def test_decoder_logits_close_to_float(self):
        cfg = t5_tiny_config(lora_rank=2)
        qcfg = t5_tiny_config(lora_rank=2, int8_decode=True)
        model = T5ForConditionalGeneration(cfg, compute_dtype=jnp.float32)
        qmodel = T5ForConditionalGeneration(qcfg, compute_dtype=jnp.float32)

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((2, 10, cfg.d_model)) * 0.3,
                        jnp.float32)
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 5)), jnp.int32)
        params = model.init(jax.random.PRNGKey(1), x, ids)["params"]
        qparams = quantize_t5_decoder_params(params)

        want = model.apply({"params": params}, x, ids)
        got = qmodel.apply({"params": qparams}, x, ids)
        # int8 weight rounding error only — logits track closely
        err = np.abs(np.asarray(got) - np.asarray(want))
        ref = np.abs(np.asarray(want)).max() + 1e-6
        assert err.max() / ref < 0.05, (err.max(), ref)
        # argmax agreement on nearly all positions
        agree = (np.asarray(got).argmax(-1) == np.asarray(want).argmax(-1))
        assert agree.mean() > 0.9

    def test_encoder_untouched_by_converter(self):
        cfg = t5_tiny_config()
        model = T5ForConditionalGeneration(cfg, compute_dtype=jnp.float32)
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.standard_normal((1, 6, cfg.d_model)), jnp.float32)
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 3)), jnp.int32)
        params = model.init(jax.random.PRNGKey(2), x, ids)["params"]
        qparams = quantize_t5_decoder_params(params)
        a = jax.tree.leaves(params["encoder"])
        b = jax.tree.leaves(qparams["encoder"])
        assert all(np.array_equal(np.asarray(x), np.asarray(y))
                   for x, y in zip(a, b))


class TestBlip2MRInt8Wiring:
    def test_quantize_for_decode_generate(self):
        from tests.test_blip2_mr import _mr_samples
        from mr_blip_tpu.models.blip2_mr import BLIP2_MR

        model = BLIP2_MR(
            img_size=28, vit_model="tiny", t5_model="tiny",
            num_beams=2, max_new_tokens=8, task="lora",
            compute_dtype="float32",
        )
        samples = _mr_samples()
        float_out = model.generate(samples)

        model.quantize_for_decode()
        assert model.t5_config.int8_decode
        # decoder kernels really are int8 now
        dec = model.params["t5"]["decoder"]
        q = (dec["block"] if "block" in dec else dec["block_0"])[
            "self_attention"]["q"]
        assert q["kernel_q"].dtype == jnp.int8 and "kernel_scale" in q
        out = model.generate(samples)
        assert set(out.keys()) == set(float_out.keys())
        assert len(out["prediction"]) == len(float_out["prediction"])


class TestInt8CrossCache:
    """``T5Config.int8_cross_cache``: the decode-time cross-attention K/V
    cache stored int8 with per-channel scales (the cache read is the decode
    step's largest HBM term after the weights — 1.6 GB/step bf16 at the
    flagship shape). The K scale folds into q, the V scale applies after
    PV; both beam-deduped (b_enc != b) and plain (beams == 1) shapes ride
    the quantized branch."""

    def _logits(self, cfg, params, embeds, mask, tokens, beams):
        import dataclasses as _dc  # noqa: F401 (kept local for clarity)
        model = T5ForConditionalGeneration(
            cfg, compute_dtype=jnp.float32, decode_cache_len=4
        )
        B = embeds.shape[0]
        enc = model.apply({"params": params}, embeds, mask, method="encode")
        _, vars0 = model.apply(
            {"params": params}, jnp.zeros((B * beams, 1), jnp.int32), enc,
            encoder_mask=mask, decode=True, decode_position=jnp.int32(0),
            method="decode", mutable=["cache"],
        )
        logits, _ = model.apply(
            {"params": params, "cache": vars0["cache"]}, tokens, enc,
            encoder_mask=mask, decode=True, decode_position=jnp.int32(0),
            method="decode", mutable=["cache"],
        )
        return np.asarray(logits)

    @staticmethod
    def _setup(beams):
        import dataclasses

        cfg = t5_tiny_config(vocab_size=64)
        qcfg = dataclasses.replace(cfg, int8_cross_cache=True)
        rng = np.random.default_rng(7)
        B, M = 2, 6
        model = T5ForConditionalGeneration(
            cfg, compute_dtype=jnp.float32, decode_cache_len=4
        )
        embeds = jnp.asarray(rng.standard_normal((B, M, cfg.d_model)),
                             jnp.float32)
        mask = jnp.ones((B, M), jnp.int32)
        params = model.init(
            jax.random.PRNGKey(0), embeds, jnp.zeros((B, 2), jnp.int32)
        )["params"]
        params = jax.tree.map(
            lambda a: jnp.asarray(
                rng.standard_normal(a.shape) * 0.05, a.dtype),
            params,
        )
        tokens = jnp.asarray(rng.integers(0, 64, (B * beams, 1)), jnp.int32)
        return cfg, qcfg, params, embeds, mask, tokens

    def test_close_to_float_beamed(self):
        cfg, qcfg, params, embeds, mask, tokens = self._setup(beams=3)
        lf = self._logits(cfg, params, embeds, mask, tokens, 3)
        lq = self._logits(qcfg, params, embeds, mask, tokens, 3)
        assert (lf.argmax(-1) == lq.argmax(-1)).mean() > 0.9
        cos = (lf * lq).sum() / (np.linalg.norm(lf) * np.linalg.norm(lq))
        assert cos > 0.999, cos

    def test_close_to_float_unbeamed(self):
        cfg, qcfg, params, embeds, mask, tokens = self._setup(beams=1)
        lf = self._logits(cfg, params, embeds, mask, tokens, 1)
        lq = self._logits(qcfg, params, embeds, mask, tokens, 1)
        cos = (lf * lq).sum() / (np.linalg.norm(lf) * np.linalg.norm(lq))
        assert cos > 0.999, cos

    def test_cache_dtypes(self):
        import dataclasses

        cfg, qcfg, params, embeds, mask, tokens = self._setup(beams=3)
        model = T5ForConditionalGeneration(
            qcfg, compute_dtype=jnp.float32, decode_cache_len=4
        )
        enc = model.apply({"params": params}, embeds, mask, method="encode")
        _, vars0 = model.apply(
            {"params": params}, jnp.zeros((6, 1), jnp.int32), enc,
            encoder_mask=mask, decode=True, decode_position=jnp.int32(0),
            method="decode", mutable=["cache"],
        )
        from flax import traverse_util

        flat = traverse_util.flatten_dict(vars0["cache"])
        cross_kv = [v for k, v in flat.items()
                    if "cross_attention" in k and k[-1] in
                    ("cached_key", "cached_value")]
        assert cross_kv and all(v.dtype == jnp.int8 for v in cross_kv)
        scales = [v for k, v in flat.items()
                  if "cross_attention" in k and k[-1].endswith("_scale")]
        assert scales and all(v.dtype == jnp.float32 for v in scales)
