"""W8A8 int8 ViT inference path (VERDICT r2 next-round #1).

Covers: kernel logic == jnp reference (Pallas interpreter mode), the
quantized-params layout transform, fidelity of the int8 EVA-ViT forward vs
float on random weights, and the BLIP2_MR.quantize_vit() integration.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mr_blip_tpu.ops.int8_matmul import (
    _quant_rows,
    _w8a8_linear_ref,
    _w8a8_mlp_ref,
    w8a8_linear,
    w8a8_mlp,
)


def _qw(rng, k, n):
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    s = np.maximum(np.abs(w).max(0), 1e-8) / 127.0
    q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
    return jnp.asarray(q), jnp.asarray(s), w


class TestKernelVsReference:
    """Pallas kernel (interpreter mode) must match the jnp emulation
    bit-for-bit — both paths implement the same quantization arithmetic."""

    def test_linear_matches_ref(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((48, 128)), jnp.bfloat16)
        wq, sw, _ = _qw(rng, 128, 256)
        bias = jnp.asarray(rng.standard_normal((256,)), jnp.float32)
        ker = w8a8_linear(x, wq, sw, bias, block_m=16, block_n=128,
                          interpret=True)
        ref = _w8a8_linear_ref(x, wq, sw, bias)
        # interpreter-mode arithmetic ordering differs by <=2 bf16 ulps
        np.testing.assert_allclose(
            np.asarray(ker, np.float32), np.asarray(ref, np.float32),
            rtol=0.02, atol=0.03,
        )

    def test_linear_no_bias_and_padding(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((10, 128)), jnp.bfloat16)  # pads to 16
        wq, sw, _ = _qw(rng, 128, 128)
        ker = w8a8_linear(x, wq, sw, None, block_m=16, block_n=128,
                          interpret=True)
        ref = _w8a8_linear_ref(x, wq, sw, None)
        assert ker.shape == (10, 128)
        np.testing.assert_allclose(
            np.asarray(ker, np.float32), np.asarray(ref, np.float32),
            rtol=0.02, atol=0.03,
        )

    def test_mlp_matches_ref(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((32, 128)), jnp.bfloat16)
        w1q, s1, _ = _qw(rng, 128, 256)
        w2q, s2, _ = _qw(rng, 256, 128)
        b1 = jnp.asarray(rng.standard_normal((256,)) * 0.01, jnp.float32)
        b2 = jnp.asarray(rng.standard_normal((128,)) * 0.01, jnp.float32)
        ker = w8a8_mlp(x, w1q, s1, b1, w2q, s2, b2, block_m=16, block_h=128,
                       interpret=True)
        ref = _w8a8_mlp_ref(x, w1q, s1, b1, w2q, s2, b2, block_h=128)
        np.testing.assert_allclose(
            np.asarray(ker, np.float32), np.asarray(ref, np.float32),
            rtol=0.05, atol=0.05,
        )

    def test_residual_epilogue(self):
        """``residual=`` adds the skip tensor in the kernel epilogue —
        kernel (interpreter) must match ref + residual for linear, mlp,
        and the gated mlp, including a ragged (boundary-masked) M."""
        from mr_blip_tpu.ops.int8_matmul import (
            _w8a8_mlp_gated_ref,
            w8a8_mlp_gated,
        )

        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal((27, 128)), jnp.bfloat16)
        r = jnp.asarray(rng.standard_normal((27, 128)), jnp.bfloat16)
        wq, sw, _ = _qw(rng, 128, 128)
        ker = w8a8_linear(x, wq, sw, None, residual=r, block_m=16,
                          block_n=128, interpret=True)
        ref = _w8a8_linear_ref(x, wq, sw, None).astype(jnp.float32) + \
            r.astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(ker, np.float32),
                                   np.asarray(ref), rtol=0.02, atol=0.05)

        w1q, s1, _ = _qw(rng, 128, 256)
        w2q, s2, _ = _qw(rng, 256, 128)
        b1 = jnp.asarray(rng.standard_normal((256,)) * 0.01, jnp.float32)
        b2 = jnp.asarray(rng.standard_normal((128,)) * 0.01, jnp.float32)
        ker = w8a8_mlp(x, w1q, s1, b1, w2q, s2, b2, residual=r, block_m=16,
                       block_h=128, interpret=True)
        ref = _w8a8_mlp_ref(x, w1q, s1, b1, w2q, s2, b2,
                            block_h=128).astype(jnp.float32) + \
            r.astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(ker, np.float32),
                                   np.asarray(ref), rtol=0.05, atol=0.05)

        w0q, s0, _ = _qw(rng, 128, 256)
        ker = w8a8_mlp_gated(x, w0q, s0, w1q, s1, w2q, s2, residual=r,
                             block_m=16, block_h=128, interpret=True)
        ref = _w8a8_mlp_gated_ref(x, w0q, s0, w1q, s1, w2q, s2,
                                  block_h=128).astype(jnp.float32) + \
            r.astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(ker, np.float32),
                                   np.asarray(ref), rtol=0.05, atol=0.06)

    def test_quant_rows_roundtrip(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((8, 64)), jnp.float32)
        q, s = _quant_rows(x)
        deq = np.asarray(q, np.float32) * np.asarray(s)
        err = np.abs(deq - np.asarray(x)).max()
        assert err <= np.asarray(s).max() * 0.5 + 1e-6  # round-to-nearest


class TestLinearFidelity:
    def test_linear_close_to_float(self):
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.standard_normal((64, 256)), jnp.bfloat16)
        wq, sw, w = _qw(rng, 256, 128)
        got = np.asarray(w8a8_linear(x, wq, sw, None), np.float32)
        want = np.asarray(x, np.float32) @ w
        cos = (got.ravel() @ want.ravel()) / (
            np.linalg.norm(got) * np.linalg.norm(want)
        )
        assert cos > 0.999, cos


class TestInt8ViT:
    def _vit_pair(self, depth=2, d=64, heads=2, hidden=128, img=28):
        from mr_blip_tpu.models.eva_vit import EvaViT, ViTConfig
        from mr_blip_tpu.models.quantize import quantize_vit_params

        cfg = ViTConfig(img_size=img, patch_size=14, embed_dim=d, depth=depth,
                        num_heads=heads, mlp_hidden_dim=hidden)
        vit = EvaViT(cfg, compute_dtype=jnp.float32)
        rng = np.random.default_rng(5)
        imgs = jnp.asarray(rng.standard_normal((2, img, img, 3)), jnp.float32)
        params = vit.init(jax.random.PRNGKey(0), imgs)["params"]
        # non-trivial weights
        params = jax.tree.map(
            lambda p: p + 0.02 * jnp.asarray(
                np.random.default_rng(7).standard_normal(p.shape), p.dtype
            ) if p.dtype != jnp.int8 else p,
            params,
        )
        qcfg = dataclasses.replace(cfg, int8_matmul=True)
        qvit = EvaViT(qcfg, compute_dtype=jnp.float32)
        qparams = quantize_vit_params(params)
        return vit, params, qvit, qparams, imgs

    def test_quantized_layout(self):
        _, params, qvit, qparams, imgs = self._vit_pair()
        blk = qparams["blocks_0"]
        assert blk["attn"]["qkv"]["kernel_q"].dtype == jnp.int8
        assert "Dense_0" not in blk["attn"]["qkv"]
        assert blk["mlp"]["fc1"]["kernel_q"].dtype == jnp.int8
        assert blk["mlp"]["fc2"]["kernel_scale"].dtype == jnp.float32
        # quantized tree initializes cleanly under the int8 module (layout
        # compatibility with _QDenseParams)
        out = qvit.apply({"params": qparams}, imgs)
        assert out.shape[0] == 2

    def test_int8_vit_fidelity(self):
        """int8 forward tracks the float forward on random weights —
        the proxy test prescribed by VERDICT (like test_int8_decode)."""
        vit, params, qvit, qparams, imgs = self._vit_pair()
        want = np.asarray(vit.apply({"params": params}, imgs), np.float32)
        got = np.asarray(qvit.apply({"params": qparams}, imgs), np.float32)
        cos = (got.ravel() @ want.ravel()) / (
            np.linalg.norm(got) * np.linalg.norm(want)
        )
        assert cos > 0.99, cos
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel < 0.15, rel


class TestBlip2MRQuantizeViT:
    def test_quantize_vit_generate(self):
        from mr_blip_tpu.models.blip2_mr import BLIP2_MR

        model = BLIP2_MR(
            img_size=28, vit_model="tiny", t5_model="tiny", task="lora",
            num_beams=2, max_new_tokens=6, compute_dtype="float32",
        )
        rng = np.random.default_rng(0)
        b, t = 1, 2
        samples = {
            "video": rng.standard_normal((b, t, 28, 28, 3)).astype(np.float32),
            "timestamps": np.stack([np.linspace(0.0, 10.0, t)] * b),
            "duration": np.full((b,), 10.0),
            "query_id": ["q0"],
            "video_prompt_end": ["<extra_id_0>"] * b,
            "query_prompt": ["Query: something\n"] * b,
            "task_prompt": ["Find it.\nRelevant windows: "] * b,
            "relevant_windows": ["[[1, 2]]"] * b,
        }
        float_out = model.generate(samples)
        model.quantize_vit()
        assert model.vit_config.int8_matmul
        vit = model.params["visual_encoder"]
        # default flagship layout is scan (stacked "blocks")
        q = (vit["blocks"] if "blocks" in vit else vit["blocks_0"])[
            "attn"]["qkv"]
        assert q["kernel_q"].dtype == jnp.int8
        int8_out = model.generate(samples)  # runs through the rebuilt module
        assert isinstance(int8_out["prediction"][0], str)
        assert len(int8_out["prediction"]) == len(float_out["prediction"])

    def test_double_quantize_rejected(self):
        from mr_blip_tpu.models.blip2_mr import BLIP2_MR

        model = BLIP2_MR(
            img_size=28, vit_model="tiny", t5_model="tiny", task="lora",
            num_beams=2, max_new_tokens=6, compute_dtype="float32",
        )
        model.quantize_vit()
        with pytest.raises(AssertionError):
            model.quantize_vit()


class TestInt8VitTrain:
    """Frozen int8 ViT inside a real train step (model.int8_vit in a train
    config): _loss_fn stop-grads the ViT params so autodiff never touches
    the forward-only Pallas kernels; the optimizer's freeze branch handles
    the int8 leaves (float0 -> integer-zero rewrite in make_train_step)."""

    def test_train_step_through_quantized_vit(self):
        from mr_blip_tpu.models.blip2_mr import BLIP2_MR
        from mr_blip_tpu.runners.train_state import (
            TrainState, make_optimizer, make_train_step,
        )

        model = BLIP2_MR(
            img_size=28, vit_model="tiny", t5_model="tiny", task="lora",
            num_beams=2, max_new_tokens=6, compute_dtype="float32",
        )
        model.quantize_vit()
        rng = np.random.default_rng(0)
        b, t = 2, 2
        samples = {
            "video": rng.standard_normal((b, t, 28, 28, 3)).astype(np.float32),
            "timestamps": np.stack([np.linspace(0.0, 10.0, t)] * b),
            "duration": np.full((b,), 10.0),
            "query_id": [f"q{i}" for i in range(b)],
            "video_prompt_end": ["<extra_id_0>"] * b,
            "query_prompt": ["Query: something\n"] * b,
            "task_prompt": ["Find it.\nRelevant windows: "] * b,
            "relevant_windows": ["[[1, 2]]"] * b,
        }
        batch = model.prepare_mr_batch(samples)
        batch.pop("video_prompt")
        tx = make_optimizer(weight_decay=0.05,
                            trainable_mask=model.trainable_mask())
        state = TrainState.create(model.params, tx)
        step = make_train_step(model._loss_fn, donate=False)
        vit_before = jax.tree.map(
            np.asarray, state.params["visual_encoder"])
        qf_before = np.asarray(jax.tree.leaves(
            state.params["qformer"])[0])
        state, loss = step(state, batch, 1e-2, jax.random.PRNGKey(0))
        state, loss = step(state, batch, 1e-2, jax.random.PRNGKey(0))
        assert np.isfinite(float(loss))
        # int8 ViT leaves (incl. int8 kernels) bitwise untouched
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
            vit_before, state.params["visual_encoder"],
        )
        # trainable Q-Former actually moved
        qf_after = np.asarray(jax.tree.leaves(state.params["qformer"])[0])
        assert not np.array_equal(qf_before, qf_after)
