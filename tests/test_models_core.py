"""Core model tests on tiny configs: shapes, dtype policy, cache consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mr_blip_tpu.models.eva_vit import EvaViT, vit_tiny_config
from mr_blip_tpu.models.qformer import QFormer, qformer_tiny_config
from mr_blip_tpu.models.t5 import (
    T5ForConditionalGeneration,
    cross_entropy_lm_loss,
    shift_right,
    t5_tiny_config,
)


class TestEvaViT:
    def test_output_shape_all_tokens(self):
        cfg = vit_tiny_config(img_size=28)  # 2x2 patches of 14
        model = EvaViT(cfg, compute_dtype=jnp.float32)
        x = jnp.ones((3, 28, 28, 3))
        params = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(params, x)
        assert out.shape == (3, 5, 32)  # cls + 4 patches, no final norm

    def test_bf16_compute_fp32_params(self):
        cfg = vit_tiny_config()
        model = EvaViT(cfg, compute_dtype=jnp.bfloat16)
        x = jnp.ones((1, 28, 28, 3))
        params = model.init(jax.random.PRNGKey(0), x)
        leaves = jax.tree.leaves(params)
        assert all(l.dtype == jnp.float32 for l in leaves)
        out = model.apply(params, x)
        assert out.dtype == jnp.bfloat16


class TestQFormer:
    def test_query_compression(self):
        cfg = qformer_tiny_config(encoder_width=32)
        model = QFormer(cfg, compute_dtype=jnp.float32)
        frames = jnp.ones((6, 5, 32))  # (B*T, vit_tokens, width)
        params = model.init(jax.random.PRNGKey(0), frames)
        out = model.apply(params, frames)
        assert out.shape == (6, cfg.num_query_tokens, cfg.hidden_size)

    def test_encoder_mask_blocks_tokens(self):
        cfg = qformer_tiny_config(encoder_width=32)
        model = QFormer(cfg, compute_dtype=jnp.float32)
        rng = np.random.default_rng(0)
        frames = jnp.array(rng.standard_normal((2, 5, 32), dtype=np.float32))
        params = model.init(jax.random.PRNGKey(0), frames)
        mask = jnp.array([[1, 1, 1, 1, 1], [1, 1, 0, 0, 0]])
        out_masked = model.apply(params, frames, encoder_mask=mask)
        # zeroing masked tokens must not change the output
        frames2 = frames.at[1, 2:].set(123.0)
        out_masked2 = model.apply(params, frames2, encoder_mask=mask)
        np.testing.assert_allclose(
            np.asarray(out_masked), np.asarray(out_masked2), atol=1e-5
        )


class TestT5:
    def _setup(self, decode_cache_len=0):
        cfg = t5_tiny_config()
        model = T5ForConditionalGeneration(
            cfg, compute_dtype=jnp.float32, decode_cache_len=decode_cache_len
        )
        rng = np.random.default_rng(0)
        inputs_embeds = jnp.array(rng.standard_normal((2, 7, cfg.d_model), np.float32))
        dec_ids = jnp.array(rng.integers(0, cfg.vocab_size, (2, 5)))
        return cfg, model, inputs_embeds, dec_ids

    def test_forward_logits_shape(self):
        cfg, model, inputs_embeds, dec_ids = self._setup()
        params = model.init(jax.random.PRNGKey(0), inputs_embeds, dec_ids)
        logits = model.apply(params, inputs_embeds, dec_ids)
        assert logits.shape == (2, 5, cfg.vocab_size)
        assert logits.dtype == jnp.float32

    def test_encoder_mask_invariance(self):
        cfg, model, inputs_embeds, dec_ids = self._setup()
        params = model.init(jax.random.PRNGKey(0), inputs_embeds, dec_ids)
        enc_mask = jnp.array([[1] * 7, [1, 1, 1, 0, 0, 0, 0]])
        out1 = model.apply(params, inputs_embeds, dec_ids, encoder_mask=enc_mask)
        poked = inputs_embeds.at[1, 3:].set(55.0)
        out2 = model.apply(params, poked, dec_ids, encoder_mask=enc_mask)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-4)

    def test_cached_decode_matches_teacher_forced(self):
        max_len = 5
        cfg, model, inputs_embeds, dec_ids = self._setup(decode_cache_len=max_len)
        assert dec_ids.shape[1] == max_len
        params = model.init(jax.random.PRNGKey(0), inputs_embeds, dec_ids)

        enc = model.apply(params, inputs_embeds, method="encode")
        full_logits = model.apply(params, dec_ids, enc, method="decode")

        # init cache with a single-token pass, then reset self-attn slots and
        # indices to zero; cross-attn K/V stay (they are encoder-derived).
        _, vars0 = model.apply(
            params, dec_ids[:, :1], enc, method="decode",
            decode=True, decode_position=jnp.int32(0), mutable=["cache"],
        )

        def fn(path, leaf):
            if any("cross_attention" in str(p) for p in path):
                return leaf
            return jnp.zeros_like(leaf)

        cache = jax.tree_util.tree_map_with_path(fn, vars0["cache"])

        logits_steps = []
        for t in range(max_len):
            step_logits, updated = model.apply(
                {**params, "cache": cache}, dec_ids[:, t : t + 1], enc,
                method="decode", decode=True, decode_position=jnp.int32(t),
                mutable=["cache"],
            )
            cache = updated["cache"]
            logits_steps.append(step_logits[:, 0])
        step_logits = jnp.stack(logits_steps, axis=1)
        np.testing.assert_allclose(
            np.asarray(step_logits), np.asarray(full_logits), rtol=1e-4, atol=1e-4
        )

    def test_shift_right_and_loss(self):
        labels = jnp.array([[5, 6, 1], [7, -100, -100]])
        shifted = shift_right(labels)
        np.testing.assert_array_equal(np.asarray(shifted), [[0, 5, 6], [0, 7, 0]])
        logits = jnp.zeros((2, 3, 10))
        mask = jnp.array([[1, 1, 1], [1, 0, 0]])
        loss = cross_entropy_lm_loss(logits, labels, mask)
        assert abs(float(loss) - np.log(10)) < 1e-5

    def test_lora_params_created_and_zero_init_delta(self):
        cfg = t5_tiny_config(lora_rank=4)
        model = T5ForConditionalGeneration(cfg, compute_dtype=jnp.float32)
        rng = np.random.default_rng(1)
        inputs_embeds = jnp.array(rng.standard_normal((1, 3, cfg.d_model), np.float32))
        dec_ids = jnp.array([[1, 2]])
        params = model.init(jax.random.PRNGKey(0), inputs_embeds, dec_ids)
        flat = jax.tree_util.tree_leaves_with_path(params)
        lora_keys = [p for p, _ in flat if "lora_a" in str(p) or "lora_b" in str(p)]
        assert len(lora_keys) > 0
        # lora_b zero-init -> same output as no-lora model with same base params
        cfg0 = t5_tiny_config(lora_rank=0)
        model0 = T5ForConditionalGeneration(cfg0, compute_dtype=jnp.float32)
        params0 = model0.init(jax.random.PRNGKey(0), inputs_embeds, dec_ids)
        out = model.apply(params, inputs_embeds, dec_ids)
        out0 = model0.apply(params0, inputs_embeds, dec_ids)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out0), atol=1e-5)


class TestMultimodalQFormer:
    def test_text_path_changes_queries(self):
        from mr_blip_tpu.models.qformer import QFormer, QFormerConfig

        cfg = QFormerConfig(
            hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
            encoder_width=32, num_query_tokens=4, vocab_size=100,
            with_text=True, dropout=0.0,
        )
        model = QFormer(cfg, compute_dtype=jnp.float32)
        rng = np.random.default_rng(0)
        frames = jnp.array(rng.standard_normal((2, 5, 32), np.float32))
        text = jnp.array(rng.integers(0, 100, (2, 6)))
        mask = jnp.ones((2, 6), jnp.int32)
        params = model.init(
            jax.random.PRNGKey(0), frames, text_ids=text, text_mask=mask
        )
        out_with = model.apply(params, frames, text_ids=text, text_mask=mask)
        assert out_with.shape == (2, 4, 32)
        other_text = jnp.array(rng.integers(0, 100, (2, 6)))
        out_other = model.apply(params, frames, text_ids=other_text, text_mask=mask)
        assert not np.allclose(np.asarray(out_with), np.asarray(out_other))

    def test_text_mask_blocks_padded_tokens(self):
        from mr_blip_tpu.models.qformer import QFormer, QFormerConfig

        cfg = QFormerConfig(
            hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
            encoder_width=32, num_query_tokens=4, vocab_size=100,
            with_text=True, dropout=0.0,
        )
        model = QFormer(cfg, compute_dtype=jnp.float32)
        rng = np.random.default_rng(1)
        frames = jnp.array(rng.standard_normal((1, 5, 32), np.float32))
        text = jnp.array([[5, 6, 7, 0, 0, 0]])
        mask = jnp.array([[1, 1, 1, 0, 0, 0]])
        params = model.init(
            jax.random.PRNGKey(0), frames, text_ids=text, text_mask=mask
        )
        out1 = model.apply(params, frames, text_ids=text, text_mask=mask)
        poked = text.at[0, 3:].set(99)
        out2 = model.apply(params, frames, text_ids=poked, text_mask=mask)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


class TestRemat:
    def test_remat_matches_plain_loss_and_grads(self):
        """use_remat must change memory, not math."""
        rng = np.random.default_rng(0)
        inputs_embeds = jnp.array(rng.standard_normal((2, 7, 32), np.float32))
        dec_ids = jnp.array(rng.integers(0, 256, (2, 5)))
        mask = jnp.ones((2, 5), jnp.int32)

        losses, grads = [], []
        for use_remat in (False, True):
            cfg = t5_tiny_config(use_remat=use_remat)
            model = T5ForConditionalGeneration(cfg, compute_dtype=jnp.float32)
            params = model.init(jax.random.PRNGKey(0), inputs_embeds, dec_ids)

            def loss_fn(p):
                logits = model.apply(p, inputs_embeds, dec_ids)
                labels = jnp.where(mask == 1, dec_ids, -100)
                return cross_entropy_lm_loss(logits, labels, mask)

            loss, grad = jax.value_and_grad(loss_fn)(params)
            losses.append(float(loss))
            grads.append(grad)

        assert losses[0] == pytest.approx(losses[1], rel=1e-6)
        for g0, g1 in zip(jax.tree.leaves(grads[0]), jax.tree.leaves(grads[1])):
            np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                                       rtol=1e-5, atol=1e-6)
