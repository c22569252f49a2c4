"""Inherited model zoo: base ViT, CLIP, TimeSformer, PerturbedTopK."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mr_blip_tpu.models.clip import CLIP, clip_contrastive_loss, clip_tiny_config
from mr_blip_tpu.models.timesformer import TimeSformer, timesformer_tiny_config
from mr_blip_tpu.models.topk import PerturbedTopK, perturbed_topk
from mr_blip_tpu.models.vit import BaseViTConfig, VisionTransformer


class TestBaseViT:
    def test_token_output(self):
        cfg = BaseViTConfig(img_size=28, patch_size=14, embed_dim=32, depth=2,
                            num_heads=2)
        m = VisionTransformer(cfg, compute_dtype=jnp.float32)
        x = jnp.ones((2, 28, 28, 3))
        params = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(params, x)
        assert out.shape == (2, 5, 32)

    def test_classification_head(self):
        cfg = BaseViTConfig(img_size=28, patch_size=14, embed_dim=32, depth=1,
                            num_heads=2, num_classes=10)
        m = VisionTransformer(cfg, compute_dtype=jnp.float32)
        x = jnp.ones((2, 28, 28, 3))
        params = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(params, x).shape == (2, 10)


class TestCLIP:
    def test_contrastive_logits(self):
        cfg = clip_tiny_config()
        m = CLIP(cfg, compute_dtype=jnp.float32)
        rng = np.random.default_rng(0)
        imgs = jnp.array(rng.standard_normal((3, 28, 28, 3), np.float32))
        text = jnp.array(rng.integers(1, 90, (3, 8)))
        params = m.init(jax.random.PRNGKey(0), imgs, text)
        li, lt = m.apply(params, imgs, text)
        assert li.shape == (3, 3)
        np.testing.assert_allclose(np.asarray(li), np.asarray(lt).T, rtol=1e-5)
        loss = clip_contrastive_loss(li)
        assert np.isfinite(float(loss))

    def test_encode_apis(self):
        cfg = clip_tiny_config()
        m = CLIP(cfg, compute_dtype=jnp.float32)
        rng = np.random.default_rng(1)
        imgs = jnp.array(rng.standard_normal((2, 28, 28, 3), np.float32))
        text = jnp.array(rng.integers(1, 90, (2, 8)))
        params = m.init(jax.random.PRNGKey(0), imgs, text)
        img_f = m.apply(params, imgs, method="encode_image")
        txt_f = m.apply(params, text, method="encode_text")
        assert img_f.shape == (2, cfg.embed_dim)
        assert txt_f.shape == (2, cfg.embed_dim)


class TestTimeSformer:
    def test_divided_attention_shapes(self):
        cfg = timesformer_tiny_config()
        m = TimeSformer(cfg, compute_dtype=jnp.float32)
        video = jnp.ones((2, cfg.n_frms, 28, 28, 3))
        params = m.init(jax.random.PRNGKey(0), video)
        out = m.apply(params, video)
        assert out.shape == (2, 1 + cfg.n_frms * cfg.patches_per_frame,
                             cfg.embed_dim)

    def test_temporal_mixing(self):
        """Changing frame 1 must affect frame 0's tokens (temporal attn)."""
        cfg = timesformer_tiny_config()
        m = TimeSformer(cfg, compute_dtype=jnp.float32)
        rng = np.random.default_rng(0)
        video = jnp.array(rng.standard_normal((1, 2, 28, 28, 3), np.float32))
        params = m.init(jax.random.PRNGKey(0), video)
        out1 = m.apply(params, video)
        poked = video.at[0, 1].add(3.0)
        out2 = m.apply(params, poked)
        frame0 = slice(1, 1 + cfg.patches_per_frame)
        assert not np.allclose(np.asarray(out1[0, frame0]),
                               np.asarray(out2[0, frame0]))


class TestPerturbedTopK:
    def test_forward_concentrates_on_topk(self):
        x = jnp.array([[0.1, 5.0, 0.2, 4.0]])
        out = perturbed_topk(x, jax.random.PRNGKey(0), 2, num_samples=200,
                             sigma=0.05)
        assert out.shape == (1, 2, 4)
        # rows are soft one-hots over positions 1 and 3
        assert float(out[0, 0, 1]) > 0.9
        assert float(out[0, 1, 3]) > 0.9
        np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, atol=1e-5)

    def test_gradient_flows(self):
        module = PerturbedTopK(k=1, num_samples=500, sigma=0.5)

        def loss(x):
            ind = module(x, jax.random.PRNGKey(1))  # (B, 1, n)
            values = jnp.array([[1.0, 2.0, 3.0]])
            return (ind[:, 0] * values).sum()

        g = jax.grad(loss)(jnp.array([[0.5, 0.4, 0.3]]))
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0
        # raising x[2]'s score should increase the selected value (pos grad)
        assert float(g[0, 2]) > 0


class TestTimeSformerAttentionTypes:
    """Reference vit.py:148-156 flavors: joint_space_time (one attention
    over 1+T*P), space_only (independent frames, frame-averaged output,
    no time embedding)."""

    def test_joint_space_time(self):
        from mr_blip_tpu.models.timesformer import (
            TimeSformer, timesformer_tiny_config,
        )

        cfg = timesformer_tiny_config(attention_type="joint_space_time")
        m = TimeSformer(cfg, compute_dtype=jnp.float32)
        video = jnp.ones((2, cfg.n_frms, 28, 28, 3))
        params = m.init(jax.random.PRNGKey(0), video)
        out = m.apply(params, video)
        assert out.shape == (2, 1 + cfg.n_frms * cfg.patches_per_frame,
                             cfg.embed_dim)
        # joint blocks have a single attention (no temporal_attn params)
        assert "temporal_attn" not in params["params"]["blocks_0"]

    def test_space_only(self):
        import numpy as np

        from mr_blip_tpu.models.timesformer import (
            TimeSformer, timesformer_tiny_config,
        )

        cfg = timesformer_tiny_config(attention_type="space_only")
        m = TimeSformer(cfg, compute_dtype=jnp.float32)
        rng = np.random.default_rng(0)
        video = jnp.asarray(
            rng.standard_normal((2, cfg.n_frms, 28, 28, 3)), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), video)
        out = m.apply(params, video)
        # frame-averaged: (B, 1+P, D); no time embedding exists
        assert out.shape == (2, 1 + cfg.patches_per_frame, cfg.embed_dim)
        assert "time_embed" not in params["params"]

        # frames are independent: permuting frames must not change the
        # frame-averaged output
        perm = video[:, ::-1]
        out2 = m.apply(params, perm)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2),
                                   rtol=1e-5, atol=1e-5)

    def test_resize_embeds(self):
        import numpy as np

        from mr_blip_tpu.models.timesformer import (
            TimeSformer, resize_timesformer_embeds, timesformer_tiny_config,
        )

        cfg2 = timesformer_tiny_config(n_frms=2)
        cfg4 = timesformer_tiny_config(n_frms=4)
        m2 = TimeSformer(cfg2, compute_dtype=jnp.float32)
        m4 = TimeSformer(cfg4, compute_dtype=jnp.float32)
        v2 = jnp.ones((1, 2, 28, 28, 3))
        v4 = jnp.ones((1, 4, 28, 28, 3))
        p2 = m2.init(jax.random.PRNGKey(0), v2)["params"]
        resized = resize_timesformer_embeds(p2, new_n_frms=4)
        assert resized["time_embed"].shape == (1, 4, cfg2.embed_dim)
        # nearest-neighbor: every new row equals one of the old rows
        old = np.asarray(p2["time_embed"])[0]
        new = np.asarray(resized["time_embed"])[0]
        for row in new:
            assert any(np.array_equal(row, o) for o in old)
        # the resized tree loads into the 4-frame model and runs
        out = m4.apply({"params": resized}, v4)
        assert out.shape[1] == 1 + 4 * cfg4.patches_per_frame

        # same-size resize is the identity
        same = resize_timesformer_embeds(p2, new_n_frms=2, new_patches=4)
        np.testing.assert_array_equal(np.asarray(same["time_embed"]),
                                      np.asarray(p2["time_embed"]))
