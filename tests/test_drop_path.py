"""Stochastic depth (drop_path) — VERDICT r2 next-round #7.

Reference: eva_vit.py create_eva_vit_g defaults drop_path_rate=0.4
(eva_vit.py:415); TimeSformer/base ViT use timm DropPath too. Training
parity for unfrozen-ViT finetunes; eval mode must be identity (parity
tests stay bit-exact).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mr_blip_tpu.models.eva_vit import EvaViT, ViTConfig
from mr_blip_tpu.models.layers import DropPath


class TestDropPathLayer:
    def test_identity_in_eval(self):
        x = jnp.ones((4, 3, 8))
        dp = DropPath(0.5)
        y = dp.apply({}, x, deterministic=True)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))

    def test_per_sample_drop_and_scaling(self):
        x = jnp.ones((512, 2))
        dp = DropPath(0.25)
        y = dp.apply({}, x, deterministic=False,
                     rngs={"drop_path": jax.random.PRNGKey(0)})
        y = np.asarray(y)
        # rows are either fully dropped or scaled by 1/keep
        row_vals = np.unique(y.round(5))
        assert set(row_vals) <= {0.0, np.float32(1 / 0.75).round(5)}
        # drop fraction near the rate
        frac = (y[:, 0] == 0).mean()
        assert 0.1 < frac < 0.4, frac


class TestViTDropPath:
    def _vit(self, rate):
        cfg = ViTConfig(img_size=28, patch_size=14, embed_dim=32, depth=3,
                        num_heads=2, mlp_hidden_dim=64, drop_path_rate=rate)
        return EvaViT(cfg, compute_dtype=jnp.float32)

    def test_eval_unaffected_by_rate(self):
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.standard_normal((2, 28, 28, 3)), jnp.float32)
        v0, v4 = self._vit(0.0), self._vit(0.4)
        params = v0.init(jax.random.PRNGKey(0), imgs)["params"]
        out0 = v0.apply({"params": params}, imgs)
        out4 = v4.apply({"params": params}, imgs)  # deterministic default
        np.testing.assert_array_equal(np.asarray(out0), np.asarray(out4))

    def test_train_mode_stochastic_and_grads_flow(self):
        rng = np.random.default_rng(1)
        imgs = jnp.asarray(rng.standard_normal((4, 28, 28, 3)), jnp.float32)
        vit = self._vit(0.5)
        params = vit.init(jax.random.PRNGKey(0), imgs)["params"]

        def run(key):
            return vit.apply({"params": params}, imgs, False,
                             rngs={"drop_path": key})

        o1 = np.asarray(run(jax.random.PRNGKey(1)))
        o2 = np.asarray(run(jax.random.PRNGKey(2)))
        assert not np.allclose(o1, o2)  # different drop masks

        def loss(p, key):
            out = vit.apply({"params": p}, imgs, False,
                            rngs={"drop_path": key})
            return jnp.sum(out ** 2)

        grads = jax.grad(loss)(params, jax.random.PRNGKey(3))
        # gradients flow through surviving branches incl. the LAST block
        # (rate ramps linearly; block 0 has rate 0)
        gnorm = np.asarray(jnp.linalg.norm(
            grads["blocks_2"]["mlp"]["fc1"]["Dense_0"]["kernel"]))
        assert gnorm > 0

    def test_timesformer_drop_path_smoke(self):
        from mr_blip_tpu.models.timesformer import (
            TimeSformer, TimeSformerConfig,
        )

        cfg = TimeSformerConfig(img_size=28, patch_size=14, n_frms=2,
                                embed_dim=32, depth=2, num_heads=2,
                                drop_path_rate=0.3)
        m = TimeSformer(cfg, compute_dtype=jnp.float32)
        rng = np.random.default_rng(2)
        video = jnp.asarray(rng.standard_normal((2, 2, 28, 28, 3)), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), video)["params"]
        out_eval = m.apply({"params": params}, video)
        o1 = m.apply({"params": params}, video, False,
                     rngs={"drop_path": jax.random.PRNGKey(1)})
        o2 = m.apply({"params": params}, video, False,
                     rngs={"drop_path": jax.random.PRNGKey(2)})
        assert out_eval.shape == o1.shape
        assert not np.allclose(np.asarray(o1), np.asarray(o2))
