"""Scan-over-layers equivalence (ViTConfig/T5Config.scan_layers).

The flagship runs its depth-39 ViT and 24+24 T5 stacks under nn.scan so
XLA compiles ONE block body (round 4's 898 s cold compile was the unrolled
program). These tests pin: (a) bit-level-close numerical equivalence of
the scanned stacks vs the unrolled ones under converted params, (b) the
layout converters round-trip, (c) generation (layer-major cache beam
gather), training loss/grads, and quantized modes agree, and (d) flat
checkpoints load over scan models (and vice versa) via match_scan_layout.
"""

import dataclasses

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mr_blip_tpu.models.scan_utils import (
    match_scan_layout,
    stack_blip2_mr_params,
    stack_t5_blocks,
    stack_vit_blocks,
    unstack_t5_blocks,
    unstack_vit_blocks,
)

TOL = 5e-6


def _mr_samples(b=2, t=4):
    rng = np.random.default_rng(0)
    return {
        "video": rng.integers(0, 256, (b, t, 28, 28, 3), dtype=np.uint8),
        "timestamps": np.stack([np.linspace(0, 100, t, endpoint=False)] * b),
        "duration": np.full((b,), 100.0),
        "query_id": [f"q{i}" for i in range(b)],
        "video_prompt_end": ["<extra_id_0>"] * b,
        "query_prompt": ["Query: something\n"] * b,
        "task_prompt": ["Find windows: "] * b,
        "relevant_windows": ["[[10, 25]]"] * b,
    }


class TestViTScan:
    def test_forward_matches_unrolled(self):
        from mr_blip_tpu.models.eva_vit import EvaViT, vit_tiny_config

        cfg = vit_tiny_config()
        m_flat = EvaViT(cfg, compute_dtype=jnp.float32)
        m_scan = EvaViT(dataclasses.replace(cfg, scan_layers=True),
                        compute_dtype=jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 28, 28, 3))
        p_flat = flax.core.unfreeze(m_flat.init(jax.random.PRNGKey(0), x)["params"])
        p_scan = stack_vit_blocks(p_flat)
        y_flat = m_flat.apply({"params": p_flat}, x)
        y_scan = m_scan.apply({"params": p_scan}, x)
        assert float(jnp.abs(y_flat - y_scan).max()) < TOL
        # converters round-trip bit-exact
        back = unstack_vit_blocks(p_scan)
        for a, b in zip(jax.tree.leaves(p_flat), jax.tree.leaves(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_remat_scan_composes(self):
        from mr_blip_tpu.models.eva_vit import EvaViT, vit_tiny_config

        cfg = vit_tiny_config()
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 28, 28, 3))
        p = stack_vit_blocks(flax.core.unfreeze(
            EvaViT(cfg, compute_dtype=jnp.float32).init(
                jax.random.PRNGKey(0), x)["params"]))
        cfg_rs = dataclasses.replace(cfg, scan_layers=True, use_checkpoint=True)
        cfg_s = dataclasses.replace(cfg, scan_layers=True)
        y_rs = EvaViT(cfg_rs, compute_dtype=jnp.float32).apply({"params": p}, x)
        y_s = EvaViT(cfg_s, compute_dtype=jnp.float32).apply({"params": p}, x)
        assert float(jnp.abs(y_rs - y_s).max()) < TOL

    def test_drop_path_ramp_under_scan(self):
        """Stochastic depth rides as a scanned input: train mode runs and
        produces a different (finite) output than eval; eval is identity
        with the flat path."""
        from mr_blip_tpu.models.eva_vit import EvaViT, vit_tiny_config

        cfg = dataclasses.replace(vit_tiny_config(), scan_layers=True,
                                  drop_path_rate=0.5)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 28, 28, 3))
        m = EvaViT(cfg, compute_dtype=jnp.float32)
        p = m.init(jax.random.PRNGKey(0), x)["params"]
        y_eval = m.apply({"params": p}, x, True)
        y_train = m.apply({"params": p}, x, False,
                          rngs={"drop_path": jax.random.PRNGKey(7)})
        assert np.all(np.isfinite(np.asarray(y_train)))
        assert float(jnp.abs(y_eval - y_train).max()) > 1e-4


class TestT5Scan:
    def _models(self, **kw):
        from mr_blip_tpu.models.t5 import (
            T5ForConditionalGeneration, t5_tiny_config,
        )

        cfg_f = t5_tiny_config(**kw)
        cfg_s = dataclasses.replace(cfg_f, scan_layers=True)
        mf = T5ForConditionalGeneration(cfg_f, compute_dtype=jnp.float32,
                                        decode_cache_len=8)
        ms = T5ForConditionalGeneration(cfg_s, compute_dtype=jnp.float32,
                                        decode_cache_len=8)
        return mf, ms

    def test_forward_and_cached_decode_match(self):
        mf, ms = self._models(lora_rank=4)
        emb = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 32))
        dec_ids = jnp.array([[1, 2, 3], [4, 5, 6]], jnp.int32)
        pf = flax.core.unfreeze(
            mf.init(jax.random.PRNGKey(0), emb, dec_ids)["params"])
        ps = stack_t5_blocks(pf)
        yf = mf.apply({"params": pf}, emb, dec_ids)
        ys = ms.apply({"params": ps}, emb, dec_ids)
        assert float(jnp.abs(yf - ys).max()) < 1e-5

        # two cached decode steps: the stacked cache (leading layer axis)
        # must reproduce the flat per-layer caches step for step
        enc_f = mf.apply({"params": pf}, emb, method="encode")
        enc_s = ms.apply({"params": ps}, emb, method="encode")
        tok = jnp.array([[0], [0]], jnp.int32)
        cf = cs = None
        for pos in range(2):
            lf, vf = mf.apply(
                {"params": pf, **({"cache": cf} if cf is not None else {})},
                tok, enc_f, None, decode=True, decode_position=jnp.int32(pos),
                method="decode", mutable=["cache"])
            ls, vs = ms.apply(
                {"params": ps, **({"cache": cs} if cs is not None else {})},
                tok, enc_s, None, decode=True, decode_position=jnp.int32(pos),
                method="decode", mutable=["cache"])
            cf, cs = vf["cache"], vs["cache"]
            assert float(jnp.abs(lf - ls).max()) < 1e-5
        # cache leaves really are layer-stacked
        sc = flax.core.unfreeze(cs)["decoder"]["block"]["self_attention"]
        assert sc["cached_key"].shape[0] == 2  # num layers leading
        assert unstack_t5_blocks(stack_t5_blocks(pf))["encoder"].keys() == \
            pf["encoder"].keys()


class TestFlagshipScan:
    KW = dict(img_size=28, vit_model="tiny", t5_model="tiny", task="lora",
              num_beams=2, max_new_tokens=8, compute_dtype="float32", seed=7)

    @pytest.fixture(scope="class")
    def pair(self):
        from mr_blip_tpu.models.blip2_mr import BLIP2_MR

        m_flat = BLIP2_MR(scan_layers=False, **self.KW)
        m_scan = BLIP2_MR(scan_layers=True, init_params=False, **self.KW)
        m_scan.params = stack_blip2_mr_params(
            flax.core.unfreeze(m_flat.params))
        return m_flat, m_scan

    def test_generate_identical(self, pair):
        m_flat, m_scan = pair
        s = _mr_samples()
        assert m_flat.generate(dict(s))["prediction"] == \
            m_scan.generate(dict(s))["prediction"]

    def test_loss_and_lora_grads(self, pair):
        m_flat, m_scan = pair
        s = _mr_samples()
        bf = m_flat.prepare_mr_batch(dict(s)); bf.pop("video_prompt", None)
        bs = m_scan.prepare_mr_batch(dict(s)); bs.pop("video_prompt", None)
        lf = float(m_flat._loss_fn(m_flat.params, bf)[0])
        ls = float(m_scan._loss_fn(m_scan.params, bs)[0])
        assert abs(lf - ls) < 2e-4 + 1e-4 * abs(lf)
        g = jax.grad(lambda p: m_scan._loss_fn(p, bs)[0])(m_scan.params)
        lora = sum(
            float(jnp.abs(l).sum())
            for p, l in jax.tree_util.tree_leaves_with_path(g)
            if "lora" in str(p))
        assert lora > 0

    def test_flat_checkpoint_loads_over_scan_model(self, pair, tmp_path):
        m_flat, m_scan = pair
        path = str(tmp_path / "flat.msgpack")
        m_flat.save_params(m_flat.params, path)
        fresh = jax.tree.map(jnp.zeros_like, m_scan.params)
        restored = m_scan.load_params_nonstrict(fresh, path)
        for a, b in zip(jax.tree.leaves(restored),
                        jax.tree.leaves(m_scan.params)):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32))

    def test_match_scan_layout_unstacks_too(self, pair):
        m_flat, m_scan = pair
        from flax import serialization

        down = match_scan_layout(
            serialization.to_state_dict(m_scan.params),
            serialization.to_state_dict(m_flat.params))
        for a, b in zip(jax.tree.leaves(down),
                        jax.tree.leaves(serialization.to_state_dict(
                            m_flat.params))):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32))

    @pytest.mark.parametrize("mode", ["vit", "t5"])
    def test_per_stack_scan(self, pair, mode):
        """scan_layers='vit'/'t5' scans only that stack; predictions and
        loss must match the unrolled model under converted params."""
        from mr_blip_tpu.models.blip2_mr import BLIP2_MR

        m_flat, _ = pair
        m = BLIP2_MR(scan_layers=mode, init_params=False, **self.KW)
        assert (m.scan_vit, m.scan_t5) == ((mode == "vit"), (mode == "t5"))
        m.params = stack_blip2_mr_params(
            flax.core.unfreeze(m_flat.params),
            vit_scan=m.scan_vit, t5_scan=m.scan_t5)
        s = _mr_samples()
        assert m_flat.generate(dict(s))["prediction"] == \
            m.generate(dict(s))["prediction"]
        bf = m_flat.prepare_mr_batch(dict(s)); bf.pop("video_prompt", None)
        bs = m.prepare_mr_batch(dict(s)); bs.pop("video_prompt", None)
        lf = float(m_flat._loss_fn(m_flat.params, bf)[0])
        ls = float(m._loss_fn(m.params, bs)[0])
        assert abs(lf - ls) < 2e-4 + 1e-4 * abs(lf)

    def test_scan_layers_rejects_unknown_string(self):
        from mr_blip_tpu.models.blip2_mr import BLIP2_MR

        with pytest.raises(ValueError):
            BLIP2_MR(scan_layers="both", init_params=False, **self.KW)

    def test_remat_policy_dots_kernels_matches(self, pair):
        """use_grad_checkpoint + remat_policy='dots_kernels' (save MXU
        outputs, recompute elementwise) must not change loss or LoRA
        grads vs the un-rematerialized scan model."""
        from mr_blip_tpu.models.blip2_mr import BLIP2_MR

        m_flat, m_scan = pair
        m = BLIP2_MR(scan_layers=True, init_params=False,
                     use_grad_checkpoint=True,
                     remat_policy="dots_kernels", **self.KW)
        m.params = m_scan.params
        s = _mr_samples()
        bs = m_scan.prepare_mr_batch(dict(s)); bs.pop("video_prompt", None)
        br = m.prepare_mr_batch(dict(s)); br.pop("video_prompt", None)

        def lora_gradsum(model, batch):
            g = jax.grad(lambda p: model._loss_fn(p, batch)[0])(model.params)
            return {
                str(p): float(jnp.abs(l).sum())
                for p, l in jax.tree_util.tree_leaves_with_path(g)
                if "lora" in str(p)
            }

        ls = float(m_scan._loss_fn(m_scan.params, bs)[0])
        lr = float(m._loss_fn(m.params, br)[0])
        assert abs(ls - lr) < 1e-5 + 1e-5 * abs(ls)
        gs, gr = lora_gradsum(m_scan, bs), lora_gradsum(m, br)
        assert gs.keys() == gr.keys() and len(gs) > 0
        for k in gs:
            np.testing.assert_allclose(gr[k], gs[k], rtol=1e-4, atol=1e-6,
                                       err_msg=k)

    def test_remat_policy_rejects_unknown(self):
        from mr_blip_tpu.models.t5 import T5Config, _checkpoint_policy

        with pytest.raises(ValueError):
            _checkpoint_policy(T5Config(remat_policy="everything"))

    def test_t5_encoder_only_scan(self, pair):
        """scan_layers='vit+t5enc' scans the ViT and the T5 ENCODER but
        keeps the decoder unrolled (flat cache, no layer-major gather):
        the production inference default shape — encoder compile win with
        zero decode-loop cost."""
        from mr_blip_tpu.models.blip2_mr import BLIP2_MR

        m_flat, _ = pair
        m = BLIP2_MR(scan_layers="vit+t5enc", init_params=False, **self.KW)
        assert m.scan_vit and m.scan_t5 == "encoder"
        assert m.t5_config.scan_encoder and not m.t5_config.scan_decoder
        m.params = stack_blip2_mr_params(
            flax.core.unfreeze(m_flat.params),
            vit_scan=True, t5_scan="encoder")
        # encoder stacked, decoder flat
        assert "block" in m.params["t5"]["encoder"]
        assert "block_0" in m.params["t5"]["decoder"]
        s = _mr_samples()
        assert m_flat.generate(dict(s))["prediction"] == \
            m.generate(dict(s))["prediction"]
        bf = m_flat.prepare_mr_batch(dict(s)); bf.pop("video_prompt", None)
        bs = m.prepare_mr_batch(dict(s)); bs.pop("video_prompt", None)
        lf = float(m_flat._loss_fn(m_flat.params, bf)[0])
        ls = float(m._loss_fn(m.params, bs)[0])
        assert abs(lf - ls) < 2e-4 + 1e-4 * abs(lf)

    @pytest.mark.parametrize("bad", ["both", "t5+t5enc", "t5enc+t5dec"])
    def test_scan_layers_rejects_bad_combos(self, bad):
        from mr_blip_tpu.models.blip2_mr import BLIP2_MR

        with pytest.raises(ValueError):
            BLIP2_MR(scan_layers=bad, init_params=False, **self.KW)
