"""ALBEF / BLIP-v1 / ALPRO / MED model families + VQA tools + gradcam."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mr_blip_tpu.models.albef import ALBEF, albef_tiny_config
from mr_blip_tpu.models.alpro import ALPRO, alpro_tiny_config
from mr_blip_tpu.models.blip_v1 import BLIPv1, blip_tiny_config
from mr_blip_tpu.models.med import MedLMHead, MedModel, med_tiny_config


def _text(rng, b=2, n=6, vocab=120):
    ids = jnp.array(rng.integers(3, vocab, (b, n)))
    mask = jnp.ones((b, n), jnp.int32)
    return ids, mask


class TestMed:
    def test_modes(self):
        cfg = med_tiny_config()
        m = MedModel(cfg, compute_dtype=jnp.float32)
        rng = np.random.default_rng(0)
        ids, mask = _text(rng)
        img = jnp.array(rng.standard_normal((2, 5, 32), np.float32))
        params = m.init(jax.random.PRNGKey(0), ids, text_mask=mask,
                        image_states=img, mode="multimodal")
        t = m.apply(params, ids, text_mask=mask, mode="text")
        mm = m.apply(params, ids, text_mask=mask, image_states=img,
                     mode="multimodal")
        assert t.shape == mm.shape == (2, 6, 32)
        assert not np.allclose(np.asarray(t), np.asarray(mm))

    def test_decoder_is_causal(self):
        cfg = med_tiny_config()
        m = MedModel(cfg, compute_dtype=jnp.float32)
        rng = np.random.default_rng(1)
        ids, mask = _text(rng)
        img = jnp.array(rng.standard_normal((2, 5, 32), np.float32))
        params = m.init(jax.random.PRNGKey(0), ids, image_states=img,
                        mode="decoder")
        out1 = m.apply(params, ids, image_states=img, mode="decoder")
        poked = ids.at[:, -1].set(7)
        out2 = m.apply(params, poked, image_states=img, mode="decoder")
        # earlier positions unaffected by a change at the last position
        np.testing.assert_allclose(
            np.asarray(out1[:, :-1]), np.asarray(out2[:, :-1]), atol=1e-5
        )


class TestALBEF:
    def test_objectives(self):
        cfg = albef_tiny_config()
        m = ALBEF(cfg, compute_dtype=jnp.float32)
        rng = np.random.default_rng(0)
        imgs = jnp.array(rng.standard_normal((2, 28, 28, 3), np.float32))
        ids, mask = _text(rng)
        params = m.init(jax.random.PRNGKey(0), imgs, ids, mask)
        out = m.apply(params, imgs, ids, mask)
        assert np.isfinite(float(out["itc_loss"]))
        assert out["itm_logits"].shape == (2, 2)
        assert out["sims"].shape == (2, 2)


class TestBLIPv1:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = blip_tiny_config()
        m = BLIPv1(cfg, compute_dtype=jnp.float32)
        rng = np.random.default_rng(0)
        imgs = jnp.array(rng.standard_normal((2, 28, 28, 3), np.float32))
        ids, mask = _text(rng)
        params = m.init(jax.random.PRNGKey(0), imgs, ids, mask)
        return m, params, imgs, ids, mask

    def test_pretraining_objectives(self, setup):
        m, params, imgs, ids, mask = setup
        out = m.apply(params, imgs, ids, mask)
        assert np.isfinite(float(out["itc_loss"]))
        assert np.isfinite(float(out["lm_loss"]))

    def test_caption_step_logits(self, setup):
        m, params, imgs, ids, mask = setup
        logits = m.apply(params, imgs, ids[:, :3], method="caption_step_logits")
        assert logits.shape == (2, m.config.text.vocab_size)

    def test_vqa_loss(self, setup):
        m, params, imgs, ids, mask = setup
        loss = m.apply(params, imgs, ids, mask, ids, mask,
                       method="vqa_answer_loss")
        assert np.isfinite(float(loss))

    def test_nlvr_two_images(self, setup):
        m, params, imgs, ids, mask = setup
        logits = m.apply(params, imgs, imgs, ids, mask, method="nlvr_logits")
        assert logits.shape == (2, 2)


class TestALPRO:
    def test_video_text_objectives(self):
        cfg = alpro_tiny_config(num_classes=7)
        m = ALPRO(cfg, compute_dtype=jnp.float32)
        rng = np.random.default_rng(0)
        video = jnp.array(rng.standard_normal((2, 2, 28, 28, 3), np.float32))
        ids, mask = _text(rng)
        params = m.init(jax.random.PRNGKey(0), video, ids, mask)
        out = m.apply(params, video, ids, mask)
        assert np.isfinite(float(out["vtc_loss"]))
        qa = m.apply(params, video, ids, mask, method="qa_logits")
        assert qa.shape == (2, 7)

    def test_hard_negative_vtm_driver(self):
        """Reference alpro_retrieval.py:166-207 semantics: VTM negatives
        are sampled from the VTC similarity with the diagonal (self)
        masked to -inf; rows = b positives + b (text, neg-video) +
        b (neg-text, video), labels [1]*b + [0]*2b."""
        from mr_blip_tpu.models.alpro import alpro_retrieval_losses

        b = 4
        cfg = alpro_tiny_config()
        m = ALPRO(cfg, compute_dtype=jnp.float32)
        rng = np.random.default_rng(1)
        video = jnp.array(rng.standard_normal((b, 2, 28, 28, 3), np.float32))
        ids, mask = _text(rng, b=b)
        params = m.init(jax.random.PRNGKey(0), video, ids, mask)["params"]

        out = alpro_retrieval_losses(
            m, params, jax.random.PRNGKey(3), video, ids, mask)
        for k in ("loss", "vtc_loss", "vtm_loss"):
            assert np.isfinite(float(out[k])), k
        assert out["vtm_logits"].shape == (3 * b, 2)
        np.testing.assert_array_equal(
            np.asarray(out["vtm_labels"]), [1] * b + [0] * 2 * b)

        # the mining weights ARE the VTC sims with the diagonal masked
        vid_f, txt_f = m.apply({"params": params}, video, ids, mask,
                               method="vtc_features")
        sims = np.asarray(vid_f @ txt_f.T / cfg.temp, np.float32)
        w = np.asarray(out["w_v2t"])
        neg_inf = np.finfo(np.float32).min
        np.testing.assert_array_equal(np.diag(w), np.full(b, neg_inf))
        off = ~np.eye(b, dtype=bool)
        np.testing.assert_allclose(w[off], sims[off], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(out["w_t2v"])[off], sims.T[off], rtol=1e-5, atol=1e-5)

        # self is never selected as its own negative, over many draws
        for seed in range(8):
            o = alpro_retrieval_losses(
                m, params, jax.random.PRNGKey(seed), video, ids, mask)
            assert not np.any(np.asarray(o["neg_text_idx"]) == np.arange(b))
            assert not np.any(np.asarray(o["neg_video_idx"]) == np.arange(b))

        # and the driver is differentiable end-to-end
        g = jax.grad(lambda p: alpro_retrieval_losses(
            m, p, jax.random.PRNGKey(3), video, ids, mask)["loss"])(params)
        total = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g))
        assert np.isfinite(total) and total > 0


class TestVQATools:
    def test_answer_normalization(self):
        from mr_blip_tpu.common.vqa_tools import process_answer

        assert process_answer("The Cat!") == "cat"
        assert process_answer("TWO") == "2"
        assert process_answer("dont") == "don't"
        assert process_answer("1,000") == "1000"

    def test_consensus_accuracy(self):
        from mr_blip_tpu.common.vqa_tools import VQAEval

        anns = [{"question_id": 1, "answers": ["cat"] * 8 + ["dog"] * 2}]
        ev = VQAEval()
        acc_match = ev.evaluate([{"question_id": 1, "answer": "cat"}], anns)
        acc_min = ev.evaluate([{"question_id": 1, "answer": "dog"}], anns)
        assert acc_match == 100.0
        assert 0 < acc_min < 100.0


class TestGradcam:
    def test_relevance_map(self):
        from mr_blip_tpu.common.gradcam import compute_gradcam

        rng = np.random.default_rng(0)
        attn = rng.random((4, 3, 5))  # heads, Q, 1 cls + 4 patches
        grad = rng.standard_normal((4, 3, 5))
        cam = compute_gradcam(attn, grad, patch_grid=(2, 2))
        assert cam.shape == (3, 2, 2)
        assert float(cam.max()) <= 1.0 + 1e-6


class TestAlbefNLVR:
    def test_pairwise_cross_attention_and_loss(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from mr_blip_tpu.models.albef import AlbefNLVR, albef_tiny_config

        cfg = albef_tiny_config()
        m = AlbefNLVR(cfg, compute_dtype=jnp.float32)
        rng = np.random.default_rng(0)
        im0 = jnp.asarray(rng.standard_normal((2, 28, 28, 3)), jnp.float32)
        im1 = jnp.asarray(rng.standard_normal((2, 28, 28, 3)), jnp.float32)
        ids = jnp.asarray(rng.integers(0, cfg.text.vocab_size, (2, 6)), jnp.int32)
        params = m.init(jax.random.PRNGKey(0), im0, im1, ids)
        logits = m.apply(params, im0, im1, ids)
        assert logits.shape == (2, 2)

        # both images matter: swapping them must change the logits
        # (interleaved cross-attention layers see different memories)
        swapped = m.apply(params, im1, im0, ids)
        assert np.abs(np.asarray(logits) - np.asarray(swapped)).max() > 1e-6

        targets = jnp.asarray([0, 1], jnp.int32)
        loss = m.apply(params, im0, im1, ids, targets, method="loss")
        assert np.isfinite(float(loss))


class TestAlbefVQAAnswerRanking:
    def test_rank_answers_prefers_trained_answer(self):
        """Ranking is a pure function of the model: for a random-init tiny
        model it must (a) return valid candidate indices, (b) reproduce a
        brute-force rank over all candidates when k = all."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from mr_blip_tpu.models.albef import (
            AlbefVQA, albef_tiny_config, rank_answers,
        )

        cfg = albef_tiny_config()
        m = AlbefVQA(cfg, compute_dtype=jnp.float32)
        rng = np.random.default_rng(1)
        images = jnp.asarray(rng.standard_normal((2, 28, 28, 3)), jnp.float32)
        q_ids = jnp.asarray(rng.integers(4, cfg.text.vocab_size, (2, 5)), jnp.int32)
        q_mask = jnp.ones_like(q_ids)
        # candidate answers: bos=1 then content tokens, padded with 0
        A, L = 6, 4
        ans = rng.integers(4, cfg.text.vocab_size, (A, L)).astype(np.int32)
        ans[:, 0] = 1
        ans_mask = np.ones((A, L), np.int32)
        ans[:, 3][:3] = 0
        ans_mask[:3, 3] = 0
        ans, ans_mask = jnp.asarray(ans), jnp.asarray(ans_mask)

        # init through answer_loss so encoder AND decoder params exist
        # (batch-matched slices: answers per sample, not the full list)
        params = m.init(jax.random.PRNGKey(0), images, q_ids, q_mask,
                        ans[:2], ans_mask[:2], method="answer_loss")["params"]

        picks_all = rank_answers(m, params, images, q_ids, q_mask, ans,
                                 ans_mask, k=A)
        picks_k = rank_answers(m, params, images, q_ids, q_mask, ans,
                               ans_mask, k=3)
        assert picks_all.shape == (2,) and picks_k.shape == (2,)
        assert all(0 <= p < A for p in picks_all)

        # brute force: per-candidate LM loss, argmin
        for b in range(2):
            losses = []
            for a in range(A):
                loss = m.apply(
                    {"params": params}, images[b:b + 1], q_ids[b:b + 1],
                    q_mask[b:b + 1], ans[a:a + 1], ans_mask[a:a + 1],
                    method="answer_loss",
                )
                losses.append(float(loss))
            assert picks_all[b] == int(np.argmin(losses))

    def test_blip_v1_shares_ranking_surface(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from mr_blip_tpu.models.albef import rank_answers
        from mr_blip_tpu.models.blip_v1 import BLIPv1, blip_tiny_config

        cfg = blip_tiny_config()
        m = BLIPv1(cfg, compute_dtype=jnp.float32)
        rng = np.random.default_rng(2)
        images = jnp.asarray(rng.standard_normal((1, 28, 28, 3)), jnp.float32)
        q_ids = jnp.asarray(rng.integers(4, cfg.text.vocab_size, (1, 4)), jnp.int32)
        q_mask = jnp.ones_like(q_ids)
        ans = jnp.asarray(rng.integers(4, cfg.text.vocab_size, (4, 3)), jnp.int32)
        ans = ans.at[:, 0].set(1)
        ans_mask = jnp.ones_like(ans)
        params = m.init(jax.random.PRNGKey(0), images, q_ids)["params"]
        picks = rank_answers(m, params, images, q_ids, q_mask, ans, ans_mask, k=2)
        assert picks.shape == (1,) and 0 <= picks[0] < 4


class TestAlbefNLVRDistillation:
    def test_distill_loss_and_ema(self):
        """Reference use_distill: alpha=0 reduces to plain CE; alpha>0 adds
        the momentum-teacher KL; the EMA copy moves toward the params."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from mr_blip_tpu.models.albef import (
            AlbefNLVR, albef_nlvr_distill_loss, albef_tiny_config,
        )

        cfg = albef_tiny_config()
        m = AlbefNLVR(cfg, compute_dtype=jnp.float32)
        rng = np.random.default_rng(0)
        im0 = jnp.asarray(rng.standard_normal((2, 28, 28, 3)), jnp.float32)
        im1 = jnp.asarray(rng.standard_normal((2, 28, 28, 3)), jnp.float32)
        ids = jnp.asarray(rng.integers(0, cfg.text.vocab_size, (2, 5)), jnp.int32)
        tgt = jnp.asarray([1, 0], jnp.int32)
        params = m.init(jax.random.PRNGKey(0), im0, im1, ids)["params"]
        m_params = jax.tree.map(
            lambda a: a + 0.1 if a.dtype == jnp.float32 else a, params)

        loss0, _ = albef_nlvr_distill_loss(
            m, params, m_params, im0, im1, ids, tgt, alpha=0.0)
        plain = m.apply({"params": params}, im0, im1, ids, tgt, method="loss")
        np.testing.assert_allclose(float(loss0), float(plain), rtol=1e-5)

        loss_d, new_m = albef_nlvr_distill_loss(
            m, params, m_params, im0, im1, ids, tgt, alpha=0.4)
        assert np.isfinite(float(loss_d)) and float(loss_d) != float(loss0)
        # EMA moved toward params
        d_old = float(jnp.abs(
            jax.tree.leaves(m_params)[0] - jax.tree.leaves(params)[0]).max())
        d_new = float(jnp.abs(
            jax.tree.leaves(new_m)[0] - jax.tree.leaves(params)[0]).max())
        assert d_new < d_old


class TestAlbefFusionSplitE2E:
    def test_base_config_fused_itm(self):
        """The fusion_layer=6-style split (here 1 of 2 layers) runs through
        the full ITM path: text layers then fusion layers over the image
        states — and differs from the every-layer multimodal recipe."""
        import dataclasses

        import jax
        import jax.numpy as jnp
        import numpy as np

        from mr_blip_tpu.models.albef import ALBEF, albef_tiny_config
        from mr_blip_tpu.models.med import MedConfig

        base = albef_tiny_config()
        split = dataclasses.replace(
            base, text=dataclasses.replace(base.text, fusion_layer=1))
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.standard_normal((2, 28, 28, 3)), jnp.float32)
        ids = jnp.asarray(rng.integers(0, base.text.vocab_size, (2, 5)), jnp.int32)

        m_all = ALBEF(base, compute_dtype=jnp.float32)
        m_split = ALBEF(split, compute_dtype=jnp.float32)
        params = m_all.init(jax.random.PRNGKey(0), img, ids)["params"]

        logits_all = m_all.apply({"params": params}, img, ids,
                                 method="itm_logits")
        logits_split = m_split.apply({"params": params}, img, ids,
                                     method="itm_logits")
        assert np.isfinite(np.asarray(logits_split)).all()
        # different fusion recipes -> different functions on the same params
        assert np.abs(np.asarray(logits_all) -
                      np.asarray(logits_split)).max() > 1e-6


class TestFeatureExtraction:
    @pytest.mark.parametrize("family", ["blip", "albef"])
    def test_extract_features_modes(self, family):
        """Reference feature-extractor surface: image/text modes give raw +
        L2-normalized projected features, multimodal the fused states."""
        rng = np.random.default_rng(0)
        if family == "blip":
            m = BLIPv1(blip_tiny_config(), compute_dtype=jnp.float32)
        else:
            m = ALBEF(albef_tiny_config(), compute_dtype=jnp.float32)
        imgs = jnp.array(rng.standard_normal((2, 28, 28, 3), np.float32))
        ids, mask = _text(rng)
        params = m.init(jax.random.PRNGKey(0), imgs, ids, mask)

        fi = m.apply(params, images=imgs, mode="image",
                     method="extract_features")
        assert fi["image_embeds"].shape[0] == 2
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(fi["image_embeds_proj"]), axis=-1),
            1.0, rtol=1e-5)

        ft = m.apply(params, text_ids=ids, text_mask=mask, mode="text",
                     method="extract_features")
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(ft["text_embeds_proj"]), axis=-1),
            1.0, rtol=1e-5)

        fm = m.apply(params, images=imgs, text_ids=ids, text_mask=mask,
                     mode="multimodal", method="extract_features")
        assert fm["multimodal_embeds"].shape[:2] == (2, ids.shape[1])
