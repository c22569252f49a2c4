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
