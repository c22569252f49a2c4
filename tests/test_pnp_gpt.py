"""GPT dialogue and PNP-VQA / Img2Prompt composition tests (tiny)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mr_blip_tpu.models.blip_v1 import BLIPv1, blip_tiny_config
from mr_blip_tpu.models.gpt_dialogue import GPTDialogue, gpt2_tiny_config
from mr_blip_tpu.models.pnp_vqa import Img2PromptVQA, PNPVQA
from mr_blip_tpu.models.t5 import T5ForConditionalGeneration, t5_tiny_config
from mr_blip_tpu.text.tokenizer import MockT5Tokenizer


class TestGPTDialogue:
    def test_loss_and_logits(self):
        cfg = gpt2_tiny_config()
        m = GPTDialogue(cfg, video_feature_dim=16, compute_dtype=jnp.float32)
        rng = np.random.default_rng(0)
        video = jnp.array(rng.standard_normal((2, 4, 16), np.float32))
        ids = jnp.array(rng.integers(3, 200, (2, 8)))
        mask = jnp.ones((2, 8), jnp.int32)
        resp = jnp.concatenate(
            [jnp.zeros((2, 4), jnp.int32), jnp.ones((2, 4), jnp.int32)], 1
        )
        params = m.init(jax.random.PRNGKey(0), video, ids, mask)
        logits = m.apply(params, video, ids, mask)
        assert logits.shape == (2, 8, cfg.vocab_size)
        loss = m.apply(params, video, ids, mask, resp, method="loss")
        assert np.isfinite(float(loss))

    def test_video_conditioning(self):
        cfg = gpt2_tiny_config()
        m = GPTDialogue(cfg, video_feature_dim=16, compute_dtype=jnp.float32)
        rng = np.random.default_rng(1)
        video = jnp.array(rng.standard_normal((1, 4, 16), np.float32))
        ids = jnp.array(rng.integers(3, 200, (1, 6)))
        params = m.init(jax.random.PRNGKey(0), video, ids)
        out1 = m.apply(params, video, ids)
        out2 = m.apply(params, video + 1.0, ids)
        assert not np.allclose(np.asarray(out1), np.asarray(out2))


class TestPNPVQA:
    @pytest.fixture(scope="class")
    def composed(self):
        tok = MockT5Tokenizer()
        blip_cfg = blip_tiny_config()
        blip = BLIPv1(blip_cfg, compute_dtype=jnp.float32)
        rng = np.random.default_rng(0)
        imgs = jnp.array(rng.standard_normal((1, 28, 28, 3), np.float32))
        ids = jnp.array(rng.integers(3, 100, (1, 5)))
        mask = jnp.ones((1, 5), jnp.int32)
        blip_params = blip.init(jax.random.PRNGKey(0), imgs, ids, mask)["params"]

        t5_cfg = t5_tiny_config(vocab_size=tok.vocab_size)
        reader = T5ForConditionalGeneration(t5_cfg, compute_dtype=jnp.float32)
        emb = jnp.zeros((1, 4, t5_cfg.d_model))
        reader_params = reader.init(
            jax.random.PRNGKey(1), emb, jnp.zeros((1, 2), jnp.int32)
        )["params"]
        model = PNPVQA(blip, blip_params, reader, reader_params, tok,
                       num_patches=2, num_captions=2)
        return model, imgs, ids, mask

    def test_patch_relevance_distribution(self, composed):
        model, imgs, ids, mask = composed
        rel = model.patch_relevance(imgs, ids, mask)
        assert rel.shape == (1, 4)  # 2x2 patches at 28/14
        np.testing.assert_allclose(rel.sum(-1), 1.0, atol=1e-5)
        assert (rel >= 0).all()

    def test_end_to_end_answers(self, composed):
        model, imgs, ids, mask = composed
        answers = model.predict_answers(imgs, ["what is shown?"], ids, mask)
        assert len(answers) == 1
        assert isinstance(answers[0], str)

    def test_img2prompt_builds_prompt(self, composed):
        model, imgs, ids, mask = composed
        i2p = Img2PromptVQA(model.blip, model.blip_params, model.reader,
                            model.reader_params, model.tokenizer)
        prompt = i2p.build_prompt(
            "what color is the cat?", ["a cat on a mat"],
            exemplars=[("what animal?", "cat")],
        )
        assert "Contexts: a cat on a mat" in prompt
        assert prompt.strip().endswith("Answer:")
        assert "what animal?" in prompt


class TestFusionInDecoder:
    def test_fid_vs_joint_context(self):
        """fid=True encodes each caption separately and the decoder fuses
        the concatenated encodings (reference pnp_unifiedqav2_fid.py);
        with multiple captions the two recipes read different evidence
        layouts, and both must return decodable strings."""
        rng = np.random.default_rng(5)
        blip_cfg = blip_tiny_config()
        blip = BLIPv1(blip_cfg, compute_dtype=jnp.float32)
        img = jnp.asarray(rng.standard_normal((1, 28, 28, 3)), jnp.float32)
        ids0 = jnp.zeros((1, 4), jnp.int32)
        blip_params = blip.init(jax.random.PRNGKey(0), img, ids0)["params"]
        tok = MockT5Tokenizer()
        t5_cfg = t5_tiny_config(vocab_size=tok.vocab_size)
        reader = T5ForConditionalGeneration(t5_cfg, compute_dtype=jnp.float32)
        emb = jnp.zeros((1, 3, t5_cfg.d_model))
        reader_params = reader.init(
            jax.random.PRNGKey(1), emb, jnp.zeros((1, 2), jnp.int32)
        )["params"]
        model = PNPVQA(blip, blip_params, reader, reader_params, tok)

        captions = [["a dog runs", "a park with grass", "a red ball"]]
        fid = model.answer(["what runs"], captions, max_new_tokens=4,
                           fid=True)
        joint = model.answer(["what runs"], captions, max_new_tokens=4,
                             fid=False)
        assert isinstance(fid[0], str) and isinstance(joint[0], str)
