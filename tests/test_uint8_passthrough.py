"""uint8 passthrough contract: raw-byte frames through the whole stack.

The shipped video dataset configs default to ``normalize: False`` so
processors emit uint8 and CLIP normalization fuses into the on-device
patch conv (host->HBM traffic 4x smaller than fp32). These tests lock the
three places that contract could silently break:

* processors keep dtype (and ``normalize_clip(uint8) == fp32 path``),
* datasets must NOT cast uint8 frames to float32 (a raw 0-255 float video
  would skip the model's dtype-keyed on-device normalization — wrong
  inputs with no error anywhere),
* models (BLIP2_MR and the OPT variant) produce the same encodings for
  uint8 frames as for the host-normalized fp32 equivalent.
"""

import json

import numpy as np
import pytest


def test_eval_processor_uint8_passthrough_matches_normalized():
    from mr_blip_tpu.processors.video_processors import (
        BlipVideoEvalProcessor, normalize_clip,
    )

    raw = BlipVideoEvalProcessor(image_size=28, n_frms=4, normalize=False)
    norm = BlipVideoEvalProcessor(image_size=28, n_frms=4, normalize=True)
    uri = "synthetic://32x48x48@10.0#3"
    f_raw, idx_raw, fps_raw = raw(uri)
    f_norm, idx_norm, fps_norm = norm(uri)
    assert f_raw.dtype == np.uint8
    assert f_norm.dtype == np.float32
    assert list(idx_raw) == list(idx_norm) and fps_raw == fps_norm
    np.testing.assert_allclose(
        normalize_clip(f_raw), f_norm, rtol=1e-6, atol=1e-6
    )


def test_mr_dataset_preserves_uint8(tmp_path):
    from mr_blip_tpu.datasets.mr_datasets import MomentRetrievalDataset
    from mr_blip_tpu.processors.text_processors import BlipQuestionProcessor
    from mr_blip_tpu.processors.video_processors import BlipVideoEvalProcessor

    ann = [{
        "qid": 0, "video": "synthetic://32x48x48@10.0",
        "duration": 3.2, "query": "a thing happens",
        "relevant_windows": [[0.5, 1.5]],
    }]
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps(ann))
    ds = MomentRetrievalDataset(
        vis_processor=BlipVideoEvalProcessor(
            image_size=28, n_frms=4, normalize=False),
        text_processor=BlipQuestionProcessor(),
        vis_root=str(tmp_path), ann_paths=[str(ann_path)],
    )
    sample = ds[0]
    assert sample["video"].dtype == np.uint8, (
        "dataset must not cast uint8 frames to float32: raw 0-255 floats "
        "skip the model's dtype-keyed on-device normalization"
    )

    ds.vis_processor = BlipVideoEvalProcessor(
        image_size=28, n_frms=4, normalize=True)
    assert ds[0]["video"].dtype == np.float32


def _mr_samples(video):
    b = video.shape[0]
    t = video.shape[1]
    return {
        "video": video,
        "timestamps": np.stack([np.linspace(0.0, 8.0, t)] * b),
        "duration": np.full((b,), 8.0),
        "query_id": [f"q{i}" for i in range(b)],
        "video_prompt_end": ["<extra_id_0>"] * b,
        "query_prompt": ["Query: something\n"] * b,
        "task_prompt": ["Find it.\nRelevant windows: "] * b,
        "relevant_windows": ["[[1, 3]]"] * b,
    }


@pytest.fixture(scope="module")
def uint8_video():
    rng = np.random.default_rng(0)
    return rng.integers(0, 256, (2, 2, 28, 28, 3), dtype=np.uint8)


@pytest.fixture(scope="module")
def fp32_video(uint8_video):
    from mr_blip_tpu.processors.video_processors import normalize_clip

    return np.stack([normalize_clip(v) for v in uint8_video])


class TestModelEquivalence:
    def test_blip2_mr_uint8_matches_fp32(self, uint8_video, fp32_video):
        from mr_blip_tpu.models.blip2_mr import BLIP2_MR

        model = BLIP2_MR(
            img_size=28, vit_model="tiny", t5_model="tiny", task="lora",
            num_beams=2, max_new_tokens=6, compute_dtype="float32",
        )
        out_u8 = model.generate(_mr_samples(uint8_video))
        out_f32 = model.generate(_mr_samples(fp32_video))
        assert out_u8["raw_prediction"] == out_f32["raw_prediction"]
        loss_u8 = float(model.forward(_mr_samples(uint8_video))["loss"])
        loss_f32 = float(model.forward(_mr_samples(fp32_video))["loss"])
        assert abs(loss_u8 - loss_f32) < 1e-3 + 1e-3 * abs(loss_f32)

    def test_videoqa_two_stage_uint8_matches_fp32(self, uint8_video,
                                                  fp32_video):
        """Grounded-QA path: localizer -> window crop -> answerer, with
        uint8 frames flowing through extract_frames and videoQA_answer."""
        from mr_blip_tpu.models.blip2_mr import BLIP2_MR

        model = BLIP2_MR(
            img_size=28, vit_model="tiny", t5_model="tiny",
            task="lora_QA_with_localizer", num_beams=2, max_new_tokens=6,
            compute_dtype="float32", num_frames_for_answer=2,
        )

        def qa_samples(video):
            s = _mr_samples(video)
            s["question_id"] = s.pop("query_id")
            s["qa_input"] = ["Question: what? Options: A b B c C d D e E f"] * 2
            s["qa_output"] = ["Option A", "Option B"]
            s["relevant_windows"] = np.array([[[0.0, 3.0]], [[1.0, 5.0]]])
            return s

        out_u8 = model.videoQA_generate(qa_samples(uint8_video))
        out_f32 = model.videoQA_generate(qa_samples(fp32_video))
        assert out_u8["output_text"] == out_f32["output_text"]

    def test_blip2_opt_uint8_matches_fp32(self, uint8_video, fp32_video):
        from mr_blip_tpu.models.blip2_mr_opt import BLIP2_MR_OPT

        model = BLIP2_MR_OPT(
            opt_model="tiny", img_size=28, vit_model="tiny", task="lora",
            num_beams=2, max_new_tokens=6, compute_dtype="float32",
        )
        loss_u8 = float(model.forward(_mr_samples(uint8_video))["loss"])
        loss_f32 = float(model.forward(_mr_samples(fp32_video))["loss"])
        assert np.isfinite(loss_u8)
        # Looser than the MR test above: the fused uint8 normalization
        # differs from the host fp32 one only by float rounding (ViT output
        # delta ~1e-6, measured), but the random-init tiny OPT LM amplifies
        # that into O(1e-2) loss noise — and the 1e-3 bound already sat at
        # ~80% consumed before scan-over-layers nudged the rounding.
        assert abs(loss_u8 - loss_f32) < 1e-3 + 5e-3 * abs(loss_f32)
