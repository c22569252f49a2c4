"""End-to-end BLIP2-MR tests on tiny configs: loss, generate, QA two-stage."""

import numpy as np
import pytest

from mr_blip_tpu.models.blip2_mr import BLIP2_MR


@pytest.fixture(scope="module")
def tiny_model():
    return BLIP2_MR(
        img_size=28, vit_model="tiny", t5_model="tiny",
        num_beams=2, max_new_tokens=8, task="lora",
        input_time_format="seconds_integers", interleave_data=True,
        compute_dtype="float32",
    )


def _mr_samples(b=2, t=4, img=28, seed=0):
    rng = np.random.default_rng(seed)
    duration = [20.0, 30.0]
    return {
        "video": rng.standard_normal((b, t, img, img, 3), np.float32),
        "timestamps": np.stack(
            [np.linspace(0, d, t, endpoint=False) for d in duration[:b]]
        ),
        "duration": np.array(duration[:b]),
        "query_id": ["q0", "q1"][:b],
        "video_prompt_end": ["<extra_id_0>"] * b,
        "query_prompt": ["Query: a cat jumps\n"] * b,
        "task_prompt": [
            "Given the video and the query, find the relevant windows.\nRelevant windows: "
        ] * b,
        "relevant_windows": ["[[0, 10]]", "[[5, 25]]"][:b],
    }


class TestForward:
    def test_loss_finite(self, tiny_model):
        out = tiny_model.forward(_mr_samples())
        loss = float(out["loss"])
        assert np.isfinite(loss) and loss > 0

    def test_trainable_mask_policy(self, tiny_model):
        import jax

        mask = tiny_model.trainable_mask()
        flat = jax.tree_util.tree_leaves_with_path(mask)
        frozen_vit = [v for p, v in flat if "visual_encoder" in str(p)]
        assert frozen_vit and not any(frozen_vit)
        t5_lora = [v for p, v in flat if "t5" in str(p) and "lora_" in str(p)]
        assert t5_lora and all(t5_lora)
        t5_base = [
            v for p, v in flat
            if getattr(p[0], "key", None) == "t5" and "lora_" not in str(p)
        ]
        assert t5_base and not any(t5_base)
        qf = [v for p, v in flat if "qformer" in str(p)]
        assert qf and all(qf)


class TestGenerate:
    def test_generate_output_contract(self, tiny_model):
        samples = _mr_samples()
        out = tiny_model.generate(samples)
        assert set(out) >= {"prediction", "raw_prediction", "answer", "qid", "duration"}
        assert len(out["prediction"]) == 2
        # predictions are valid span strings after post-processing
        from mr_blip_tpu.text.span_grammar import moment_str_to_list

        for p in out["prediction"]:
            parsed = moment_str_to_list(p)
            assert isinstance(parsed, list) and all(len(w) == 2 for w in parsed)

    def test_batch_invariance(self, tiny_model):
        """Each sample's prediction is independent of its batch neighbors."""
        samples = _mr_samples()
        out_batch = tiny_model.generate(samples)
        single = {
            k: (v[:1] if hasattr(v, "__getitem__") else v) for k, v in samples.items()
        }
        out_single = tiny_model.generate(single)
        assert out_batch["raw_prediction"][0] == out_single["raw_prediction"][0]


class TestQATwoStage:
    @pytest.fixture(scope="class")
    def qa_model(self):
        return BLIP2_MR(
            img_size=28, vit_model="tiny", t5_model="tiny",
            num_beams=2, max_new_tokens=8, task="lora_QA_with_localizer",
            input_time_format="seconds_integers", compute_dtype="float32",
            num_frames_for_answer=2,
        )

    def _qa_samples(self, b=2):
        s = _mr_samples(b=b)
        s["question_id"] = s.pop("query_id")
        s["qa_input"] = ["Question: what happens? Options: (A x B y C z D w E v)"] * b
        s["qa_output"] = ["Option A", "Option B"][:b]
        s["relevant_windows"] = np.array([[[0.0, 10.0]], [[5.0, 25.0]]][:b])
        # MR-stage prompts still needed by the localizer
        s["query_prompt"] = ["Query: what happens?\n"] * b
        return s

    def test_videoqa_generate(self, qa_model):
        out = qa_model.videoQA_generate(self._qa_samples())
        assert len(out["output_text"]) == 2
        assert all(p in range(5) for p in out["output_text"])
        assert "relevant_moments" in out

    def test_forward_qa_loss(self, qa_model):
        out = qa_model.forward(self._qa_samples())
        assert np.isfinite(float(out["loss"]))


class TestVariants:
    def test_only_frames(self):
        model = BLIP2_MR(
            img_size=28, vit_model="tiny", t5_model="tiny", num_beams=1,
            max_new_tokens=4, task="lora_only_frames", input_time_format=None,
            interleave_data=False, compute_dtype="float32",
        )
        out = model.forward(_mr_samples())
        assert np.isfinite(float(out["loss"]))

    def test_mean_aggregation(self):
        model = BLIP2_MR(
            img_size=28, vit_model="tiny", t5_model="tiny", num_beams=1,
            max_new_tokens=4, task="lora", frame_token_aggregation="mean",
            compute_dtype="float32",
        )
        out = model.forward(_mr_samples())
        assert np.isfinite(float(out["loss"]))

    def test_relative_time_format(self):
        model = BLIP2_MR(
            img_size=28, vit_model="tiny", t5_model="tiny", num_beams=1,
            max_new_tokens=6, task="lora", input_time_format="relative_integers",
            compute_dtype="float32",
        )
        out = model.generate(_mr_samples())
        # relative predictions converted to absolute seconds
        from mr_blip_tpu.text.span_grammar import moment_str_to_list

        for p, d in zip(out["prediction"], out["duration"]):
            for w in moment_str_to_list(p):
                assert w == [-1, -1] or (0 <= w[0] <= d * 1.01 and w[1] <= d * 1.01)


class TestRelposInKernelFlag:
    def test_flagged_model_matches_default(self):
        """relpos_in_kernel=True must not change the model function: on CPU
        the dispatcher falls back to materializing the identical bias, so
        loss and generations agree bit-for-bit with the default path."""
        import jax

        kw = dict(
            img_size=28, vit_model="tiny", t5_model="tiny",
            num_beams=2, max_new_tokens=8, task="lora",
            compute_dtype="float32", seed=7,
        )
        base = BLIP2_MR(**kw)
        flagged = BLIP2_MR(relpos_in_kernel=True, **kw)
        # same seed -> identical params modulo tree structure
        flagged.params = jax.tree.map(lambda a: a, base.params)

        samples = _mr_samples()
        l0 = float(base.forward(samples)["loss"])
        l1 = float(flagged.forward(samples)["loss"])
        assert abs(l0 - l1) < 1e-6, (l0, l1)
        g0 = base.generate(samples)["prediction"]
        g1 = flagged.generate(samples)["prediction"]
        assert g0 == g1
