"""Span semantics under a real (tokenizers-library) T5 vocab.

Builds the structurally faithful fixture tokenizer (see
``mr_blip_tpu/text/fixture_tokenizer.py``) and verifies that the framework
*derives* every constant the reference hard-codes for flan-t5
(blip2_mr.py:1299-1306, 1497-1608) — so correctness under the true flan-t5
vocabulary follows automatically when real assets are supplied — and runs
the full model pipeline through the HFT5Tokenizer production path.

**Asset-day mode**: set ``MRBLIP_TOKENIZER_PATH=<hf flan-t5 dir>`` to run
this file against the REAL tokenizer (scripts/asset_day.sh step 2). The
reference-constant assertions (answer ids 71/272/205/309/262, special ids,
extra-id layout) apply verbatim; assertions tied to the fixture's *crafted*
annoying sets ({87,113,157}/{123,124,149}) switch to the derived sets —
the reference itself derives them at init (blip2_mr.py:165-168).
"""

import os

import numpy as np
import pytest

pytest.importorskip("transformers")

from mr_blip_tpu.text.fixture_tokenizer import (
    ANNOYING_NONSPACE,
    ANNOYING_SPACE,
    ANSWER_IDS,
    build_fixture_tokenizer,
)
from mr_blip_tpu.text.timestamps import (
    find_annoying_numbers,
    find_annoying_numbers_replacement_dict,
)
from mr_blip_tpu.text.tokenizer import HFT5Tokenizer

REAL_TOKENIZER = os.environ.get("MRBLIP_TOKENIZER_PATH")


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    if REAL_TOKENIZER:
        return HFT5Tokenizer(REAL_TOKENIZER)
    d = tmp_path_factory.mktemp("fixture_tok")
    return HFT5Tokenizer(build_fixture_tokenizer(str(d)))


@pytest.fixture(scope="module")
def annoying_sets(tok):
    """(nonspace, space) — crafted constants under the fixture, derived
    under a real tokenizer (matching the reference's init-time derivation)."""
    if REAL_TOKENIZER:
        annoying, annoying_space = find_annoying_numbers(tok, 200)
        return sorted(annoying), sorted(annoying_space)
    return sorted(ANNOYING_NONSPACE), sorted(ANNOYING_SPACE)


class TestDerivedVocabFacts:
    def test_special_ids(self, tok):
        assert (tok.pad_token_id, tok.eos_token_id, tok.unk_token_id) == (0, 1, 2)
        assert tok.convert_tokens_to_ids("▁") == 3

    def test_answer_letter_ids_match_reference_constants(self, tok):
        """The reference scores QA logits at fixed flan-t5 ids
        [71, 272, 205, 309, 262] (blip2_mr.py:1299-1306); our derivation
        must recover exactly those from the vocab."""
        derived = [tok.encode(l, add_special_tokens=False)[-1] for l in "ABCDE"]
        assert derived == [71, 272, 205, 309, 262]
        assert derived == [ANSWER_IDS[l] for l in "ABCDE"]

    def test_extra_id_layout(self, tok):
        """T5 convention: extra_id_0 is the highest id, descending."""
        i0 = tok.convert_tokens_to_ids("<extra_id_0>")
        i1 = tok.convert_tokens_to_ids("<extra_id_1>")
        i99 = tok.convert_tokens_to_ids("<extra_id_99>")
        assert i0 == i1 + 1 and i0 == i99 + 99

    def test_annoying_number_derivation(self, tok, annoying_sets):
        annoying, annoying_space = find_annoying_numbers(tok, 200)
        assert annoying == annoying_sets[0]
        assert annoying_space == annoying_sets[1]
        rep = find_annoying_numbers_replacement_dict(annoying)
        assert set(rep) == set(annoying)
        for n, r in rep.items():
            # nearest non-annoying integer (<=2 by construction under the
            # crafted fixture sets; a real vocab may have longer runs)
            assert r not in rep
            assert abs(r - n) <= (10 if REAL_TOKENIZER else 2)
            # the replacement is not nonspace-annoying: single piece, or
            # space-flavor (leading bare-space id 3, stripped at embed time)
            ids = tok.encode(str(r), add_special_tokens=False)
            assert len(ids) == 1 or ids[0] == 3

    def test_leading_space_piece_stripping(self, tok, annoying_sets):
        """Space-flavor numbers tokenize as [3, ...]; the prompt pipeline
        strips the leading 3 (reference get_clean_timestamp_tokens_and_embs,
        blip2_mr.py:1561-1608)."""
        for n in annoying_sets[1]:
            ids = tok.encode(str(n), add_special_tokens=False)
            assert ids[0] == 3 and len(ids) > 1
        for n in annoying_sets[0]:
            ids = tok.encode(str(n), add_special_tokens=False)
            assert ids[0] != 3 and len(ids) > 1

    def test_span_string_round_trip(self, tok):
        for s in ("[[10, 25]]", "[[0, 150]]", "[[3, 7], [80, 99]]"):
            ids = tok.encode(s, add_special_tokens=False)
            assert tok.unk_token_id not in ids
            assert tok.decode(ids) == s


class TestModelUnderRealVocab:
    @pytest.fixture(scope="class")
    def model(self, tmp_path_factory):
        import mr_blip_tpu  # registry side effects
        from mr_blip_tpu.models.blip2_mr import BLIP2_MR

        if REAL_TOKENIZER:
            path = REAL_TOKENIZER
        else:
            d = tmp_path_factory.mktemp("fixture_tok2")
            path = build_fixture_tokenizer(str(d))
        return BLIP2_MR(
            img_size=28, vit_model="tiny", t5_model="tiny",
            tokenizer_path=path, task="lora", num_beams=2, max_new_tokens=10,
            compute_dtype="float32",
        )

    def _samples(self, b=2, t=3):
        rng = np.random.default_rng(0)
        return {
            "video": rng.integers(0, 256, (b, t, 28, 28, 3), dtype=np.uint8),
            "timestamps": np.stack(
                [np.linspace(0, 100, t, endpoint=False)] * b
            ),
            "duration": np.full((b,), 100.0),
            "query_id": [f"q{i}" for i in range(b)],
            "video_prompt_end": ["<extra_id_0>"] * b,
            "query_prompt": ["Query: a person is doing something\n"] * b,
            "task_prompt": [
                "Given the video and the query, find the relevant windows.\nRelevant windows: "
            ] * b,
            "relevant_windows": ["[[10, 25]]"] * b,
        }

    def test_derived_answer_ids(self, model):
        assert model.answer_ids == [71, 272, 205, 309, 262]

    def test_annoying_remap_active(self, model):
        rep = model.annoying_numbers_replacement_dict
        want, _ = find_annoying_numbers(model.tokenizer, 200)
        assert set(rep) == set(want)
        if not REAL_TOKENIZER:
            assert set(rep) == set(ANNOYING_NONSPACE)

    def test_forward_loss(self, model):
        out = model(self._samples())
        assert np.isfinite(float(out["loss"]))

    def test_generate_produces_spans(self, model):
        from mr_blip_tpu.text.span_grammar import moment_str_to_list

        out = model.generate(self._samples())
        assert len(out["prediction"]) == 2
        for p in out["prediction"]:
            # grammar-repaired span string, parseable (reference contract:
            # prediction is the post_process output string)
            spans = moment_str_to_list(p)
            assert isinstance(spans, list)

    def test_vocab_padding(self, model):
        """Model embedding rows >= tokenizer vocab, lane-aligned (flan-t5's
        32100 -> 32128 convention)."""
        assert model.t5_config.vocab_size >= model.tokenizer.vocab_size
        assert model.t5_config.vocab_size % 128 == 0
