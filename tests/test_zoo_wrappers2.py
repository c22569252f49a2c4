"""Smoke tests for the round-2 zoo model-name wrappers.

Each reference model name (lavis/models/__init__.py registry) must build
from the registry, produce a finite loss, and expose its task-facing
prediction surface.
"""

import numpy as np
import pytest

from mr_blip_tpu.common.registry import registry

IMG = 28


def _img(b=2):
    return np.random.RandomState(0).rand(b, IMG, IMG, 3).astype(np.float32)


def _vid(b=2, t=2):
    return np.random.RandomState(0).rand(b, t, IMG, IMG, 3).astype(np.float32)


def test_albef_retrieval_registered():
    cls = registry.get_model_class("albef_retrieval")
    m = cls(model_size="tiny")
    out = m({"image": _img(), "text_input": ["a dog", "a cat"]})
    assert np.isfinite(float(out["loss"]))


def test_albef_pretrain():
    cls = registry.get_model_class("albef_pretrain")
    m = cls(model_size="tiny", queue_size=4)
    out = m({"image": _img(), "text_input": ["a dog", "a cat"]})
    assert np.isfinite(float(out["loss"]))
    # queue pointer advanced
    assert int(m.momentum_state["queue_ptr"]) == 2


@pytest.mark.parametrize("name,ncls", [("albef_classification", 3),
                                       ("blip_classification", 3)])
def test_single_image_classifiers(name, ncls):
    m = registry.get_model_class(name)(model_size="tiny", num_classes=ncls)
    s = {"image": _img(), "text_input": ["a dog", "a cat"], "label": [0, 2]}
    assert np.isfinite(float(m(s)["loss"]))
    pred = m.predict(s)
    assert len(pred["predictions"]) == 2
    assert all(0 <= p < ncls for p in pred["predictions"])
    assert pred["targets"] == [0, 2]


def test_blip_nlvr():
    m = registry.get_model_class("blip_nlvr")(model_size="tiny")
    s = {"image": _img(), "image2": _img(), "text_input": ["a", "b"],
         "label": [0, 1]}
    assert np.isfinite(float(m(s)["loss"]))
    pred = m.predict(s)
    assert len(pred["predictions"]) == 2


def test_blip_vqa():
    m = registry.get_model_class("blip_vqa")(
        model_size="tiny", answer_list=["yes", "no", "red", "two"])
    s = {"image": _img(), "text_input": ["is it a dog", "what color"],
         "answers": [["yes"], ["red"]]}
    assert np.isfinite(float(m(s)["loss"]))
    answers = m.predict_answers(s, num_ans_candidates=3)
    assert len(answers) == 2
    assert all(a in m.answer_list for a in answers)


def test_blip_feature_extractor():
    m = registry.get_model_class("blip_feature_extractor")(model_size="tiny")
    s = {"image": _img(), "text_input": ["a dog", "a cat"]}
    f_i = m.extract_features(s, mode="image")
    f_t = m.extract_features(s, mode="text")
    f_m = m.extract_features(s, mode="multimodal")
    assert f_i["image_embeds_proj"].shape == (2, 16)
    assert f_t["text_embeds_proj"].shape == (2, 16)
    assert f_m["multimodal_embeds"].ndim == 3
    n = np.linalg.norm(np.asarray(f_i["image_embeds_proj"]), axis=-1)
    np.testing.assert_allclose(n, 1.0, atol=1e-4)


def test_blip_image_text_matching():
    m = registry.get_model_class("blip_image_text_matching")(model_size="tiny")
    s = {"image": _img(), "text_input": ["a dog", "a cat"]}
    itm = m.itm(s, match_head="itm")
    assert itm.shape == (2, 2)
    itc = m.itm(s, match_head="itc")
    assert itc.shape == (2,)
    assert np.all(np.abs(itc) <= 1.0 + 1e-4)


def test_alpro_qa():
    m = registry.get_model_class("alpro_qa")(model_size="tiny", num_classes=5)
    s = {"image": _vid(), "text_input": ["what is it", "who runs"],
         "label": [1, 4]}
    assert np.isfinite(float(m(s)["loss"]))
    pred = m.predict(s)
    assert len(pred["predictions"]) == 2
    assert all(0 <= p < 5 for p in pred["predictions"])


def test_blip2_stage1():
    m = registry.get_model_class("blip2")(model_size="tiny")
    s = {"image": _img(), "text_input": ["a dog runs", "a cat sits"]}
    out = m(s)
    for k in ("loss", "loss_itc", "loss_itm", "loss_lm"):
        assert np.isfinite(float(out[k])), k
    caps = m.generate(s, max_length=6)["captions"]
    assert len(caps) == 2
    f = m.extract_features(s, mode="image")
    assert f["image_embeds_proj"].shape[0] == 2


def test_blip2_itm():
    m = registry.get_model_class("blip2_image_text_matching")(model_size="tiny")
    s = {"image": _img(), "text_input": ["a dog", "a cat"]}
    assert m.itm(s, match_head="itm").shape == (2, 2)
    itc = m.itm(s, match_head="itc")
    assert itc.shape == (2,) and np.all(np.abs(itc) <= 1 + 1e-4)


def test_blip2_feature_extractor_name():
    m = registry.get_model_class("blip2_feature_extractor")(model_size="tiny")
    s = {"image": _img(), "text_input": ["a dog", "a cat"]}
    f = m.extract_features(s, mode="multimodal")
    assert f["multimodal_embeds"].ndim == 3


def test_blip2_t5():
    m = registry.get_model_class("blip2_t5")(model_size="tiny",
                                             max_new_tokens=6)
    s = {"image": _img(), "text_input": ["what is this", "who is here"],
         "text_output": ["a dog", "a cat"]}
    assert np.isfinite(float(m(s)["loss"]))
    caps = m.generate(s)["captions"]
    assert len(caps) == 2
    assert m.predict_answers(s) == caps


def test_blip2_opt():
    m = registry.get_model_class("blip2_opt")(model_size="tiny")
    s = {"image": _img(), "text_input": ["what is this", "who is here"],
         "text_output": ["a dog", "a cat"]}
    assert np.isfinite(float(m(s)["loss"]))
    assert len(m.generate(s, max_length=5)["captions"]) == 2


def test_blip_pretrain():
    m = registry.get_model_class("blip_pretrain")(model_size="tiny",
                                                  queue_size=4)
    out = m({"image": _img(), "text_input": ["a dog runs", "a cat sits"]})
    for k in ("loss", "loss_itc", "loss_itm", "loss_lm"):
        assert np.isfinite(float(out[k])), k
    assert int(m.momentum_state["queue_ptr"]) == 2


def test_pnp_unifiedqav2_fid():
    m = registry.get_model_class("pnp_unifiedqav2_fid")(model_size="tiny")
    ans = m.predict_answers({
        "text_input": ["what runs", "who sits"],
        "context": [["a dog runs fast", "the park is green"],
                    ["a cat sits"]],
    })
    assert len(ans) == 2 and all(isinstance(a, str) for a in ans)


def test_reference_model_name_coverage():
    """Every model name the reference registers must resolve here."""
    import json
    import pathlib

    names = json.loads(
        (pathlib.Path(__file__).parent / "data" / "ref_model_names.json")
        .read_text())
    missing = [n for n in names if registry.get_model_class(n) is None]
    assert not missing, missing


def test_wrappers_pick_up_bert_vocab(tmp_path, monkeypatch):
    """With MRBLIP_BERT_VOCAB set (and a vocab that fits the model's
    embedding), zoo wrappers tokenize with the real WordPiece."""
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "a", "dog",
             "cat", "runs", "sits"]
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(vocab) + "\n")
    monkeypatch.setenv("MRBLIP_BERT_VOCAB", str(p))
    m = registry.get_model_class("blip_caption")(model_size="tiny")
    from mr_blip_tpu.text.wordpiece import BertWordPieceTokenizer

    assert isinstance(m.tokenizer, BertWordPieceTokenizer)
    out = m({"image": _img(), "text_input": ["a dog runs", "a cat sits"]})
    assert np.isfinite(float(out["loss"]))


def test_default_config_yamls_resolve():
    """Every non-None PRETRAINED_MODEL_CONFIG_DICT entry must point at a
    real yaml whose arch matches the registered name, and load_model with
    model_type='tiny' stays cheap (no yaml)."""
    import os

    from mr_blip_tpu.common.config import load_yaml

    checked = 0
    for name, cls in registry.mapping["model_name_mapping"].items():
        d = getattr(cls, "PRETRAINED_MODEL_CONFIG_DICT", {})
        for mtype, rel in d.items():
            if rel is None:
                continue
            path = cls.default_config_path(mtype)
            assert os.path.exists(path), (name, mtype, path)
            cfg = load_yaml(path)["model"]
            # subclasses (e.g. blip2_opt_mr) may inherit the parent's yamls
            arch_cls = registry.get_model_class(cfg["arch"])
            assert cfg["arch"] == name or issubclass(cls, arch_cls), (
                name, cfg["arch"])
            checked += 1
    assert checked >= 15
