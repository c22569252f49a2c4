"""Numeric parity of the MED text stack against the reference torch module.

Loads the reference's own ``lavis/models/med.py`` (the BLIP/ALBEF BERT with
cross-attention and the fusion_layer split) from the mounted tree, ports
the torch state dict through ``port_med``, and requires hidden-state
agreement <= 1e-4 across all four modes:

* "text"        — layers [0, fusion_layer)                med.py:543-547
* "fusion"      — layers [fusion_layer, N) over encoder_embeds  :548-552
* "multimodal"  — every layer cross-attends               :553-557
* decoder       — causal self-attention (is_decoder=True) :883+
"""

import importlib.machinery
import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from mr_blip_tpu.models.med import MedConfig, MedLMHead, MedModel
from mr_blip_tpu.models.port import port_med, port_med_lm_head


def _load_module(path, name):
    spec = importlib.util.spec_from_file_location(name, str(path))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_med(reference_root):
    """Reference med.py with the lavis bits + relocated transformers
    helpers stubbed (same recipe as test_vision_parity's Qformer load)."""
    import transformers.modeling_utils as mu
    from transformers import pytorch_utils

    for n in (
        "apply_chunking_to_forward",
        "find_pruneable_heads_and_indices",
        "prune_linear_layer",
    ):
        if not hasattr(mu, n):
            setattr(mu, n, getattr(pytorch_utils, n))

    for name in ("lavis", "lavis.common", "lavis.models"):
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = []
            pkg.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
            sys.modules[name] = pkg
    if "lavis.common.utils" not in sys.modules:
        cu = types.ModuleType("lavis.common.utils")
        cu.get_abs_path = lambda p: p
        sys.modules["lavis.common.utils"] = cu
    bm = sys.modules.get("lavis.models.base_model")
    if bm is None:
        bm = types.ModuleType("lavis.models.base_model")
        bm.__spec__ = importlib.machinery.ModuleSpec(
            "lavis.models.base_model", loader=None)
        sys.modules["lavis.models.base_model"] = bm
    if not hasattr(bm, "BaseEncoder"):
        class BaseEncoder(torch.nn.Module):
            @classmethod
            def from_config(cls, cfg, from_pretrained=False):  # pragma: no cover
                raise NotImplementedError

        bm.BaseEncoder = BaseEncoder
    return _load_module(reference_root / "lavis" / "models" / "med.py",
                        "ref_med")


def _tiny_bert_config(ref_med, fusion_layer=None):
    from transformers.models.bert.configuration_bert import BertConfig

    kw = dict(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, hidden_act="gelu",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-12, add_cross_attention=True,
        add_type_embeddings=False, encoder_width=32, pad_token_id=0,
    )
    if fusion_layer is not None:
        kw["fusion_layer"] = fusion_layer
    return BertConfig(**kw)


def _build_pair(ref_med, fusion_layer=None):
    torch.manual_seed(0)
    cfg = _tiny_bert_config(ref_med, fusion_layer)
    ref = ref_med.BertModel(cfg, add_pooling_layer=False).eval()

    ours_cfg = MedConfig(
        vocab_size=120, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, encoder_width=32, max_position_embeddings=64,
        dropout=0.0, fusion_layer=fusion_layer,
    )
    ours = MedModel(ours_cfg, compute_dtype=jnp.float32)
    params = port_med(ref.state_dict())
    return ref, ours, params


def _inputs(seed=0, b=2, l=6, m=5, vocab=120, width=32):
    rng = np.random.default_rng(seed)
    ids = rng.integers(1, vocab, (b, l)).astype(np.int64)
    mask = np.ones((b, l), np.int64)
    mask[1, l - 2:] = 0
    img = rng.standard_normal((b, m, width)).astype(np.float32)
    return ids, mask, img


class TestMedParity:
    def test_text_and_multimodal_modes(self, ref_med):
        ref, ours, params = _build_pair(ref_med)
        ids, mask, img = _inputs()
        with torch.no_grad():
            want_text = ref(
                torch.tensor(ids), attention_mask=torch.tensor(mask),
                mode="text", return_dict=True,
            ).last_hidden_state.numpy()
            want_mm = ref(
                torch.tensor(ids), attention_mask=torch.tensor(mask),
                encoder_hidden_states=torch.tensor(img),
                mode="multimodal", return_dict=True,
            ).last_hidden_state.numpy()
        got_text = ours.apply({"params": params}, jnp.asarray(ids),
                              text_mask=jnp.asarray(mask), mode="text")
        got_mm = ours.apply({"params": params}, jnp.asarray(ids),
                            text_mask=jnp.asarray(mask),
                            image_states=jnp.asarray(img), mode="multimodal")
        np.testing.assert_allclose(np.asarray(got_text), want_text,
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got_mm), want_mm,
                                   rtol=1e-4, atol=1e-4)

    def test_albef_fusion_split(self, ref_med):
        """fusion_layer=1 of 2: text mode runs one layer; fusion continues
        from its output with cross-attention — the ALBEF/ALPRO split."""
        ref, ours, params = _build_pair(ref_med, fusion_layer=1)
        ids, mask, img = _inputs(seed=1)
        with torch.no_grad():
            text_out = ref(
                torch.tensor(ids), attention_mask=torch.tensor(mask),
                mode="text", return_dict=True,
            ).last_hidden_state
            want = ref(
                encoder_embeds=text_out,
                attention_mask=torch.tensor(mask),
                encoder_hidden_states=torch.tensor(img),
                mode="fusion", return_dict=True,
            ).last_hidden_state.numpy()
        got_text = ours.apply({"params": params}, jnp.asarray(ids),
                              text_mask=jnp.asarray(mask), mode="text")
        np.testing.assert_allclose(np.asarray(got_text), text_out.numpy(),
                                   rtol=1e-4, atol=1e-4)
        got = ours.apply({"params": params}, jnp.asarray(ids),
                         text_mask=jnp.asarray(mask),
                         image_states=jnp.asarray(img), mode="fusion",
                         input_embeds=got_text)
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-4, atol=1e-4)

    def test_decoder_causal_mode(self, ref_med):
        ref, ours, params = _build_pair(ref_med)
        ids, mask, img = _inputs(seed=2)
        with torch.no_grad():
            want = ref(
                torch.tensor(ids), attention_mask=torch.tensor(mask),
                encoder_hidden_states=torch.tensor(img),
                mode="multimodal", is_decoder=True, return_dict=True,
            ).last_hidden_state.numpy()
        got = ours.apply({"params": params}, jnp.asarray(ids),
                         text_mask=jnp.asarray(mask),
                         image_states=jnp.asarray(img), mode="decoder")
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-4, atol=1e-4)

    def test_lm_head(self, ref_med):
        torch.manual_seed(1)
        cfg = _tiny_bert_config(ref_med)
        head = ref_med.BertOnlyMLMHead(cfg).eval()
        ours_cfg = MedConfig(
            vocab_size=120, hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64, encoder_width=32, dropout=0.0,
        )
        ours = MedLMHead(ours_cfg, compute_dtype=jnp.float32)
        params = port_med_lm_head(head.state_dict(), prefix="")
        rng = np.random.default_rng(3)
        h = rng.standard_normal((2, 5, 32)).astype(np.float32)
        with torch.no_grad():
            want = head(torch.tensor(h)).numpy()
        got = ours.apply({"params": params}, jnp.asarray(h))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
