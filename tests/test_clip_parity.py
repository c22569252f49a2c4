"""Numeric parity of CLIP against the reference torch module.

Loads the reference's own ``lavis/models/clip_models/model.py`` (torchvision
-dependent submodules + lavis registry/base-model/tasks stubbed), ports the
state dict via ``port_clip``, and requires feature agreement <= 1e-4 for
both towers and the similarity logits (quick_gelu on and off).
"""

import importlib
import importlib.machinery
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from mr_blip_tpu.models.clip import CLIP as OurCLIP
from mr_blip_tpu.models.clip import CLIPConfig
from mr_blip_tpu.models.port import port_clip
from mr_blip_tpu.models.vit import BaseViTConfig


def _stub(name, **attrs):
    # additive: parity fixtures share the fake ``lavis`` modules — never
    # clobber attrs another fixture installed (e.g. base_model.BaseEncoder)
    mod = sys.modules.get(name) or types.ModuleType(name)
    if getattr(mod, "__spec__", None) is None:
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        if not hasattr(mod, k):
            setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


@pytest.fixture(scope="module")
def ref_clip(reference_root):
    for name in ("lavis", "lavis.common", "lavis.models", "lavis.tasks"):
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = []
            pkg.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
            sys.modules[name] = pkg

    class _Registry:
        mapping = {"model_name_mapping": {}}

        @classmethod
        def register_model(cls, name):
            return lambda target: target

        @classmethod
        def get_model_class(cls, name):  # pragma: no cover
            return None

    _stub("lavis.common.registry", registry=_Registry)
    _stub("lavis.common.utils", get_abs_path=lambda p: p)
    _stub("lavis.models.base_model", BaseModel=type(
        "BaseModel", (torch.nn.Module,), {}))
    _stub("lavis.tasks.multimodal_classification",
          MultimodalClassificationTask=object)

    cm_dir = reference_root / "lavis" / "models" / "clip_models"
    pkg = types.ModuleType("lavis.models.clip_models")
    pkg.__path__ = [str(cm_dir)]
    pkg.__spec__ = importlib.machinery.ModuleSpec(
        "lavis.models.clip_models", loader=None, is_package=True)
    sys.modules["lavis.models.clip_models"] = pkg
    # torchvision-dependent submodules: stub what model.py imports
    _stub("lavis.models.clip_models.transform",
          image_transform=lambda *a, **k: (lambda x: x))
    _stub("lavis.models.clip_models.utils",
          freeze_batch_norm_2d=lambda m, *a, **k: m)
    _stub("lavis.models.clip_models.tokenizer",  # needs ftfy (absent)
          tokenize=lambda *a, **k: None, SimpleTokenizer=object)
    return importlib.import_module("lavis.models.clip_models.model")


def _tiny_pair(ref_clip, quick_gelu):
    torch.manual_seed(0)
    # this CLIP revision fixes heads = width // 64 (model.py:466,836)
    vision_cfg = ref_clip.CLIPVisionCfg(
        layers=2, width=64, patch_size=14, image_size=28,
    )
    text_cfg = ref_clip.CLIPTextCfg(
        context_length=12, vocab_size=100, width=64, heads=1, layers=2,
    )
    ref = ref_clip.CLIP(16, vision_cfg, text_cfg, quick_gelu=quick_gelu).eval()

    cfg = CLIPConfig(
        embed_dim=16,
        vision=BaseViTConfig(
            img_size=28, patch_size=14, embed_dim=64, depth=2, num_heads=1,
            pre_norm=True, norm_eps=1e-5,
            act="quick_gelu" if quick_gelu else "gelu",
        ),
        vocab_size=100, context_length=12, text_width=64, text_heads=1,
        text_layers=2, quick_gelu=quick_gelu,
    )
    ours = OurCLIP(cfg, compute_dtype=jnp.float32)
    params = port_clip(ref.state_dict())
    return ref, ours, params


class TestClipParity:
    @pytest.mark.parametrize("quick_gelu", [False, True])
    def test_towers_and_logits(self, ref_clip, quick_gelu):
        ref, ours, params = _tiny_pair(ref_clip, quick_gelu)
        rng = np.random.default_rng(0)
        imgs = rng.standard_normal((2, 28, 28, 3)).astype(np.float32)
        ids = rng.integers(1, 100, (2, 12)).astype(np.int64)
        ids[:, -1] = 99  # EOT = highest id (argmax pooling)

        with torch.no_grad():
            want_img = ref.encode_image(
                torch.tensor(imgs.transpose(0, 3, 1, 2))).numpy()
            want_txt = ref.encode_text(torch.tensor(ids)).numpy()

        got_img = np.asarray(ours.apply(
            {"params": params}, jnp.asarray(imgs), method="encode_image"))
        got_txt = np.asarray(ours.apply(
            {"params": params}, jnp.asarray(ids), method="encode_text"))
        np.testing.assert_allclose(got_img, want_img, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(got_txt, want_txt, rtol=1e-4, atol=1e-4)

        got_li, got_lt = ours.apply(
            {"params": params}, jnp.asarray(imgs), jnp.asarray(ids))
        ni = want_img / np.linalg.norm(want_img, axis=-1, keepdims=True)
        nt = want_txt / np.linalg.norm(want_txt, axis=-1, keepdims=True)
        scale = float(np.exp(ref.logit_scale.detach().numpy()))
        np.testing.assert_allclose(np.asarray(got_li), scale * ni @ nt.T,
                                   rtol=1e-3, atol=1e-3)
