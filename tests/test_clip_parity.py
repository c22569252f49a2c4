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


class TestClipResNetParity:
    """ModifiedResNet tower (RN50 family) vs the reference torch module."""

    def _tiny_rn_pair(self, ref_clip, quick_gelu=False):
        from mr_blip_tpu.models.clip_resnet import ResNetVisionConfig

        torch.manual_seed(0)
        vision_cfg = ref_clip.CLIPVisionCfg(
            layers=(1, 1, 1, 1), width=8, patch_size=None, image_size=64,
        )
        text_cfg = ref_clip.CLIPTextCfg(
            context_length=12, vocab_size=100, width=64, heads=1, layers=2,
        )
        ref = ref_clip.CLIP(16, vision_cfg, text_cfg,
                            quick_gelu=quick_gelu).eval()
        # randomize BN running stats so the parity check exercises them;
        # also lift the reference's zero-init of bn3.weight
        # (model.py:212-215 residual-as-identity init) — with scale=0 the
        # whole main branch is multiplied by zero, which would make both
        # the parity check and the gradient check vacuous for those convs
        with torch.no_grad():
            for m in ref.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.normal_(0, 0.05)
                    m.running_var.uniform_(0.8, 1.2)
            for n, p in ref.named_parameters():
                if n.endswith("bn3.weight"):
                    p.normal_(1.0, 0.1)

        cfg = CLIPConfig(
            embed_dim=16,
            resnet=ResNetVisionConfig(
                layers=(1, 1, 1, 1), output_dim=16, image_size=64, width=8,
            ),
            vocab_size=100, context_length=12, text_width=64, text_heads=1,
            text_layers=2, quick_gelu=quick_gelu,
        )
        ours = OurCLIP(cfg, compute_dtype=jnp.float32)
        params = port_clip(ref.state_dict())
        return ref, ours, params

    def test_tower_and_logits(self, ref_clip):
        ref, ours, params = self._tiny_rn_pair(ref_clip)
        rng = np.random.default_rng(0)
        imgs = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
        ids = rng.integers(1, 100, (2, 12)).astype(np.int64)
        ids[:, -1] = 99

        with torch.no_grad():
            want_img = ref.encode_image(
                torch.tensor(imgs.transpose(0, 3, 1, 2))).numpy()

        got_img = np.asarray(ours.apply(
            {"params": params}, jnp.asarray(imgs), method="encode_image"))
        np.testing.assert_allclose(got_img, want_img, rtol=1e-4, atol=1e-4)

        # full contrastive logits through the dual towers
        got_li, _ = ours.apply(
            {"params": params}, jnp.asarray(imgs), jnp.asarray(ids))
        with torch.no_grad():
            want_txt = ref.encode_text(torch.tensor(ids)).numpy()
        ni = want_img / np.linalg.norm(want_img, axis=-1, keepdims=True)
        nt = want_txt / np.linalg.norm(want_txt, axis=-1, keepdims=True)
        scale = float(np.exp(ref.logit_scale.detach().numpy()))
        np.testing.assert_allclose(np.asarray(got_li), scale * ni @ nt.T,
                                   rtol=1e-3, atol=1e-3)

    def test_train_mode_grads(self, ref_clip):
        """Batch-stat normalization path is differentiable (contrastive
        finetune smoke; running-stat EMA is out of scope — see
        models/clip_resnet.py docstring)."""
        _, ours, params = self._tiny_rn_pair(ref_clip)
        rng = np.random.default_rng(1)
        imgs = jnp.asarray(
            rng.standard_normal((2, 64, 64, 3)).astype(np.float32))

        def loss_fn(p):
            feats = ours.apply({"params": p}, imgs, False,
                               method=lambda m, x, det: m.visual(x, det))
            return jnp.sum(feats ** 2)

        grads = jax.grad(loss_fn)(params)
        g = grads["visual"]["layer1_block0"]["conv1"]["kernel"]
        assert bool(jnp.any(g != 0))
        assert np.isfinite(float(jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(jnp.abs(b)), grads, 0.0)))
