"""Numeric parity of the base ViT (ALBEF/BLIP-v1 vision tower) against the
reference's own ``lavis/models/vit.py`` (timm PatchEmbed/helpers and
fairscale stubbed), ported via ``port_base_vit``; tokens <= 1e-4."""

import importlib.machinery
import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from mr_blip_tpu.models.port import port_base_vit
from mr_blip_tpu.models.vit import BaseViTConfig, VisionTransformer


@pytest.fixture(scope="module")
def ref_vit(reference_root):
    import torch.nn as nn

    def _mk(name, **attrs):
        mod = sys.modules.get(name) or types.ModuleType(name)
        mod.__spec__ = getattr(
            mod, "__spec__", None
        ) or importlib.machinery.ModuleSpec(name, loader=None)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod
        return mod

    class PatchEmbed(nn.Module):
        def __init__(self, img_size=224, patch_size=16, in_chans=3,
                     embed_dim=768, **kw):
            super().__init__()
            self.num_patches = (img_size // patch_size) ** 2
            self.proj = nn.Conv2d(in_chans, embed_dim, kernel_size=patch_size,
                                  stride=patch_size)

        def forward(self, x):
            return self.proj(x).flatten(2).transpose(1, 2)

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()

        def forward(self, x):
            return x

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(mean + a * std, mean + b * std)
        return tensor

    timm = _mk("timm")
    models = _mk("timm.models")
    _mk("timm.models.vision_transformer", PatchEmbed=PatchEmbed,
        _cfg=lambda url="", **kw: dict(url=url, **kw))
    _mk("timm.models.registry", register_model=lambda fn: fn)
    _mk("timm.models.layers", trunc_normal_=trunc_normal_, DropPath=DropPath,
        drop_path=lambda x, *a, **k: x, to_2tuple=lambda v: (v, v))
    _mk("timm.models.helpers", named_apply=lambda fn, mod, *a, **k: mod,
        adapt_input_conv=lambda in_chans, w: w)
    timm.models = models

    if "fairscale" not in sys.modules:
        fs = _mk("fairscale")
        nn_m = _mk("fairscale.nn")
        cp = _mk("fairscale.nn.checkpoint")
        _mk("fairscale.nn.checkpoint.checkpoint_activations",
            checkpoint_wrapper=lambda m, *a, **k: m)
        fs.nn = nn_m
        nn_m.checkpoint = cp
    else:
        sys.modules.setdefault(
            "fairscale.nn.checkpoint.checkpoint_activations",
            _mk("fairscale.nn.checkpoint.checkpoint_activations",
                checkpoint_wrapper=lambda m, *a, **k: m),
        )
    for name in ("lavis", "lavis.models"):
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = []
            pkg.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
            sys.modules[name] = pkg
    if "lavis.models.base_model" not in sys.modules:
        bm = types.ModuleType("lavis.models.base_model")

        class BaseEncoder(torch.nn.Module):
            pass

        bm.BaseEncoder = BaseEncoder
        bm.__spec__ = importlib.machinery.ModuleSpec(
            "lavis.models.base_model", loader=None)
        sys.modules["lavis.models.base_model"] = bm

    spec = importlib.util.spec_from_file_location(
        "ref_base_vit", str(reference_root / "lavis" / "models" / "vit.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_base_vit"] = mod
    spec.loader.exec_module(mod)
    return mod


class TestBaseViTParity:
    def test_tokens_match(self, ref_vit):
        torch.manual_seed(0)
        ref = ref_vit.VisionTransformer(
            img_size=28, patch_size=14, embed_dim=32, depth=2, num_heads=2,
            mlp_ratio=4.0, qkv_bias=True, drop_rate=0.0, drop_path_rate=0.0,
        ).eval()
        # random-init the zero-init embeddings so the test is non-trivial
        with torch.no_grad():
            ref.pos_embed.normal_(0, 0.5)
            ref.cls_token.normal_(0, 0.5)

        cfg = BaseViTConfig(img_size=28, patch_size=14, embed_dim=32,
                            depth=2, num_heads=2)
        ours = VisionTransformer(cfg, compute_dtype=jnp.float32)
        params = port_base_vit(ref.state_dict())

        rng = np.random.default_rng(0)
        imgs = rng.standard_normal((2, 28, 28, 3)).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.tensor(imgs.transpose(0, 3, 1, 2))).numpy()
        got = np.asarray(ours.apply({"params": params}, jnp.asarray(imgs)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
