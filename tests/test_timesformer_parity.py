"""Numeric parity of TimeSformer against the reference torch module.

Loads the reference's own ``lavis/models/timesformer/vit.py`` (fairscale
checkpoint_wrapper stubbed; the package's relative imports resolve through
a real __path__), ports the state dict via ``port_timesformer``, and
requires token agreement <= 1e-4.

Token-order note: the reference keeps patch tokens patch-major
``(h w t)`` (vit.py Block.forward rearranges), ours are frame-major
``(t p)`` — the same computation on permuted token order, so the
comparison permutes the reference output with ``ref[p*T + t] == ours[t*P
+ p]``.
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

from mr_blip_tpu.models.port import port_timesformer
from mr_blip_tpu.models.timesformer import TimeSformer, TimeSformerConfig


@pytest.fixture(scope="module")
def ref_vit(reference_root):
    if "fairscale" not in sys.modules:
        fs = types.ModuleType("fairscale")
        nn_m = types.ModuleType("fairscale.nn")
        cp = types.ModuleType("fairscale.nn.checkpoint")
        ca = types.ModuleType("fairscale.nn.checkpoint.checkpoint_activations")
        ca.checkpoint_wrapper = lambda m, *a, **k: m
        for m in (fs, nn_m, cp, ca):
            m.__spec__ = importlib.machinery.ModuleSpec(m.__name__, loader=None)
        fs.nn = nn_m
        nn_m.checkpoint = cp
        cp.checkpoint_activations = ca
        sys.modules.update({
            "fairscale": fs, "fairscale.nn": nn_m,
            "fairscale.nn.checkpoint": cp,
            "fairscale.nn.checkpoint.checkpoint_activations": ca,
        })
    for name in ("lavis", "lavis.models"):
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = []
            pkg.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
            sys.modules[name] = pkg
    ts_dir = reference_root / "lavis" / "models" / "timesformer"
    if "lavis.models.timesformer" not in sys.modules:
        pkg = types.ModuleType("lavis.models.timesformer")
        pkg.__path__ = [str(ts_dir)]
        pkg.__spec__ = importlib.machinery.ModuleSpec(
            "lavis.models.timesformer", loader=None, is_package=True)
        sys.modules["lavis.models.timesformer"] = pkg
    return importlib.import_module("lavis.models.timesformer.vit")


class TestTimeSformerParity:
    def test_divided_space_time(self, ref_vit):
        torch.manual_seed(0)
        img, patch, T, dim, depth, heads = 28, 14, 2, 32, 2, 2
        ref = ref_vit.VisionTransformer(
            img_size=img, patch_size=patch, in_chans=3, num_classes=0,
            embed_dim=dim, depth=depth, num_heads=heads, mlp_ratio=4.0,
            qkv_bias=True, drop_rate=0.0, attn_drop_rate=0.0,
            drop_path_rate=0.0, num_frames=T,
            attention_type="divided_space_time",
        ).eval()

        cfg = TimeSformerConfig(img_size=img, patch_size=patch, n_frms=T,
                                embed_dim=dim, depth=depth, num_heads=heads)
        ours = TimeSformer(cfg, compute_dtype=jnp.float32)
        params = port_timesformer(ref.state_dict())

        rng = np.random.default_rng(0)
        video_np = rng.standard_normal((2, T, img, img, 3)).astype(np.float32)
        # torch layout (B, C, T, H, W)
        video_t = torch.tensor(video_np.transpose(0, 4, 1, 2, 3))
        with torch.no_grad():
            want = ref.forward_features(video_t).numpy()

        got = np.asarray(ours.apply({"params": params},
                                    jnp.asarray(video_np)))
        P = (img // patch) ** 2
        # permute reference patch tokens (p-major) to our frame-major order
        perm = [0] + [1 + p * T + t for t in range(T) for p in range(P)]
        np.testing.assert_allclose(got, want[:, perm], rtol=2e-4, atol=2e-4)

    def test_joint_space_time(self, ref_vit):
        torch.manual_seed(1)
        img, patch, T, dim, depth, heads = 28, 14, 2, 32, 2, 2
        ref = ref_vit.VisionTransformer(
            img_size=img, patch_size=patch, in_chans=3, num_classes=0,
            embed_dim=dim, depth=depth, num_heads=heads, mlp_ratio=4.0,
            qkv_bias=True, drop_rate=0.0, attn_drop_rate=0.0,
            drop_path_rate=0.0, num_frames=T,
            attention_type="joint_space_time",
        ).eval()
        cfg = TimeSformerConfig(img_size=img, patch_size=patch, n_frms=T,
                                embed_dim=dim, depth=depth, num_heads=heads,
                                attention_type="joint_space_time")
        ours = TimeSformer(cfg, compute_dtype=jnp.float32)
        params = port_timesformer(ref.state_dict())
        rng = np.random.default_rng(1)
        video_np = rng.standard_normal((1, T, img, img, 3)).astype(np.float32)
        video_t = torch.tensor(video_np.transpose(0, 4, 1, 2, 3))
        with torch.no_grad():
            want = ref.forward_features(video_t).numpy()
        got = np.asarray(ours.apply({"params": params},
                                    jnp.asarray(video_np)))
        P = (img // patch) ** 2
        perm = [0] + [1 + p * T + t for t in range(T) for p in range(P)]
        np.testing.assert_allclose(got, want[:, perm], rtol=2e-4, atol=2e-4)
