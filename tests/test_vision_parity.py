"""Numeric parity of the vision front end against the reference torch modules.

Loads the reference's own ``lavis/models/eva_vit.py`` (with ``timm`` stubbed —
it only uses drop_path/to_2tuple/trunc_normal_/register_model) and
``lavis/models/blip2_models/Qformer.py`` (with the moved transformers helpers
re-exported) directly from the mounted reference tree, random-inits matched
geometries, ports the torch state dicts through ``port_eva_vit`` /
``port_qformer``, and requires logits agreement ≤ 1e-4 — proving the flax
modules compute the *same function*, not just that the name mapping
round-trips.

Covers (per reference):
* EVA ViT blocks/patch-embed/q-v-bias quirk   eva_vit.py:246-370
* the real head-dim-88 geometry slice          eva_vit.py:415-428
* Q-Former query-only path (text stripped)     Qformer.py:111-677, blip2_mr.py:259-264
* Q-Former multimodal path (queries + text)    Qformer.py:403-470, blip2_mr.py:455-481
* composed ViT -> fp32 LN -> QFormer -> t5_proj  blip2.py:76-119, blip2_mr.py:446-510
"""

import importlib.util
import sys
import types
from functools import partial

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from mr_blip_tpu.models.eva_vit import EvaViT, ViTConfig
from mr_blip_tpu.models.port import merge_subtree, port_eva_vit, port_qformer
from mr_blip_tpu.models.qformer import QFormer, QFormerConfig


def _load_module(path, name):
    spec = importlib.util.spec_from_file_location(name, str(path))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_eva(reference_root):
    """Reference eva_vit with timm + lavis.common.dist_utils stubbed."""
    if "timm" not in sys.modules or not hasattr(
        sys.modules.get("timm.models.layers", None), "drop_path"
    ):
        import importlib.machinery

        timm = types.ModuleType("timm")
        models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")
        registry = types.ModuleType("timm.models.registry")
        # transformers probes importlib.util.find_spec("timm"); a stub with a
        # None __spec__ raises ValueError there.
        for m in (timm, models, layers, registry):
            m.__spec__ = importlib.machinery.ModuleSpec(m.__name__, loader=None)

        def drop_path(x, drop_prob=0.0, training=False):
            if drop_prob == 0.0 or not training:
                return x
            keep = 1 - drop_prob
            mask = torch.bernoulli(torch.full((x.shape[0],) + (1,) * (x.ndim - 1), keep))
            return x.div(keep) * mask

        def to_2tuple(v):
            return v if isinstance(v, tuple) else (v, v)

        def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
            with torch.no_grad():
                tensor.normal_(mean, std).clamp_(mean + a * std, mean + b * std)
            return tensor

        layers.drop_path = drop_path
        layers.to_2tuple = to_2tuple
        layers.trunc_normal_ = trunc_normal_
        registry.register_model = lambda fn: fn
        models.layers = layers
        models.registry = registry
        timm.models = models
        sys.modules.update(
            {
                "timm": timm,
                "timm.models": models,
                "timm.models.layers": layers,
                "timm.models.registry": registry,
            }
        )
    for name in ("lavis", "lavis.common"):
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = []
            sys.modules[name] = pkg
    if "lavis.common.dist_utils" not in sys.modules:
        du = types.ModuleType("lavis.common.dist_utils")
        du.download_cached_file = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("no network in tests")
        )
        sys.modules["lavis.common.dist_utils"] = du
    return _load_module(
        reference_root / "lavis" / "models" / "eva_vit.py", "ref_eva_vit"
    )


@pytest.fixture(scope="module")
def ref_qformer(reference_root):
    """Reference Qformer with the relocated transformers helpers injected."""
    import transformers.modeling_utils as mu
    from transformers import pytorch_utils

    for n in (
        "apply_chunking_to_forward",
        "find_pruneable_heads_and_indices",
        "prune_linear_layer",
    ):
        if not hasattr(mu, n):
            setattr(mu, n, getattr(pytorch_utils, n))
    return _load_module(
        reference_root / "lavis" / "models" / "blip2_models" / "Qformer.py",
        "ref_qformer",
    )


def _build_ref_vit(ref_eva, img_size, embed_dim, depth, num_heads, mlp_ratio):
    torch.manual_seed(0)
    model = ref_eva.VisionTransformer(
        img_size=img_size,
        patch_size=14,
        use_mean_pooling=False,
        embed_dim=embed_dim,
        depth=depth,
        num_heads=num_heads,
        mlp_ratio=mlp_ratio,
        qkv_bias=True,
        drop_path_rate=0.0,
        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
    ).eval()
    # trunc_normal_ leaves biases zero and the synthetic q/v-bias zero too;
    # randomize every parameter so a porting miss can't hide behind zeros.
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return model


def _vit_parity(ref_eva, img_size, embed_dim, depth, num_heads, mlp_ratio, atol):
    ref = _build_ref_vit(ref_eva, img_size, embed_dim, depth, num_heads, mlp_ratio)
    cfg = ViTConfig(
        img_size=img_size,
        patch_size=14,
        embed_dim=embed_dim,
        depth=depth,
        num_heads=num_heads,
        mlp_hidden_dim=int(embed_dim * mlp_ratio),
    )
    mine = EvaViT(cfg, compute_dtype=jnp.float32)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, img_size, img_size, 3)).astype(np.float32)

    params = mine.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    ported = merge_subtree(
        {"m": params}, port_eva_vit(ref.state_dict()), "m"
    )["m"]

    with torch.no_grad():
        want = ref(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(mine.apply({"params": ported}, jnp.asarray(x)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=atol)


class TestEvaViTParity:
    def test_tiny_geometry(self, ref_eva):
        _vit_parity(ref_eva, img_size=28, embed_dim=32, depth=2, num_heads=2,
                    mlp_ratio=2.0, atol=1e-4)

    def test_real_geometry_slice(self, ref_eva):
        """Two blocks of the true ViT-g geometry: d=1408, 16 heads of dim 88,
        MLP hidden int(1408*4.3637)=6144 (eva_vit.py:415-428)."""
        _vit_parity(ref_eva, img_size=28, embed_dim=1408, depth=2, num_heads=16,
                    mlp_ratio=4.3637, atol=5e-4)


def _bert_config(ref_qformer, hidden=32, layers=2, heads=2, inter=64,
                 encoder_width=16, nq=4):
    from transformers.models.bert.configuration_bert import BertConfig

    cfg = BertConfig(
        vocab_size=64,
        hidden_size=hidden,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        intermediate_size=inter,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        max_position_embeddings=32,
    )
    cfg.encoder_width = encoder_width
    cfg.add_cross_attention = True
    cfg.cross_attention_freq = 2
    cfg.query_length = nq
    return cfg


def _build_ref_qformer(ref_qformer, cfg, strip_text=True):
    torch.manual_seed(0)
    model = ref_qformer.BertLMHeadModel(cfg).eval()
    g = torch.Generator().manual_seed(11)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    if strip_text:
        # blip2_mr.py:259-264
        model.cls = None
        model.bert.embeddings.word_embeddings = None
        model.bert.embeddings.position_embeddings = None
        for layer in model.bert.encoder.layer:
            layer.output = None
            layer.intermediate = None
    return model


def _port_ref_qformer(model, query_tokens=None):
    sd = {f"Qformer.{k}": v for k, v in model.state_dict().items()}
    if query_tokens is not None:
        sd["query_tokens"] = query_tokens
    return port_qformer(sd)


class TestQFormerParity:
    def test_query_only_path(self, ref_qformer):
        """The live Mr. BLIP configuration: 4 queries, text path stripped,
        cross-attention on even layers, ragged encoder mask."""
        cfg = _bert_config(ref_qformer)
        ref = _build_ref_qformer(ref_qformer, cfg)

        rng = np.random.default_rng(0)
        B, M = 3, 9
        enc = rng.standard_normal((B, M, cfg.encoder_width)).astype(np.float32)
        enc_mask = np.ones((B, M), np.int64)
        enc_mask[1, 5:] = 0
        qt = rng.standard_normal((1, cfg.query_length, cfg.hidden_size)).astype(
            np.float32
        )

        with torch.no_grad():
            want = ref.bert(
                query_embeds=torch.tensor(qt).expand(B, -1, -1),
                encoder_hidden_states=torch.tensor(enc),
                encoder_attention_mask=torch.tensor(enc_mask),
                return_dict=True,
            ).last_hidden_state.numpy()

        mcfg = QFormerConfig(
            hidden_size=cfg.hidden_size, num_layers=cfg.num_hidden_layers,
            num_heads=cfg.num_attention_heads,
            intermediate_size=cfg.intermediate_size,
            encoder_width=cfg.encoder_width, num_query_tokens=cfg.query_length,
        )
        mine = QFormer(mcfg, compute_dtype=jnp.float32)
        params = mine.init(
            jax.random.PRNGKey(0), jnp.asarray(enc), jnp.asarray(enc_mask)
        )["params"]
        ported = merge_subtree({"m": params}, _port_ref_qformer(ref, qt), "m")["m"]
        got = np.asarray(
            mine.apply({"params": ported}, jnp.asarray(enc), jnp.asarray(enc_mask))
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_multimodal_path(self, ref_qformer):
        """Queries + text share self-attention; text keeps word/pos embeddings
        and its own FFN (multimodal_Qformer branch, blip2_mr.py:455-481)."""
        cfg = _bert_config(ref_qformer)
        ref = _build_ref_qformer(ref_qformer, cfg, strip_text=False)

        rng = np.random.default_rng(1)
        B, M, L = 2, 7, 5
        enc = rng.standard_normal((B, M, cfg.encoder_width)).astype(np.float32)
        text_ids = rng.integers(1, cfg.vocab_size, (B, L))
        text_mask = np.ones((B, L), np.int64)
        text_mask[0, 3:] = 0
        qt = rng.standard_normal((1, cfg.query_length, cfg.hidden_size)).astype(
            np.float32
        )
        attn = np.concatenate(
            [np.ones((B, cfg.query_length), np.int64), text_mask], axis=1
        )

        with torch.no_grad():
            want = ref.bert(
                torch.tensor(text_ids),
                query_embeds=torch.tensor(qt).expand(B, -1, -1),
                attention_mask=torch.tensor(attn),
                encoder_hidden_states=torch.tensor(enc),
                encoder_attention_mask=torch.tensor(np.ones((B, M), np.int64)),
                return_dict=True,
            ).last_hidden_state.numpy()[:, : cfg.query_length]

        mcfg = QFormerConfig(
            hidden_size=cfg.hidden_size, num_layers=cfg.num_hidden_layers,
            num_heads=cfg.num_attention_heads,
            intermediate_size=cfg.intermediate_size,
            encoder_width=cfg.encoder_width, num_query_tokens=cfg.query_length,
            vocab_size=cfg.vocab_size,
            max_position_embeddings=cfg.max_position_embeddings, with_text=True,
        )
        mine = QFormer(mcfg, compute_dtype=jnp.float32)
        params = mine.init(
            jax.random.PRNGKey(0), jnp.asarray(enc), None,
            jnp.asarray(text_ids), jnp.asarray(text_mask),
        )["params"]
        ported_tree = _port_ref_qformer(ref, qt)
        # text-path embeddings (only present in the multimodal configuration)
        esd = ref.bert.embeddings
        ported_tree.setdefault("word_embeddings", {})["embedding"] = (
            esd.word_embeddings.weight.detach().numpy()
        )
        ported_tree.setdefault("position_embeddings", {})["embedding"] = (
            esd.position_embeddings.weight.detach().numpy()
        )
        # text FFN (intermediate/output, stripped on the live path)
        for i, layer in enumerate(ref.bert.encoder.layer):
            b = ported_tree.setdefault(f"layer_{i}", {})
            b.setdefault("intermediate", {})["Dense_0"] = {
                "kernel": layer.intermediate.dense.weight.detach().numpy().T,
                "bias": layer.intermediate.dense.bias.detach().numpy(),
            }
            b.setdefault("output", {})["Dense_0"] = {
                "kernel": layer.output.dense.weight.detach().numpy().T,
                "bias": layer.output.dense.bias.detach().numpy(),
            }
            b.setdefault("output_norm", {})["LayerNorm_0"] = {
                "scale": layer.output.LayerNorm.weight.detach().numpy(),
                "bias": layer.output.LayerNorm.bias.detach().numpy(),
            }
        ported = merge_subtree({"m": params}, ported_tree, "m")["m"]
        got = np.asarray(
            mine.apply(
                {"params": ported}, jnp.asarray(enc), None,
                jnp.asarray(text_ids), jnp.asarray(text_mask),
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def _port_text_path(ref, ported_tree):
    """Add the text-path tensors (embeddings + per-layer text FFN) that
    port_qformer skips on the stripped live path."""
    esd = ref.bert.embeddings
    ported_tree.setdefault("word_embeddings", {})["embedding"] = (
        esd.word_embeddings.weight.detach().numpy()
    )
    ported_tree.setdefault("position_embeddings", {})["embedding"] = (
        esd.position_embeddings.weight.detach().numpy()
    )
    for i, layer in enumerate(ref.bert.encoder.layer):
        b = ported_tree.setdefault(f"layer_{i}", {})
        b.setdefault("intermediate", {})["Dense_0"] = {
            "kernel": layer.intermediate.dense.weight.detach().numpy().T,
            "bias": layer.intermediate.dense.bias.detach().numpy(),
        }
        b.setdefault("output", {})["Dense_0"] = {
            "kernel": layer.output.dense.weight.detach().numpy().T,
            "bias": layer.output.dense.bias.detach().numpy(),
        }
        b.setdefault("output_norm", {})["LayerNorm_0"] = {
            "scale": layer.output.LayerNorm.weight.detach().numpy(),
            "bias": layer.output.LayerNorm.bias.detach().numpy(),
        }
    return ported_tree


def _multimodal_qformer_config(cfg):
    return QFormerConfig(
        hidden_size=cfg.hidden_size, num_layers=cfg.num_hidden_layers,
        num_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        encoder_width=cfg.encoder_width, num_query_tokens=cfg.query_length,
        vocab_size=cfg.vocab_size,
        max_position_embeddings=cfg.max_position_embeddings, with_text=True,
    )


class TestQFormerModesParity:
    """The stage-1 BLIP-2 modes (blip2_qformer.py forward): text-only tower
    and the causal-LM pass with the query prefix, vs the reference's own
    torch Qformer."""

    def test_text_only_path(self, ref_qformer):
        """ITC text tower: BertModel(input_ids) with no queries and no
        cross-attention (blip2_qformer.py:112-118) vs mode='text'."""
        cfg = _bert_config(ref_qformer)
        ref = _build_ref_qformer(ref_qformer, cfg, strip_text=False)

        rng = np.random.default_rng(2)
        B, L = 3, 6
        text_ids = rng.integers(1, cfg.vocab_size, (B, L))
        text_mask = np.ones((B, L), np.int64)
        text_mask[1, 4:] = 0

        with torch.no_grad():
            want = ref.bert(
                torch.tensor(text_ids),
                attention_mask=torch.tensor(text_mask),
                return_dict=True,
            ).last_hidden_state.numpy()

        mine = QFormer(_multimodal_qformer_config(cfg),
                       compute_dtype=jnp.float32)
        # init with a full multimodal pass so every subtree exists
        enc0 = jnp.zeros((B, 2, cfg.encoder_width))
        params = mine.init(
            jax.random.PRNGKey(0), enc0, None,
            jnp.asarray(text_ids), jnp.asarray(text_mask),
        )["params"]
        qt = np.zeros((1, cfg.query_length, cfg.hidden_size), np.float32)
        ported = merge_subtree(
            {"m": params}, _port_text_path(ref, _port_ref_qformer(ref, qt)),
            "m",
        )["m"]
        got = np.asarray(mine.apply(
            {"params": ported}, text_ids=jnp.asarray(text_ids),
            text_mask=jnp.asarray(text_mask), mode="text",
        ))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_causal_lm_path(self, ref_qformer):
        """Image-grounded captioning: the reference computes query outputs
        with use_cache=True, then decodes text causally over the cached
        query prefix (blip2_qformer.py:209-246, Qformer.py:743-770 prefix
        causal mask). Our joint mode='lm' pass must reproduce both the
        query outputs and the text hidden states."""
        cfg = _bert_config(ref_qformer)
        ref = _build_ref_qformer(ref_qformer, cfg, strip_text=False)

        rng = np.random.default_rng(3)
        B, M, L = 2, 7, 5
        enc = rng.standard_normal((B, M, cfg.encoder_width)).astype(np.float32)
        text_ids = rng.integers(1, cfg.vocab_size, (B, L))
        text_mask = np.ones((B, L), np.int64)
        text_mask[0, 3:] = 0
        qt = rng.standard_normal(
            (1, cfg.query_length, cfg.hidden_size)).astype(np.float32)
        q_atts = np.ones((B, cfg.query_length), np.int64)

        with torch.no_grad():
            q_out = ref.bert(
                query_embeds=torch.tensor(qt).expand(B, -1, -1),
                encoder_hidden_states=torch.tensor(enc),
                encoder_attention_mask=torch.tensor(np.ones((B, M), np.int64)),
                use_cache=True,
                return_dict=True,
            )
            want_q = q_out.last_hidden_state.numpy()
            want_t = ref.bert(
                torch.tensor(text_ids),
                attention_mask=torch.tensor(
                    np.concatenate([q_atts, text_mask], axis=1)),
                past_key_values=q_out.past_key_values,
                is_decoder=True,
                return_dict=True,
            ).last_hidden_state.numpy()

        mine = QFormer(_multimodal_qformer_config(cfg),
                       compute_dtype=jnp.float32)
        params = mine.init(
            jax.random.PRNGKey(0), jnp.asarray(enc), None,
            jnp.asarray(text_ids), jnp.asarray(text_mask),
        )["params"]
        ported = merge_subtree(
            {"m": params}, _port_text_path(ref, _port_ref_qformer(ref, qt)),
            "m",
        )["m"]
        got = np.asarray(mine.apply(
            {"params": ported}, jnp.asarray(enc), None,
            jnp.asarray(text_ids), jnp.asarray(text_mask), mode="lm",
        ))
        nq = cfg.query_length
        np.testing.assert_allclose(got[:, :nq], want_q, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(got[:, nq:], want_t, rtol=1e-4, atol=1e-4)


class TestComposedVisionPath:
    def test_vit_ln_qformer_proj(self, ref_eva, ref_qformer):
        """End-to-end frame featurization: ViT -> fp32 LN (eps 1e-5) ->
        Q-Former -> t5_proj, torch composition per blip2.py:76-119 +
        blip2_mr.py:446-510 vs my Blip2MRModule.encode_frames."""
        from mr_blip_tpu.models.blip2_mr_module import Blip2MRModule
        from mr_blip_tpu.models.t5 import T5Config

        img, d_vit, nq, d_q, d_t5 = 28, 32, 4, 32, 16
        ref_vit = _build_ref_vit(
            ref_eva, img_size=img, embed_dim=d_vit, depth=2, num_heads=2,
            mlp_ratio=2.0,
        )
        bcfg = _bert_config(ref_qformer, hidden=d_q, encoder_width=d_vit, nq=nq)
        ref_qf = _build_ref_qformer(ref_qformer, bcfg)

        torch.manual_seed(3)
        ln_vision = torch.nn.LayerNorm(d_vit).eval()  # blip2.py:83 (eps 1e-5)
        t5_proj = torch.nn.Linear(d_q, d_t5).eval()
        g = torch.Generator().manual_seed(13)
        with torch.no_grad():
            for p in list(ln_vision.parameters()) + list(t5_proj.parameters()):
                p.copy_(torch.randn(p.shape, generator=g) * 0.1)
        rng = np.random.default_rng(5)
        qt = rng.standard_normal((1, nq, d_q)).astype(np.float32)

        B, T = 2, 3
        frames = rng.standard_normal((B, T, img, img, 3)).astype(np.float32)

        with torch.no_grad():
            flat = torch.tensor(
                frames.reshape(B * T, img, img, 3).transpose(0, 3, 1, 2)
            )
            image_embeds = ln_vision(ref_vit(flat))
            q_out = ref_qf.bert(
                query_embeds=torch.tensor(qt).expand(B * T, -1, -1),
                encoder_hidden_states=image_embeds,
                encoder_attention_mask=torch.ones(image_embeds.shape[:-1]).long(),
                return_dict=True,
            ).last_hidden_state
            want = t5_proj(q_out).numpy().reshape(B, T * nq, d_t5)

        module = Blip2MRModule(
            vit_config=ViTConfig(img_size=img, patch_size=14, embed_dim=d_vit,
                                 depth=2, num_heads=2, mlp_hidden_dim=64),
            qformer_config=QFormerConfig(
                hidden_size=d_q, num_layers=2, num_heads=2, intermediate_size=64,
                encoder_width=d_vit, num_query_tokens=nq,
            ),
            t5_config=T5Config(vocab_size=32, d_model=d_t5, d_kv=4, d_ff=32,
                               num_layers=1, num_decoder_layers=1, num_heads=2),
            compute_dtype=jnp.float32,
        )
        params = module.init(
            jax.random.PRNGKey(0), jnp.asarray(frames), method="encode_frames"
        )["params"]
        params = merge_subtree(params, port_eva_vit(ref_vit.state_dict()),
                               "visual_encoder")
        params = merge_subtree(params, _port_ref_qformer(ref_qf, qt), "qformer")
        from flax import traverse_util

        extra = {
            "ln_vision/LayerNorm_0/scale": ln_vision.weight.detach().numpy(),
            "ln_vision/LayerNorm_0/bias": ln_vision.bias.detach().numpy(),
            "t5_proj/Dense_0/kernel": t5_proj.weight.detach().numpy().T,
            "t5_proj/Dense_0/bias": t5_proj.bias.detach().numpy(),
        }
        params = merge_subtree(
            params, traverse_util.unflatten_dict(extra, sep="/"), ""
        )
        got = np.asarray(
            module.apply(
                {"params": params}, jnp.asarray(frames), method="encode_frames"
            )
        )
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)
