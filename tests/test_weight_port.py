"""Weight-porting parity: my flax T5 must match HF transformers' T5 exactly.

Instantiates a tiny random HF ``T5ForConditionalGeneration`` (torch CPU),
ports its weights through ``port_t5_hf``, and requires logits agreement on
random inputs — validating both the name mapping and my T5 math (relative
position buckets, gated-GELU FFN, RMSNorm, untied LM head).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from mr_blip_tpu.models.port import merge_subtree, port_t5_hf
from mr_blip_tpu.models.t5 import T5Config, T5ForConditionalGeneration


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration as HFT5

    hf_cfg = HFT5Config(
        vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, dropout_rate=0.0,
        feed_forward_proj="gated-gelu", tie_word_embeddings=False,
        decoder_start_token_id=0,
    )
    torch.manual_seed(0)
    hf_model = HFT5(hf_cfg).eval()

    cfg = T5Config(
        vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, dropout_rate=0.0,
        dense_act_fn="gelu_new",  # HF gated-gelu uses the tanh approximation
        is_gated_act=True, tie_word_embeddings=False,
    )
    model = T5ForConditionalGeneration(cfg, compute_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    enc_embeds = jnp.array(rng.standard_normal((1, 3, 32), np.float32))
    dec_ids = jnp.array([[0, 1]])
    params = model.init(jax.random.PRNGKey(0), enc_embeds, dec_ids)["params"]
    ported = merge_subtree({"t5": params}, port_t5_hf(hf_model.state_dict()), "t5")
    return hf_model, model, {"params": ported["t5"]}


class TestT5PortParity:
    def test_all_tensors_mapped(self, hf_pair):
        hf_model, model, variables = hf_pair
        # every HF tensor must land somewhere (no silent drops)
        from flax import traverse_util

        flat = traverse_util.flatten_dict(variables["params"], sep="/")
        n_flax = len(flat)
        n_hf = len([k for k in hf_model.state_dict()])
        # encoder.embed_tokens / decoder.embed_tokens are views of shared
        assert n_flax == n_hf - 2, (n_flax, n_hf)

    def test_logits_match_hf(self, hf_pair):
        hf_model, model, variables = hf_pair
        rng = np.random.default_rng(1)
        B, N, M = 2, 7, 5
        input_ids = rng.integers(3, 120, (B, N))
        dec_ids = rng.integers(3, 120, (B, M))
        enc_mask = np.ones((B, N), np.int64)
        enc_mask[1, 4:] = 0

        with torch.no_grad():
            hf_out = hf_model(
                input_ids=torch.tensor(input_ids),
                attention_mask=torch.tensor(enc_mask),
                decoder_input_ids=torch.tensor(dec_ids),
            ).logits.numpy()

        embeds = model.apply(variables, jnp.array(input_ids), method="embed_tokens")
        logits = model.apply(
            variables, embeds, jnp.array(dec_ids),
            encoder_mask=jnp.array(enc_mask),
        )
        np.testing.assert_allclose(np.asarray(logits), hf_out, rtol=2e-4, atol=2e-4)

    def test_long_range_buckets_match(self, hf_pair):
        # longer sequence exercises the logarithmic bucket arm
        hf_model, model, variables = hf_pair
        rng = np.random.default_rng(2)
        input_ids = rng.integers(3, 120, (1, 40))
        dec_ids = rng.integers(3, 120, (1, 24))
        with torch.no_grad():
            hf_out = hf_model(
                input_ids=torch.tensor(input_ids),
                decoder_input_ids=torch.tensor(dec_ids),
            ).logits.numpy()
        embeds = model.apply(variables, jnp.array(input_ids), method="embed_tokens")
        logits = model.apply(variables, embeds, jnp.array(dec_ids))
        np.testing.assert_allclose(np.asarray(logits), hf_out, rtol=2e-4, atol=2e-4)


class TestEvaViTPortRoundTrip:
    def test_roundtrip_mapping(self):
        """Synthesize a torch-style EVA state dict, port, run; checks the
        name/transpose mapping is complete for the tiny geometry."""
        from mr_blip_tpu.models.eva_vit import EvaViT, vit_tiny_config
        from mr_blip_tpu.models.port import port_eva_vit

        cfg = vit_tiny_config()
        model = EvaViT(cfg, compute_dtype=jnp.float32)
        x = jnp.ones((1, 28, 28, 3))
        params = model.init(jax.random.PRNGKey(0), x)["params"]

        rng = np.random.default_rng(0)
        sd = {
            "cls_token": rng.standard_normal((1, 1, 32), np.float32),
            "pos_embed": rng.standard_normal((1, 5, 32), np.float32),
            "patch_embed.proj.weight": rng.standard_normal((32, 3, 14, 14), np.float32),
            "patch_embed.proj.bias": rng.standard_normal((32,), np.float32),
        }
        for i in range(cfg.depth):
            p = f"blocks.{i}."
            sd.update({
                p + "norm1.weight": np.ones(32, np.float32),
                p + "norm1.bias": np.zeros(32, np.float32),
                p + "attn.qkv.weight": rng.standard_normal((96, 32), np.float32),
                p + "attn.q_bias": np.zeros(32, np.float32),
                p + "attn.v_bias": np.zeros(32, np.float32),
                p + "attn.proj.weight": rng.standard_normal((32, 32), np.float32),
                p + "attn.proj.bias": np.zeros(32, np.float32),
                p + "norm2.weight": np.ones(32, np.float32),
                p + "norm2.bias": np.zeros(32, np.float32),
                p + "mlp.fc1.weight": rng.standard_normal((64, 32), np.float32),
                p + "mlp.fc1.bias": np.zeros(64, np.float32),
                p + "mlp.fc2.weight": rng.standard_normal((32, 64), np.float32),
                p + "mlp.fc2.bias": np.zeros(32, np.float32),
            })
        ported = port_eva_vit(sd)
        merged = merge_subtree({"m": params}, ported, "m")["m"]

        from flax import traverse_util

        flat_new = traverse_util.flatten_dict(merged, sep="/")
        flat_old = traverse_util.flatten_dict(params, sep="/")
        assert set(flat_new) == set(flat_old)
        # every random-valued tensor replaced (zero biases / unit norms in
        # the synthetic dict coincide with flax init values)
        unchanged_kernels = [
            k for k in flat_new
            if ("kernel" in k or "cls_token" in k or "pos_embed" in k)
            and np.allclose(flat_new[k], flat_old[k])
        ]
        assert not unchanged_kernels, unchanged_kernels
        out = model.apply({"params": merged}, x)
        assert np.isfinite(np.asarray(out)).all()
