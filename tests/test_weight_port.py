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


class TestLoRAPortParity:
    """port_lora_peft must reproduce torch PEFT's merged forward exactly
    (reference LoRA r=8/alpha=8 on every T5 Linear, blip2_mr.py:183-237)."""

    @pytest.fixture(scope="class")
    def peft_pair(self):
        peft = pytest.importorskip("peft")
        from transformers import T5Config as HFT5Config
        from transformers import T5ForConditionalGeneration as HFT5

        hf_cfg = HFT5Config(
            vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
            num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
            relative_attention_max_distance=16, dropout_rate=0.0,
            feed_forward_proj="gated-gelu", tie_word_embeddings=False,
            decoder_start_token_id=0,
        )
        torch.manual_seed(1)
        hf_model = HFT5(hf_cfg).eval()
        base_sd = {k: v.clone() for k, v in hf_model.state_dict().items()}

        # the reference regexes every Linear name out of the module repr
        lora_cfg = peft.LoraConfig(
            r=2, lora_alpha=8, lora_dropout=0.0, bias="none",
            target_modules=["q", "k", "v", "o", "wi_0", "wi_1", "wo", "lm_head"],
        )
        peft_model = peft.get_peft_model(hf_model, lora_cfg).eval()
        # lora_B inits to zero; randomize both so the delta is nonzero
        g = torch.Generator().manual_seed(5)
        with torch.no_grad():
            for name, p in peft_model.named_parameters():
                if "lora_" in name:
                    p.copy_(torch.randn(p.shape, generator=g) * 0.1)
        return base_sd, peft_model

    def test_all_lora_tensors_mapped(self, peft_pair):
        from mr_blip_tpu.models.port import port_lora_peft
        from flax import traverse_util

        _, peft_model = peft_pair
        sd = peft_model.state_dict()
        n_lora_torch = len([k for k in sd if ".lora_A" in k or ".lora_B" in k])
        tree = port_lora_peft(sd)
        n_ported = len(traverse_util.flatten_dict(tree))
        assert n_ported == n_lora_torch and n_ported > 0, (n_ported, n_lora_torch)

    def test_logits_match_peft(self, peft_pair):
        from mr_blip_tpu.models.port import port_lora_peft

        base_sd, peft_model = peft_pair
        cfg = T5Config(
            vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
            num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
            relative_attention_max_distance=16, dropout_rate=0.0,
            dense_act_fn="gelu_new", is_gated_act=True, tie_word_embeddings=False,
            lora_rank=2, lora_alpha=8.0, lora_dropout=0.0,
        )
        model = T5ForConditionalGeneration(cfg, compute_dtype=jnp.float32)
        rng = np.random.default_rng(3)
        B, N, M = 2, 6, 4
        input_ids = rng.integers(3, 120, (B, N))
        dec_ids = rng.integers(3, 120, (B, M))

        params = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 3, 32), jnp.float32), jnp.array([[0, 1]]),
        )["params"]
        tree = {"t5": params}
        tree = merge_subtree(tree, port_t5_hf(base_sd), "t5")
        tree = merge_subtree(tree, port_lora_peft(peft_model.state_dict()), "t5")
        variables = {"params": tree["t5"]}

        with torch.no_grad():
            want = peft_model(
                input_ids=torch.tensor(input_ids),
                decoder_input_ids=torch.tensor(dec_ids),
            ).logits.numpy()
            base_only = merge_subtree({"t5": params}, port_t5_hf(base_sd), "t5")
            embeds = model.apply(
                {"params": base_only["t5"]}, jnp.array(input_ids),
                method="embed_tokens",
            )
            base_logits = model.apply(
                {"params": base_only["t5"]}, embeds, jnp.array(dec_ids)
            )

        embeds = model.apply(variables, jnp.array(input_ids), method="embed_tokens")
        logits = model.apply(variables, embeds, jnp.array(dec_ids))
        # the adapters must actually move the logits ...
        assert not np.allclose(np.asarray(logits), np.asarray(base_logits), atol=1e-3)
        # ... and match torch PEFT bit-close
        np.testing.assert_allclose(np.asarray(logits), want, rtol=2e-4, atol=2e-4)

    def test_mr_finetuned_checkpoint_routing(self, peft_pair):
        """A reference-layout finetuned checkpoint (t5_model.-prefixed LoRA +
        Qformer + t5_proj + query_tokens, runner_base.py:572-600) routes every
        tensor into the right subtree."""
        from mr_blip_tpu.models.port import port_mr_finetuned

        _, peft_model = peft_pair
        rng = np.random.default_rng(4)
        sd = {
            f"t5_model.{k}": v
            for k, v in peft_model.state_dict().items()
            if "lora_" in k
        }
        sd.update({
            f"answerer_model.{k}": v
            for k, v in peft_model.state_dict().items()
            if "lora_" in k
        })
        sd["query_tokens"] = rng.standard_normal((1, 4, 32)).astype(np.float32)
        sd["t5_proj.weight"] = rng.standard_normal((32, 32)).astype(np.float32)
        sd["t5_proj.bias"] = rng.standard_normal((32,)).astype(np.float32)
        sd["Qformer.bert.embeddings.LayerNorm.weight"] = np.ones(32, np.float32)
        sd["Qformer.bert.embeddings.LayerNorm.bias"] = np.zeros(32, np.float32)

        tree = port_mr_finetuned(sd)
        assert "t5" in tree and "answerer_t5" in tree and "qformer" in tree
        assert "query_tokens" in tree["qformer"]
        assert tree["t5_proj"]["Dense_0"]["kernel"].shape == (32, 32)
        from flax import traverse_util

        n_lora = len([k for k in sd if "t5_model." in k])
        assert len(traverse_util.flatten_dict(tree["t5"])) == n_lora


class TestOPTPortParity:
    """My flax OPT must compute HF transformers' OPT exactly (the reference
    vendors modeling_opt.py for the blip2_opt_mr variant)."""

    @pytest.fixture(scope="class")
    def opt_pair(self):
        from transformers import OPTConfig as HFOPTConfig
        from transformers import OPTForCausalLM as HFOPT

        from mr_blip_tpu.models.opt import OPTConfig, OPTForCausalLM
        from mr_blip_tpu.models.port import port_opt_hf

        hf_cfg = HFOPTConfig(
            vocab_size=128, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, ffn_dim=64, max_position_embeddings=64,
            dropout=0.0, attention_dropout=0.0, activation_function="relu",
            do_layer_norm_before=True, word_embed_proj_dim=32,
            pad_token_id=1, bos_token_id=2, eos_token_id=2,
        )
        torch.manual_seed(3)
        hf = HFOPT(hf_cfg).eval()

        cfg = OPTConfig(
            vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
            ffn_dim=64, max_position_embeddings=64, dropout=0.0,
        )
        model = OPTForCausalLM(cfg, compute_dtype=jnp.float32)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 4, 32), jnp.float32)
        )["params"]
        merged = merge_subtree({"m": params}, port_opt_hf(hf.state_dict()), "m")["m"]
        return hf, model, merged

    def test_all_tensors_mapped(self, opt_pair):
        from flax import traverse_util

        hf, model, params = opt_pair
        n_flax = len(traverse_util.flatten_dict(params))
        # HF: every flax tensor + lm_head.weight (tied, skipped)
        n_hf = len(hf.state_dict())
        assert n_flax == n_hf - 1, (n_flax, n_hf)

    def test_logits_match_hf(self, opt_pair):
        hf, model, params = opt_pair
        rng = np.random.default_rng(0)
        B, N = 2, 9
        ids = rng.integers(3, 120, (B, N))
        mask = np.ones((B, N), np.int64)

        with torch.no_grad():
            want = hf(input_ids=torch.tensor(ids),
                      attention_mask=torch.tensor(mask)).logits.numpy()
        embeds = model.apply({"params": params}, jnp.asarray(ids),
                             method="embed_tokens")
        got = model.apply({"params": params}, embeds,
                          attention_mask=jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


class TestGPT2Port:
    def test_gpt_dialogue_lm_matches_hf_gpt2(self):
        """port_gpt2: our GPT-2-reuse stack (pre-LN, tanh-GELU, tied head)
        computes HF GPT2LMHeadModel's function (reference gpt_dialogue is
        a GPT2LMHeadModel subclass)."""
        torch = pytest.importorskip("torch")
        from transformers import GPT2Config, GPT2LMHeadModel

        import jax.numpy as jnp

        from mr_blip_tpu.models.opt import OPTForCausalLM
        from mr_blip_tpu.models.gpt_dialogue import gpt2_tiny_config
        from mr_blip_tpu.models.port import port_gpt2

        torch.manual_seed(0)
        hf_cfg = GPT2Config(
            vocab_size=256, n_positions=128, n_embd=32, n_layer=2, n_head=4,
            n_inner=64, resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
            layer_norm_epsilon=1e-5, activation_function="gelu_new",
        )
        ref = GPT2LMHeadModel(hf_cfg).eval()

        cfg = gpt2_tiny_config()
        ours = OPTForCausalLM(cfg, compute_dtype=jnp.float32)
        params = port_gpt2(ref.state_dict())

        rng = np.random.default_rng(0)
        ids = rng.integers(0, 256, (2, 7)).astype(np.int64)
        with torch.no_grad():
            want = ref(torch.tensor(ids)).logits.numpy()
        embeds = ours.apply({"params": params}, jnp.asarray(ids),
                            method="embed_tokens")
        got = np.asarray(ours.apply({"params": params}, jnp.asarray(embeds)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
