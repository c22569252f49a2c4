"""Full flagship assembly from all four pretrained sources, end-to-end.

Synthesizes the reference's four checkpoint artifacts at the tiny geometry
(EVA ViT state dict, BLIP-2 stage-2 checkpoint with Qformer/query_tokens/
ln_vision/t5_proj, an HF T5 state dict, and a trainable-only finetuned
checkpoint with PEFT LoRA adapters), writes them to disk as .pth files, and
runs the real ``scripts/port_weights.py`` CLI flow. Done-criterion from the
round-1 verdict: every source tensor lands in the assembled params.msgpack
with zero skipped tensors (reference contract blip2_mr.py:183-237,
1466-1495 + blip2.py:86-104).
"""

import logging
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import mr_blip_tpu  # noqa: F401


def _torch_eva_tiny_sd(depth=2, d=32, heads=2, mlp=64, patches=4, seed=0):
    g = torch.Generator().manual_seed(seed)

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    sd = {
        "cls_token": r(1, 1, d),
        "pos_embed": r(1, patches + 1, d),
        "patch_embed.proj.weight": r(d, 3, 14, 14),
        "patch_embed.proj.bias": r(d),
    }
    for i in range(depth):
        p = f"blocks.{i}."
        sd.update({
            p + "norm1.weight": r(d), p + "norm1.bias": r(d),
            p + "attn.qkv.weight": r(3 * d, d),
            p + "attn.q_bias": r(d), p + "attn.v_bias": r(d),
            p + "attn.proj.weight": r(d, d), p + "attn.proj.bias": r(d),
            p + "norm2.weight": r(d), p + "norm2.bias": r(d),
            p + "mlp.fc1.weight": r(mlp, d), p + "mlp.fc1.bias": r(mlp),
            p + "mlp.fc2.weight": r(d, mlp), p + "mlp.fc2.bias": r(d),
        })
    return sd


def _torch_qformer_tiny_sd(layers=2, h=32, inter=64, enc_w=32, nq=4, seed=1):
    g = torch.Generator().manual_seed(seed)

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    sd = {
        "query_tokens": r(1, nq, h),
        "ln_vision.weight": r(enc_w), "ln_vision.bias": r(enc_w),
        "t5_proj.weight": r(32, h), "t5_proj.bias": r(32),
        "Qformer.bert.embeddings.LayerNorm.weight": r(h),
        "Qformer.bert.embeddings.LayerNorm.bias": r(h),
    }
    for i in range(layers):
        p = f"Qformer.bert.encoder.layer.{i}."

        def attn(src, kvw=h):
            sd.update({
                p + src + ".self.query.weight": r(h, h),
                p + src + ".self.query.bias": r(h),
                p + src + ".self.key.weight": r(h, kvw),
                p + src + ".self.key.bias": r(h),
                p + src + ".self.value.weight": r(h, kvw),
                p + src + ".self.value.bias": r(h),
                p + src + ".output.dense.weight": r(h, h),
                p + src + ".output.dense.bias": r(h),
                p + src + ".output.LayerNorm.weight": r(h),
                p + src + ".output.LayerNorm.bias": r(h),
            })

        attn("attention")
        if i % 2 == 0:
            attn("crossattention", kvw=enc_w)
        sd.update({
            p + "intermediate_query.dense.weight": r(inter, h),
            p + "intermediate_query.dense.bias": r(inter),
            p + "output_query.dense.weight": r(h, inter),
            p + "output_query.dense.bias": r(h),
            p + "output_query.LayerNorm.weight": r(h),
            p + "output_query.LayerNorm.bias": r(h),
        })
    return sd


@pytest.fixture(scope="module")
def hf_t5_and_lora():
    import peft
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration as HFT5

    # the tiny model's vocab follows the mock tokenizer (4096); the real
    # pipeline matches by construction (flan-t5 32128 both sides)
    hf_cfg = HFT5Config(
        vocab_size=4096, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=32,
        relative_attention_max_distance=128, dropout_rate=0.0,
        feed_forward_proj="gated-gelu", tie_word_embeddings=False,
        decoder_start_token_id=0,
    )
    torch.manual_seed(2)
    hf = HFT5(hf_cfg).eval()
    base_sd = {k: v.clone() for k, v in hf.state_dict().items()}
    pm = peft.get_peft_model(hf, peft.LoraConfig(
        r=8, lora_alpha=8, lora_dropout=0.05, bias="none",
        target_modules=["q", "k", "v", "o", "wi_0", "wi_1", "wo", "lm_head"],
    ))
    with torch.no_grad():
        for n, p in pm.named_parameters():
            if "lora_" in n:
                p.normal_(0, 0.1)
    ft_sd = {f"t5_model.{k}": v for k, v in pm.state_dict().items()
             if "lora_" in k}
    return base_sd, ft_sd


def test_full_assembly_zero_skipped(tmp_path, hf_t5_and_lora, caplog):
    base_sd, ft_sd = hf_t5_and_lora
    eva = tmp_path / "eva_vit_tiny.pth"
    blip2 = tmp_path / "blip2_stage2_tiny.pth"
    t5 = tmp_path / "t5_tiny.pth"
    lora = tmp_path / "finetuned_tiny.pth"
    torch.save(_torch_eva_tiny_sd(), eva)
    torch.save({"model": _torch_qformer_tiny_sd()}, blip2)
    torch.save(base_sd, t5)
    torch.save({"model": ft_sd}, lora)
    out = tmp_path / "params.msgpack"

    argv = [
        "port_weights.py", "--arch", "blip2_mr", "--model-type", "tiny",
        "--eva-vit", str(eva), "--blip2", str(blip2), "--t5", str(t5),
        "--lora", str(lora), "--output", str(out),
    ]
    import scripts.port_weights as pw

    caplog.set_level(logging.WARNING)
    old_argv = sys.argv
    sys.argv = argv
    try:
        pw.main()
    finally:
        sys.argv = old_argv

    skipped = [r for r in caplog.records if "skipped" in r.getMessage()]
    assert not skipped, [r.getMessage() for r in skipped]
    assert out.exists() and out.stat().st_size > 10_000

    # the assembled file loads back over a fresh model and changes outputs
    from mr_blip_tpu.models import load_model

    model = load_model("blip2_mr", "tiny")
    def _q(p):
        enc = p["t5"]["encoder"]
        return (enc["block"] if "block" in enc else enc["block_0"])[
            "self_attention"]["q"]

    before = _q(model.params)
    model.params = model.load_params_nonstrict(model.params, str(out))
    after = _q(model.params)
    assert not np.allclose(np.asarray(before["Dense_0"]["kernel"]),
                           np.asarray(after["Dense_0"]["kernel"]))
    assert np.any(np.asarray(after["lora_a"]) != 0)
