"""Asset-day dress rehearsal at FULL geometry (no real weights exist in
this environment — the point is shape/memory/time survival of the real
path, VERDICT r2 next-round #3).

Synthesizes the reference's four checkpoint artifacts at production
geometry (1.0B EVA ViT-g fp16 sd, BLIP-2 stage-2 Q-Former sd, HF
Flan-T5-XL sd via transformers, PEFT LoRA adapter sd — reference contract
blip2_mr.py:1466-1495 / blip2.py:86-104 / eva_vit.py:429-436), runs the
real ``scripts/port_weights.py`` flow, and then drives ``evaluate.py`` on
the Charades eval config (20 frames, beam 5) with the ported junk weights
at real geometry. Records wall time, peak RSS, and artifact sizes per
stage.

Usage:
    python scripts/rehearse_asset_day.py --stage synthesize --dir /tmp/assets
    python scripts/rehearse_asset_day.py --stage port       --dir /tmp/assets
    python scripts/rehearse_asset_day.py --stage eval       --dir /tmp/assets
    python scripts/rehearse_asset_day.py --stage all        --dir /tmp/assets

``--stage eval`` needs the TPU (ViT-g at 224^2 is not CPU-feasible);
synthesize/port are host-only (run them under JAX_PLATFORMS=cpu).
"""

import argparse
import json
import os
import resource
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Production geometry (reference eva_vit.py:415-442, blip2_mr.py:241-264,
# flan-t5-xl config)
EVA = dict(depth=39, d=1408, heads=16, mlp=6144, patches=256)
QFORMER = dict(layers=12, h=768, inter=3072, enc_w=1408, nq=32, t5_d=2048)
T5_XL = dict(vocab_size=32128, d_model=2048, d_kv=64, d_ff=5120,
             num_layers=24, num_decoder_layers=24, num_heads=32)


def _log(stage, msg):
    print(f"[rehearse:{stage}] {msg}", flush=True)


def _record(out_dir, stage, **facts):
    path = os.path.join(out_dir, "rehearsal_log.jsonl")
    with open(path, "a") as f:
        f.write(json.dumps({"stage": stage, **facts}) + "\n")
    _log(stage, json.dumps(facts))


def _peak_rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def synthesize(out_dir):
    import torch

    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()

    # ---- EVA ViT-g (fp16, like the LAVIS artifact eva_vit_g.pth) ----
    g = torch.Generator().manual_seed(0)

    def r(*shape):
        return (torch.randn(*shape, generator=g) * 0.02).half()

    d, mlp = EVA["d"], EVA["mlp"]
    sd = {
        "cls_token": r(1, 1, d),
        "pos_embed": r(1, EVA["patches"] + 1, d),
        "patch_embed.proj.weight": r(d, 3, 14, 14),
        "patch_embed.proj.bias": r(d),
    }
    for i in range(EVA["depth"]):
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
    eva_path = os.path.join(out_dir, "eva_vit_g.pth")
    torch.save(sd, eva_path)
    n_eva = sum(v.numel() for v in sd.values())
    _record(out_dir, "synthesize.eva", params=n_eva,
            size_gb=round(os.path.getsize(eva_path) / 1e9, 2),
            wall_s=round(time.time() - t0, 1))
    del sd

    # ---- BLIP-2 stage-2 (Q-Former + query_tokens + ln_vision + t5_proj) --
    t0 = time.time()
    h, inter, enc_w, nq = (QFORMER["h"], QFORMER["inter"],
                           QFORMER["enc_w"], QFORMER["nq"])

    def rf(*shape):
        return torch.randn(*shape, generator=g) * 0.02

    sd = {
        "query_tokens": rf(1, nq, h),
        "ln_vision.weight": rf(enc_w), "ln_vision.bias": rf(enc_w),
        "t5_proj.weight": rf(QFORMER["t5_d"], h),
        "t5_proj.bias": rf(QFORMER["t5_d"]),
        "Qformer.bert.embeddings.LayerNorm.weight": rf(h),
        "Qformer.bert.embeddings.LayerNorm.bias": rf(h),
    }
    for i in range(QFORMER["layers"]):
        p = f"Qformer.bert.encoder.layer.{i}."

        def attn(src, kvw=h):
            sd.update({
                p + src + ".self.query.weight": rf(h, h),
                p + src + ".self.query.bias": rf(h),
                p + src + ".self.key.weight": rf(h, kvw),
                p + src + ".self.key.bias": rf(h),
                p + src + ".self.value.weight": rf(h, kvw),
                p + src + ".self.value.bias": rf(h),
                p + src + ".output.dense.weight": rf(h, h),
                p + src + ".output.dense.bias": rf(h),
                p + src + ".output.LayerNorm.weight": rf(h),
                p + src + ".output.LayerNorm.bias": rf(h),
            })

        attn("attention")
        if i % 2 == 0:  # cross_attention_freq=2
            attn("crossattention", kvw=enc_w)
        sd.update({
            p + "intermediate_query.dense.weight": rf(inter, h),
            p + "intermediate_query.dense.bias": rf(inter),
            p + "output_query.dense.weight": rf(h, inter),
            p + "output_query.dense.bias": rf(h),
            p + "output_query.LayerNorm.weight": rf(h),
            p + "output_query.LayerNorm.bias": rf(h),
        })
    blip2_path = os.path.join(out_dir, "blip2_pretrained_flant5xl.pth")
    torch.save({"model": sd}, blip2_path)
    _record(out_dir, "synthesize.blip2_stage2",
            params=sum(v.numel() for v in sd.values()),
            size_gb=round(os.path.getsize(blip2_path) / 1e9, 3),
            wall_s=round(time.time() - t0, 1))
    del sd

    # ---- Flan-T5-XL base (HF skeleton -> exact HF key names) ----
    t0 = time.time()
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration as HFT5

    hf_cfg = HFT5Config(
        **T5_XL,
        relative_attention_num_buckets=32,
        relative_attention_max_distance=128,
        dropout_rate=0.0, feed_forward_proj="gated-gelu",
        tie_word_embeddings=False, decoder_start_token_id=0,
    )
    torch.manual_seed(1)
    hf = HFT5(hf_cfg).eval()
    t5_path = os.path.join(out_dir, "flan_t5_xl_state.pth")
    torch.save(hf.state_dict(), t5_path)
    n_t5 = sum(v.numel() for v in hf.state_dict().values())
    _record(out_dir, "synthesize.t5_xl", params=n_t5,
            size_gb=round(os.path.getsize(t5_path) / 1e9, 2),
            wall_s=round(time.time() - t0, 1),
            peak_rss_gb=round(_peak_rss_gb(), 1))

    # ---- LoRA adapters (PEFT layout, r=8 on all T5 Linears) ----
    t0 = time.time()
    import peft

    pm = peft.get_peft_model(hf, peft.LoraConfig(
        r=8, lora_alpha=8, lora_dropout=0.05, bias="none",
        target_modules=["q", "k", "v", "o", "wi_0", "wi_1", "wo", "lm_head"],
    ))
    with torch.no_grad():
        for n, p in pm.named_parameters():
            if "lora_" in n:
                p.normal_(0, 0.02)
    ft_sd = {f"t5_model.{k}": v for k, v in pm.state_dict().items()
             if "lora_" in k}
    lora_path = os.path.join(out_dir, "mr_blip_finetuned.pth")
    torch.save({"model": ft_sd}, lora_path)
    _record(out_dir, "synthesize.lora",
            params=sum(v.numel() for v in ft_sd.values()),
            n_tensors=len(ft_sd),
            size_gb=round(os.path.getsize(lora_path) / 1e9, 3),
            wall_s=round(time.time() - t0, 1),
            peak_rss_gb=round(_peak_rss_gb(), 1))


def port(out_dir):
    """Run the real port CLI as a subprocess; measure its peak RSS."""
    out = os.path.join(out_dir, "params.msgpack")
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO + ":" + os.environ.get("PYTHONPATH", ""),
               HF_HUB_OFFLINE="1", TRANSFORMERS_OFFLINE="1")
    t0 = time.time()
    cmd = [
        sys.executable, os.path.join(REPO, "scripts/port_weights.py"),
        "--arch", "blip2_mr", "--model-type", "pretrain_flant5xl",
        "--eva-vit", os.path.join(out_dir, "eva_vit_g.pth"),
        "--blip2", os.path.join(out_dir, "blip2_pretrained_flant5xl.pth"),
        "--t5", os.path.join(out_dir, "flan_t5_xl_state.pth"),
        "--lora", os.path.join(out_dir, "mr_blip_finetuned.pth"),
        "--output", out,
    ]
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True)
    wall = time.time() - t0
    child_rss_gb = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss / 1e6
    sys.stderr.write(proc.stderr[-4000:])
    assert proc.returncode == 0, f"port failed rc={proc.returncode}"
    skipped = [l for l in proc.stderr.splitlines() if "skipped" in l]
    _record(out_dir, "port", wall_s=round(wall, 1),
            peak_rss_gb=round(child_rss_gb, 1),
            output_gb=round(os.path.getsize(out) / 1e9, 2),
            skipped_lines=skipped[:3])


def eval_full_geometry(out_dir):
    """Charades eval config through evaluate.py with the ported weights
    (2 synthetic test videos; metrics are garbage by construction — the
    assertion is that the real path compiles and runs at real geometry)."""
    from mr_blip_tpu.datasets.synthetic import make_mr_annotations

    synth = os.path.join(out_dir, "synthetic_charades")
    make_mr_annotations(synth, n_train=2, n_val=2, n_test=2,
                        n_video_frames=40, fps=2.0, height=240, width=320)
    run_out = os.path.join(out_dir, "eval_out")
    # extend (never overwrite) PYTHONPATH: the TPU plugin lives on it
    env = dict(os.environ,
               PYTHONPATH=REPO + ":" + os.environ.get("PYTHONPATH", ""),
               HF_HUB_OFFLINE="1", TRANSFORMERS_OFFLINE="1")
    t0 = time.time()
    cmd = [
        sys.executable, os.path.join(REPO, "evaluate.py"),
        "--cfg-path", os.path.join(REPO, "configs/projects/eval/charades.yaml"),
        "--options",
        f"model.finetuned={os.path.join(out_dir, 'params.msgpack')}",
        "model.load_finetuned=True",
        "model.params_dtype=bfloat16",
        # no tokenizer asset in this environment: build at the checkpoint's
        # true vocab so every ported tensor lands (asset day passes
        # model.tokenizer_path instead)
        "model.vocab_size=32128",
        f"datasets.charades_sta.build_info.annotations.train.storage={synth}/train.json",
        f"datasets.charades_sta.build_info.annotations.val.storage={synth}/val.json",
        f"datasets.charades_sta.build_info.annotations.test.storage={synth}/test.json",
        "datasets.charades_sta.build_info.videos.storage=synthetic",
        f"run.output_dir={run_out}",
        "run.batch_size_eval=2", "run.num_workers=0", "run.wandb=False",
    ]
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True)
    wall = time.time() - t0
    child_rss_gb = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss / 1e6
    sys.stderr.write(proc.stderr[-6000:])
    assert proc.returncode == 0, f"evaluate failed rc={proc.returncode}"
    import glob

    results = glob.glob(os.path.join(run_out, "*", "result", "test_epoch*.json"))
    assert results, "no result file produced"
    with open(results[0]) as f:
        recs = json.load(f)
    _record(out_dir, "eval_full_geometry", wall_s=round(wall, 1),
            peak_rss_gb=round(child_rss_gb, 1), n_records=len(recs),
            sample_prediction=recs[0]["prediction"][:60])


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--stage", default="all",
                    choices=["synthesize", "port", "eval", "all"])
    ap.add_argument("--dir", default="/tmp/mrblip_assets")
    args = ap.parse_args()
    stages = (["synthesize", "port", "eval"] if args.stage == "all"
              else [args.stage])
    for s in stages:
        {"synthesize": synthesize, "port": port,
         "eval": eval_full_geometry}[s](args.dir)


if __name__ == "__main__":
    main()
