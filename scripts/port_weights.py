"""Port reference PyTorch checkpoints into a mr_blip_tpu parameter file.

Usage:
    python scripts/port_weights.py \
        --arch blip2_mr --model-type pretrain_flant5xl \
        [--eva-vit eva_vit_g.pth] \
        [--blip2 blip2_pretrained_flant5xl.pth] \
        [--t5 /path/to/hf-flan-t5-xl (dir with pytorch_model.bin/safetensors)] \
        [--lora finetuned_lora.pth] \
        --output params.msgpack

Each source is optional; missing subtrees keep their random initialization
(matching the reference's non-strict loading, blip2.py:86-104).
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--arch", default="blip2_mr")
    parser.add_argument("--model-type", default="pretrain_flant5xl")
    parser.add_argument("--eva-vit", help="LAVIS eva_vit_g.pth")
    parser.add_argument("--blip2", help="BLIP-2 stage-2 checkpoint (.pth)")
    parser.add_argument("--t5", help="HF T5 model dir or state file")
    parser.add_argument("--lora", help="PEFT LoRA adapter checkpoint")
    parser.add_argument("--tokenizer-path", help="local tokenizer dir")
    parser.add_argument("--vocab-size", type=int,
                        help="override the model vocab (default: inferred "
                             "from the --t5 checkpoint when no tokenizer "
                             "is given)")
    parser.add_argument("--output", required=True)
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)

    import jax

    from mr_blip_tpu.models import load_model
    from mr_blip_tpu.models import port

    build_kw = {}
    if args.vocab_size:
        build_kw["vocab_size"] = args.vocab_size
    elif args.t5 and not args.tokenizer_path and args.arch == "blip2_mr":
        # No tokenizer asset: size the embedding/LM head from the T5
        # checkpoint itself instead of the fallback tokenizer's vocab
        # (otherwise shared.weight (32128, d) is skipped against a
        # 4096-row table — found by the full-geometry rehearsal).
        import torch

        vocab = None
        t5_path = args.t5
        if os.path.isdir(t5_path):
            for cand in ("pytorch_model.bin", "model.safetensors"):
                if os.path.exists(os.path.join(t5_path, cand)):
                    t5_path = os.path.join(t5_path, cand)
                    break
        if t5_path.endswith(".safetensors"):
            from safetensors import safe_open

            with safe_open(t5_path, framework="np") as f:
                if "shared.weight" in f.keys():
                    vocab = f.get_slice("shared.weight").get_shape()[0]
        else:
            sd = torch.load(t5_path, map_location="meta", weights_only=False)
            if "shared.weight" in sd:
                vocab = sd["shared.weight"].shape[0]
            del sd
        if vocab:
            logging.info("inferred vocab_size=%d from %s", vocab, args.t5)
            build_kw["vocab_size"] = int(vocab)

    model = load_model(
        args.arch, args.model_type, tokenizer_path=args.tokenizer_path,
        **build_kw,
    )
    params = jax.tree.map(lambda x: __import__("numpy").asarray(x), model.params)

    # The port functions naturally produce the flat (per-layer) layout;
    # merge in flat space, restack at the end for scan models.
    from mr_blip_tpu.models.scan_utils import (
        stack_blip2_mr_params, unstack_blip2_mr_params,
    )

    # scan_layers may be per-stack ("vit"/"t5"/"vit+t5enc"); unstack is a
    # no-op for groups that aren't stacked, and restack follows the model's
    # flags (scan_t5 may be "encoder"/"decoder" — passed through verbatim).
    scan_vit = bool(getattr(model, "scan_vit",
                            getattr(model, "scan_layers", False)))
    scan_t5 = getattr(model, "scan_t5",
                      bool(getattr(model, "scan_layers", False)))
    scan = bool(scan_vit or scan_t5)
    if scan:
        params = unstack_blip2_mr_params(params)

    if args.eva_vit:
        sd = port.load_torch_state_dict(args.eva_vit)
        params = port.merge_subtree(params, port.port_eva_vit(sd), "visual_encoder")
    if args.blip2:
        sd = port.load_torch_state_dict(args.blip2)
        params = port.merge_subtree(params, port.port_qformer(sd), "qformer")
        # stage-2 checkpoints also carry ln_vision + t5_proj
        extra = {}
        if "ln_vision.weight" in sd:
            extra["ln_vision/LayerNorm_0/scale"] = sd["ln_vision.weight"]
            extra["ln_vision/LayerNorm_0/bias"] = sd["ln_vision.bias"]
        if "t5_proj.weight" in sd:
            extra["t5_proj/Dense_0/kernel"] = sd["t5_proj.weight"].T
            extra["t5_proj/Dense_0/bias"] = sd["t5_proj.bias"]
        from flax import traverse_util

        params = port.merge_subtree(
            params, traverse_util.unflatten_dict(extra, sep="/"), ""
        )
    if args.t5:
        path = args.t5
        if os.path.isdir(path):
            cands = [f for f in os.listdir(path)
                     if f.endswith((".bin", ".safetensors"))]
            assert cands, f"no weight files in {path}"
            path = os.path.join(path, sorted(cands)[0])
        sd = port.load_torch_state_dict(path)
        params = port.merge_subtree(params, port.port_t5_hf(sd), "t5")
    if args.lora:
        # Reference finetuned checkpoints carry LoRA adapters plus the other
        # trainables (Q-Former, t5_proj, query_tokens); port all of them.
        sd = port.load_torch_state_dict(args.lora)
        tree = port.port_mr_finetuned(sd)
        answerer = tree.pop("answerer_t5", None)
        params = port.merge_subtree(params, tree, "")
        if answerer is not None and getattr(model, "answerer_params", None) is not None:
            ans = model.answerer_params
            if scan:
                ans = unstack_blip2_mr_params(ans)
            ans = port.merge_subtree(ans, answerer, "t5")
            model.answerer_params = (
                stack_blip2_mr_params(ans, vit_scan=scan_vit, t5_scan=scan_t5)
                if scan else ans
            )

    if scan:
        params = stack_blip2_mr_params(
            params, vit_scan=scan_vit, t5_scan=scan_t5)
    model.save_params(params, args.output)
    logging.info("wrote %s", args.output)


if __name__ == "__main__":
    main()
