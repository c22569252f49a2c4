"""Train-step stage budget + MFU on the flagship QVH config (one chip).

Times three jitted slices at the real training geometry (B=1 x 60 frames,
EVA ViT-g + Q-Former + Flan-T5-XL LoRA, bf16):

  encoder_fwd — frame encoder only (ViT + fp32 LN + Q-Former + proj)
  loss_fwd    — full teacher-forced loss forward
  train_step  — loss + grads + AdamW update (the production step)

and derives the budget: ViT-side fwd, T5-side fwd (loss_fwd -
encoder_fwd), backward+optimizer (train_step - loss_fwd), plus MFU from
the documented FLOPs accounting (bench.py A100_TRAIN_BASELINE chain:
ViT fwd 30.3 TFLOP + Q-Former ~1.8 + T5 fwd+bwd ~14 => ~46 TFLOP/step
of math FLOPs on the trainable path at 60 frames).

Prints ONE JSON line. MRBLIP_BENCH_TRAIN_INT8=1 profiles the int8
frozen-ViT variant instead.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_FRAMES = int(os.environ.get("MRBLIP_BENCH_FRAMES", "60"))
V5E_PEAK_BF16 = 197e12
STEP_TFLOPS = 46.0  # documented accounting, see module docstring


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _fence(out):
    """Force a host transfer — block_until_ready alone has been observed
    returning early through the axon relay (2 ms for a 30-TFLOP fwd);
    bench.py fences with float(loss) for the same reason."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jax.numpy.asarray(leaf).ravel()[0])


def _time(fn, *args, n=5):
    _fence(fn(*args))  # compile + warm
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _fence(out)
    return (time.time() - t0) / n


def main():
    from mr_blip_tpu.common.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _make_samples
    from mr_blip_tpu.models.blip2_mr import BLIP2_MR
    from mr_blip_tpu.runners.train_state import (
        TrainState, make_optimizer, make_train_step,
    )

    from bench import _scan_env

    model = BLIP2_MR(
        img_size=224, vit_model="eva_vit_g", t5_model="flan-t5-xl",
        task="lora", num_beams=5, max_new_tokens=50,
        compute_dtype="bfloat16", init_params=False,
        # "vit" (not the bench train stage's "all"): this profiler builds
        # the train step WITHOUT remat, and the scanned-T5 backward OOMs
        # HBM without it; ViT-only scan fits and matches the round-4
        # budget baseline.
        scan_layers=_scan_env("vit"),
    )
    model.params = model.init_params_fast(jax.random.PRNGKey(0), mode="zeros")
    int8_vit = bool(os.environ.get("MRBLIP_BENCH_TRAIN_INT8"))
    if int8_vit:
        model.quantize_vit()
        log("int8 frozen-ViT variant")

    samples = _make_samples(1, N_FRAMES)
    samples["video"] = jax.device_put(samples["video"])
    batch = model.prepare_mr_batch(samples)
    batch.pop("video_prompt")
    module = model.module

    @jax.jit
    def encoder_fwd(params, frames):
        return module.apply(
            {"params": params},
            method=lambda mod: mod.encode_frames(frames, deterministic=True),
        )

    @jax.jit
    def loss_fwd(params, batch):
        loss, _ = model._loss_fn(params, batch)
        return loss

    t_enc = _time(encoder_fwd, model.params, batch["frames"])
    log(f"encoder fwd: {t_enc:.3f}s")
    t_loss = _time(loss_fwd, model.params, batch)
    log(f"loss fwd: {t_loss:.3f}s")

    # The production step, donated (same graph the bench compiles — a
    # non-donated variant needs a second param tree and OOMs 16 GB HBM).
    mask = model.trainable_mask()
    tx = make_optimizer(weight_decay=0.05, trainable_mask=mask)
    state = TrainState.create(model.params, tx)
    step = make_train_step(model._loss_fn, donate=True,
                           trainable_mask=mask)
    rng = jax.random.PRNGKey(0)
    state, loss = step(state, batch, 3e-4, rng)
    _ = float(loss)
    n = 5
    t0 = time.time()
    for _ in range(n):
        state, loss = step(state, batch, 3e-4, rng)
    _ = float(loss)
    t_step = (time.time() - t0) / n
    log(f"train step: {t_step:.3f}s")

    extras = {}
    if os.environ.get("MRBLIP_PROFILE_BWD"):
        # Decompose bwd_plus_optimizer: which slice of the backward is slow?
        # The optimizer slice is NOT timed directly — a non-donated update
        # graph needs a second full param tree and OOMs 16 GB HBM (measured;
        # the masked AdamW touches only trainable leaves so it is small) —
        # it is reported as the residual of the other slices instead.
        import jax.numpy as jnp

        module = model.module

        def grad_checksum(grads):
            # Reduce trainable grads to one scalar so XLA cannot DCE the
            # backward out of a timing graph (frozen leaves are symbolic
            # zeros under the stop-grad mask; skip them).
            parts = [jnp.sum(jnp.abs(g).astype(jnp.float32))
                     for g, m in zip(jax.tree.leaves(grads),
                                     jax.tree.leaves(mask)) if m]
            return sum(parts)

        # T5-side fwd+bwd from a precomputed encoder sequence: grad w.r.t.
        # the embeds + all params the mask trains inside the T5.
        def t5_loss(params, embeds, attn, tgt, tgt_mask):
            def run(mod):
                loss, _ = mod.loss_from_encoder_input(
                    embeds, attn, tgt, tgt_mask, deterministic=True)
                return loss
            return module.apply({"params": params}, method=run)

        @jax.jit
        def embeds_of(params, batch):
            def run(mod):
                frames = mod.encode_frames(
                    batch["frames"], deterministic=True)
                return mod.assemble_encoder_input(
                    frames, batch["time_ids"], batch["src_type"],
                    batch["src_idx"], batch["int_mask"], batch["end_ids"],
                    batch["end_mask"], batch["text_ids"], batch["text_mask"],
                )
            return module.apply({"params": params}, method=run)

        embeds, attn = embeds_of(state.params, batch)
        embeds = jax.block_until_ready(embeds)

        @jax.jit
        def t5_fwd(params, embeds, attn, tgt, tgt_mask):
            return t5_loss(params, embeds, attn, tgt, tgt_mask)

        @jax.jit
        def t5_fwd_bwd(params, embeds, attn, tgt, tgt_mask):
            def masked_loss(p, e):
                p = jax.tree.map(
                    lambda m, x: x if m else jax.lax.stop_gradient(x),
                    mask, p)
                return t5_loss(p, e, attn, tgt, tgt_mask)
            loss, grads = jax.value_and_grad(masked_loss, argnums=(0, 1))(
                params, embeds)
            # Fold every grad into the returned scalar so the param-grad
            # and embeds-grad subgraphs both survive DCE (never scale by
            # 0.0 — XLA may algebraically fold the term away).
            return loss + grad_checksum(grads[0]) + \
                jnp.sum(grads[1].astype(jnp.float32))

        args = (state.params, embeds, attn,
                batch["target_ids"], batch["target_mask"])
        t_t5f = _time(lambda *a: t5_fwd(*a), *args, n=3)
        t_t5fb = _time(lambda *a: t5_fwd_bwd(*a), *args, n=3)
        extras["t5_fwd_only_s"] = round(t_t5f, 4)
        extras["t5_fwd_bwd_s"] = round(t_t5fb, 4)
        extras["t5_bwd_s"] = round(t_t5fb - t_t5f, 4)

        # Frame-encoder fwd+bwd (ViT stop-gradded like the real loss):
        # grads reach Q-Former + t5_proj + query tokens only.
        @jax.jit
        def enc_fwd_bwd(params, frames):
            def f(p):
                p = jax.tree.map(
                    lambda m, x: x if m else jax.lax.stop_gradient(x),
                    mask, p)
                out = module.apply(
                    {"params": p},
                    method=lambda mod: mod.encode_frames(
                        frames, deterministic=True))
                return jnp.sum(out.astype(jnp.float32))
            loss, grads = jax.value_and_grad(f)(params)
            return loss + grad_checksum(grads)

        t_encfb = _time(enc_fwd_bwd, state.params, batch["frames"], n=3)
        extras["encoder_fwd_bwd_s"] = round(t_encfb, 4)
        extras["encoder_bwd_s"] = round(t_encfb - t_enc, 4)
        # Optimizer + assemble + glue as the residual of the step budget
        extras["residual_opt_glue_s"] = round(
            t_step - t_encfb - t_t5fb, 4)

    mfu = STEP_TFLOPS * 1e12 / (t_step * V5E_PEAK_BF16)
    print(json.dumps({
        "mode": "int8_vit" if int8_vit else "bf16",
        "n_frames": N_FRAMES,
        "encoder_fwd_s": round(t_enc, 4),
        "t5_fwd_s": round(t_loss - t_enc, 4),
        "bwd_plus_optimizer_s": round(t_step - t_loss, 4),
        "train_step_s": round(t_step, 4),
        "train_fps_per_chip": round(N_FRAMES / t_step, 2),
        "mfu_vs_bf16_peak": round(mfu, 4),
        "flops_accounting_tflop_per_step": STEP_TFLOPS,
        **extras,
    }))


if __name__ == "__main__":
    main()
