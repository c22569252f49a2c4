"""Stage-level timing of the flagship inference batch on the real chip.

Breaks the e2e generate batch (bench.py geometry: B=4 x 60 frames,
EVA ViT-g + Q-Former + Flan-T5-XL, beam 5) into jitted stages and times
each with a scalar-fetch fence (block_until_ready is not a reliable fence
through the axon relay — docs/performance.md). Used to name the residual
time between the ViT stage and the e2e number.

Usage:  PYTHONPATH=. python scripts/profile_inference.py [--fp]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fence(x):
    leaves = [l for l in __import__("jax").tree_util.tree_leaves(x)
              if hasattr(l, "dtype")]
    import jax.numpy as jnp
    return float(jnp.sum(leaves[0].astype(jnp.float32)))


def bench_fn(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        fence(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.time() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from mr_blip_tpu.models.blip2_mr import BLIP2_MR

    use_fp = "--fp" in sys.argv
    n_frames = int(os.environ.get("MRBLIP_BENCH_FRAMES", "60"))
    batch_sz = int(os.environ.get("MRBLIP_BENCH_BATCH", "4"))

    print(f"devices: {jax.devices()}", flush=True)
    model = BLIP2_MR(
        img_size=224, vit_model="eva_vit_g", t5_model="flan-t5-xl",
        task="lora", num_beams=5, max_new_tokens=50, min_new_tokens=12,
        compute_dtype="bfloat16", init_params=False,
    )
    model.params = model.init_params_fast(jax.random.PRNGKey(0), mode="zeros")
    if not use_fp:
        model.quantize_for_inference()
        print("int8 inference enabled (ViT + T5 encoder + decode)",
              flush=True)

    rng = np.random.default_rng(0)
    duration = 150.0
    video = jax.device_put(
        rng.integers(0, 256, (batch_sz, n_frames, 224, 224, 3), dtype=np.uint8)
    )
    samples = {
        "video": video,
        "timestamps": np.stack(
            [np.linspace(0.0, duration, n_frames, endpoint=False)] * batch_sz
        ),
        "duration": np.full((batch_sz,), duration),
        "query_id": [f"q{i}" for i in range(batch_sz)],
        "video_prompt_end": ["<extra_id_0>"] * batch_sz,
        "query_prompt": ["Query: a person is doing something interesting\n"] * batch_sz,
        "task_prompt": [
            "Given the video and the query, find the relevant windows.\nRelevant windows: "
        ] * batch_sz,
        "relevant_windows": ["[[10, 25]]"] * batch_sz,
    }

    module = model.module
    params = model.params
    batch = model.prepare_mr_batch(samples)
    batch.pop("video_prompt", None)
    batch = jax.device_put(batch)

    # --- stage jits -------------------------------------------------------
    @jax.jit
    def vit_only(params, frames):
        b, t = frames.shape[0], frames.shape[1]
        from mr_blip_tpu.processors.video_processors import CLIP_MEAN, CLIP_STD
        mean = jnp.asarray(CLIP_MEAN, jnp.bfloat16) * 255.0
        std = jnp.asarray(CLIP_STD, jnp.bfloat16) * 255.0
        x = (frames.astype(jnp.bfloat16) - mean) / std
        flat = x.reshape((b * t,) + x.shape[2:])
        return module.apply(
            {"params": params}, flat, True,
            method=lambda mod, f, det: mod.visual_encoder(f, det),
        )

    @jax.jit
    def frames_stage(params, frames):
        return module.apply(
            {"params": params}, frames, method="encode_frames"
        )

    @jax.jit
    def encode_stage(params, batch):
        def encode(mod):
            f = mod.encode_frames(batch["frames"])
            embeds, attn = mod.assemble_encoder_input(
                f, batch["time_ids"], batch["src_type"],
                batch["src_idx"], batch["int_mask"], batch["end_ids"],
                batch["end_mask"], batch["text_ids"], batch["text_mask"],
            )
            return mod.encode(embeds, attn), attn
        return module.apply({"params": params}, method=encode)

    t = bench_fn(vit_only, params, batch["frames"])
    print(f"ViT only           : {t*1e3:8.1f} ms", flush=True)
    t_vit = t
    t = bench_fn(frames_stage, params, batch["frames"])
    print(f"+LN/QFormer/proj   : {t*1e3:8.1f} ms  (delta {1e3*(t-t_vit):.1f})",
          flush=True)
    t_frames = t
    t = bench_fn(encode_stage, params, batch)
    print(f"+assemble/T5-enc   : {t*1e3:8.1f} ms  (delta {1e3*(t-t_frames):.1f})",
          flush=True)
    t_enc = t

    # full generate, unpipelined single-shot (host prep + device)
    out = model.generate(samples)
    t0 = time.time()
    for _ in range(3):
        out = model.generate(samples)
    t_full = (time.time() - t0) / 3
    print(f"full generate      : {t_full*1e3:8.1f} ms  "
          f"(decode+beam+host delta {1e3*(t_full-t_enc):.1f})", flush=True)

    # pipelined steady state (what bench.py reports)
    pending = model.generate_dispatch(samples)
    t0 = time.time()
    n = 5
    for _ in range(n - 1):
        nxt = model.generate_dispatch(samples)
        model.generate_collect(pending)
        pending = nxt
    model.generate_collect(pending)
    t_pipe = (time.time() - t0) / n
    print(f"pipelined e2e      : {t_pipe*1e3:8.1f} ms/batch "
          f"= {n_frames * batch_sz / t_pipe:.1f} f/s/chip", flush=True)
    print(f"residual (pipe - enc) = {1e3*(t_pipe-t_enc):.1f} ms "
          f"[decode loop + collect host work]", flush=True)


if __name__ == "__main__":
    main()
