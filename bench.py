"""End-to-end throughput benchmark: video frames -> span string, one chip.

Measures the product-defining inference path on the flagship model
(EVA ViT-g/14 + Q-Former + Flan-T5-XL, bf16): 60 frames at 224x224 through
the frame encoder, interleaved prompt assembly, T5 encoding, and beam-5
span decoding (max 50 new tokens) — the reference QVH eval configuration
(lavis/projects/mr_BLIP/eval/qvh.yaml: n_frms 60, beam 5).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "frames/sec/chip", "vs_baseline": N}

vs_baseline: the reference publishes no throughput numbers, so the baseline
is an estimate of the 8xA100 eval pipeline at ~40 frames/sec/chip
(~1.5 s per 60-frame video per GPU: ViT-g fp16 over 60 frames plus beam-5
T5-XL decoding with HF generate).  BASELINE.json's target of >=2x the A100
frames/sec/chip corresponds to vs_baseline >= 2.0.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

A100_BASELINE_FPS_PER_CHIP = 40.0

N_FRAMES = 60
BATCH = 4  # the reference QVH eval batch size (eval/qvh.yaml)
REPEATS = 3


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    t_start = time.time()
    import jax

    from mr_blip_tpu.models.blip2_mr import BLIP2_MR

    log(f"devices: {jax.devices()}")

    model = BLIP2_MR(
        img_size=224, vit_model="eva_vit_g", t5_model="flan-t5-xl",
        task="lora", num_beams=5, max_new_tokens=50,
        compute_dtype="bfloat16", init_params=False,
    )
    model.params = model.init_params_fast(jax.random.PRNGKey(0), mode="zeros")
    log(f"params ready in {time.time() - t_start:.0f}s")

    rng = np.random.default_rng(0)
    duration = 150.0
    # uint8 frames, pre-staged in HBM: decoded video arrives as bytes and
    # normalization is fused on device; staging isolates chip throughput
    # from this harness's host tunnel bandwidth.
    video = jax.device_put(
        rng.integers(0, 256, (BATCH, N_FRAMES, 224, 224, 3), dtype=np.uint8)
    )
    samples = {
        "video": video,
        "timestamps": np.stack(
            [np.linspace(0.0, duration, N_FRAMES, endpoint=False)] * BATCH
        ),
        "duration": np.full((BATCH,), duration),
        "query_id": [f"q{i}" for i in range(BATCH)],
        "video_prompt_end": ["<extra_id_0>"] * BATCH,
        "query_prompt": ["Query: a person is doing something interesting\n"] * BATCH,
        "task_prompt": [
            "Given the video and the query, find the relevant windows.\nRelevant windows: "
        ] * BATCH,
        "relevant_windows": ["[[10, 25]]"] * BATCH,
    }

    t0 = time.time()
    out = model.generate(samples)  # compile + run
    log(f"first generate (compile+run): {time.time() - t0:.0f}s, "
        f"prediction={out['prediction'][0][:60]!r}")

    # timed steady-state runs
    times = []
    for i in range(REPEATS):
        t0 = time.time()
        model.generate(samples)
        times.append(time.time() - t0)
        log(f"run {i}: {times[-1]:.3f}s")

    per_video = float(np.median(times)) / BATCH
    fps = N_FRAMES / per_video
    result = {
        "metric": "e2e video->span inference (60f, ViT-g+FlanT5-XL, beam5)",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / A100_BASELINE_FPS_PER_CHIP, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
