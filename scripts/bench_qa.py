"""Two-stage grounded-QA throughput at NExT-GQA geometry, decode included.

The most host-entangled path in the framework (reference
blip2_mr.py:990-1314): 60-frame beam-5 LOCALIZER -> predicted-window
RE-DECODE from the source video (mid-inference host I/O through the
native async pool) -> 60-frame ANSWERER scoring A-E logits. Never timed
before this script (VERDICT r3 #4).

Drives the REAL stack end-to-end: MCVideoQADataset over real encoded
clips (NExT-QA-like ~44 s, GOP 60) + DataLoader thread pool +
PrefetchLoader -> BLIP2_MR (EVA ViT-g + Flan-T5-XL). Measures both
schedules:

* serial   — videoQA_generate per batch (dispatch -> redecode -> collect
             back-to-back), with a per-stage budget;
* pipelined — the videogqa task's loop: batch i's window re-decode and
             answerer overlap batch i+1's device localizer.

int8 (production-candidate) by default; MRBLIP_BENCH_FP=1 for the
bit-parity float path. Prints ONE JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = int(os.environ.get("MRBLIP_BENCH_BATCH", "4"))
N_FRAMES = 60            # NExT-GQA localizer frames (eval/nextGQA.yaml)
N_ANSWER_FRAMES = 60     # num_frames_for_answer (eval/nextGQA.yaml)
N_BATCHES = int(os.environ.get("MRBLIP_BENCH_QA_BATCHES", "4"))
CLIP_SECONDS = 44        # NExT-QA average clip length

# MRBLIP_BENCH_QA_TINY=1: tiny-model smoke of the exact same control flow
# (real encoded clips, real decode pool, both schedules) for CPU CI.
TINY = bool(os.environ.get("MRBLIP_BENCH_QA_TINY"))
if TINY:
    N_FRAMES = N_ANSWER_FRAMES = 4
    N_BATCHES = 2
    CLIP_SECONDS = 10


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from mr_blip_tpu.common.compile_cache import enable_compilation_cache

    cache_dir = enable_compilation_cache()
    if cache_dir:
        log(f"persistent compilation cache: {cache_dir}")

    import jax

    from mr_blip_tpu.datasets.loader import DataLoader, PrefetchLoader
    from mr_blip_tpu.datasets.mr_datasets import MCVideoQADataset
    from mr_blip_tpu.datasets.synthetic import (
        make_benchmark_clips, make_benchmark_qa_annotations,
    )
    from mr_blip_tpu.models.blip2_mr import BLIP2_MR
    from mr_blip_tpu.processors.text_processors import BlipQuestionProcessor
    from mr_blip_tpu.processors.video_processors import BlipVideoEvalProcessor

    log(f"devices: {jax.devices()}")
    t_start = time.time()

    clips = make_benchmark_clips(seconds=CLIP_SECONDS)
    n_queries = BATCH * (N_BATCHES + 1)  # +1 warmup batch
    ann = make_benchmark_qa_annotations(
        clips, f"/tmp/mrblip_bench_clips/bench_qa_ann_{n_queries}.json",
        n_queries=n_queries,
    )
    img = 28 if TINY else 224
    ds = MCVideoQADataset(
        vis_processor=BlipVideoEvalProcessor(
            image_size=img, n_frms=N_FRAMES, normalize=False),
        text_processor=BlipQuestionProcessor(),
        vis_root="", ann_paths=[ann],
    )

    if TINY:
        model = BLIP2_MR(
            img_size=img, vit_model="tiny", t5_model="tiny",
            task="lora_QA_with_localizer", num_beams=2, max_new_tokens=8,
            compute_dtype="float32",
            resample_frames=True, num_frames_for_answer=N_ANSWER_FRAMES,
        )
    else:
        model = BLIP2_MR(
            img_size=img, vit_model="eva_vit_g", t5_model="flan-t5-xl",
            task="lora_QA_with_localizer", num_beams=5, max_new_tokens=50,
            min_new_tokens=12, compute_dtype="bfloat16", init_params=False,
            resample_frames=True, num_frames_for_answer=N_ANSWER_FRAMES,
        )
        model.params = model.init_params_fast(
            jax.random.PRNGKey(0), mode="zeros")
    int8_mode = not os.environ.get("MRBLIP_BENCH_FP") and not TINY
    if int8_mode:
        model.quantize_for_inference()
        log("int8 inference enabled (MRBLIP_BENCH_FP=1 for float)")
    log(f"params ready in {time.time() - t_start:.0f}s")

    workers = int(os.environ.get("MRBLIP_DECODE_THREADS", "4"))

    def batches():
        loader = PrefetchLoader(
            DataLoader(ds, batch_size=BATCH, num_workers=workers))
        return iter(loader)

    # Warmup: compile localizer generate + answerer graphs on batch 0.
    it = batches()
    warm = next(it)
    t0 = time.time()
    model.videoQA_generate(warm)
    log(f"warmup (compile+run): {time.time() - t0:.0f}s")

    # ---- serial schedule, with a per-stage budget -----------------------
    t_loc = t_dec = t_ans = 0.0
    n_videos = 0
    t_serial0 = time.time()
    for lb in it:
        t0 = time.time()
        h = model.videoQA_dispatch(lb)
        hh = model.videoQA_redecode(h)  # blocks on localizer device wall
        t1 = time.time()
        frames = model.collect_window_redecodes(hh["pending"])
        t2 = time.time()
        hh["frames"] = frames
        model.videoQA_collect(hh)
        t3 = time.time()
        t_loc += t1 - t0
        t_dec += t2 - t1
        t_ans += t3 - t2
        n_videos += lb["video"].shape[0]
    serial_wall = time.time() - t_serial0
    serial_s_per_video = serial_wall / n_videos
    log(f"serial: {serial_s_per_video:.3f} s/video over {n_videos} "
        f"(loc {t_loc:.1f}s, window-decode {t_dec:.1f}s, answer {t_ans:.1f}s)")

    # ---- pipelined schedule (the videogqa task's loop) ------------------
    it = batches()
    next(it)  # skip the warmup batch for matched work
    pending = None
    n_videos_p = 0
    t_pipe0 = time.time()
    for lb in it:
        handle = model.videoQA_dispatch(lb)
        if pending is not None:
            h = model.videoQA_redecode(pending)
            model.videoQA_collect(h)
        pending = handle
        n_videos_p += lb["video"].shape[0]
    if pending is not None:
        model.videoQA_collect(model.videoQA_redecode(pending))
    pipe_wall = time.time() - t_pipe0
    pipe_s_per_video = pipe_wall / n_videos_p
    log(f"pipelined: {pipe_s_per_video:.3f} s/video over {n_videos_p}")

    mode = "int8" if int8_mode else "bf16"
    print(json.dumps({
        "metric": (
            f"two-stage grounded QA (NExT-GQA geometry: {N_FRAMES}f beam-5 "
            f"localizer + window re-decode + {N_ANSWER_FRAMES}f answerer, "
            f"{mode}, decode included)"
        ),
        "value": round(1.0 / pipe_s_per_video, 3),
        "unit": "videos/sec/chip (pipelined, decode included)",
        "serial_s_per_video": round(serial_s_per_video, 3),
        "pipelined_s_per_video": round(pipe_s_per_video, 3),
        "overlap_gain": round(serial_s_per_video / pipe_s_per_video, 3),
        "stage_budget_s_per_batch": {
            "localizer": round(t_loc / N_BATCHES, 3),
            "window_redecode": round(t_dec / N_BATCHES, 3),
            "answerer": round(t_ans / N_BATCHES, 3),
        },
        "host_note": (
            f"{os.cpu_count()} host core(s), {workers} decode threads; "
            "loader decode for the NEXT batch also overlaps"
        ),
    }))


if __name__ == "__main__":
    main()
