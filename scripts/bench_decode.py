"""Host video-decode throughput: the reference's hot loop #3, measured.

The e2e bench (bench.py) stages decoded uint8 frames in HBM to isolate
chip throughput from this harness's host tunnel; this script measures the
other half of the pipeline — the native FFmpeg decoder's sustained
RANDOM-ACCESS throughput at the eval sampler's seek pattern (SURVEY hot
loop #3; reference decord gather, lavis/datasets/data_utils.py:30-85).

Workload = QVH eval geometry: a ~150 s clip at 30 fps (4500 frames),
640x360 source, GOP 60 (realistic web-video keyframe spacing — NOT the
test default of 8), decoded at 224x224 output, 60 uniform frame indices
per video (one seek + decode-forward run per index cluster).

Prints ONE JSON line:
  {"decode_fps_per_core": N, "window_fps_per_core": N,
   "cores_to_feed_chip_int8": N, "cores_to_feed_chip_bf16": N, ...}

Env: MRBLIP_DECODE_BENCH_CLIPS (default 4), MRBLIP_DECODE_BENCH_SECONDS
(default 150), MRBLIP_DECODE_THREADS for the async-pool variant.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# Current e2e chip rates from the most recent BENCH artifact (see
# docs/performance.md); used only to express "cores needed to feed one
# chip" — recompute if the chip numbers move.
CHIP_FPS_INT8 = 298.0
CHIP_FPS_BF16 = 164.0

N_CLIPS = int(os.environ.get("MRBLIP_DECODE_BENCH_CLIPS", "4"))
SECONDS = int(os.environ.get("MRBLIP_DECODE_BENCH_SECONDS", "150"))
# H.264 with B-frames is what real QVH/Charades videos are; "mpeg4" gives
# the pre-round-4 (cheaper-to-decode) comparison point.
CODEC = os.environ.get("MRBLIP_DECODE_BENCH_CODEC", "libx264")
FPS = 30.0
SRC_W, SRC_H = 640, 360
GOP = 60
N_FRMS = 60
OUT = 224


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def clip_paths():
    """Encode the benchmark clips once; cache across runs."""
    from mr_blip_tpu.datasets.synthetic import make_benchmark_clips

    return make_benchmark_clips(
        n_clips=N_CLIPS, seconds=SECONDS, fps=FPS,
        width=SRC_W, height=SRC_H, gop=GOP, codec=CODEC,
    )


def main():
    from mr_blip_tpu.datasets.sampling import sample_frame_indices
    from mr_blip_tpu.datasets.video_reader import VideoReader

    paths = clip_paths()

    # Open outside the timed loop ~ the dataset keeps no reader cache, but
    # open cost is measured separately below so both numbers exist.
    t0 = time.time()
    readers = [VideoReader(p, OUT, OUT) for p in paths]
    open_s = (time.time() - t0) / len(paths)

    # Eval seek pattern: uniform midpoint sampling, like blip_video_eval.
    per_video = []
    total_frames = 0
    t_all = time.time()
    for rep in range(3):
        for vr in readers:
            idx = sample_frame_indices(
                vlen=len(vr), fps=vr.get_avg_fps(), n_frms=N_FRMS,
                sampling="uniform",
            )
            t0 = time.time()
            frames = vr.get_batch(idx)
            per_video.append(time.time() - t0)
            total_frames += frames.shape[0]
    wall = time.time() - t_all
    decode_fps = total_frames / wall

    # Same eval pattern with the SWS_FAST_BILINEAR opt-in (VideoReader
    # fast_scale=True): quality-gated by test_fast_scale_quality, for
    # decode-bound eval hosts.
    fast_readers = [VideoReader(p, OUT, OUT, fast_scale=True) for p in paths]
    fast_frames = 0
    t_fast = time.time()
    for rep in range(3):
        for vr in fast_readers:
            idx = sample_frame_indices(
                vlen=len(vr), fps=vr.get_avg_fps(), n_frms=N_FRMS,
                sampling="uniform",
            )
            fast_frames += vr.get_batch(idx).shape[0]
    fast_fps = fast_frames / (time.time() - t_fast)
    for vr in fast_readers:
        vr.close()

    # Grounded-QA window re-decode pattern: contiguous [t0, t1) windows
    # (reference PyAV get_frames, blip2_mr_models/utils.py:532-606).
    t0 = time.time()
    win_frames = 0
    for vr in readers:
        w = vr.get_window(SECONDS * 0.4, SECONDS * 0.4 + 4.0)  # 4 s window
        win_frames += w.shape[0]
    window_fps = win_frames / (time.time() - t0)

    result = {
        "decode_fps_per_core": round(decode_fps, 1),
        "decode_fps_per_core_fastscale": round(fast_fps, 1),
        "decode_s_per_video": round(float(np.mean(per_video)), 3),
        "window_fps_per_core": round(window_fps, 1),
        "open_s_per_video": round(open_s, 3),
        "unit": (
            f"frames/sec/core, {SECONDS}s {SRC_W}x{SRC_H} {CODEC} GOP{GOP} "
            f"clip, {N_FRMS} uniform samples at {OUT}x{OUT}"
        ),
        "cores_to_feed_chip_int8": round(CHIP_FPS_INT8 / decode_fps, 1),
        "cores_to_feed_chip_bf16": round(CHIP_FPS_BF16 / decode_fps, 1),
        "host_note": (
            f"this host exposes {os.cpu_count()} core(s); production v5e/v5p "
            "hosts expose 100+ — cores_to_feed_chip says how many of them "
            "one chip consumes"
        ),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
