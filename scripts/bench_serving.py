"""Online-serving load test on the real chip: latency/throughput under
closed-loop saturation and open-loop Poisson arrivals.

Drives MomentRetrievalServer (mr_blip_tpu/serving) with the flagship int8
model at bench.py geometry (60f, beam 5, QVH prompts, 150 s duration) and
staged synthetic frames (isolating serving behavior from this harness's
host decode bound — scripts/bench_decode.py covers that half).

Usage:
    python scripts/bench_serving.py                 # int8, B<=4
    MRBLIP_SERVE_RATE=3.5 python scripts/bench_serving.py   # Poisson rate

Prints one JSON line per phase:
  {"phase": "closed_loop", "throughput_rps": ..., "f_s_chip": ...}
  {"phase": "poisson", "rate_rps": ..., "p50_s": ..., "p99_s": ...}

Batches pad to the full bench bucket (batch_buckets=[B]) so the run reuses
bench.py's compiled graphs from the persistent cache; the smaller buckets
a latency-tuned deployment would add are a compile-budget choice, not a
code path difference.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    from mr_blip_tpu.common.compile_cache import enable_compilation_cache
    from mr_blip_tpu.models.blip2_mr import BLIP2_MR
    from mr_blip_tpu.serving import MomentRetrievalServer, MRRequest

    enable_compilation_cache()

    n_frames = int(os.environ.get("MRBLIP_BENCH_FRAMES", "60"))
    batch = int(os.environ.get("MRBLIP_BENCH_BATCH", "4"))
    n_closed = int(os.environ.get("MRBLIP_SERVE_N", "40"))
    use_fp = bool(os.environ.get("MRBLIP_BENCH_FP"))
    # default: one graph (reuse bench.py's cache entry). A latency-tuned
    # deployment compiles the sub-max buckets too so ragged batches don't
    # pad: MRBLIP_SERVE_BUCKETS=1,2,4
    buckets = sorted(
        int(b)
        for b in os.environ.get("MRBLIP_SERVE_BUCKETS", str(batch)).split(",")
    )

    log(f"devices: {jax.devices()}")
    model = BLIP2_MR(
        img_size=224, vit_model="eva_vit_g", t5_model="flan-t5-xl",
        task="lora", num_beams=5, max_new_tokens=50, min_new_tokens=12,
        compute_dtype="bfloat16", init_params=False,
    )
    model.params = model.init_params_fast(jax.random.PRNGKey(0), mode="zeros")
    if not use_fp:
        model.quantize_for_inference()
        log("int8 inference enabled")

    rng = np.random.default_rng(0)
    duration = 150.0
    # a few distinct videos, reused round-robin. PRE-STAGED to HBM: this
    # harness's host tunnel moves ~20 MB/s, so per-request H2D (9 MB/req)
    # would measure the tunnel, not the serving layer (same staging call
    # bench.py documents). The "unstaged" phase below measures the tunnel
    # case for honesty; a production host's PCIe/DMA makes it moot.
    videos_np = [
        rng.integers(0, 256, (n_frames, 224, 224, 3), dtype=np.uint8)
        for _ in range(8)
    ]
    videos = [jax.device_put(v) for v in videos_np]

    def make_req(i, staged=True):
        vids = videos if staged else videos_np
        return MRRequest(
            query="a person is doing something interesting",
            duration=duration, video=vids[i % len(vids)],
            timestamps=np.linspace(0.0, duration, n_frames, endpoint=False),
            qid=f"q{i}",
        )

    server = MomentRetrievalServer(
        model, max_batch=batch, max_wait_ms=15.0,
        batch_buckets=buckets,
        decode_workers=0,
    )

    # ---- warmup (compile, one graph per bucket) ---------------------------
    for b in buckets:
        t0 = time.time()
        futs = [server.submit(make_req(i)) for i in range(b)]
        for f in futs:
            f.result(timeout=3600)
        log(f"warmup bucket {b} (compile+run): {time.time() - t0:.0f}s")

    # ---- closed loop: saturation throughput ------------------------------
    t0 = time.time()
    futs = [server.submit(make_req(i)) for i in range(n_closed)]
    for f in futs:
        f.result(timeout=3600)
    wall = time.time() - t0
    rps = n_closed / wall
    st = server.stats()
    row = {
        "phase": "closed_loop",
        "n": n_closed,
        "throughput_rps": round(rps, 3),
        "f_s_chip": round(rps * n_frames, 1),
        "mean_batch_occupancy": round(st.mean_batch_occupancy, 3),
    }
    print(json.dumps(row), flush=True)

    # ---- closed loop, unstaged: per-request H2D through this host --------
    if not os.environ.get("MRBLIP_SERVE_SKIP_UNSTAGED"):
        t0 = time.time()
        futs = [server.submit(make_req(i, staged=False))
                for i in range(n_closed)]
        for f in futs:
            f.result(timeout=3600)
        rps_u = n_closed / (time.time() - t0)
        print(json.dumps({
            "phase": "closed_loop_unstaged",
            "n": n_closed,
            "throughput_rps": round(rps_u, 3),
            "f_s_chip": round(rps_u * n_frames, 1),
            "note": "per-request 9MB H2D via this harness's slow tunnel",
        }), flush=True)

    # ---- open loop: Poisson arrivals -------------------------------------
    # fresh server so latency quantiles cover ONLY this phase (the compiled
    # graphs carry over via the jit cache on the same model object)
    server.close()
    # open-loop wait knob: ragged (padded) dispatch only happens when the
    # device pipeline is idle (see MomentRetrievalServer), so the deadline
    # governs only the idle->busy transition; ~1/4 of the ~0.8 s service
    # time trades a little first-request latency for companions arriving
    # within the window.
    open_wait_ms = float(os.environ.get("MRBLIP_SERVE_WAIT_MS", "200"))
    server = MomentRetrievalServer(
        model, max_batch=batch, max_wait_ms=open_wait_ms,
        batch_buckets=buckets, decode_workers=0,
    )
    # default rate: ~80% of measured closed-loop capacity (the classic
    # knee-of-the-curve operating point)
    rate = float(os.environ.get("MRBLIP_SERVE_RATE", 0.8 * rps))
    n_open = int(os.environ.get("MRBLIP_SERVE_N_OPEN", "48"))
    arr_rng = np.random.default_rng(1)
    gaps = arr_rng.exponential(1.0 / rate, n_open)
    lat = []
    futs = []
    t_start = time.time()
    for i in range(n_open):
        target = t_start + float(np.sum(gaps[: i + 1]))
        now = time.time()
        if target > now:
            time.sleep(target - now)
        futs.append((time.time(), server.submit(make_req(100 + i))))
    for t_sub, f in futs:
        f.result(timeout=3600)
        # per-request latency measured by the server itself
    st2 = server.stats()
    wall_open = time.time() - t_start
    row = {
        "phase": "poisson",
        "buckets": buckets,
        "wait_ms": open_wait_ms,
        "rate_rps": round(rate, 3),
        "n": n_open,
        "achieved_rps": round(n_open / wall_open, 3),
        "p50_s": round(st2.latency_p50_s, 3),
        "p95_s": round(st2.latency_p95_s, 3),
        "p99_s": round(st2.latency_p99_s, 3),
        "mean_batch_occupancy": round(st2.mean_batch_occupancy, 3),
    }
    print(json.dumps(row), flush=True)
    server.close()


if __name__ == "__main__":
    main()
