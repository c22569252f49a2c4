"""HTTP serving daemon for moment retrieval.

A stdlib-only (``http.server``) JSON API over
:class:`mr_blip_tpu.serving.MomentRetrievalServer` — the deployable face
of the serving subsystem. Concurrent connections each block in their own
handler thread on ``submit().result()``, so cross-request batching for
the MXU happens in the batching engine, not here. The reference has no
serving path at all (offline eval loop only, evaluate.py:66-120).

Endpoints:
  POST /v1/moment_retrieval   {"query": str, "duration": float,
                               "video_path": str,
                               "clip_proposal": [s, e]?, "qid": str?}
                              -> {"prediction", "raw_prediction",
                                  "qid", "duration"}
  GET  /v1/stats              -> ServerStats (occupancy, p50/p95/p99, ...)
  GET  /healthz               -> {"ok": true}

Usage:
    python scripts/serve.py --model blip2_mr --model-type pretrain_flant5xl \
        --checkpoint /ckpts/mr_blip_qvh.msgpack --n-frms 60 --int8 \
        --port 8080

SIGTERM/SIGINT drain in-flight requests (the batching engine finishes
queued work) and exit 0 — the serving counterpart of the training-side
preemption handling (common/preempt.py).
"""

import argparse
import json
import os
import signal
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_httpd(mr_server, host="127.0.0.1", port=0, request_timeout=600.0):
    """Build (but don't start) the HTTP server bound to ``mr_server``.

    Factored from ``main`` so tests can drive the full HTTP surface with a
    tiny in-process model (tests/test_serving.py::TestHTTPServe).
    """
    from mr_blip_tpu.serving import MRRequest

    class Handler(BaseHTTPRequestHandler):
        # one JSON response path for everything
        def _reply(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # quiet; stats live at /v1/stats
            pass

        def do_GET(self):
            if self.path == "/healthz":
                return self._reply(200, {"ok": True})
            if self.path == "/v1/stats":
                return self._reply(200, mr_server.stats().as_dict())
            return self._reply(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            if self.path != "/v1/moment_retrieval":
                return self._reply(404, {"error": f"no route {self.path}"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(n) or b"{}")
                req = MRRequest(
                    query=payload["query"],
                    duration=float(payload["duration"]),
                    video_path=payload["video_path"],
                    clip_proposal=payload.get("clip_proposal"),
                    qid=str(payload.get("qid", "")),
                )
            except (KeyError, ValueError, json.JSONDecodeError) as e:
                return self._reply(400, {"error": f"bad request: {e!r}"})
            try:
                out = mr_server.submit(req).result(timeout=request_timeout)
            except Exception as e:  # noqa: BLE001 — surface per-request
                return self._reply(500, {"error": repr(e)})
            return self._reply(200, out)

    return ThreadingHTTPServer((host, port), Handler)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="blip2_mr")
    ap.add_argument("--model-type", default="pretrain_flant5xl")
    ap.add_argument("--checkpoint", default=None,
                    help="finetuned params msgpack (non-strict load)")
    ap.add_argument("--params-dtype", default=None,
                    choices=("bfloat16", "float32"),
                    help="fast zero-init at this dtype instead of real "
                         "initialization — for load tests / smoke runs "
                         "where --checkpoint covers (or stands in for) "
                         "the param tree")
    ap.add_argument("--n-frms", type=int, default=60)
    ap.add_argument("--int8", action="store_true",
                    help="quantize_for_inference() before serving")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--max-batch", type=int, default=4)
    ap.add_argument("--max-wait-ms", type=float, default=50.0)
    ap.add_argument("--decode-workers", type=int, default=2)
    ap.add_argument("--warmup", action="store_true",
                    help="compile every batch-bucket graph before binding "
                         "the port, so no request ever sees compile latency")
    ap.add_argument("--warmup-duration", type=float, default=150.0,
                    help="representative video duration (s) for warmup "
                         "prompts — match production traffic so the text "
                         "length buckets precompile too")
    args = ap.parse_args()

    from mr_blip_tpu.models import load_model
    from mr_blip_tpu.processors.video_processors import BlipVideoEvalProcessor
    from mr_blip_tpu.serving import MomentRetrievalServer

    extra = {"params_dtype": args.params_dtype} if args.params_dtype else {}
    model = load_model(args.model, args.model_type, is_eval=True,
                       checkpoint=args.checkpoint, **extra)
    if args.int8:
        model.quantize_for_inference()
    proc = BlipVideoEvalProcessor(
        image_size=getattr(model, "img_size", 224), n_frms=args.n_frms,
        normalize=False,
    )
    mr_server = MomentRetrievalServer(
        model, vis_processor=proc, max_batch=args.max_batch,
        max_wait_ms=args.max_wait_ms, decode_workers=args.decode_workers,
    )
    if args.warmup:
        secs = mr_server.warmup(
            n_frms=args.n_frms, duration=args.warmup_duration
        )
        print(
            f"warmup: {len(mr_server.batch_buckets)} bucket graphs ready "
            f"in {secs:.0f}s", flush=True,
        )
    httpd = make_httpd(mr_server, host=args.host, port=args.port)

    def _shutdown(signum, frame):
        # stop accepting, drain the batching engine, exit 0
        threading.Thread(target=httpd.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _shutdown)
    signal.signal(signal.SIGINT, _shutdown)

    print(f"serving on {args.host}:{httpd.server_address[1]}", flush=True)
    httpd.serve_forever()
    mr_server.close(drain=True)
    print(json.dumps(mr_server.stats().as_dict()), flush=True)


if __name__ == "__main__":
    main()
