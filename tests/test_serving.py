"""Online serving layer (mr_blip_tpu/serving): batching, padding, decode
offload, and stats.

The reference has no serving path (its only batch inference is the offline
eval loop, evaluate.py:66-120); the server is the TPU-native production
extension, so its contract is defined against our own generate(): results
for every request must be row-identical to a direct ``model.generate`` on
the same sample rows, regardless of how the server batched, padded, or
reordered the work.
"""

import json
import os
import threading
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from mr_blip_tpu.serving import MomentRetrievalServer, MRRequest

TASK_PROMPT = (
    "Given the video and the query, find the relevant windows.\n"
    "Relevant windows: "
)


def _model():
    from mr_blip_tpu.models.blip2_mr import BLIP2_MR

    return BLIP2_MR(
        img_size=28, vit_model="tiny", t5_model="tiny", task="lora",
        num_beams=2, max_new_tokens=8, compute_dtype="float32",
    )


def _frames(t=2, img=28, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (t, img, img, 3), dtype=np.uint8)


def _request(i, duration=30.0):
    return MRRequest(
        query=f"action {i}", duration=duration, video=_frames(seed=i),
        qid=f"q{i}",
    )


def _expected(model, reqs):
    """Direct model.generate on the same rows (uniform timestamps, like the
    server synthesizes when none are given)."""
    b = len(reqs)
    samples = {
        "video": np.stack([r.video for r in reqs]),
        "timestamps": np.stack([
            np.linspace(0.0, r.duration, r.video.shape[0], endpoint=False)
            for r in reqs
        ]),
        "duration": np.asarray([r.duration for r in reqs]),
        "query_id": [r.qid for r in reqs],
        "video_prompt_end": ["<extra_id_0>"] * b,
        "query_prompt": ["Query: " + r.query + "\n" for r in reqs],
        "task_prompt": [TASK_PROMPT] * b,
    }
    return model.generate(samples)


@pytest.fixture(scope="module")
def model():
    return _model()


class TestServerEquivalence:
    def test_full_batch_matches_generate(self, model):
        reqs = [_request(i) for i in range(4)]
        want = _expected(model, reqs)
        with MomentRetrievalServer(model, max_batch=4, max_wait_ms=5) as srv:
            futs = [srv.submit(r) for r in reqs]
            got = [f.result(timeout=120) for f in futs]
        for i, g in enumerate(got):
            assert g["raw_prediction"] == want["raw_prediction"][i]
            assert g["prediction"] == want["prediction"][i]
            assert g["qid"] == f"q{i}"

    def test_padded_partial_batch_matches_generate(self, model):
        # 3 requests, single bucket [4]: every dispatch pads to 4 by row
        # replication (whether the scheduler forms one batch of 3 or splits
        # across deadlines); padded rows must not perturb the real rows'
        # predictions.
        reqs = [_request(i, duration=25.0) for i in range(3)]
        want = _expected(model, reqs)
        srv = MomentRetrievalServer(model, max_batch=4, max_wait_ms=1,
                                    batch_buckets=[4])
        try:
            futs = [srv.submit(r) for r in reqs]
            got = [f.result(timeout=120) for f in futs]
        finally:
            srv.close()
        for i, g in enumerate(got):
            assert g["raw_prediction"] == want["raw_prediction"][i]
        st = srv.stats()
        assert st.completed == 3
        assert st.batches >= 1
        # occupancy accounts padding: 3 real rows over >=4 padded
        assert st.mean_batch_occupancy <= 0.75 + 1e-9

    def test_many_requests_ragged_tail(self, model):
        # 6 requests with max_batch 4 -> at least two dispatches, one ragged;
        # every request still matches its own single-row generate.
        reqs = [_request(10 + i) for i in range(6)]
        want = _expected(model, reqs)
        with MomentRetrievalServer(model, max_batch=4, max_wait_ms=5) as srv:
            futs = [srv.submit(r) for r in reqs]
            got = [f.result(timeout=240) for f in futs]
        for i, g in enumerate(got):
            assert g["raw_prediction"] == want["raw_prediction"][i]


class TestServerBehavior:
    def test_single_request_deadline(self, model):
        with MomentRetrievalServer(model, max_batch=4, max_wait_ms=10) as srv:
            fut = srv.submit(_request(0))
            out = fut.result(timeout=120)
        assert isinstance(out["prediction"], (list, str))

    def test_video_path_decode(self, model, tmp_path):
        from mr_blip_tpu.datasets.video_reader import write_test_video
        from mr_blip_tpu.processors.video_processors import (
            BlipVideoEvalProcessor,
        )

        path = str(tmp_path / "clip.mp4")
        write_test_video(path, w=48, h=48, n_frames=20, fps=10.0)
        proc = BlipVideoEvalProcessor(image_size=28, n_frms=2, normalize=False)
        with MomentRetrievalServer(
            model, vis_processor=proc, max_batch=2, max_wait_ms=5,
            decode_workers=1,
        ) as srv:
            fut = srv.submit(
                MRRequest(query="anything", duration=2.0, video_path=path)
            )
            out = fut.result(timeout=120)
        assert "prediction" in out

        # decoded path must equal the dataset-style manual flow
        frames, indices, fps = proc(path, clip_proposal=None)
        from mr_blip_tpu.datasets.mr_datasets import _as_model_frames

        req = MRRequest(
            query="anything", duration=2.0,
            video=_as_model_frames(frames),
            timestamps=np.asarray(
                [round(float(i / fps), 2) for i in indices]),
        )
        want = _expected_with_ts(model, [req])
        assert out["raw_prediction"] == want["raw_prediction"][0]

    def test_close_drains_inflight_decode(self, model, tmp_path):
        """close(drain=True) while a video_path request is still in the
        decode pool: the device loop must not exit until the decode
        enqueues, or the request's future would hang forever."""
        import time as _time

        from mr_blip_tpu.datasets.video_reader import write_test_video
        from mr_blip_tpu.processors.video_processors import (
            BlipVideoEvalProcessor,
        )

        path = str(tmp_path / "clip.mp4")
        write_test_video(path, w=48, h=48, n_frames=20, fps=10.0)
        proc = BlipVideoEvalProcessor(image_size=28, n_frms=2, normalize=False)

        class SlowProc:
            def __call__(self, p, clip_proposal=None):
                _time.sleep(0.4)  # device loop sees empty+closed meanwhile
                return proc(p, clip_proposal=clip_proposal)

        srv = MomentRetrievalServer(
            model, vis_processor=SlowProc(), max_batch=2, max_wait_ms=1,
            decode_workers=1,
        )
        fut = srv.submit(
            MRRequest(query="anything", duration=2.0, video_path=path))
        srv.close(drain=True, timeout=120)
        assert "prediction" in fut.result(timeout=5)

    def test_bad_request_fails_future(self, model):
        with MomentRetrievalServer(model, max_batch=2, max_wait_ms=5) as srv:
            fut = srv.submit(MRRequest(query="x", duration=1.0))  # no video
            with pytest.raises(ValueError):
                fut.result(timeout=10)
            ok = srv.submit(_request(3))
            assert "prediction" in ok.result(timeout=120)
        st = srv.stats()
        assert st.failed == 1 and st.completed == 1

    def test_mixed_n_frms_fails_only_the_offender(self, model):
        """A request with a different frame count is rejected ALONE at
        enqueue time (co-batched futures unaffected) and never holds a
        staged-HBM slot (ADVICE r4: the old batch-time check failed the
        whole dispatch and leaked _staged)."""
        with MomentRetrievalServer(model, max_batch=4, max_wait_ms=5) as srv:
            good = [srv.submit(_request(i)) for i in range(2)]  # t=2
            bad_req = MRRequest(query="odd", duration=30.0,
                                video=_frames(t=3, seed=9), qid="odd")
            bad = srv.submit(bad_req)
            with pytest.raises(ValueError, match="n_frms"):
                bad.result(timeout=30)
            for f in good:
                assert "prediction" in f.result(timeout=240)
        st = srv.stats()
        assert st.failed == 1 and st.completed == 2
        assert srv._staged == 0  # the rejected request held no slot

    def test_submit_after_close_raises(self, model):
        srv = MomentRetrievalServer(model, max_batch=2, max_wait_ms=5)
        srv.close(drain=True)
        with pytest.raises(RuntimeError):
            srv.submit(_request(0))

    def test_close_drains(self, model):
        srv = MomentRetrievalServer(model, max_batch=4, max_wait_ms=5000)
        futs = [srv.submit(_request(i)) for i in range(2)]
        # max_wait is huge; close() must trigger the launch and drain
        t0 = time.time()
        srv.close(drain=True)
        assert all(f.done() for f in futs)
        assert time.time() - t0 < 4000
        for f in futs:
            assert "prediction" in f.result()

    def test_max_staged_hbm_cap(self, model):
        """A backlog burst past max_staged queues on host (no unbounded
        staged HBM) and every request still matches direct generate."""
        import jax

        reqs = [_request(i) for i in range(6)]
        want = _expected(model, reqs)
        srv = MomentRetrievalServer(
            model, max_batch=2, max_wait_ms=5, max_staged=2,
        )
        try:
            futs = [srv.submit(r) for r in reqs]
            # staged never exceeds the cap (observed while queued)
            assert srv.stats().staged <= 2
            got = [f.result(timeout=240) for f in futs]
        finally:
            srv.close()
        assert srv._staged == 0  # all releases accounted
        # the over-cap rows stayed host-side until dispatch
        assert sum(
            isinstance(r.video, jax.Array) for r in reqs
        ) <= 6  # (uploaded inside dispatch via jnp.stack, not in place)
        for i, g in enumerate(got):
            assert g["raw_prediction"] == want["raw_prediction"][i]

    def test_warmup_compiles_buckets_without_touching_stats(self, model):
        """warmup() drives one synthetic batch per bucket through
        dispatch/collect: no stats pollution, and real traffic afterwards
        still matches direct generate."""
        reqs = [_request(i) for i in range(2)]
        want = _expected(model, reqs)
        with MomentRetrievalServer(
            model, max_batch=2, max_wait_ms=5, batch_buckets=[1, 2]
        ) as srv:
            secs = srv.warmup(n_frms=2, image_size=28, duration=30.0)
            assert secs >= 0.0
            st = srv.stats()
            assert st.submitted == 0 and st.completed == 0 and st.batches == 0
            futs = [srv.submit(r) for r in reqs]
            got = [f.result(timeout=240) for f in futs]
        for i, g in enumerate(got):
            assert g["raw_prediction"] == want["raw_prediction"][i]

    def test_stats_latency_quantiles(self, model):
        with MomentRetrievalServer(model, max_batch=2, max_wait_ms=5) as srv:
            futs = [srv.submit(_request(i)) for i in range(4)]
            for f in futs:
                f.result(timeout=240)
            st = srv.stats()
        assert st.submitted == 4 and st.completed == 4
        assert st.latency_p50_s <= st.latency_p95_s <= st.latency_p99_s
        assert st.throughput_rps > 0


class TestHTTPServe:
    """The HTTP daemon (scripts/serve.py) over the batching engine."""

    @pytest.fixture()
    def httpd(self, model, tmp_path):
        import importlib.util

        from mr_blip_tpu.datasets.video_reader import write_test_video
        from mr_blip_tpu.processors.video_processors import (
            BlipVideoEvalProcessor,
        )

        spec = importlib.util.spec_from_file_location(
            "serve", os.path.join(REPO, "scripts", "serve.py"))
        serve = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(serve)

        path = str(tmp_path / "clip.mp4")
        write_test_video(path, w=48, h=48, n_frames=20, fps=10.0)
        proc = BlipVideoEvalProcessor(image_size=28, n_frms=2, normalize=False)
        srv = MomentRetrievalServer(
            model, vis_processor=proc, max_batch=2, max_wait_ms=5,
            decode_workers=1,
        )
        httpd = serve.make_httpd(srv, port=0)
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        yield httpd, path
        httpd.shutdown()
        srv.close()

    def _post(self, httpd, route, payload):
        import urllib.request

        port = httpd.server_address[1]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{route}",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"}, method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=120) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    def _get(self, httpd, route):
        import urllib.request

        port = httpd.server_address[1]
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}{route}", timeout=30
            ) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    def test_healthz_and_stats(self, httpd):
        h, _ = httpd
        assert self._get(h, "/healthz") == (200, {"ok": True})
        code, st = self._get(h, "/v1/stats")
        assert code == 200 and "throughput_rps" in st
        assert self._get(h, "/nope")[0] == 404

    def test_predict_matches_direct_flow(self, httpd, model):
        h, path = httpd
        code, out = self._post(h, "/v1/moment_retrieval", {
            "query": "anything", "duration": 2.0, "video_path": path,
            "qid": "http1",
        })
        assert code == 200, out
        assert out["qid"] == "http1"
        assert "prediction" in out and "raw_prediction" in out

        # same decode + generate flow as the Python API (which is itself
        # proven identical to model.generate above)
        from mr_blip_tpu.datasets.mr_datasets import _as_model_frames
        from mr_blip_tpu.processors.video_processors import (
            BlipVideoEvalProcessor,
        )

        proc = BlipVideoEvalProcessor(image_size=28, n_frms=2, normalize=False)
        frames, indices, fps = proc(path, clip_proposal=None)
        req = MRRequest(
            query="anything", duration=2.0, video=_as_model_frames(frames),
            timestamps=np.asarray(
                [round(float(i / fps), 2) for i in indices]),
        )
        want = _expected_with_ts(model, [req])
        assert out["raw_prediction"] == want["raw_prediction"][0]

    def test_bad_request_400(self, httpd):
        h, path = httpd
        code, out = self._post(h, "/v1/moment_retrieval",
                               {"query": "no duration or path"})
        assert code == 400 and "error" in out
        # decode failure surfaces as 500, doesn't kill the server
        code, out = self._post(h, "/v1/moment_retrieval", {
            "query": "x", "duration": 1.0, "video_path": "/nonexistent.mp4",
        })
        assert code == 500 and "error" in out
        assert self._get(h, "/healthz")[0] == 200


class TestServerMesh:
    """The server is mode-agnostic: a ``set_mesh`` (dp-sharded) model must
    serve row-identical results — full batches, and ragged batches whose
    bucket padding composes with the mesh-divisibility padding inside
    generate (cf. tests/test_mesh_generate.py)."""

    @pytest.mark.skipif(
        __import__("jax").device_count() < 8, reason="needs 8 virtual devices"
    )
    def test_dp_mesh_serving_matches_single_device(self):
        from mr_blip_tpu.parallel.mesh import make_mesh

        base_model = _model()
        reqs = [_request(i) for i in range(8)]
        want = _expected(base_model, reqs)

        mesh_model = _model()
        mesh_model.set_mesh(make_mesh(dp=8, tp=1))
        with MomentRetrievalServer(
            mesh_model, max_batch=8, max_wait_ms=5
        ) as srv:
            futs = [srv.submit(r) for r in reqs]
            got = [f.result(timeout=240) for f in futs]
            # ragged tail through the same server: bucket-pad (3 -> 4)
            # then mesh-pad (4 -> 8) inside generate
            futs2 = [srv.submit(_request(i)) for i in range(3)]
            got2 = [f.result(timeout=240) for f in futs2]
        for i, g in enumerate(got):
            assert g["raw_prediction"] == want["raw_prediction"][i]
            assert g["prediction"] == want["prediction"][i]
        for i, g in enumerate(got2):
            assert g["raw_prediction"] == want["raw_prediction"][i]


def _expected_with_ts(model, reqs):
    b = len(reqs)
    samples = {
        "video": np.stack([r.video for r in reqs]),
        "timestamps": np.stack(
            [np.asarray(r.timestamps, np.float64) for r in reqs]),
        "duration": np.asarray([r.duration for r in reqs]),
        "query_id": [r.qid for r in reqs],
        "video_prompt_end": ["<extra_id_0>"] * b,
        "query_prompt": ["Query: " + r.query + "\n" for r in reqs],
        "task_prompt": [TASK_PROMPT] * b,
    }
    return model.generate(samples)
