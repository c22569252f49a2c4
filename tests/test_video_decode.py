"""Native FFmpeg decoder: sync vs async (C++ decode pool) equivalence.

The pool (video_decoder.cpp vpool_*) runs N worker threads serving ticketed
jobs — the decode-ahead machinery used by the grounded-QA mid-inference
window re-decode and available to the loaders. These tests pin:
async == sync bytes, many concurrent in-flight jobs, window mode, and the
synthetic:// immediate path.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def test_video(tmp_path_factory):
    try:
        from mr_blip_tpu.datasets.video_reader import write_test_video
    except Exception as e:  # pragma: no cover - build env without ffmpeg dev
        pytest.skip(f"native decoder unavailable: {e}")
    path = tmp_path_factory.mktemp("vid") / "clip.avi"
    try:
        write_test_video(str(path), w=64, h=48, n_frames=40, fps=10.0)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"cannot encode test video: {e}")
    return str(path)


class TestAsyncDecode:
    def test_batch_async_matches_sync(self, test_video):
        from mr_blip_tpu.datasets.video_reader import VideoReader

        indices = [0, 7, 7, 3, 39, 12]
        vr1 = VideoReader(test_video)
        want = vr1.get_batch(indices)
        vr1.close()

        vr2 = VideoReader(test_video)
        ticket = vr2.get_batch_async(indices)
        got = ticket.result()
        vr2.close()
        np.testing.assert_array_equal(got, want)

    def test_many_inflight_jobs(self, test_video):
        """Submit a batch per reader before collecting any — the pool's
        workers decode concurrently; results must match per-reader sync."""
        from mr_blip_tpu.datasets.video_reader import VideoReader

        jobs = []
        for k in range(6):
            vr = VideoReader(test_video)
            idx = [k, k + 5, 2 * k]
            jobs.append((vr, idx, vr.get_batch_async(idx)))
        for vr, idx, ticket in jobs:
            got = ticket.result()
            ref = VideoReader(test_video)
            np.testing.assert_array_equal(got, ref.get_batch(idx))
            ref.close()
            vr.close()

    def test_window_async_matches_sync(self, test_video):
        from mr_blip_tpu.datasets.video_reader import VideoReader

        vr1 = VideoReader(test_video)
        want = vr1.get_window(0.5, 2.5, max_n=64)
        vr1.close()
        vr2 = VideoReader(test_video)
        got = vr2.get_window_async(0.5, 2.5, max_n=64).result()
        vr2.close()
        assert got.shape == want.shape
        np.testing.assert_array_equal(got, want)

    def test_synthetic_immediate(self):
        from mr_blip_tpu.datasets.video_reader import VideoReader

        vr = VideoReader("synthetic://16x32x32@10.0#3")
        want = vr.get_batch([0, 5, 9])
        got = vr.get_batch_async([0, 5, 9]).result()
        np.testing.assert_array_equal(got, want)

    def test_resampled_qa_window_path(self, test_video):
        """The BLIP2-MR resample path drives the async pool end-to-end:
        per-sample clip_proposal decode at the model's image size."""
        from mr_blip_tpu.datasets.sampling import sample_frame_indices
        from mr_blip_tpu.datasets.video_reader import VideoReader

        readers, tickets = [], []
        proposals = [[0.0, 2.0], [1.0, 3.5]]
        for prop in proposals:
            vr = VideoReader(test_video, width=28, height=28)
            idx = sample_frame_indices(
                vlen=len(vr), fps=vr.get_avg_fps(), n_frms=4,
                sampling="uniform", clip_proposal=prop,
            )
            readers.append((vr, idx))
            tickets.append(vr.get_batch_async(idx))
        for (vr, idx), ticket in zip(readers, tickets):
            frames = ticket.result()
            assert frames.shape == (4, 28, 28, 3)
            ref = VideoReader(test_video, width=28, height=28)
            np.testing.assert_array_equal(frames, ref.get_batch(idx))
            ref.close()
            vr.close()
