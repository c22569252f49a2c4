"""Native FFmpeg decoder: sync vs async (C++ decode pool) equivalence.

The pool (video_decoder.cpp vpool_*) runs N worker threads serving ticketed
jobs — the decode-ahead machinery used by the grounded-QA mid-inference
window re-decode and available to the loaders. These tests pin:
async == sync bytes, many concurrent in-flight jobs, window mode, and the
synthetic:// immediate path.
"""

import contextlib
import io

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


@pytest.fixture(scope="module")
def h264_video(tmp_path_factory):
    """H.264 with B-frames + realistic GOP: what real QVH/Charades web
    videos are. Exercises pts-reorder handling and the AVDISCARD_NONREF
    catch-up path."""
    try:
        from mr_blip_tpu.datasets.video_reader import write_test_video
    except Exception as e:  # pragma: no cover
        pytest.skip(f"native decoder unavailable: {e}")
    path = tmp_path_factory.mktemp("vid") / "clip.mp4"
    try:
        with contextlib.redirect_stderr(io.StringIO()):
            write_test_video(str(path), w=128, h=96, n_frames=120, fps=10.0,
                             gop=30, codec="libx264")
    except Exception as e:  # pragma: no cover - no libx264 in ffmpeg build
        pytest.skip(f"cannot encode h264 video: {e}")
    return str(path)


def _pattern_residual(frame, k, w, h):
    """Mean |decoded luma - analytic pattern| for frame index k, with a
    scale+offset fit absorbing the YUV limited-range conversion. ~3 for
    the right frame (codec noise); >12 for an off-by-one (the synthetic
    gradient shifts 16 luma levels per frame)."""
    rgb = frame.astype(np.float64)
    luma = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    pat = ((np.arange(w)[None, :] * 3 + np.arange(h)[:, None] + k * 16)
           & 0xFF).astype(np.float64)
    a = np.vstack([pat.ravel(), np.ones(pat.size)]).T
    coef, *_ = np.linalg.lstsq(a, luma.ravel(), rcond=None)
    return float(np.abs(a @ coef - luma.ravel()).mean())


class TestFrameIdentity:
    """Pin that get_batch([k]) returns the k-th frame's CONTENT — not just
    that access paths agree with each other (they can all be consistently
    wrong: a demuxer-computed avg fps of 1200/119 on a 10 fps mp4 once
    shifted every frame past #60 by one, through every access path).
    Guarded by the exact demux-scanned pts map (video_decoder.cpp
    build_pts_map)."""

    @pytest.mark.parametrize("k", [0, 37, 59, 60, 61, 100, 119])
    def test_h264_random_access_identity(self, h264_video, k):
        from mr_blip_tpu.datasets.video_reader import VideoReader

        vr = VideoReader(h264_video)
        assert len(vr) == 120
        frame = vr.get_batch([k])[0]
        vr.close()
        r_k = _pattern_residual(frame, k, 128, 96)
        assert r_k < 8.0, f"frame {k} content residual {r_k:.1f}"
        # ...and it is distinguishable from its neighbors (off-by-one guard).
        for dk in (-1, 1):
            if 0 <= k + dk < 120:
                assert _pattern_residual(frame, k + dk, 128, 96) > 12.0

    def test_h264_sequential_identity(self, h264_video):
        from mr_blip_tpu.datasets.video_reader import VideoReader

        vr = VideoReader(h264_video)
        seq = vr.get_batch(list(range(120)))
        vr.close()
        resid = [_pattern_residual(seq[k], k, 128, 96) for k in range(120)]
        assert max(resid) < 8.0, f"max residual {max(resid):.1f} at frame {int(np.argmax(resid))}"

    def test_h264_stepped_forward_identity(self, h264_video):
        """Forward decode with the NONREF-discard catch-up engaged
        (step > margin) must still land on the right frames."""
        from mr_blip_tpu.datasets.video_reader import VideoReader

        vr = VideoReader(h264_video)
        for k in [0, 25, 58, 90, 119]:
            frame = vr.get_batch([k])[0]
            assert _pattern_residual(frame, k, 128, 96) < 8.0, f"frame {k}"
        vr.close()

    def test_h264_random_access_matches_sequential(self, h264_video):
        from mr_blip_tpu.datasets.video_reader import VideoReader

        vr = VideoReader(h264_video)
        seq = vr.get_batch(list(range(120)))
        vr.close()
        vr2 = VideoReader(h264_video)
        idx = [100, 3, 64, 59, 61, 119, 0]
        ra = vr2.get_batch(idx)
        vr2.close()
        for i, k in enumerate(idx):
            np.testing.assert_array_equal(ra[i], seq[k])

    def test_h264_window_identity(self, h264_video):
        from mr_blip_tpu.datasets.video_reader import VideoReader

        vr = VideoReader(h264_video)
        w = vr.get_window(3.0, 6.0, max_n=64)
        vr.close()
        assert w.shape[0] == 30  # [3, 6) s at 10 fps
        assert _pattern_residual(w[0], 30, 128, 96) < 8.0
        assert _pattern_residual(w[-1], 59, 128, 96) < 8.0

    def test_h264_async_matches_sync(self, h264_video):
        from mr_blip_tpu.datasets.video_reader import VideoReader

        indices = [0, 61, 61, 30, 119, 45]
        vr1 = VideoReader(h264_video)
        want = vr1.get_batch(indices)
        vr1.close()
        vr2 = VideoReader(h264_video)
        got = vr2.get_batch_async(indices).result()
        vr2.close()
        np.testing.assert_array_equal(got, want)

    def test_mpeg4_identity(self, test_video):
        from mr_blip_tpu.datasets.video_reader import VideoReader

        vr = VideoReader(test_video)
        for k in [0, 13, 39]:
            frame = vr.get_batch([k])[0]
            assert _pattern_residual(frame, k, 64, 48) < 8.0, f"frame {k}"
        vr.close()


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


class TestPtsMapCacheAndGating:
    """Round-5 decoder upgrades: per-path pts-map caching (the demux scan
    is per-open latency under the pool's reopen pattern), codec gating of
    the 1-packet=1-frame assumption, and the exact keyframe-map seek."""

    def test_cache_reuse_and_clear(self, h264_video):
        from mr_blip_tpu.datasets.video_reader import VideoReader, _lib

        lib = _lib()
        lib.vd_pts_cache_clear()
        assert lib.vd_pts_cache_size() == 0
        vr1 = VideoReader(h264_video)
        assert lib.vd_pts_cache_size() == 1
        has, nk = vr1.pts_map_info()
        assert has and nk == 4  # 120 frames, GOP 30 -> 4 seek points
        vr1.close()
        # reopen: served from cache (size unchanged), same map
        vr2 = VideoReader(h264_video)
        assert lib.vd_pts_cache_size() == 1
        assert vr2.pts_map_info() == (has, nk)
        # and the cached map indexes identically to the scanned one
        frame = vr2.get_batch([61])[0]
        assert _pattern_residual(frame, 61, 128, 96) < 8.0
        vr2.close()
        lib.vd_pts_cache_clear()
        assert lib.vd_pts_cache_size() == 0

    def test_eval_stride_exactness(self, tmp_path_factory):
        """QVH eval geometry in miniature (large GOP, stride smaller than
        the GOP): the keyframe-exact seek decision must keep sparse access
        bit-identical to a full sequential decode."""
        import contextlib
        import io

        from mr_blip_tpu.datasets.video_reader import (
            VideoReader, write_test_video,
        )

        path = tmp_path_factory.mktemp("vid") / "stride.mp4"
        try:
            with contextlib.redirect_stderr(io.StringIO()):
                write_test_video(str(path), w=128, h=96, n_frames=240,
                                 fps=30.0, gop=60, codec="libx264")
        except Exception as e:  # pragma: no cover
            pytest.skip(f"cannot encode h264 video: {e}")
        vr = VideoReader(str(path))
        seq = vr.get_batch(list(range(240)))
        vr.close()
        vr2 = VideoReader(str(path))
        idx = list(range(2, 240, 24))  # eval-style uniform stride
        got = vr2.get_batch(idx)
        vr2.close()
        for i, k in enumerate(idx):
            np.testing.assert_array_equal(got[i], seq[k])

    def test_fast_scale_quality(self, h264_video):
        """SWS_FAST_BILINEAR eval option: same frame SELECTION (identity
        residual still passes) and bounded pixel delta vs bicubic."""
        from mr_blip_tpu.datasets.video_reader import VideoReader

        idx = [0, 37, 61, 100]
        vr_b = VideoReader(h264_video, width=96, height=64)
        bicubic = vr_b.get_batch(idx)
        vr_b.close()
        vr_f = VideoReader(h264_video, width=96, height=64, fast_scale=True)
        fast = vr_f.get_batch(idx)
        vr_f.close()
        # Same frame selection: the synthetic gradient shifts 16 luma
        # levels per frame index, so an off-by-one would push the mean
        # |delta| to ~16+; scaler-algorithm differences alone stay low.
        diff = np.abs(bicubic.astype(np.int16) - fast.astype(np.int16))
        assert float(diff.mean()) < 4.0, f"mean |delta| {diff.mean():.2f}"
        per_frame = diff.reshape(len(idx), -1).mean(axis=1)
        assert float(per_frame.max()) < 6.0, per_frame

    def test_mpeg4_map_kept_avi_container(self, test_video):
        """AVI reports nb_frames; safe codec + matching count keeps the
        exact map."""
        from mr_blip_tpu.datasets.video_reader import VideoReader

        vr = VideoReader(test_video)
        has, _ = vr.pts_map_info()
        assert has
        vr.close()
