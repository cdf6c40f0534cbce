"""Tests for video ingest (array + OpenCV backends) and synthetic fixtures."""

import numpy as np
import pytest

from pyannote_video_tpu.io.video import ArraySource, Video
from pyannote_video_tpu.utils.imops import bilinear_resize, rgb_to_gray
from pyannote_video_tpu.utils.synthetic import (
    synthetic_episode,
    write_synthetic_video,
)


@pytest.fixture(scope="module")
def episode():
    return synthetic_episode(n_shots=3, shot_frames=10, width=96, height=72, seed=1)


class TestImops:
    def test_rgb_to_gray_matches_cv2(self):
        cv2 = pytest.importorskip("cv2")
        rng = np.random.default_rng(0)
        rgb = rng.integers(0, 256, size=(32, 40, 3), dtype=np.uint8)
        ours = rgb_to_gray(rgb)
        theirs = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY)
        assert np.abs(ours.astype(int) - theirs.astype(int)).max() <= 1

    def test_bilinear_resize_matches_cv2(self):
        cv2 = pytest.importorskip("cv2")
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
        ours = bilinear_resize(img, 30, 20)
        theirs = cv2.resize(img, (30, 20), interpolation=cv2.INTER_LINEAR)
        assert np.abs(ours.astype(int) - theirs.astype(int)).max() <= 2

    def test_identity_resize(self):
        img = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
        out = bilinear_resize(img, 2, 2)
        np.testing.assert_array_equal(out, img)


class TestArrayVideo:
    def test_metadata(self, episode):
        v = Video(episode.frames, fps=episode.fps)
        assert v.frame_rate == 25.0
        assert v.size == (96, 72)
        assert v.duration == pytest.approx(30 / 25.0)

    def test_iterframes_grid(self, episode):
        v = Video(episode.frames, fps=episode.fps)
        items = list(v)
        assert len(items) == 30
        t0, f0 = items[0]
        assert t0 == 0.0
        np.testing.assert_array_equal(f0, episode.frames[0])
        t5, f5 = items[5]
        assert t5 == pytest.approx(5 / 25.0)
        np.testing.assert_array_equal(f5, episode.frames[5])

    def test_random_access(self, episode):
        v = Video(episode.frames, fps=episode.fps)
        np.testing.assert_array_equal(v(7 / 25.0), episode.frames[7])
        # anti-jitter: 3.0 stored as 2.999999 still lands on frame 3
        np.testing.assert_array_equal(v(3 / 25.0 - 1e-9), episode.frames[3])

    def test_frame_size_setter(self, episode):
        v = Video(episode.frames, fps=episode.fps)
        v.frame_size = (48, 36)
        t, f = next(iter(v))
        assert f.shape == (36, 48, 3)
        assert v.frame_size == [48, 36]
        assert v.size == (96, 72)  # native size unchanged

    def test_start_end_step(self, episode):
        v = Video(episode.frames, fps=episode.fps, start=0.2, end=0.6, step=0.2)
        ts = [t for t, _ in v]
        assert ts == pytest.approx([0.2, 0.4])

    def test_iterbatches(self, episode):
        v = Video(episode.frames, fps=episode.fps)
        batches = list(v.iterbatches(8))
        assert len(batches) == 4
        ts, frames = batches[0]
        assert frames.shape == (8, 72, 96, 3)
        assert frames.dtype == np.uint8
        ts_last, frames_last = batches[-1]
        assert frames_last.shape[0] == 30 - 24
        all_ts = np.concatenate([b[0] for b in batches])
        np.testing.assert_allclose(all_ts, np.arange(30) / 25.0)


class TestOpenCVVideo:
    def test_file_roundtrip(self, episode, tmp_path):
        pytest.importorskip("cv2")
        path = str(tmp_path / "clip.avi")
        write_synthetic_video(path, episode)
        v = Video(path)
        assert v.frame_rate == pytest.approx(25.0)
        assert v.size == (96, 72)
        items = list(v)
        assert len(items) == 30
        # MJPG is lossy; frames should still be close to the source
        _, f0 = items[0]
        assert f0.shape == (72, 96, 3)
        err = np.abs(f0.astype(int) - episode.frames[0].astype(int)).mean()
        assert err < 8.0

    def test_random_access_matches_sequential(self, episode, tmp_path):
        pytest.importorskip("cv2")
        path = str(tmp_path / "clip2.avi")
        write_synthetic_video(path, episode)
        v = Video(path)
        seq = {t: f.copy() for t, f in v}
        # jump around
        for idx in [20, 3, 29, 0, 15]:
            t = idx / 25.0
            np.testing.assert_array_equal(v(t), seq[t])

    def test_missing_file_raises(self):
        pytest.importorskip("cv2")
        with pytest.raises(IOError):
            Video("/nonexistent/video.mp4")


class TestNativeFramefeed:
    def test_ring_buffer_roundtrip(self):
        """native/framefeed.c: background reader drains a frame pipe."""
        import subprocess

        from pyannote_video_tpu.io.framefeed import load

        ff = load()
        if ff is None:
            pytest.skip("native framefeed extension unavailable")
        frame_bytes = 48 * 64 * 3
        code = (
            "import os; "
            f"[os.write(1, bytes([i % 256]) * {frame_bytes}) for i in range(50)]"
        )
        proc = subprocess.Popen(["python", "-c", code], stdout=subprocess.PIPE)
        reader = ff.Reader(proc.stdout.fileno(), frame_bytes, 8)
        out = np.empty((8, 48, 64, 3), dtype=np.uint8)
        total = 0
        frames_seen = []
        while True:
            n = reader.read_batch(out, 8)
            if n == 0:
                break
            for k in range(n):
                assert (out[k] == out[k, 0, 0, 0]).all()  # constant frame
                frames_seen.append(int(out[k, 0, 0, 0]))
            total += n
        reader.close()
        proc.wait()
        assert total == 50
        assert frames_seen == list(range(50))  # order preserved


class TestSyntheticEpisode:
    def test_ground_truth_consistency(self, episode):
        assert episode.frames.shape == (30, 72, 96, 3)
        assert len(episode.cuts) == 2
        assert episode.cuts == pytest.approx([10 / 25.0, 20 / 25.0])
        assert len(episode.shots) == 3
        # every frame has exactly one face
        for f in range(30):
            obs = episode.faces_at(f)
            assert len(obs) == 1
            left, top, right, bottom = obs[0].box
            assert 0 <= (left + right) / 2 <= 96
            assert obs[0].landmarks.shape == (68, 2)
            # landmarks inside (padded) box
            assert obs[0].landmarks[:, 0].min() >= left - 2
            assert obs[0].landmarks[:, 0].max() <= right + 2

    def test_cuts_change_content(self, episode):
        # frame across a cut differs much more than within a shot
        within = np.abs(
            episode.frames[5].astype(int) - episode.frames[6].astype(int)
        ).mean()
        across = np.abs(
            episode.frames[9].astype(int) - episode.frames[10].astype(int)
        ).mean()
        assert across > 3 * within

    def test_thread_pattern_reuses_backgrounds(self):
        ep = synthetic_episode(
            n_shots=4, shot_frames=6, width=64, height=48,
            thread_pattern=[0, 1, 0, 1], seed=3,
        )
        # shots 0 and 2 share a background -> their first frames correlate
        a, b = ep.frames[0].astype(float), ep.frames[12].astype(float)
        c = ep.frames[6].astype(float)  # different background
        assert np.abs(a - b).mean() < np.abs(a - c).mean() * 0.6

    def test_determinism(self):
        e1 = synthetic_episode(n_shots=2, shot_frames=4, width=48, height=36, seed=9)
        e2 = synthetic_episode(n_shots=2, shot_frames=4, width=48, height=36, seed=9)
        np.testing.assert_array_equal(e1.frames, e2.frames)


class TestTimeGrid:
    """`timestamps()` and `iterbatches` must share one drift-safe grid
    (round-1 gap: iterbatches used np.arange, which can emit a phantom
    tail frame on resumed runs with nonzero start)."""

    def test_resumed_nonzero_start_grids_match(self):
        from pyannote_video_tpu.io.video import Video

        frames = np.zeros((50, 32, 32, 3), dtype=np.uint8)
        # start/end/step chosen so (end-start)/step is a float-noisy
        # integer: arange would yield an extra phantom tail frame
        v = Video(frames, fps=30.0, start=0.7, end=1.6, step=0.1)
        ts = v.timestamps()
        assert len(ts) == 9, ts

        batched = []
        for bts, bframes in v.iterbatches(4):
            assert len(bts) == len(bframes)
            batched.extend(bts)
        np.testing.assert_allclose(batched, ts)

    def test_grid_matches_iterframes(self):
        from pyannote_video_tpu.io.video import Video

        frames = np.zeros((30, 16, 16, 3), dtype=np.uint8)
        v = Video(frames, fps=25.0, step=0.2)
        ts = [t for t, _ in v.iterframes(with_time=True)]
        np.testing.assert_allclose(ts, v.timestamps())
