"""Tests for device ops: color/resize, DFD, medfilt, boxes, distance."""

import numpy as np
import pytest

import jax.numpy as jnp

from pyannote_video_tpu.ops.boxes import (
    box_area,
    gated_overlap,
    intersection_area,
    iou,
    nms,
    normalize_boxes,
)
from pyannote_video_tpu.ops.color import ingest_gray, resize_bilinear, to_gray
from pyannote_video_tpu.ops.dfd import dfd_series
from pyannote_video_tpu.ops.distance import pairwise_dist, pairwise_sqdist
from pyannote_video_tpu.ops.medfilt import medfilt1d
from pyannote_video_tpu.utils.synthetic import synthetic_episode


class TestColor:
    def test_to_gray_matches_cv2(self):
        cv2 = pytest.importorskip("cv2")
        rng = np.random.default_rng(0)
        rgb = rng.integers(0, 256, size=(2, 24, 32, 3), dtype=np.uint8)
        ours = np.asarray(to_gray(jnp.asarray(rgb)))
        for b in range(2):
            theirs = cv2.cvtColor(rgb[b], cv2.COLOR_RGB2GRAY)
            assert np.abs(ours[b] - theirs.astype(np.float32)).max() <= 1.0

    def test_resize_matches_cv2(self):
        cv2 = pytest.importorskip("cv2")
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, size=(1, 48, 64), dtype=np.uint8)
        ours = np.asarray(resize_bilinear(jnp.asarray(img), 20, 30))[0]
        theirs = cv2.resize(img[0], (30, 20), interpolation=cv2.INTER_LINEAR)
        assert np.abs(ours - theirs.astype(np.float32)).max() <= 2.0

    def test_ingest_shapes(self):
        frames = np.zeros((4, 48, 64, 3), dtype=np.uint8)
        out = ingest_gray(jnp.asarray(frames), 24, 32)
        assert out.shape == (4, 24, 32)
        assert out.dtype == jnp.float32

    def test_yuv420_forward_matches_cv2(self):
        """Host packer vs cv2.COLOR_RGB2YUV_I420 (limited-range BT.601).
        Luma must match to rounding; chroma siting differs (ours is a 2x2
        box average, cv2 decimates) so chroma gets a small tolerance."""
        cv2 = pytest.importorskip("cv2")
        from pyannote_video_tpu.ops.color import rgb_to_yuv420

        rng = np.random.default_rng(2)
        raw = rng.integers(0, 256, size=(2, 32, 48, 3), dtype=np.uint8)
        rgb = np.stack([cv2.GaussianBlur(f, (7, 7), 3) for f in raw])
        y, u, v = rgb_to_yuv420(rgb)
        assert y.shape == (2, 32, 48) and u.shape == (2, 16, 24)
        H, W = 32, 48
        for b in range(2):
            i420 = cv2.cvtColor(rgb[b], cv2.COLOR_RGB2YUV_I420)
            ycv = i420[:H]
            ucv = i420[H:H + H // 4].reshape(H // 2, W // 2)
            vcv = i420[H + H // 4:].reshape(H // 2, W // 2)
            assert np.abs(ycv.astype(int) - y[b].astype(int)).max() <= 1
            assert np.abs(ucv.astype(float) - u[b]).mean() <= 2.0
            assert np.abs(vcv.astype(float) - v[b]).mean() <= 2.0

    def test_yuv420_inverse_matches_cv2(self):
        cv2 = pytest.importorskip("cv2")
        from pyannote_video_tpu.ops.color import rgb_to_yuv420, yuv420_to_rgb

        rng = np.random.default_rng(3)
        raw = rng.integers(0, 256, size=(1, 32, 48, 3), dtype=np.uint8)
        rgb = np.stack([cv2.GaussianBlur(f, (7, 7), 3) for f in raw])
        y, u, v = rgb_to_yuv420(rgb)
        ours = np.asarray(yuv420_to_rgb(
            jnp.asarray(y), jnp.asarray(u), jnp.asarray(v)))[0]
        H, W = 32, 48
        i420 = np.concatenate([y[0], u[0].reshape(H // 4, W),
                               v[0].reshape(H // 4, W)], axis=0)
        theirs = cv2.cvtColor(i420, cv2.COLOR_YUV2RGB_I420)
        assert np.abs(ours - theirs.astype(np.float32)).max() <= 1.0
        # and the whole trip stays close to the original on smooth content
        assert np.abs(ours - rgb[0].astype(np.float32)).mean() <= 4.0

    def test_yuv_luma_is_gray(self):
        """Y plane (rescaled) == to_gray, so tracking/DFD/ORB thresholds
        transfer unchanged to the YUV streaming path."""
        from pyannote_video_tpu.ops.color import (
            rgb_to_yuv420,
            yuv_luma_to_gray,
        )

        rng = np.random.default_rng(4)
        rgb = rng.integers(0, 256, size=(2, 32, 48, 3), dtype=np.uint8)
        y, _, _ = rgb_to_yuv420(rgb)
        gray = np.asarray(to_gray(jnp.asarray(rgb)))
        gray_from_y = np.asarray(yuv_luma_to_gray(jnp.asarray(y)))
        assert np.abs(gray - gray_from_y).max() <= 1.0


class TestDFD:
    def test_static_scene_near_zero(self):
        rng = np.random.default_rng(0)
        frame = rng.uniform(0, 255, size=(40, 60)).astype(np.float32)
        frames = np.stack([frame] * 5)
        d = np.asarray(dfd_series(jnp.asarray(frames)))
        assert d.shape == (4,)
        np.testing.assert_allclose(d, 0.0, atol=1e-4)

    def test_translation_compensated(self):
        # a shifted frame should have near-zero DFD (motion compensated),
        # much smaller than the naive frame difference
        rng = np.random.default_rng(1)
        big = rng.uniform(0, 255, size=(60, 80)).astype(np.float32)
        f0 = big[10:50, 10:70]
        f1 = big[12:52, 10:70]  # shifted down by 2 px
        frames = jnp.asarray(np.stack([f0, f1]))
        d = float(dfd_series(frames, radius=3)[0])
        naive = float(np.abs(f0 - f1).mean())
        assert d < 0.15 * naive

    def test_subpixel_translation_compensated(self):
        # a HALF-pixel global shift (bilinear-resampled) is invisible to
        # integer displacement search; the V-interpolated surface recovers
        # the noise floor (slow-pan false-boundary fix)
        rng = np.random.default_rng(7)
        noise = rng.uniform(0, 255, size=(44, 64)).astype(np.float32)
        # smooth the texture: natural images are dominated by low spatial
        # frequencies, where sub-pixel shift ≈ linear ramp and the V-model
        # is accurate (white noise would be dominated by the blend's
        # low-pass loss instead)
        k = np.ones(5) / 5
        big = np.apply_along_axis(
            lambda r: np.convolve(r, k, mode="same"), 1,
            np.apply_along_axis(
                lambda c: np.convolve(c, k, mode="same"), 0, noise))
        big = big.astype(np.float32)
        f0 = big[2:42, 2:62]
        f1 = 0.5 * big[2:42, 2:62] + 0.5 * big[3:43, 2:62]  # 0.5 px down
        frames = jnp.asarray(np.stack([f0, f1]))
        d_sub = float(dfd_series(frames, subpixel=True)[0])
        d_int = float(dfd_series(frames, subpixel=False)[0])
        # integer search is stuck with the half-pixel residual; the
        # corrected min removes most of it
        assert d_sub < 0.35 * d_int

    def test_cut_stays_large(self):
        rng = np.random.default_rng(2)
        f0 = rng.uniform(0, 255, size=(40, 60)).astype(np.float32)
        f1 = rng.uniform(0, 255, size=(40, 60)).astype(np.float32)
        d = float(dfd_series(jnp.asarray(np.stack([f0, f1])))[0])
        assert d > 30.0

    def test_series_on_synthetic_episode(self):
        ep = synthetic_episode(n_shots=3, shot_frames=10, width=96, height=72, seed=0)
        gray = np.asarray(
            ingest_gray(jnp.asarray(ep.frames), 50, int(96 * 50 / 72))
        )
        d = np.asarray(dfd_series(jnp.asarray(gray)))
        assert d.shape == (29,)
        # cuts at pair indices 9 (frames 9->10) and 19
        cut_vals = d[[9, 19]]
        within = np.delete(d, [9, 19])
        assert cut_vals.min() > 4 * within.max()


class TestMedfilt:
    def test_matches_scipy(self):
        from scipy.signal import medfilt as scipy_medfilt

        rng = np.random.default_rng(3)
        for k in [3, 5, 9, 51]:
            y = rng.uniform(0, 10, size=100)
            ours = np.asarray(medfilt1d(jnp.asarray(y.astype(np.float32)), k))
            theirs = scipy_medfilt(y, kernel_size=k)
            np.testing.assert_allclose(ours, theirs.astype(np.float32), atol=1e-5)

    def test_reflect_mode_no_edge_depression(self):
        # increasing ramp: zero-padding depresses the leading edge,
        # reflect padding preserves local medians
        y = jnp.asarray(np.arange(1, 51, dtype=np.float32))
        zero = np.asarray(medfilt1d(y, 21, mode="zero"))
        refl = np.asarray(medfilt1d(y, 21, mode="reflect"))
        assert zero[0] < refl[0]  # zeros drag the edge median down
        np.testing.assert_allclose(refl[10:-10], y[10:-10])  # interior exact

    def test_reflect_kernel_longer_than_series(self):
        y = jnp.asarray(np.arange(5, dtype=np.float32))
        out = np.asarray(medfilt1d(y, 51, mode="reflect"))
        assert out.shape == (5,)
        assert np.isfinite(out).all()


class TestBoxes:
    def test_area_dlib_convention(self):
        # dlib drectangle(0,0,9,9).area() == 100 (closed interval)
        assert float(box_area(jnp.asarray([[0, 0, 9, 9]]))[0]) == 100.0

    def test_intersection(self):
        a = jnp.asarray([[0, 0, 9, 9]])
        b = jnp.asarray([[5, 5, 14, 14], [20, 20, 25, 25]])
        inter = np.asarray(intersection_area(a, b))
        assert inter[0, 0] == 25.0  # 5x5 closed overlap
        assert inter[0, 1] == 0.0

    def test_gated_overlap_reference_semantics(self):
        a = jnp.asarray([[0, 0, 9, 9]])  # area 100
        b = jnp.asarray([[0, 0, 9, 9], [8, 8, 17, 17]])
        g = np.asarray(gated_overlap(a, b, 0.5))
        assert g[0, 0] == 100.0
        assert g[0, 1] == 0.0  # 2x2=4 overlap < 50% of either area

    def test_iou_and_nms(self):
        boxes = np.array(
            [[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]], dtype=np.float32
        )
        scores = np.array([0.9, 0.8, 0.7], dtype=np.float32)
        keep = nms(boxes, scores, iou_threshold=0.4)
        assert keep == [0, 2]
        m = np.asarray(iou(boxes, boxes))
        assert m[0, 0] == pytest.approx(1.0)

    def test_normalize(self):
        out = np.asarray(normalize_boxes(jnp.asarray([[32.0, 24.0, 64.0, 48.0]]), 128, 96))
        np.testing.assert_allclose(out[0], [0.25, 0.25, 0.5, 0.5])


class TestDistance:
    def test_matches_scipy_pdist(self):
        from scipy.spatial.distance import pdist, squareform

        rng = np.random.default_rng(4)
        X = rng.normal(size=(20, 128)).astype(np.float32)
        ours = np.asarray(pairwise_dist(jnp.asarray(X)))
        theirs = squareform(pdist(X, metric="euclidean"))
        # float32 matmul-identity pdist carries ~1e-4 relative error from
        # cancellation — well inside the 1e-3 parity budget (BASELINE.md)
        np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=5e-3)

    def test_near_duplicate_precision(self):
        # at realistic face-embedding scale (unit-ish norm, distances 0-1.5)
        # small true distances must not be swamped by cancellation noise
        rng = np.random.default_rng(5)
        base = (0.1 * rng.normal(size=(1, 128))).astype(np.float32)
        X = np.concatenate(
            [base, base + 0.005, (0.1 * rng.normal(size=(1, 128))).astype(np.float32)],
            axis=0,
        )
        d = np.asarray(pairwise_dist(jnp.asarray(X)))
        true_01 = np.linalg.norm(X[0] - X[1])
        assert abs(d[0, 1] - true_01) < 0.05 * true_01
        assert d[0, 0] == 0.0  # exact zero diagonal

    def test_sqdist_nonnegative(self):
        X = np.ones((5, 8), dtype=np.float32)
        d = np.asarray(pairwise_sqdist(jnp.asarray(X)))
        assert (d >= 0).all() and d.max() == 0.0


class TestShotPipeline:
    def test_detects_synthetic_cuts(self):
        from pyannote_video_tpu import Video
        from pyannote_video_tpu.pipeline.shot import Shot

        ep = synthetic_episode(
            n_shots=4, shot_frames=30, width=160, height=120, seed=7
        )
        video = Video(ep.frames, fps=ep.fps)
        # true cuts sit ~7x above within-shot DFD noise on this fixture;
        # threshold 2.0 separates them exactly
        shots = list(Shot(video, height=50, context=2.0, threshold=2.0))
        # segments tile [0, duration]
        assert shots[0].start == 0.0
        assert shots[-1].end == pytest.approx(video.duration)
        for s1, s2 in zip(shots, shots[1:]):
            assert s1.end == pytest.approx(s2.start)
        # boundaries found at the true cuts (within one frame)
        found = [s.end for s in shots[:-1]]
        assert len(found) == len(ep.cuts)
        for expected, got in zip(ep.cuts, found):
            assert abs(expected - got) <= 1.5 / ep.fps
        # at the CLI-default threshold 1.0 the true cuts are still a subset
        video2 = Video(ep.frames, fps=ep.fps)
        loose = [s.end for s in Shot(video2, threshold=1.0)][:-1]
        for expected in ep.cuts:
            assert any(abs(expected - got) <= 1.5 / ep.fps for got in loose)

    def test_chunked_equals_single_batch(self):
        from pyannote_video_tpu import Video
        from pyannote_video_tpu.pipeline.shot import Shot

        ep = synthetic_episode(n_shots=3, shot_frames=12, width=96, height=72, seed=8)
        v1 = Video(ep.frames, fps=ep.fps)
        v2 = Video(ep.frames, fps=ep.fps)
        big = Shot(v1, batch_size=1000).dfd_values()
        small = Shot(v2, batch_size=7).dfd_values()
        np.testing.assert_allclose(big[0], small[0], atol=1e-6)
        np.testing.assert_allclose(big[1], small[1], atol=1e-3)

    def test_single_shot_video(self):
        from pyannote_video_tpu import Video
        from pyannote_video_tpu.pipeline.shot import Shot

        ep = synthetic_episode(n_shots=1, shot_frames=20, width=96, height=72, seed=9)
        video = Video(ep.frames, fps=ep.fps)
        shots = list(Shot(video))
        assert len(shots) == 1
        assert shots[0] == Segment_approx(0.0, video.duration)


def Segment_approx(start, end):
    from pyannote_video_tpu.core import Segment

    class _Approx(Segment):
        def __eq__(self, other):
            return (
                abs(other.start - self.start) < 1e-6
                and abs(other.end - self.end) < 1e-6
            )

    return _Approx(start, end)


class TestShotNormalization:
    def test_noise_floor_zero_is_reference_formula(self):
        """noise_floor=0 reproduces the reference's bare (y-med)/med rule
        (`structure/shot.py:127`); the default adds the floor to the
        denominator only."""
        from pyannote_video_tpu import Video
        from pyannote_video_tpu.pipeline.shot import Shot
        from pyannote_video_tpu.ops.medfilt import medfilt1d

        ep = synthetic_episode(n_shots=2, shot_frames=12, width=96,
                               height=72, seed=3)
        video = Video(ep.frames, fps=ep.fps)
        shot0 = Shot(video, noise_floor=0.0)
        ts, y = shot0.dfd_values()
        filt = np.asarray(medfilt1d(jnp.asarray(y), shot0._kernel_size,
                                    mode=shot0.pad_mode))
        expect0 = (y - filt) / np.where(filt == 0.0, 1e-12, filt)
        _, norm0 = shot0.boundaries()
        np.testing.assert_allclose(norm0, expect0, rtol=1e-6)

        shot1 = Shot(Video(ep.frames, fps=ep.fps), noise_floor=1.0)
        _, norm1 = shot1.boundaries()
        np.testing.assert_allclose(norm1, (y - filt) / (filt + 1.0),
                                   rtol=1e-6)
