"""Tests for the Farneback optical-flow kernel and flow-based DFD."""

import numpy as np
import pytest

import jax.numpy as jnp

from pyannote_video_tpu.ops.flow import (
    dfd_series_farneback,
    farneback_flow,
    poly_expansion,
    warped_residual,
)
from pyannote_video_tpu.utils.synthetic import synthetic_episode


def _smooth_noise(shape, seed=0, sigma=2.0):
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(seed)
    return gaussian_filter(
        rng.uniform(0, 255, shape).astype(np.float32), sigma
    )


class TestPolyExpansion:
    def test_quadratic_recovered(self):
        # a pure quadratic image must be fitted near-exactly away from edges
        H, W = 40, 50
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        img = 0.02 * (xx - 25) ** 2 + 0.5 * (yy - 20) + 30.0
        A, b = poly_expansion(jnp.asarray(img[None]))
        A = np.asarray(A)[0]
        b = np.asarray(b)[0]
        # A[..., 0, 0] ≈ d²f/dx² / 2 = 0.02 ; b y-component ≈ 0.5
        assert abs(A[20, 25, 0, 0] - 0.02) < 0.005
        assert abs(b[20, 25, 1] - 0.5) < 0.05


class TestFlow:
    def test_translation_recovered(self):
        big = _smooth_noise((80, 100), seed=1)
        f0 = big[10:60, 10:80]
        f1 = big[12:62, 13:83]  # content shifted by (dy=2, dx=3)
        flow = np.asarray(
            farneback_flow(jnp.asarray(f0[None]), jnp.asarray(f1[None]))
        )[0]
        interior = flow[10:40, 10:60]
        assert abs(np.median(interior[..., 0]) + 3.0) < 0.3
        assert abs(np.median(interior[..., 1]) + 2.0) < 0.3

    def test_batch_shapes(self):
        f = jnp.zeros((3, 40, 50))
        flow = farneback_flow(f, f)
        assert flow.shape == (3, 40, 50, 2)

    def test_residual_separates_cut(self):
        big = _smooth_noise((80, 100), seed=2)
        f0 = big[10:60, 10:80]
        f1 = big[11:61, 12:82]
        f_cut = _smooth_noise((50, 70), seed=3)
        frames = jnp.asarray(np.stack([f0, f1, f_cut]))
        d = np.asarray(dfd_series_farneback(frames))
        assert d[0] < 0.15 * d[1]


class TestOrbParity:
    def test_fast_corners_recover_cv2(self):
        """Our FAST-9 (cv2-score ranking) recovers cv2's corners."""
        cv2 = pytest.importorskip("cv2")
        import jax.numpy as jnp

        from pyannote_video_tpu.ops.orb import detect_and_describe
        from pyannote_video_tpu.utils.synthetic import _background

        rng = np.random.default_rng(3)
        gray_u8 = _background(320, 240, rng).mean(axis=2).astype(np.uint8)
        fast = cv2.FastFeatureDetector_create(
            threshold=20, nonmaxSuppression=True
        )
        cv_pts = np.asarray([k.pt for k in fast.detect(gray_u8, None)])
        kps, valid, _ = detect_and_describe(
            jnp.asarray(gray_u8[None], dtype=jnp.float32)
        )
        ours = np.asarray(kps[0][np.asarray(valid[0])])[:, :2]
        assert len(ours) >= len(cv_pts) * 0.5
        d = np.sqrt(((cv_pts[:, None, :] - ours[None, :, :]) ** 2).sum(-1))
        recall = (d.min(axis=1) <= 2.0).mean()
        assert recall > 0.75, f"only {recall:.0%} of cv2 corners recovered"


class TestShotFarneback:
    def test_detects_cuts_like_block_method(self):
        from pyannote_video_tpu import Video
        from pyannote_video_tpu.pipeline.shot import Shot

        ep = synthetic_episode(n_shots=3, shot_frames=12, width=96,
                               height=72, seed=11)
        v1 = Video(ep.frames, fps=ep.fps)
        shots_fb = list(Shot(v1, threshold=2.0, method="farneback"))
        boundaries = [s.end for s in shots_fb[:-1]]
        assert len(boundaries) == len(ep.cuts)
        for expected, got in zip(ep.cuts, boundaries):
            assert abs(expected - got) <= 1.5 / ep.fps
