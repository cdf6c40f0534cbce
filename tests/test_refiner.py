"""Refine cascade: gather-free crop op, stage-2 scoring, serve wiring.

The cascade (`models/refiner.py` + `ops/crop.py`) re-scores the pyramid
detector's top proposals; these tests pin the crop kernel to a scalar
bilinear reference, the refine-step selection/scatter semantics, and the
FaceDetector/fused integration (including the PYV_NO_REFINE kill
switch).  Trainer invariants (`train/train_refiner.py`) are covered at
the bottom; the full training loop is exercised by the slow smoke.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyannote_video_tpu.models import detector, refiner
from pyannote_video_tpu.ops.crop import crop_resize


def _scalar_crop(img, box, S):
    """Scalar bilinear crop-resize (the contract crop_resize must match):
    half-pixel centres, zero outside the frame."""
    l, t, r, b = box
    H, W = img.shape[:2]
    out = np.zeros((S, S, img.shape[2]), np.float32)
    for a in range(S):
        sy = t + (a + 0.5) * (b - t) / S - 0.5
        for o in range(S):
            sx = l + (o + 0.5) * (r - l) / S - 0.5
            acc = np.zeros(img.shape[2], np.float32)
            y0, x0 = int(np.floor(sy)), int(np.floor(sx))
            for yy in (y0, y0 + 1):
                for xx in (x0, x0 + 1):
                    w = max(0.0, 1 - abs(sy - yy)) * max(0.0, 1 - abs(sx - xx))
                    if 0 <= yy < H and 0 <= xx < W:
                        acc += w * img[yy, xx]
            out[a, o] = acc
    return out


class TestCropResize:
    def test_matches_scalar_bilinear(self):
        rng = np.random.default_rng(3)
        frames = rng.uniform(0, 255, size=(2, 29, 41, 3)).astype(np.float32)
        boxes = np.array(
            [[[4.2, 2.1, 24.7, 20.9], [-6.0, -4.0, 14.0, 16.0]],
             [[8.0, 9.0, 40.0, 28.0], [30.0, 14.0, 52.0, 40.0]]],
            dtype=np.float32)
        out = np.asarray(crop_resize(jnp.asarray(frames),
                                     jnp.asarray(boxes), 12))
        for bi in range(2):
            for k in range(2):
                ref = _scalar_crop(frames[bi], boxes[bi, k], 12)
                np.testing.assert_allclose(out[bi, k], ref, atol=2e-3)

    def test_out_of_frame_is_zero_padded(self):
        frames = np.full((1, 16, 16, 1), 200.0, np.float32)
        # window entirely above the frame
        out = np.asarray(crop_resize(
            jnp.asarray(frames),
            jnp.asarray([[[-40.0, -40.0, -8.0, -8.0]]], np.float32), 8))
        assert float(np.abs(out).max()) == 0.0

    def test_identity_window_reproduces_frame(self):
        rng = np.random.default_rng(5)
        frames = rng.uniform(0, 255, size=(1, 8, 8, 2)).astype(np.float32)
        out = np.asarray(crop_resize(
            jnp.asarray(frames),
            jnp.asarray([[[0.0, 0.0, 8.0, 8.0]]], np.float32), 8))
        np.testing.assert_allclose(out[0, 0], frames[0], atol=1e-4)


class TestCropBoxes:
    def test_square_context_window(self):
        box = jnp.asarray([10.0, 20.0, 30.0, 60.0])  # 20 x 40
        win = np.asarray(refiner.crop_boxes(box, context=1.5))
        # square at 1.5 x the larger side, same centre
        assert win[2] - win[0] == pytest.approx(60.0)
        assert win[3] - win[1] == pytest.approx(60.0)
        assert (win[0] + win[2]) / 2 == pytest.approx(20.0)
        assert (win[1] + win[3]) / 2 == pytest.approx(40.0)


class TestRefineScores:
    def setup_method(self):
        self.ref = refiner.init_params(jax.random.PRNGKey(0))
        rng = np.random.default_rng(11)
        self.frames = rng.uniform(0, 255, (2, 64, 96, 3)).astype(np.float32)

    def test_topk_slots_scored_rest_unrefined(self):
        B, K_total = 2, refiner.REFINE_K + 8
        rng = np.random.default_rng(1)
        scores = jnp.asarray(rng.uniform(1.0, 10.0, (B, K_total)),
                             jnp.float32)
        boxes = jnp.asarray(
            np.stack([np.stack([np.array([10.0, 10.0, 40.0, 40.0])
                                + 2 * k for k in range(K_total)])
                      for _ in range(B)]), jnp.float32)
        out = np.asarray(refiner.refine_scores(
            self.ref, jnp.asarray(self.frames), scores, boxes))
        for b in range(B):
            order = np.argsort(np.asarray(scores[b]))[::-1]
            top = set(order[:refiner.REFINE_K].tolist())
            for k in range(K_total):
                if k in top:
                    assert out[b, k] != refiner.UNREFINED
                else:
                    assert out[b, k] == refiner.UNREFINED

    def test_refined_logits_match_direct_forward(self):
        """The refined score of a selected slot IS the refiner logit on
        the serve-extracted crop — no hidden rescaling."""
        scores = jnp.asarray([[5.0, 2.0]], jnp.float32)
        boxes = jnp.asarray([[[8.0, 8.0, 40.0, 40.0],
                              [20.0, 10.0, 50.0, 44.0]]], jnp.float32)
        out = np.asarray(refiner.refine_scores(
            self.ref, jnp.asarray(self.frames[:1]), scores, boxes))
        wins = refiner.crop_boxes(boxes)
        crops = crop_resize(jnp.asarray(self.frames[:1], jnp.bfloat16),
                            wins, refiner.CROP)
        direct, _ = refiner.forward(self.ref, crops[0])
        np.testing.assert_allclose(out[0], np.asarray(direct), atol=1e-2)

    def test_proposal_gate(self):
        """Candidates below PROPOSAL_GATE stay UNREFINED even inside the
        top-K — a sub-gate stage-1 score means the window is noise."""
        scores = jnp.asarray([[5.0, refiner.PROPOSAL_GATE - 0.2]],
                             jnp.float32)
        boxes = jnp.asarray([[[8.0, 8.0, 40.0, 40.0],
                              [20.0, 10.0, 50.0, 44.0]]], jnp.float32)
        out = np.asarray(refiner.refine_scores(
            self.ref, jnp.asarray(self.frames[:1]), scores, boxes))
        assert out[0, 1] == refiner.UNREFINED
        assert out[0, 0] != refiner.UNREFINED


class TestDetectorIntegration:
    def test_detect_batch_with_refiner(self):
        ref = refiner.init_params(jax.random.PRNGKey(0))
        from pyannote_video_tpu.models.weights import default_detector_params

        params = detector.with_s2d_stem(default_detector_params())
        det = detector.FaceDetector(params={**params, "refiner": ref})
        assert det.threshold == detector.DEFAULT_THRESHOLD
        frames = np.random.default_rng(0).uniform(
            0, 255, size=(1, 96, 128, 3)).astype(np.uint8)
        out = det.detect_batch(frames)  # must run the fused cascade
        assert len(out) == 1

    def test_kill_switch(self, monkeypatch):
        monkeypatch.setenv("PYV_NO_REFINE", "1")
        det = detector.FaceDetector()
        assert "refiner" not in det.params
        assert det.threshold == detector.STAGE1_THRESHOLD

    def test_threshold_resolution_without_refiner_file(self, monkeypatch,
                                                       tmp_path):
        """With no packaged refiner the detector serves single-stage at
        STAGE1_THRESHOLD (never a random second stage)."""
        import pyannote_video_tpu.models.weights as weights

        monkeypatch.setattr(weights, "REFINER_FILE",
                            tmp_path / "missing.npz")
        det = detector.FaceDetector()
        assert "refiner" not in det.params
        assert det.threshold == detector.STAGE1_THRESHOLD


class TestTrainerInvariants:
    def test_scene_labels(self):
        from pyannote_video_tpu.train.train_refiner import (
            scene, _clean_negative)

        rng = np.random.default_rng(2)
        for _ in range(5):
            frame, gt, distract, hard = scene(rng)
            assert frame.dtype == np.uint8
            assert frame.shape == (360, 480, 3)
            assert len(hard) == len(gt)
            for d in distract:
                if _clean_negative(d, gt):
                    # no GT centre may sit inside the context window
                    win = np.asarray(refiner.crop_boxes(jnp.asarray(d)))
                    for g in gt:
                        gc = ((g[0] + g[2]) / 2, (g[1] + g[3]) / 2)
                        assert not (win[0] <= gc[0] <= win[2]
                                    and win[1] <= gc[1] <= win[3])

    def test_crop_batch_shapes(self):
        from pyannote_video_tpu.train import train_refiner as tr

        rng = np.random.default_rng(4)
        miner = tr.ServeMiner(seed=1)
        miner.refresh(n_frames=2)
        crops, labels, hard = tr.crop_batch(rng, miner, n_scenes=2)
        assert crops.ndim == 4 and crops.shape[1:] == (64, 64, 3)
        assert labels.shape == hard.shape == (crops.shape[0],)
        assert set(np.unique(labels)).issubset({0.0, 1.0})
        # hard flags only on positives
        assert float(hard[labels == 0].max(initial=0.0)) == 0.0

    @pytest.mark.slow
    def test_train_smoke(self):
        from pyannote_video_tpu.train import train_refiner as tr

        params = tr.train(steps=2, log_every=1)
        logits, _ = refiner.forward(
            params, jnp.zeros((2, refiner.CROP, refiner.CROP, 3)))
        assert logits.shape == (2,)
