"""Tests for the model stack: detector, landmarks, chip, embedder, fused."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyannote_video_tpu.models import detector as det
from pyannote_video_tpu.models import embedder as emb
from pyannote_video_tpu.models.chip import (
    box_to_landmarks,
    canonical_chip_landmarks,
    chip_transforms,
    extract_chips,
    extract_chips_yuv,
)
from pyannote_video_tpu.models.weights import (
    DETECTOR_FILE,
    EMBEDDER_FILE,
    LANDMARKS_FILE,
)
from pyannote_video_tpu.utils.synthetic import synthetic_episode


def iou_xyxy(a, b):
    ix0, iy0 = max(a[0], b[0]), max(a[1], b[1])
    ix1, iy1 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0, ix1 - ix0) * max(0, iy1 - iy0)
    union = (
        (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    )
    return inter / union


@pytest.fixture(scope="module")
def episode():
    return synthetic_episode(
        n_shots=2, shot_frames=8, width=160, height=120, seed=21,
        face_height_ratio=0.45,
    )


class TestDetector:
    @pytest.mark.slow
    def test_forward_shapes(self):
        p = det.init_params(jax.random.PRNGKey(0))
        maps, _ = det.forward_maps(p, jnp.zeros((2, 64, 64, 3)))
        assert maps.shape == (2, 8, 8, 5)

    def test_pyramid_scales(self):
        scales = det.pyramid_scales(720, 1280)
        assert scales[0] == 1.0
        assert all(s1 > s2 for s1, s2 in zip(scales, scales[1:]))
        assert 720 * scales[-1] >= det.WINDOW
        up = det.pyramid_scales(720, 1280, upsample=1)
        assert up[0] == 2.0

    @pytest.mark.skipif(not DETECTOR_FILE.exists(), reason="no trained weights")
    def test_detects_synthetic_faces(self, episode):
        d = det.FaceDetector()
        hits, total = 0, 0
        for f in range(0, 16, 4):
            gt = episode.faces_at(f)[0].box
            boxes = d.detect_batch(episode.frames[f][None])[0]
            total += 1
            if any(iou_xyxy(b, gt) > 0.5 for b in boxes):
                hits += 1
        assert hits >= total - 1  # allow one miss

    @pytest.mark.skipif(not DETECTOR_FILE.exists(), reason="no trained weights")
    def test_no_faces_on_background(self):
        from pyannote_video_tpu.utils.synthetic import _background

        rng = np.random.default_rng(5)
        d = det.FaceDetector()  # default threshold
        false_positives = 0
        for _ in range(4):
            frame = _background(160, 120, rng).astype(np.uint8)
            false_positives += len(d.detect_batch(frame[None])[0])
        assert false_positives <= 2  # rare noise at the default threshold

    @pytest.mark.parametrize("hw", [(64, 64), (63, 65), (50, 88)])
    def test_s2d_stem_matches_plain(self, hw):
        """The space-to-depth stem is an EXACT reformulation of the
        stride-2 5×5 first conv (`detector.s2d_stem_weights`) — including
        odd level dims, which even-pad like the conv's own high padding."""
        p = det.init_params(jax.random.PRNGKey(3))
        rng = np.random.default_rng(3)
        x = jnp.asarray(
            rng.uniform(0, 255, size=(2, *hw, 3)).astype(np.float32))
        plain, _ = det.forward_maps(p, x, compute_dtype=jnp.float32)
        p2 = det.with_s2d_stem(p)
        assert "c1_s2d" in p2
        s2d, _ = det.forward_maps(p2, x, compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(s2d), np.asarray(plain),
                                   atol=2e-4)

    def test_s2d_train_mode_uses_canonical_stem(self):
        """Training must ignore the derived stem (BN stats and gradients
        flow through the canonical 5×5 conv)."""
        p = det.with_s2d_stem(det.init_params(jax.random.PRNGKey(0)))
        maps, newp = det.forward_maps(p, jnp.zeros((1, 64, 64, 3)),
                                      train=True)
        assert maps.shape == (1, 8, 8, 5)
        assert "c1_s2d" in newp  # passed through untouched


class TestChip:
    def test_canonical_layout(self):
        pts = canonical_chip_landmarks()
        assert pts.shape == (68, 2)
        assert pts.min() > 0 and pts.max() < 150
        # face occupies the middle 2/3 (padding 0.25)
        assert 20 < pts[:, 0].min() < 60

    def test_chip_transform_roundtrip(self):
        # landmarks exactly at canonical positions -> identity-ish transform
        target = canonical_chip_landmarks()
        m = np.asarray(chip_transforms(jnp.asarray(target[None])))[0]
        np.testing.assert_allclose(m, [[1, 0, 0], [0, 1, 0]], atol=1e-4)

    def test_extract_chip_shape_and_content(self, episode):
        obs = episode.faces_at(0)[0]
        chips = extract_chips(
            jnp.asarray(episode.frames[:1]),
            jnp.asarray([0], dtype=jnp.int32),
            jnp.asarray(obs.landmarks[None]),
        )
        assert chips.shape == (1, 150, 150, 3)
        chip = np.asarray(chips[0])
        # center of the chip should contain the face (skin tone), not
        # background — check it differs from the frame corner
        center = chip[60:90, 60:90].mean(axis=(0, 1))
        ident = episode.identities[obs.face_id]
        assert np.abs(center - np.asarray(ident.skin)).mean() < 60

    def test_extract_chips_yuv_matches_rgb_path(self, episode):
        # chips cut from YUV 4:2:0 planes must match the RGB path applied
        # to the SAME 4:2:0 content (full-frame yuv420_to_rgb, then chip
        # cut — what the streaming path used before this kernel).  The
        # residual is chroma siting only: half-res bilinear at the chip
        # grid vs nearest 2x upsample at the frame grid.
        from pyannote_video_tpu.ops.color import rgb_to_yuv420, yuv420_to_rgb

        obs = episode.faces_at(0)[0]
        frames = episode.frames[:1]
        fidx = jnp.asarray([0], dtype=jnp.int32)
        lms = jnp.asarray(obs.landmarks[None])
        y, u, v = rgb_to_yuv420(frames)
        yj, uj, vj = jnp.asarray(y), jnp.asarray(u), jnp.asarray(v)
        rec = jnp.round(yuv420_to_rgb(yj, uj, vj)).astype(jnp.uint8)
        ref = np.asarray(extract_chips(rec, fidx, lms))
        got = np.asarray(extract_chips_yuv(yj, uj, vj, fidx, lms))
        assert got.shape == ref.shape == (1, 150, 150, 3)
        assert np.abs(got - ref).mean() < 3.0
        assert np.percentile(np.abs(got - ref), 99) < 20.0

    def test_box_to_landmarks_inside_box(self):
        boxes = jnp.asarray([[10.0, 20.0, 110.0, 140.0]])
        lm = np.asarray(box_to_landmarks(boxes))[0]
        assert lm[:, 0].min() >= 9.0 and lm[:, 0].max() <= 111.0
        assert lm[:, 1].min() >= 19.0 and lm[:, 1].max() <= 141.0


class TestEmbedder:
    @pytest.mark.slow
    def test_forward_shape_and_determinism(self):
        p = emb.init_params(jax.random.PRNGKey(0), width=0.25)
        chips = jnp.asarray(
            np.random.default_rng(0).integers(0, 255, (3, 150, 150, 3)),
            dtype=jnp.float32,
        )
        e1 = np.asarray(emb.embed(p, chips))
        e2 = np.asarray(emb.embed(p, chips))
        assert e1.shape == (3, 128)
        np.testing.assert_array_equal(e1, e2)

    @pytest.mark.skipif(not EMBEDDER_FILE.exists(), reason="no trained weights")
    def test_identity_separation(self):
        from pyannote_video_tpu.train import data as tdata
        from pyannote_video_tpu.models.weights import default_embedder_params
        from pyannote_video_tpu.ops.distance import pairwise_dist

        rng = np.random.default_rng(11)
        fresh = tdata.identity_bank(8, seed=4242)  # unseen identities
        chips, labels = tdata.embedding_batch(rng, fresh, n_ident=4,
                                              per_ident=3)
        params = default_embedder_params()
        e = np.asarray(emb.embed(params, jnp.asarray(chips, jnp.float32)))
        d = np.asarray(pairwise_dist(jnp.asarray(e)))
        same = labels[:, None] == labels[None, :]
        np.fill_diagonal(same, False)
        diff = ~(labels[:, None] == labels[None, :])
        assert d[same].mean() < d[diff].mean() * 0.75


class TestLandmarks:
    @pytest.mark.skipif(not LANDMARKS_FILE.exists(), reason="no trained weights")
    def test_cascade_beats_mean_shape(self, episode):
        from pyannote_video_tpu.models.landmarks import LandmarkPredictor

        predictor = LandmarkPredictor()
        obs = episode.faces_at(0)[0]
        # jitter the box like a noisy detector
        l, t, r, b = obs.box
        w, h = r - l, b - t
        box = np.asarray([[l + 0.04 * w, t - 0.03 * h,
                           r + 0.02 * w, b + 0.05 * h]], dtype=np.float32)
        pred = predictor.predict_batch(
            episode.frames[:1], np.asarray([0]), box
        )[0]
        err_cascade = np.linalg.norm(pred - obs.landmarks, axis=1).mean()

        mean_pred = np.asarray(box_to_landmarks(jnp.asarray(box)))[0]
        err_mean = np.linalg.norm(mean_pred - obs.landmarks, axis=1).mean()
        assert err_cascade < err_mean * 0.7
        assert err_cascade < 0.05 * h  # within 5% of face height

    def test_mean_shape_fallback(self, episode):
        from pyannote_video_tpu.models.landmarks import (
            LandmarkPredictor,
            mean_shape_only,
        )

        predictor = LandmarkPredictor(params=mean_shape_only())
        box = np.asarray([[40.0, 20.0, 100.0, 100.0]], dtype=np.float32)
        pred = predictor.predict_batch(episode.frames[:1], np.asarray([0]), box)
        assert pred.shape == (1, 68, 2)


class TestFused:
    @pytest.mark.skipif(not DETECTOR_FILE.exists(), reason="no trained weights")
    @pytest.mark.slow
    def test_fused_pipeline_end_to_end(self, episode):
        from pyannote_video_tpu.models.fused import FusedFacePipeline

        pipe = FusedFacePipeline(max_faces=4)
        out = pipe(episode.frames[:2])
        assert out.boxes.shape == (2, 4, 4)
        assert out.embeddings.shape == (2, 4, 128)
        valid = np.asarray(out.valid)
        boxes = np.asarray(out.boxes)
        # at least one valid face found per frame, overlapping GT
        for fidx in range(2):
            gt = episode.faces_at(fidx)[0].box
            found = [
                iou_xyxy(boxes[fidx, k], gt)
                for k in range(4) if valid[fidx, k]
            ]
            assert found and max(found) > 0.4


class TestDlibConvert:
    """Round-trip the container walks through the mirror serializer
    (write → convert → forward); dlib's primitive wire format is exact for
    float32, so conversions must be bit-faithful."""

    def test_primitive_roundtrip(self, tmp_path):
        import io
        from pyannote_video_tpu.models.dlib_convert import DlibReader, DlibWriter

        buf = io.BytesIO()
        w = DlibWriter(buf)
        ints = [0, 1, -1, 255, -256, 2**31 - 1, -(2**31), 2**53]
        for v in ints:
            w.write_int(v)
        w.write_uint(0)
        w.write_uint(2**40)
        floats = [0.0, 1.0, -1.5, 3.14159265, 1e-20, -7e11]
        for v in floats:
            w.write_float(v)
        w.write_string("shape_predictor")
        mat = np.random.default_rng(0).normal(size=(5, 3)).astype(np.float32)
        w.write_matrix(mat)

        buf.seek(0)
        r = DlibReader(buf)
        for v in ints:
            assert r.read_int() == v
        assert r.read_uint() == 0
        assert r.read_uint() == 2**40
        for v in floats:
            assert r.read_float() == np.float32(v)
        assert r.read_string() == "shape_predictor"
        np.testing.assert_array_equal(r.read_matrix(), mat)

    @pytest.mark.slow

    def test_shape_predictor_roundtrip(self, tmp_path, episode):
        from pyannote_video_tpu.models.dlib_convert import (
            convert_shape_predictor, write_shape_predictor,
        )
        from pyannote_video_tpu.models.landmarks import (
            LandmarkPredictor, predict_crops,
        )
        from pyannote_video_tpu.ops.color import to_gray
        import jax.numpy as jnp

        orig = LandmarkPredictor().params  # packaged synthetic cascade
        path = str(tmp_path / "toy_shape_predictor.dat")
        write_shape_predictor(path, orig)
        conv = convert_shape_predictor(path)

        assert conv["n_stages"] == int(orig["n_stages"])
        assert conv["depth"] == int(orig["depth"])
        # sampling mode is NOT part of dlib's wire format: a re-imported
        # cascade must serve all-nearest (dlib's sampling), whatever the
        # exported one used
        assert conv["bilinear_tail"] == 0
        meta_keys = ("n_stages", "depth", "bilinear_tail")
        for k in orig:
            if k in meta_keys:
                continue
            np.testing.assert_allclose(
                np.asarray(conv[k]), np.asarray(orig[k]),
                rtol=0, atol=1e-6, err_msg=k,
            )

        # converted weights predict identically on a real image (sampling
        # mode pinned to the original's — it is orthogonal to the weights)
        grays = to_gray(jnp.asarray(episode.frames[:1]))
        box = np.asarray([episode.faces_at(0)[0].box], np.float32)
        fidx = jnp.zeros((1,), jnp.int32)
        lm_orig = np.asarray(predict_crops(
            {k: jnp.asarray(v) if not np.isscalar(v) else v
             for k, v in orig.items()}, grays, fidx, jnp.asarray(box)))
        conv_j = {k: (v if k in meta_keys else jnp.asarray(v))
                  for k, v in conv.items()}
        conv_j["bilinear_tail"] = int(orig.get(
            "bilinear_tail", int(orig["n_stages"])))
        lm_conv = np.asarray(predict_crops(conv_j, grays, fidx,
                                           jnp.asarray(box)))
        np.testing.assert_allclose(lm_conv, lm_orig, atol=1e-3)

    def test_mmod_detector_roundtrip(self, tmp_path):
        import jax
        import jax.numpy as jnp
        from pyannote_video_tpu.models import detector
        from pyannote_video_tpu.models.dlib_convert import (
            convert_mmod_detector, write_mmod_detector,
        )

        orig = detector.init_params(jax.random.PRNGKey(7))
        meta = {"avg_rgb": (122.0, 117.0, 104.0),
                "windows": [(40, 40, "face")],
                "loss_per_false_alarm": 1.0,
                "loss_per_missed_target": 2.0,
                "truth_match_iou_threshold": 0.5,
                "overlaps_nms": (0.4, 1.0),
                "overlaps_ignore": (0.5, 0.95)}
        path = str(tmp_path / "toy_mmod.dat")
        write_mmod_detector(path, orig, meta=meta)
        conv = convert_mmod_detector(path)

        # conv/affine weights survive the wire format
        for ck in ("c1", "c2", "c3", "c4", "c5", "c6"):
            np.testing.assert_allclose(conv[ck]["w"], np.asarray(orig[ck]["w"]),
                                       rtol=1e-6, atol=1e-6, err_msg=ck)
        # metadata round-trips
        assert conv["mmod_meta"]["windows"] == [(40, 40, "face")]
        np.testing.assert_allclose(conv["mmod_meta"]["avg_rgb"],
                                   (122.0, 117.0, 104.0))
        assert conv["mmod_meta"]["overlaps_ignore"][1] == pytest.approx(0.95)

        # head: dlib's single score channel lands in channel 0; the 4
        # regression channels are zeroed (=> exp(0): fixed-window MMOD
        # decoding semantics)
        np.testing.assert_allclose(conv["head"]["w"][..., 0],
                                   np.asarray(orig["head"]["w"])[..., 0],
                                   rtol=1e-6, atol=1e-6)
        assert not conv["head"]["w"][..., 1:].any()
        assert not conv["head"]["b"][1:].any()

        # forward parity on the SCORE channel (float32 to isolate the
        # weight mapping from bf16 rounding)
        rng = np.random.default_rng(2)
        img = jnp.asarray(rng.integers(0, 255, (1, 64, 64, 3)),
                          dtype=jnp.float32)
        maps_o, _ = detector.forward_maps(orig, img, train=False,
                                          compute_dtype=jnp.float32)
        conv_params = {k: jax.tree_util.tree_map(jnp.asarray, v)
                       for k, v in conv.items() if k != "mmod_meta"}
        maps_c, _ = detector.forward_maps(conv_params, img, train=False,
                                          compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(maps_c[..., 0]),
                                   np.asarray(maps_o[..., 0]),
                                   rtol=1e-4, atol=1e-4)
        assert np.abs(np.asarray(maps_c[..., 1:])).max() == 0.0

    def test_resnet29_roundtrip(self, tmp_path):
        import jax
        import jax.numpy as jnp
        from pyannote_video_tpu.models import embedder
        from pyannote_video_tpu.models.dlib_convert import (
            convert_face_recognition, write_face_recognition,
        )

        orig = embedder.init_params(jax.random.PRNGKey(3), width=0.125)
        path = str(tmp_path / "toy_resnet29.dat")
        write_face_recognition(path, orig)
        conv = convert_face_recognition(path)

        rng = np.random.default_rng(1)
        chips = jnp.asarray(
            rng.integers(0, 255, (2, 150, 150, 3)), dtype=jnp.float32
        )
        emb_orig, _ = embedder.forward(orig, chips, train=False,
                                       compute_dtype=jnp.float32)
        conv_j = jax.tree_util.tree_map(jnp.asarray, conv)
        emb_conv, _ = embedder.forward(conv_j, chips, train=False,
                                       compute_dtype=jnp.float32)
        emb_orig = np.asarray(emb_orig)
        emb_conv = np.asarray(emb_conv)
        cos = np.sum(emb_orig * emb_conv, axis=1) / (
            np.linalg.norm(emb_orig, axis=1)
            * np.linalg.norm(emb_conv, axis=1)
        )
        # BASELINE.md parity bar: cosine distance <= 1e-3; the round-trip
        # through the exact wire format should be far tighter
        assert np.all(1.0 - cos <= 1e-5), cos

        # NORM-sensitive parity: dlib nets emit UNnormalised embeddings
        # (the 0.6 Euclidean clustering threshold is calibrated on those),
        # so converted params must carry normalized_head=0 and forward()
        # must NOT rescale them.  Compare in Euclidean terms against the
        # raw (un-normalised) head of the original weights.
        assert float(conv_j["normalized_head"]) == 0.0
        raw = dict(orig)
        raw["normalized_head"] = jnp.zeros(())
        emb_raw, _ = embedder.forward(raw, chips, train=False,
                                      compute_dtype=jnp.float32)
        emb_raw = np.asarray(emb_raw)
        np.testing.assert_allclose(emb_conv, emb_raw, rtol=5e-3, atol=1e-2)
        # and the raw head is genuinely un-normalised for these weights
        # (guards against the flag being silently ignored)
        assert not np.allclose(np.linalg.norm(emb_conv, axis=1), 1.0,
                               atol=1e-3)
        # the packaged/synthetic path (no flag) still normalises
        np.testing.assert_allclose(np.linalg.norm(emb_orig, axis=1), 1.0,
                                   atol=1e-5)


class TestTrainData:
    def test_detection_batch_superscale_bounds(self):
        from pyannote_video_tpu.train import data as tdata
        from pyannote_video_tpu.models.detector import WINDOW

        rng = np.random.default_rng(5)
        frames, boxes = tdata.detection_batch(rng, batch=12, height=128,
                                              width=128)
        assert frames.shape == (12, 128, 128, 3)
        assert frames.dtype == np.uint8
        n_faces = 0
        for gt in boxes:
            for (l, t, r, b) in gt:
                n_faces += 1
                # boxes stay inside the (possibly downscaled) crop ...
                assert -1.0 <= l < r <= 129.0
                assert -1.0 <= t < b <= 129.0
                # ... and face heights stay inside the detector's window
                # band regardless of the render super-scale.  Pre-affine
                # heights are WINDOW·U(0.85, 1.2); the pose affine then
                # scales vertically by AUG_YSCALE (0.85, 1.18) with
                # roll/shear mixing — the invariant is the product band
                assert WINDOW * 0.6 <= (b - t) <= WINDOW * 1.2 * 1.18 * 1.05
        assert n_faces > 0

    def test_hard_negative_miner(self):
        """Serve-scale mining (train/mine.py): negative frames render at
        frame scale, the miner harvests crops around high-scoring pyramid
        cells of the CURRENT params, and sampled crops are batch-shaped
        all-negative training inputs.  No eval-shift import (hygiene is
        structural: mine.py renders via train.data families only)."""
        import pyannote_video_tpu.train.mine as mine
        from pyannote_video_tpu.models.weights import default_detector_params

        assert "synthetic_shift" not in {
            m.split(".")[-1] for m in dir(mine)}
        rng = np.random.default_rng(3)
        fr = mine.negative_frame(rng)
        assert fr.shape == (mine.MINE_H, mine.MINE_W, 3)
        assert fr.dtype == np.uint8

        # mechanism check with a RANDOM-init detector (fires on plenty of
        # cells by construction).  The packaged weights are no longer a
        # valid probe here: the r5 stage-1 was itself trained with this
        # serve-scale miner in the loop, so 2 frames of fresh distractors
        # can legitimately yield zero cells above the hinge target.
        from pyannote_video_tpu.models import detector as det_mod

        miner = mine.HardNegativeMiner(frames_per_refresh=2, seed=3)
        found = miner.refresh(det_mod.init_params(jax.random.PRNGKey(5)))
        assert found > 0 and len(miner) == found
        assert miner.last_max_logit > mine.MINE_MIN_LOGIT
        crops = miner.sample(rng, 4)
        assert crops and all(
            c.shape == (128, 128, 3) and c.dtype == np.uint8 for c in crops)
        # packaged weights still go through the same path without error
        miner2 = mine.HardNegativeMiner(frames_per_refresh=2, seed=3)
        found2 = miner2.refresh(default_detector_params())
        assert found2 >= 0 and len(miner2) == found2

        # hard-positive side: frame-scale faces the serve pyramid
        # under-scores come back as (crop, level-mapped GT box) pairs
        fr2, gt = mine.positive_frame(rng)
        assert fr2.shape == (mine.MINE_H, mine.MINE_W, 3) and len(gt) <= 1
        n_pos = 0
        for _ in range(4):  # the affine can drop a frame's face
            # random init under-scores every face — mechanism check only
            # (the packaged r5 stage-1 mines its own positives to zero)
            n_pos += miner.refresh_positives(
                det_mod.init_params(jax.random.PRNGKey(5)))
            if n_pos:
                break
        assert n_pos > 0
        (patch, box), = miner.sample_pos(rng, 1)
        assert patch.shape == (128, 128, 3) and patch.dtype == np.uint8
        l, t, r, b = box
        assert l < r and t < b
        # the mined box is window-banded at its level and its center is
        # inside the crop (that is the cell the harvest centered on)
        assert mine.WINDOW * 0.5 <= (b - t) <= mine.WINDOW * 1.5
        assert 0 <= (l + r) / 2 <= 128 and 0 <= (t + b) / 2 <= 128

    def test_embedding_batch_resample_range(self):
        from pyannote_video_tpu.train import data as tdata

        rng = np.random.default_rng(6)
        bank = tdata.identity_bank(6, seed=9)
        chips, labels = tdata.embedding_batch(rng, bank, n_ident=3,
                                              per_ident=2)
        assert chips.shape == (6, 150, 150, 3)
        assert chips.dtype == np.uint8
        assert set(np.asarray(labels)) <= set(bank)

    def test_no_arg_ctor_uses_packaged_weights(self):
        # regression: FaceEmbedder() used to random-initialise, so the CLI
        # extract path (`FaceEmbedder(embedding_model or None)`) silently
        # produced untrained embeddings
        import pytest
        from pyannote_video_tpu.models.weights import EMBEDDER_FILE
        if not EMBEDDER_FILE.exists():
            pytest.skip("no packaged weights")
        from pyannote_video_tpu.models.embedder import FaceEmbedder
        from pyannote_video_tpu.models.weights import default_embedder_params
        a = FaceEmbedder().params
        b = default_embedder_params()
        np.testing.assert_array_equal(np.asarray(a["fc"]), np.asarray(b["fc"]))

    def test_unseen_identity_absolute_margins(self):
        # the 0.6 clustering threshold must hold in ABSOLUTE distance for
        # identities outside the training bank (round-2 regression: an
        # unnormalised head embedded unseen identities at distances 10-40)
        import pytest
        from pyannote_video_tpu.models.weights import EMBEDDER_FILE
        if not EMBEDDER_FILE.exists():
            pytest.skip("no packaged weights")
        from pyannote_video_tpu.models import embedder as emb_mod
        from pyannote_video_tpu.models.weights import default_embedder_params
        from pyannote_video_tpu.train import data as tdata

        params = default_embedder_params()
        rng = np.random.default_rng(31337)
        bank = tdata.identity_bank(8, seed=31337)  # unseen (train seed 1)
        chips, labels = tdata.embedding_batch(rng, bank, n_ident=6,
                                              per_ident=4)
        e = np.asarray(emb_mod.embed(params, jnp.asarray(chips, jnp.float32)))
        # normalised head: unit vectors
        np.testing.assert_allclose(np.linalg.norm(e, axis=1), 1.0, atol=1e-3)
        d = np.sqrt(((e[:, None] - e[None]) ** 2).sum(-1))
        same = labels[:, None] == labels[None, :]
        np.fill_diagonal(same, False)
        diff = ~(labels[:, None] == labels[None, :])
        # comfortable slack around the 0.6 operating point
        assert d[same].max() < 0.5, d[same].max()
        assert d[diff].mean() > 0.8, d[diff].mean()


class TestDetectorHeldOut:
    @pytest.mark.slow
    def test_bc_domain_recall_and_precision_at_threshold(self):
        # Regression guard for the held-out-domain operating point: on a
        # pose+photometric-shifted episode (domain BC — ranges the
        # trainers never sample, utils/synthetic_shift.py), every face on
        # a spread of detection frames must score >= DEFAULT_THRESHOLD,
        # and nothing off-face may reach it.  Guards the train/serve
        # resample match (chained-pyramid downscale) and the threshold
        # calibration (evals/probe_detector.py).
        from pyannote_video_tpu.models.detector import FaceDetector
        from pyannote_video_tpu.utils.synthetic import synthetic_episode
        from pyannote_video_tpu.utils.synthetic_shift import domain_hooks

        det = FaceDetector()  # packaged weights, DEFAULT_THRESHOLD
        ep = synthetic_episode(n_shots=6, shot_frames=4, width=480,
                               height=360, n_identities=3, seed=101,
                               **domain_hooks("BC"))
        frames = ep.frames[::4]  # first frame of each shot
        per_frame = det.detect_batch(frames)  # the tracking-engine entry
        for k, boxes in enumerate(per_frame):
            gt = [f.box for f in ep.faces_at(k * 4)]
            found = [False] * len(gt)
            for b in boxes:
                bc = ((b[0] + b[2]) / 2, (b[1] + b[3]) / 2)
                hit = False
                for gi, g in enumerate(gt):
                    if g[0] <= bc[0] <= g[2] and g[1] <= bc[1] <= g[3]:
                        found[gi] = hit = True
                assert hit, f"frame {k}: off-face detection at {bc}"
            assert all(found), f"frame {k}: missed face(s) {found}"
