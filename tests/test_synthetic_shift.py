"""Held-out eval domains (utils/synthetic_shift.py): GT stays exact under
the warp, decoys stay clear of faces, and the hook plumbing in
`synthetic_episode` is inert for the training domain."""

import numpy as np
import pytest

from pyannote_video_tpu.utils.synthetic import (
    FaceParams,
    face_landmarks,
    synthetic_episode,
)
from pyannote_video_tpu.utils.synthetic_shift import (
    DecoyDrawer,
    domain_hooks,
    novel_identity_sampler,
    render_face_warped,
)


class TestRenderFaceWarped:
    def test_identity_warp_matches_upright(self):
        """roll=0, yaw=1, shear=0 must reproduce the upright GT exactly."""
        rng = np.random.default_rng(3)
        params = FaceParams.random(rng)
        canvas = np.full((200, 200, 3), 90.0, dtype=np.float32)
        lm, box = render_face_warped(canvas, 100, 100, 90, params)
        lm_ref = face_landmarks(100, 100, 90, params)
        np.testing.assert_allclose(lm, lm_ref, atol=1e-3)
        half_w, half_h = 45 / params.aspect, 45.0
        np.testing.assert_allclose(
            box, (100 - half_w, 100 - half_h, 100 + half_w, 100 + half_h),
            atol=1e-6)

    def test_rolled_landmarks_are_rotated_upright_landmarks(self):
        rng = np.random.default_rng(4)
        params = FaceParams.random(rng)
        canvas = np.full((240, 240, 3), 90.0, dtype=np.float32)
        roll = 25.0
        lm, box = render_face_warped(canvas, 120, 120, 100, params,
                                     roll_deg=roll)
        th = np.deg2rad(roll)
        rot = np.array([[np.cos(th), -np.sin(th)],
                        [np.sin(th), np.cos(th)]])
        lm_ref = (face_landmarks(120, 120, 100, params)
                  - [120, 120]) @ rot.T + [120, 120]
        np.testing.assert_allclose(lm, lm_ref, atol=1e-3)
        # GT box bounds the warped face: all landmarks inside
        assert lm[:, 0].min() >= box[0] - 1 and lm[:, 0].max() <= box[2] + 1
        assert lm[:, 1].min() >= box[1] - 1 and lm[:, 1].max() <= box[3] + 1

    def test_composite_touches_only_warped_extent(self):
        rng = np.random.default_rng(5)
        params = FaceParams.random(rng)
        canvas = np.full((240, 240, 3), 90.0, dtype=np.float32)
        _, box = render_face_warped(canvas, 120, 120, 100, params,
                                    roll_deg=-18, yaw_scale=0.85)
        changed = np.argwhere(np.abs(canvas[..., 0] - 90.0) > 1e-4)
        assert len(changed) > 500  # the face was actually drawn
        ys, xs = changed[:, 0], changed[:, 1]
        # nothing outside the warped patch bound is modified (2px slack)
        assert xs.min() >= box[0] - 4 and xs.max() <= box[2] + 4
        assert ys.min() >= box[1] - 4 and ys.max() <= box[3] + 4

    def test_occlusion_paints_over_face(self):
        rng = np.random.default_rng(6)
        params = FaceParams.random(rng)
        canvas = np.full((240, 240, 3), 90.0, dtype=np.float32)
        shade = np.array([11.0, 22.0, 33.0])
        _, box = render_face_warped(canvas, 120, 120, 100, params,
                                    occlusion=("bottom", 0.2, shade))
        l, t, r, b = box
        band = canvas[int(b - (b - t) * 0.1):int(b) - 1,
                      int(l) + 2:int(r) - 2]
        assert np.allclose(band, shade)


class TestDomains:
    def test_domain_a_is_inert(self):
        assert domain_hooks("A") == {}
        with pytest.raises(ValueError):
            domain_hooks("Z")

    def test_novel_sampler_leaves_training_range(self):
        """Over many draws the novel sampler must produce parameters the
        training sampler (`FaceParams.random`) cannot."""
        rng = np.random.default_rng(7)
        aspects = [novel_identity_sampler(rng).aspect for _ in range(200)]
        assert min(aspects) < 1.15 and max(aspects) > 1.45

    @pytest.mark.parametrize("domain", ["B", "C", "BC"])
    def test_episode_generates(self, domain):
        ep = synthetic_episode(n_shots=3, shot_frames=5, width=256,
                               height=192, n_identities=2, seed=12,
                               **domain_hooks(domain))
        assert ep.frames.shape == (15, 192, 256, 3)
        assert len(ep.faces) == 15
        for f in ep.faces:
            l, t, r, b = f.box
            assert r > l and b > t
            assert f.landmarks.shape == (68, 2)

    def test_domain_b_actually_rolls(self):
        """Across shots, domain B must produce materially non-upright
        faces (eye line rotated >8° somewhere)."""
        ep = synthetic_episode(n_shots=6, shot_frames=3, width=256,
                               height=192, n_identities=3, seed=1,
                               **domain_hooks("B"))
        max_roll = 0.0
        for f in ep.faces:
            le = f.landmarks[36:42].mean(0)
            re = f.landmarks[42:48].mean(0)
            roll = abs(np.degrees(np.arctan2(re[1] - le[1], re[0] - le[0])))
            max_roll = max(max_roll, min(roll, 180 - roll))
        assert max_roll > 8.0

    def test_decoys_do_not_touch_faces(self):
        drawer = DecoyDrawer(per_shot=3)
        rng = np.random.default_rng(8)
        canvas = np.zeros((192, 256, 3), dtype=np.float32)
        face_box = (60.0, 40.0, 190.0, 170.0)
        drawer(canvas, rng, 0, 0, [face_box])
        l, t, r, b = map(int, face_box)
        assert np.all(canvas[t:b, l:r] == 0.0)

    def test_domain_c_changes_photometry_not_gt(self):
        base = synthetic_episode(n_shots=2, shot_frames=4, width=256,
                                 height=192, n_identities=2, seed=5)
        shifted = synthetic_episode(n_shots=2, shot_frames=4, width=256,
                                    height=192, n_identities=2, seed=5,
                                    frame_post=domain_hooks("C")["frame_post"])
        # identical ground truth, different pixels
        for a, b in zip(base.faces, shifted.faces):
            assert a.box == b.box
        assert not np.array_equal(base.frames, shifted.frames)
