"""CLI tests: both scripts end-to-end on a synthetic encoded clip."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from pyannote_video_tpu.core import Segment, Timeline, dump, load
from pyannote_video_tpu.core import formats
from pyannote_video_tpu.models.weights import (
    DETECTOR_FILE,
    EMBEDDER_FILE,
    LANDMARKS_FILE,
)
from pyannote_video_tpu.utils.synthetic import synthetic_episode, write_synthetic_video

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(script, *args):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", script), *args],
        capture_output=True, text=True, env=env, timeout=560,
    )
    return result


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    pytest.importorskip("cv2")
    path = str(tmp_path_factory.mktemp("cli") / "ep.avi")
    ep = synthetic_episode(
        n_shots=2, shot_frames=12, width=160, height=120, seed=61,
        face_height_ratio=0.45,
    )
    write_synthetic_video(path, ep)
    return path, ep


class TestStructureCli:
    def test_help_and_version(self):
        r = run_cli("pyannote-structure.py", "--help")
        assert r.returncode == 0
        assert "Usage:" in r.stdout
        assert "shot" in r.stdout and "thread" in r.stdout and "scene" in r.stdout
        r = run_cli("pyannote-structure.py", "--version")
        assert "pyannote-structure" in r.stdout

    def test_shot_command(self, clip, tmp_path):
        path, ep = clip
        out = str(tmp_path / "shot.json")
        r = run_cli("pyannote-structure.py", "shot", "--threshold=2.0",
                    path, out)
        assert r.returncode == 0, r.stderr[-2000:]
        with open(out) as fp:
            timeline = load(fp)
        assert isinstance(timeline, Timeline)
        assert len(timeline) == 2
        assert abs(timeline[0].end - ep.cuts[0]) < 0.1

    def test_unknown_option_fails(self, clip, tmp_path):
        path, _ = clip
        r = run_cli("pyannote-structure.py", "shot", "--bogus", path,
                    str(tmp_path / "x.json"))
        assert r.returncode != 0


@pytest.mark.skipif(not DETECTOR_FILE.exists(), reason="no trained weights")
class TestFaceCli:
    @pytest.mark.slow
    def test_track_extract_demo_chain(self, clip, tmp_path):
        path, ep = clip
        shot_json = str(tmp_path / "shot.json")
        with open(shot_json, "w") as fp:
            dump(Timeline([Segment(s, e) for s, e in ep.shots]), fp)

        tracking = str(tmp_path / "tracking.txt")
        r = run_cli("pyannote-face.py", "track", "--every=0.2",
                    path, shot_json, tracking)
        assert r.returncode == 0, r.stderr[-2000:]
        points = formats.read_tracking(tracking)
        assert points
        # schema: 7 whitespace fields, normalized coords
        with open(tracking) as fp:
            fields = fp.readline().split()
        assert len(fields) == 7
        assert 0.0 <= float(fields[2]) <= 1.5

        if EMBEDDER_FILE.exists() and LANDMARKS_FILE.exists():
            lmk = str(tmp_path / "landmarks.txt")
            emb = str(tmp_path / "emb.txt")
            r = run_cli("pyannote-face.py", "extract", path, tracking,
                        str(LANDMARKS_FILE), str(EMBEDDER_FILE), lmk, emb)
            assert r.returncode == 0, r.stderr[-2000:]
            lm_rows = formats.read_landmarks(lmk)
            assert lm_rows and lm_rows[0][2].shape == (68, 2)
            _, _, X = formats.read_embeddings(emb)
            assert X.shape[1] == 128

        # --resume: truncate mid-shot, resume, compare against the full run
        resumed = str(tmp_path / "resumed.txt")
        with open(tracking) as src:
            lines = src.readlines()
        with open(resumed, "w") as dst:
            dst.writelines(lines[: len(lines) // 2])
        r = run_cli("pyannote-face.py", "track", "--every=0.2", "--resume",
                    path, shot_json, resumed)
        assert r.returncode == 0, r.stderr[-2000:]
        full_rows = formats.read_tracking(tracking)
        res_rows = formats.read_tracking(resumed)
        assert len(res_rows) == len(full_rows)
        full_ts = sorted(round(p.t, 3) for p in full_rows)
        res_ts = sorted(round(p.t, 3) for p in res_rows)
        assert full_ts == res_ts

        demo_out = str(tmp_path / "demo.avi")
        r = run_cli("pyannote-face.py", "demo", "--height=120",
                    path, tracking, demo_out)
        assert r.returncode == 0, r.stderr[-2000:]
        assert os.path.getsize(demo_out) > 10000


class TestDemoGolden:
    """Pixel-level demo parity: reference 26-color palette + yields-once
    face timing (`/root/reference/scripts/pyannote-face.py:320-331,159-172`)."""

    def test_demo_palette_and_timing(self, clip, tmp_path):
        cv2 = pytest.importorskip("cv2")
        from pyannote_video_tpu.cli.face_cli import REFERENCE_COLORS, demo

        path, ep = clip
        track_id = 3
        tracking = str(tmp_path / "golden_tracking.txt")
        with open(tracking, "w") as fp:
            # ONE group, at the first frame's timestamp only
            fp.write(f"0.000 {track_id} 0.200 0.200 0.600 0.700 detection\n")
        out = str(tmp_path / "golden_demo.avi")
        demo(path, tracking, out, height=120)

        cap = cv2.VideoCapture(out)
        ok0, f0 = cap.read()
        ok1, f1 = cap.read()
        cap.release()
        assert ok0 and ok1
        f0 = f0[:, :, ::-1].astype(np.int32)  # BGR -> RGB
        f1 = f1[:, :, ::-1].astype(np.int32)

        color = np.asarray(REFERENCE_COLORS[track_id % 26], np.int32)
        # the expected rectangle: pt1=(int(.2*W), int(.2*H)),
        # pt2=(int(.6*W), int(.7*H)), thickness 2 — count palette-colored
        # pixels on its perimeter band only (the clip background may
        # contain similar colors elsewhere)
        H, W = f0.shape[:2]
        x1, y1, x2, y2 = int(.2 * W), int(.2 * H), int(.6 * W), int(.7 * H)
        band = np.zeros((H, W), bool)
        band[y1 - 2:y2 + 3, x1 - 2:x1 + 3] = True
        band[y1 - 2:y2 + 3, x2 - 2:x2 + 3] = True
        band[y1 - 2:y1 + 3, x1 - 2:x2 + 3] = True
        band[y2 - 2:y2 + 3, x1 - 2:x2 + 3] = True
        near0 = ((np.abs(f0 - color).max(axis=2) < 40) & band).sum()
        near1 = ((np.abs(f1 - color).max(axis=2) < 40) & band).sum()
        # frame 0 carries the 2px rectangle perimeter (hundreds of pixels
        # of COLORS[3], MJPG-lossy); frame 1 must NOT: the reference's
        # generator yields each timestamp group exactly once, it is not
        # held over later frames
        assert near0 > 100, near0
        assert near1 < near0 / 10, (near0, near1)
