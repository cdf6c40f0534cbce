"""End-to-end quality evaluation on synthetic episodes with ground truth.

Runs the full reference pipeline (shots → threads/scenes → tracking →
landmarks/embeddings → clustering) on a procedurally generated episode and
reports the BASELINE.md quality metrics plus structure/landmark quality:

* shot-boundary F1 (reference `structure/shot.py` semantics);
* thread pairwise-F1 and scene pairwise-F1 against the episode's camera
  pattern (reference `structure/thread.py:171-249`);
* per-frame track F1, precision, recall;
* landmark mean error (inter-ocular-normalised, vs rendered GT points);
* cluster purity AND pairwise recall — recall exposes cross-shot
  under-merging that purity alone hides (round-1 known gap).

Scale: 12 shots × 480p with 6 recurring identities (each appears in two
different shots, so same-identity cross-shot merging is actually
exercised).  No media files exist in this environment, so this harness
stands in for the pyannote-data sample episode protocol (BASELINE.md
"Measurement protocol").

Usage:  python evals/eval_synthetic.py [seed] [--faces=N] [--domain=A|B|C|BC]

Domains B/C/BC are the held-out shifted render distributions
(`utils/synthetic_shift.py`) — trainers only ever sample domain A, so
the shifted numbers measure generalisation, not memorisation.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from pyannote_video_tpu import Video
from pyannote_video_tpu.core import Segment
from pyannote_video_tpu.models.chip import extract_chips
from pyannote_video_tpu.models.embedder import FaceEmbedder
from pyannote_video_tpu.models.landmarks import LandmarkPredictor
from pyannote_video_tpu.models.weights import default_embedder_params
from pyannote_video_tpu.pipeline.clustering import FaceClustering
from pyannote_video_tpu.pipeline.face_tracking import FaceTracking
from pyannote_video_tpu.pipeline.shot import Shot
from pyannote_video_tpu.pipeline.thread import Thread, scenes_from_threads
from pyannote_video_tpu.utils.metrics import (
    boundary_f1,
    cluster_purity,
    iou_xyxy,
    pairwise_prf,
    track_frame_f1,
)
from pyannote_video_tpu.utils.synthetic import synthetic_episode
from pyannote_video_tpu.core import formats

# camera pattern: three A/B-alternating pairs → thread GT = pattern id,
# scene GT = [0]*4 + [1]*4 + [2]*4 (intertwined pairs merge into scenes)
THREAD_PATTERN = [0, 1, 0, 1, 2, 3, 2, 3, 4, 5, 4, 5]
SCENE_TRUTH = [0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2]


def _segment_label_map(annotation, shots):
    """Annotation → {shot_index: label} by segment identity."""
    seg_label = {}
    for segment, _, label in annotation.itertracks(yield_label=True):
        seg_label[(round(segment.start, 6), round(segment.end, 6))] = label
    out = {}
    for i, s in enumerate(shots):
        out[i] = seg_label.get((round(s.start, 6), round(s.end, 6)))
    return out


def evaluate(seed: int = 101, n_shots: int = 12, shot_frames: int = 20,
             width: int = 640, height: int = 480,
             n_identities: int = 6, faces_per_shot: int = 1,
             domain: str = "A") -> dict:
    """Full-pipeline eval; `domain` selects the render distribution
    ('A' = training distribution; 'B'/'C'/'BC' = held-out shifted domains
    from `utils/synthetic_shift.py` that no trainer ever samples)."""
    import jax.numpy as jnp

    from pyannote_video_tpu.utils.synthetic_shift import domain_hooks

    ep = synthetic_episode(
        n_shots=n_shots, shot_frames=shot_frames, width=width, height=height,
        seed=seed, face_height_ratio=0.35 if faces_per_shot > 1 else 0.4,
        n_identities=n_identities, faces_per_shot=faces_per_shot,
        thread_pattern=THREAD_PATTERN[:n_shots],
        **domain_hooks(domain),
    )
    video = Video(ep.frames, fps=ep.fps)
    t_start = time.time()

    # --- shots -----------------------------------------------------------
    shots = list(Shot(video, threshold=2.0))
    bf1 = boundary_f1([s.end for s in shots[:-1]], ep.cuts,
                      tolerance=1.5 / ep.fps)

    # --- threads & scenes (camera-pattern ground truth) --------------------
    gt_shots = [Segment(s, e) for s, e in ep.shots]
    threads = Thread(video, shot=gt_shots, lookahead=5)()
    thread_map = _segment_label_map(threads, gt_shots)
    thread_truth = {i: THREAD_PATTERN[i] for i in range(n_shots)}
    thread_prf = pairwise_prf(thread_map, thread_truth)

    scenes = scenes_from_threads(threads)
    # map scenes back onto shots by containment
    shot_scene = {}
    for i, s in enumerate(gt_shots):
        mid = (s.start + s.end) / 2
        for segment, _, label in scenes.itertracks(yield_label=True):
            if segment.start <= mid <= segment.end:
                shot_scene[i] = label
                break
    scene_truth = {i: SCENE_TRUTH[i] for i in range(n_shots)}
    scene_prf = pairwise_prf(shot_scene, scene_truth)

    # --- landmarks (inter-ocular-normalised mean error) --------------------
    predictor = LandmarkPredictor()
    lm_errors = []
    for shot_idx in range(n_shots):
        f = shot_idx * shot_frames + shot_frames // 2
        obs = ep.faces_at(f)[0]
        pred = predictor.predict_batch(
            ep.frames[f][None], np.zeros(1, dtype=np.int32),
            np.asarray([obs.box], dtype=np.float32))[0]
        gt = obs.landmarks
        eye_dist = np.linalg.norm(gt[36:42].mean(0) - gt[42:48].mean(0))
        lm_errors.append(
            float(np.linalg.norm(pred - gt, axis=1).mean() / eye_dist))
    landmark_err = float(np.mean(lm_errors))

    # --- tracking --------------------------------------------------------
    tracking = FaceTracking(detect_every=0.2, track_max_gap=1.0)
    tracks = list(tracking(video, shots))

    predicted = {}
    for tid, trk in enumerate(tracks):
        for t, (l, tp_, r, b), status in trk:
            predicted.setdefault(round(t, 5), []).append(
                (l * width, tp_ * height, r * width, b * height)
            )
    truth = {}
    for f in range(len(ep.frames)):
        t = round(f / ep.fps, 5)
        truth[t] = [o.box for o in ep.faces_at(f)]
    tf1 = track_frame_f1(predicted, truth)

    # --- embeddings per track (landmark-aligned) ---------------------------
    embedder = FaceEmbedder(params=default_embedder_params())
    rows = []
    for tid, trk in enumerate(tracks):
        for t, (l, tp_, r, b), status in trk:
            rows.append(formats.TrackPoint(t, tid, l, tp_, r, b, status))
    emb_by_track = {}
    for t, group in formats.iter_tracking_by_time(rows):
        f = int(round(t * ep.fps))
        if f >= len(ep.frames):
            continue
        boxes = np.asarray(
            [[p.left * width, p.top * height, p.right * width,
              p.bottom * height] for p in group], dtype=np.float32)
        lms = predictor.predict_batch(
            ep.frames[f][None], np.zeros(len(group), dtype=np.int32), boxes)
        chips = extract_chips(
            jnp.asarray(ep.frames[f][None]),
            jnp.zeros((len(group),), dtype=jnp.int32), jnp.asarray(lms))
        embs = embedder(chips)
        for p, e in zip(group, embs):
            emb_by_track.setdefault(p.identifier, []).append((t, e))

    # --- clustering --------------------------------------------------------
    import tempfile, os

    fd, path = tempfile.mkstemp(suffix=".embedding.txt")
    try:
        with os.fdopen(fd, "w") as fp:
            for tid, entries in emb_by_track.items():
                for t, e in entries:
                    formats.write_embedding_line(fp, t, tid, e)
        clustering = FaceClustering(threshold=0.6)
        sp, feats = clustering.model.preprocess(path)
        result = clustering(sp, features=feats)
    finally:
        os.remove(path)
    assignment = {int(trk): lab
                  for _, trk, lab in result.itertracks(yield_label=True)}

    # ground-truth identity per track: majority of overlapping GT boxes
    truth_ident = {}
    for tid, trk in enumerate(tracks):
        votes = {}
        for t, (l, tp_, r, b), status in trk:
            f = int(round(t * ep.fps))
            if f >= len(ep.frames):
                continue
            box = (l * width, tp_ * height, r * width, b * height)
            for o in ep.faces_at(f):
                if iou_xyxy(box, o.box) > 0.3:
                    votes[o.face_id] = votes.get(o.face_id, 0) + 1
        truth_ident[tid] = max(votes, key=votes.get) if votes else -1
    purity = cluster_purity(assignment, truth_ident)
    cluster_prf = pairwise_prf(assignment, truth_ident)

    wall = time.time() - t_start
    return {
        "seed": seed,
        "domain": domain,
        "config": f"{n_shots} shots x {shot_frames} frames @ "
                  f"{width}x{height}, {n_identities} identities, "
                  f"{faces_per_shot} face(s)/shot",
        "boundary_f1": round(bf1["f1"], 3),
        "thread_f1": round(thread_prf["f1"], 3),
        "scene_f1": round(scene_prf["f1"], 3),
        "landmark_err_interocular": round(landmark_err, 4),
        "track_f1": round(tf1["f1"], 3),
        "track_precision": round(tf1["precision"], 3),
        "track_recall": round(tf1["recall"], 3),
        "cluster_purity": round(purity, 3),
        "cluster_recall": round(cluster_prf["recall"], 3),
        "cluster_precision": round(cluster_prf["precision"], 3),
        "n_tracks": len(tracks),
        "n_clusters": len(set(assignment.values())),
        "wall_s": round(wall, 1),
    }


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    faces = 1
    domain = "A"
    for a in sys.argv[1:]:
        if a.startswith("--faces="):
            faces = int(a.split("=", 1)[1])
        if a.startswith("--domain="):
            domain = a.split("=", 1)[1]
    seed = int(args[0]) if args else 101
    print(json.dumps(evaluate(seed=seed, faces_per_shot=faces,
                              domain=domain)))
