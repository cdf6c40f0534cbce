"""End-to-end quality evaluation on synthetic episodes with ground truth.

Runs the full reference pipeline (shots → tracking → landmarks/embeddings →
clustering) on procedurally generated episodes and reports the BASELINE.md
quality metrics: shot-boundary F1, per-frame track F1, cluster purity.
No media files exist in this environment, so this harness stands in for the
pyannote-data sample episode protocol (BASELINE.md "Measurement protocol").

Usage:  python evals/eval_synthetic.py [seed]
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
from pyannote_video_tpu.utils.metrics import (
    boundary_f1,
    cluster_purity,
    track_frame_f1,
)
from pyannote_video_tpu.utils.synthetic import synthetic_episode
from pyannote_video_tpu.core import formats


def evaluate(seed: int = 101, n_shots: int = 4, shot_frames: int = 24,
             width: int = 160, height: int = 120) -> dict:
    import jax.numpy as jnp

    ep = synthetic_episode(
        n_shots=n_shots, shot_frames=shot_frames, width=width, height=height,
        seed=seed, face_height_ratio=0.45, n_identities=2,
    )
    video = Video(ep.frames, fps=ep.fps)
    t_start = time.time()

    # --- shots -----------------------------------------------------------
    shots = list(Shot(video, threshold=2.0))
    bf1 = boundary_f1([s.end for s in shots[:-1]], ep.cuts,
                      tolerance=1.5 / ep.fps)

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
    truth_ident = {}
    for f in range(len(ep.frames)):
        t = round(f / ep.fps, 5)
        truth[t] = [o.box for o in ep.faces_at(f)]
    tf1 = track_frame_f1(predicted, truth)

    # --- embeddings per track (landmark-aligned) ---------------------------
    predictor = LandmarkPredictor()
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

    path = tempfile.mktemp()
    with open(path, "w") as fp:
        for tid, entries in emb_by_track.items():
            for t, e in entries:
                formats.write_embedding_line(fp, t, tid, e)
    clustering = FaceClustering(threshold=0.6)
    sp, feats = clustering.model.preprocess(path)
    result = clustering(sp, features=feats)
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
                from pyannote_video_tpu.utils.metrics import iou_xyxy

                if iou_xyxy(box, o.box) > 0.3:
                    votes[o.face_id] = votes.get(o.face_id, 0) + 1
        truth_ident[tid] = max(votes, key=votes.get) if votes else -1
    purity = cluster_purity(assignment, truth_ident)

    wall = time.time() - t_start
    return {
        "seed": seed,
        "boundary_f1": round(bf1["f1"], 3),
        "track_f1": round(tf1["f1"], 3),
        "track_precision": round(tf1["precision"], 3),
        "track_recall": round(tf1["recall"], 3),
        "cluster_purity": round(purity, 3),
        "n_tracks": len(tracks),
        "wall_s": round(wall, 1),
    }


if __name__ == "__main__":
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 101
    print(json.dumps(evaluate(seed=seed)))
