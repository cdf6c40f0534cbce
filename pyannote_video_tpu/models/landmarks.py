"""ERT 68-point landmark predictor (Kazemi–Sullivan ensemble of
regression trees) as dense batched gathers.

TPU-native re-formulation of ``dlib.shape_predictor``
(reference `face/face.py:58,69-71`): dlib walks ~500×10 regression trees
per face in C++; data-dependent tree traversal is recast so the full
cascade runs as ONE jitted program over a *batch* of faces:

* per stage, the feature pool (pixel intensities at mean-shape-anchored
  offsets, warped by the current shape's similarity transform) is one
  batched bilinear gather ``[N_faces, pool]``;
* all trees of a stage traverse in lockstep with heap-indexed arithmetic —
  at each depth level a single gather picks every tree's split-feature
  pair, the comparison advances every (face, tree) pair simultaneously;
* leaf deltas are summed over trees (segment-sum free: one take + sum) and
  applied in the mean-shape frame.

Shape state lives in the normalized face frame ([-1, 1]² of the detection
box); anchoring/warping follows Kazemi–Sullivan §4 (similarity transform
re-indexing).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .nn import load_params
from ..ops.warp import bilinear_sample
from ..utils.synthetic import CANONICAL_LANDMARKS

N_POINTS = 68


def _similarity_to_current(mean_shape: jnp.ndarray, shape: jnp.ndarray):
    """Rotation+scale (no translation) aligning mean shape to `shape`.

    Kazemi–Sullivan re-index features relative to the current shape
    estimate via the similarity transform between mean and current shape.
    Returns a [2, 2] matrix.
    """
    ms = mean_shape - mean_shape.mean(axis=0)
    s = shape - shape.mean(axis=0)
    var = jnp.sum(ms * ms)
    a = jnp.sum(ms[:, 0] * s[:, 0] + ms[:, 1] * s[:, 1]) / jnp.maximum(var, 1e-9)
    b = jnp.sum(ms[:, 0] * s[:, 1] - ms[:, 1] * s[:, 0]) / jnp.maximum(var, 1e-9)
    return jnp.asarray([[a, -b], [b, a]], dtype=jnp.float32)


def predict_cascade(params: Dict, grays: jnp.ndarray, boxes: jnp.ndarray):
    """Run the full cascade.

    params: dict with
        mean_shape [68, 2];
        per stage s: ``s{k}/anchor`` [P] int32, ``s{k}/offset`` [P, 2],
        ``s{k}/i1`` [T, NODES] int32, ``s{k}/i2``, ``s{k}/thresh`` [T, NODES],
        ``s{k}/leaves`` [T, LEAVES, 136].
    grays: [N, H, W] float32 — one crop-aligned gray image per face is NOT
        required; faces index into their own frame via `boxes`.
    boxes: [N, 4] (left, top, right, bottom) in pixel coords of `grays[i]`.

    Returns landmarks [N, 68, 2] in pixel coords.
    """
    mean_shape = params["mean_shape"]
    n_stages = int(params["n_stages"])
    depth = int(params["depth"])
    nodes = (1 << depth) - 1

    cx = (boxes[:, 0] + boxes[:, 2]) / 2.0
    cy = (boxes[:, 1] + boxes[:, 3]) / 2.0
    half_w = jnp.maximum((boxes[:, 2] - boxes[:, 0]) / 2.0, 1.0)
    half_h = jnp.maximum((boxes[:, 3] - boxes[:, 1]) / 2.0, 1.0)

    def to_image(pts_norm, i):
        x = cx[i] + pts_norm[:, 0] * half_w[i]
        y = cy[i] + pts_norm[:, 1] * half_h[i]
        return x, y

    N = grays.shape[0]
    shape = jnp.broadcast_to(mean_shape, (N, N_POINTS, 2))

    for s in range(n_stages):
        anchor = params[f"s{s}/anchor"]      # [P]
        offset = params[f"s{s}/offset"]      # [P, 2]
        i1 = params[f"s{s}/i1"]              # [T, NODES]
        i2 = params[f"s{s}/i2"]
        thresh = params[f"s{s}/thresh"]
        leaves = params[f"s{s}/leaves"]      # [T, LEAVES, 136]
        T_trees = i1.shape[0]

        def face_update(shape_i, idx):
            # features: one batched bilinear gather at warped anchor offsets
            rot = _similarity_to_current(mean_shape, shape_i)
            pts = shape_i[anchor] + offset @ rot.T          # [P, 2] normalized
            x = cx[idx] + pts[:, 0] * half_w[idx]
            y = cy[idx] + pts[:, 1] * half_h[idx]
            feats = bilinear_sample(grays[idx], y, x)        # [P]

            # lockstep heap-indexed traversal of all trees
            node = jnp.zeros((T_trees,), dtype=jnp.int32)
            for _ in range(depth):
                n1 = jnp.take_along_axis(i1, node[:, None], axis=1)[:, 0]
                n2 = jnp.take_along_axis(i2, node[:, None], axis=1)[:, 0]
                th = jnp.take_along_axis(thresh, node[:, None], axis=1)[:, 0]
                go_right = (feats[n1] - feats[n2]) > th
                node = 2 * node + 1 + go_right.astype(jnp.int32)

            leaf = node - nodes                              # [T]
            delta = jnp.take_along_axis(
                leaves, leaf[:, None, None], axis=1
            )[:, 0, :]                                       # [T, 136]
            return delta.sum(axis=0)

        delta_sum = jax.vmap(face_update)(shape, jnp.arange(N))  # [N, 136]
        shape = shape + delta_sum.reshape(N, N_POINTS, 2)

    x = cx[:, None] + shape[..., 0] * half_w[:, None]
    y = cy[:, None] + shape[..., 1] * half_h[:, None]
    return jnp.stack([x, y], axis=-1)


CROP = 128          # cascade sampling-domain resolution
CROP_SCALE = 2.0    # crop window covers CROP_SCALE × the detection box


def predict_crops(params: Dict, grays: jnp.ndarray, frame_idx: jnp.ndarray,
                  boxes: jnp.ndarray) -> jnp.ndarray:
    """Cascade over per-face crops instead of full frames.

    Extracts one CROP×CROP gray window covering ``CROP_SCALE ×`` each
    detection box (structured access: separable full-frame column/row
    gathers — per-pixel gathers are scalar-bound on TPU), runs the cascade
    in crop coordinates (the feature pool's ±0.25 normalized offsets stay
    well inside the window) and maps the landmarks back to frame pixels.
    This keeps the cascade inside large fused programs without gathering
    whole frames per face.

    grays [T, H, W] float32, frame_idx [N] int32, boxes [N, 4] pixel
    coords → landmarks [N, 68, 2] pixel coords.
    """
    from ..ops.warp import separable_resize_chips

    N = boxes.shape[0]
    cx = (boxes[:, 0] + boxes[:, 2]) / 2.0
    cy = (boxes[:, 1] + boxes[:, 3]) / 2.0
    w = jnp.maximum(boxes[:, 2] - boxes[:, 0], 2.0)
    h = jnp.maximum(boxes[:, 3] - boxes[:, 1], 2.0)
    region_w = CROP_SCALE * w
    region_h = CROP_SCALE * h
    sx = region_w / CROP
    sy = region_h / CROP
    ox = cx - region_w / 2.0
    oy = cy - region_h / 2.0

    zeros = jnp.zeros_like(sx)
    matrices = jnp.stack(
        [jnp.stack([sx, zeros, ox], axis=1),
         jnp.stack([zeros, sy, oy], axis=1)], axis=1,
    )  # [N, 2, 3] chip → image
    crops = separable_resize_chips(
        grays[..., None], frame_idx.astype(jnp.int32), matrices, CROP, CROP
    )[..., 0]  # [N, CROP, CROP]

    # detection box in crop coordinates (identical for every face)
    q = CROP / (2.0 * CROP_SCALE)
    cbox = jnp.broadcast_to(
        jnp.asarray([CROP / 2 - q, CROP / 2 - q, CROP / 2 + q, CROP / 2 + q],
                    dtype=jnp.float32),
        (N, 4),
    )
    lm = predict_cascade(params, crops, cbox)  # [N, 68, 2] crop coords
    x = ox[:, None] + lm[..., 0] * sx[:, None]
    y = oy[:, None] + lm[..., 1] * sy[:, None]
    return jnp.stack([x, y], axis=-1)


class LandmarkPredictor:
    """Loads a trained cascade; mirrors ``dlib.shape_predictor(path)``."""

    def __init__(self, model_path: Optional[str] = None,
                 params: Optional[Dict] = None):
        if params is not None:
            self.params = params
        elif model_path is not None:
            self.params = _load(model_path)
        else:
            from .weights import LANDMARKS_FILE

            if LANDMARKS_FILE.exists():
                self.params = _load(str(LANDMARKS_FILE))
            else:
                self.params = mean_shape_only()
        self._jit = jax.jit(partial(predict_cascade, self.params))
        self._jit_crops = jax.jit(partial(predict_crops, self.params))

    def predict_batch(self, frames: np.ndarray, frame_idx: np.ndarray,
                      boxes: np.ndarray) -> np.ndarray:
        """frames [T, H, W(, 3)], frame_idx [N], boxes [N, 4] → [N, 68, 2]."""
        from ..ops.color import to_gray

        frames = np.asarray(frames)
        if frames.ndim == 4:
            grays = to_gray(jnp.asarray(frames))
        else:
            grays = jnp.asarray(frames, dtype=jnp.float32)
        return np.asarray(
            self._jit_crops(grays,
                            jnp.asarray(frame_idx, dtype=jnp.int32),
                            jnp.asarray(boxes, dtype=jnp.float32))
        )


def mean_shape_only() -> Dict:
    """Degenerate 0-stage cascade: returns the mean shape in the box.

    Used when no trained cascade is available — equivalent to the geometric
    fallback (`models/chip.py:box_to_landmarks`).
    """
    return {
        "mean_shape": jnp.asarray(CANONICAL_LANDMARKS),
        "n_stages": 0,
        "depth": 3,
    }


def _load(path: str) -> Dict:
    flat = load_params(path)
    out: Dict = {}

    def walk(node, prefix=""):
        for k, v in node.items():
            key = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, key)
            else:
                out[key] = v

    walk(flat)
    out["n_stages"] = int(np.asarray(out["n_stages"]))
    out["depth"] = int(np.asarray(out["depth"]))
    # integer index arrays must stay int32
    for k in list(out):
        if k.endswith("anchor") or k.endswith("i1") or k.endswith("i2"):
            out[k] = jnp.asarray(np.asarray(out[k]), dtype=jnp.int32)
        elif k.endswith("leaves"):
            # leaves may be stored f16 (weight-file size); the per-stage
            # sum over trees runs f32
            out[k] = jnp.asarray(np.asarray(out[k]), dtype=jnp.float32)
    return out


def save(path: str, params: Dict) -> None:
    flat = {
        k: np.asarray(v) for k, v in params.items()
    }
    np.savez_compressed(path, **flat)
