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
    # coarse-to-fine feature sampling: early stages take NEAREST-pixel
    # features (dlib's shape_predictor rounds to the nearest pixel; one
    # tap = 4x less gather traffic than bilinear), the last
    # ``bilinear_tail`` stages sample bilinearly — sub-pixel precision is
    # only needed once the shape estimate is already close.  Weights
    # carry the split they were trained with; absent field = all-bilinear
    # (pre-r4 cascades).
    bilinear_tail = int(params.get("bilinear_tail", n_stages))
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

    n_leaves = 1 << depth
    for s in range(n_stages):
        anchor = params[f"s{s}/anchor"]      # [P]
        offset = params[f"s{s}/offset"]      # [P, 2]
        i1 = params[f"s{s}/i1"]              # [T, NODES]
        i2 = params[f"s{s}/i2"]
        thresh = params[f"s{s}/thresh"]
        leaves = params[f"s{s}/leaves"]      # [T, LEAVES, 136]
        T_trees = i1.shape[0]

        fine = s >= n_stages - bilinear_tail

        # feature-point coordinates for every (face, point) at once
        rot = jax.vmap(_similarity_to_current, in_axes=(None, 0))(
            mean_shape, shape)                               # [N, 2, 2]
        pts = (shape[:, anchor, :]
               + jnp.einsum("pc,ndc->npd", offset, rot))     # [N, P, 2]
        x = cx[:, None] + pts[..., 0] * half_w[:, None]      # [N, P]
        y = cy[:, None] + pts[..., 1] * half_h[:, None]

        # dlib zeroes the feature value of points falling outside the image
        # (shape_predictor.h: ``area.contains(p) ? pixel : 0``); this
        # cascade's native convention clamps to the border instead.
        # Imported ``.dat`` cascades (bilinear_tail == 0) get dlib's
        # semantics so border-adjacent boxes serve faithfully (ADVICE r4
        # #3); natively-trained cascades keep the clamp they were trained
        # with.
        dlib_oob = bilinear_tail == 0
        if dlib_oob:
            yi_r = jnp.floor(y + 0.5)
            xi_r = jnp.floor(x + 0.5)
            inb = ((yi_r >= 0.0) & (yi_r <= grays.shape[1] - 1.0)
                   & (xi_r >= 0.0) & (xi_r <= grays.shape[2] - 1.0))
            inb = inb.astype(jnp.float32)                    # [N, P]

        Hc, Wc = grays.shape[1], grays.shape[2]
        if Hc * Wc <= 256 * 256:
            # dense separable sampling on the MXU: per-axis weight
            # matrices (bilinear hat, or one-hot of the rounded coord on
            # coarse stages) contracted against the images —
            # [N,P,Hc] @ [N,Hc,Wc] then a [N,P,Wc] row dot.  Arbitrary
            # point gathers lower to ~1 element/cycle scalar loops on
            # TPU (measured: the cascade was 93% of the extract stage);
            # at crop resolution this contraction is <1 GFLOP/stage of
            # MXU work instead.  Matches the gather form to f32 rounding
            # (enforced by tests/test_landmarks_parity.py) — the
            # contractions that feed split decisions run at HIGHEST
            # precision, because the TPU default lowers f32 matmuls to
            # bfloat16 passes whose ~0.25-graylevel error can flip a
            # tree decision near its threshold (ADVICE r4 #2).
            y = jnp.clip(y, 0.0, Hc - 1.0)
            x = jnp.clip(x, 0.0, Wc - 1.0)
            if not fine:
                y, x = jnp.round(y), jnp.round(x)
            hy = jnp.maximum(
                0.0, 1.0 - jnp.abs(y[..., None]
                                   - jnp.arange(Hc, dtype=jnp.float32)))
            hx = jnp.maximum(
                0.0, 1.0 - jnp.abs(x[..., None]
                                   - jnp.arange(Wc, dtype=jnp.float32)))
            rows = jnp.einsum("nph,nhw->npw", hy, grays,
                              precision=jax.lax.Precision.HIGHEST)
            feats = jnp.sum(rows * hx, axis=-1)              # [N, P]
        else:
            # full-frame grays: the dense form would contract against
            # the whole frame — fall back to per-face point gathers
            def face_feats(xy, idx):
                g = grays[idx]
                if fine:
                    return bilinear_sample(g, xy[1], xy[0])
                yi = jnp.clip(jnp.round(xy[1]).astype(jnp.int32), 0, Hc - 1)
                xi = jnp.clip(jnp.round(xy[0]).astype(jnp.int32), 0, Wc - 1)
                return g[yi, xi]

            feats = jax.vmap(face_feats)((x, y), jnp.arange(N))  # [N, P]
        if dlib_oob:
            feats = feats * inb

        # gather-free lockstep traversal (measured: the gather-based
        # walk — 5 small dynamic gathers per level — was ~80% of the
        # whole extract stage; TPU lowers arbitrary gathers to scalar
        # loops with heavy per-op overhead).  Every node's split decision
        # is evaluated UP FRONT as one static matmul: selection matrices
        # S1/S2 (one-hot rows built from the stage's constant feature
        # indices, folded by XLA) give
        #   d_all = feats @ (S1 - S2)^T          [N, T·NODES]  (MXU)
        # and the walk then only mixes those precomputed bits with
        # [N, T, NODES]-sized one-hot arithmetic — no dynamic gathers.
        P_pool = feats.shape[1]
        sel = (jax.nn.one_hot(i1.reshape(-1), P_pool, dtype=feats.dtype)
               - jax.nn.one_hot(i2.reshape(-1), P_pool, dtype=feats.dtype))
        # HIGHEST: the decision inputs must stay f32 — a bf16-pass error
        # on feats can flip ``> thresh`` and change the whole leaf
        d_all = jnp.dot(feats, sel.T,
                        precision=jax.lax.Precision.HIGHEST)  # [N, T·NODES]
        bits = (d_all.reshape(N, T_trees, nodes)
                > thresh[None, :, :]).astype(jnp.float32)    # [N, T, NODES]
        node = jnp.zeros((N, T_trees), dtype=jnp.int32)
        for _ in range(depth):
            oh = jax.nn.one_hot(node, nodes, dtype=jnp.float32)
            b = jnp.sum(oh * bits, axis=-1)                  # [N, T]
            node = 2 * node + 1 + b.astype(jnp.int32)

        leaf = node - nodes                                  # [N, T]
        # leaf deltas summed over trees as ONE one-hot matmul on the MXU:
        # one_hot over the per-tree leaf axis is block-diagonal in the
        # flattened [T·L] layout, so [N, T, L] reshapes straight to the
        # [N, T·L] selector and delta = selector @ leaves[T·L, 136].
        # The former per-face take_along_axis+sum gathered T×136 elements
        # per (face, stage) — the single hottest op of the whole extract
        # program (measured: cascade = 93% of extract).
        onehot = jax.nn.one_hot(leaf, n_leaves, dtype=leaves.dtype)
        # HIGHEST keeps the f32 leaf values exact through the one-hot
        # selection (default precision would truncate them to bf16)
        delta_sum = jnp.dot(onehot.reshape(N, T_trees * n_leaves),
                            leaves.reshape(T_trees * n_leaves, -1),
                            precision=jax.lax.Precision.HIGHEST)
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
    if "bilinear_tail" in out:
        out["bilinear_tail"] = int(np.asarray(out["bilinear_tail"]))
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
