"""Box geometry ops: overlap matrices, gated matching, NMS.

Replaces ``dlib.drectangle``/``rectangle.intersect().area()`` geometry
(`tracking.py:129-134,167`) with vectorised array math.  Boxes are
``(left, top, right, bottom)`` rows; functions work on host NumPy or
device jnp arrays alike (pure jax.numpy code).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def box_area(boxes) -> jnp.ndarray:
    """dlib-convention area: width = right - left + 1 (closed pixel grid).

    dlib's ``drectangle.area()`` counts the closed interval; the reference's
    overlap gating (`tracking.py:129-134`) inherits that convention, so we
    keep it for behavioural parity.
    """
    boxes = jnp.asarray(boxes, dtype=jnp.float32)
    w = jnp.maximum(0.0, boxes[..., 2] - boxes[..., 0] + 1.0)
    h = jnp.maximum(0.0, boxes[..., 3] - boxes[..., 1] + 1.0)
    return w * h


def intersection_area(a, b) -> jnp.ndarray:
    """Pairwise intersection areas: a [N,4] × b [M,4] → [N, M]."""
    a = jnp.asarray(a, dtype=jnp.float32)
    b = jnp.asarray(b, dtype=jnp.float32)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(0.0, rb - lt + 1.0)
    inter = wh[..., 0] * wh[..., 1]
    # dlib's intersect() of disjoint rects is an empty rect with area 0
    disjoint = (rb[..., 0] < lt[..., 0]) | (rb[..., 1] < lt[..., 1])
    return jnp.where(disjoint, 0.0, inter)


def gated_overlap(a, b, min_overlap_ratio: float) -> jnp.ndarray:
    """Reference `_match` semantics (`tracking.py:129-134`) as a matrix.

    Overlap area, zeroed whenever it is below ``min_overlap_ratio`` times
    EITHER box's area.
    """
    inter = intersection_area(a, b)
    area_a = box_area(a)[:, None]
    area_b = box_area(b)[None, :]
    gate = (inter >= min_overlap_ratio * area_a) & (inter >= min_overlap_ratio * area_b)
    return jnp.where(gate, inter, 0.0)


def iou(a, b) -> jnp.ndarray:
    inter = intersection_area(a, b)
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def overlap_min_ratio(a, b) -> jnp.ndarray:
    """Intersection over the SMALLER box's area — catches contained
    duplicates (a part-of-face box inside the full-face box) that plain
    IoU misses."""
    inter = intersection_area(a, b)
    min_area = jnp.minimum(box_area(a)[:, None], box_area(b)[None, :])
    return inter / jnp.maximum(min_area, 1e-9)


def nms(boxes: np.ndarray, scores: np.ndarray, iou_threshold: float = 0.4,
        max_out: int = 64, containment_threshold: float = 0.7):
    """Greedy non-maximum suppression (host-side, tiny candidate sets).

    Suppresses on IoU > iou_threshold OR containment
    (intersection / min-area) > containment_threshold — multi-scale pyramid
    detectors produce nested duplicates that IoU alone keeps.

    Device-side candidate generation (the detector's score maps) does the
    heavy lifting; by the time NMS runs there are only dozens of boxes.

    Returns indices of kept boxes, highest score first.
    """
    boxes = np.asarray(boxes, dtype=np.float32)
    scores = np.asarray(scores, dtype=np.float32)
    order = np.argsort(-scores)
    keep = []
    iou_mat = np.asarray(iou(boxes, boxes))
    cont_mat = np.asarray(overlap_min_ratio(boxes, boxes))
    for i in order:
        if len(keep) >= max_out:
            break
        if all(
            iou_mat[i, j] <= iou_threshold
            and cont_mat[i, j] <= containment_threshold
            for j in keep
        ):
            keep.append(int(i))
    return keep


def normalize_boxes(boxes, frame_width: float, frame_height: float):
    """Pixel boxes → frame-size-normalised coords (`tracking.py:364-372`)."""
    boxes = jnp.asarray(boxes, dtype=jnp.float32)
    scale = jnp.asarray(
        [frame_width, frame_height, frame_width, frame_height], dtype=jnp.float32
    )
    return boxes / scale
