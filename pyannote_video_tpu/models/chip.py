"""Face-chip alignment: landmarks → similarity transform → 150×150 chip.

TPU-native equivalent of dlib's ``get_face_chip_details(shape, 150, 0.25)``
+ ``extract_image_chip`` pipeline that feeds ``compute_face_descriptor``
(reference `face/face.py:73-76`): a least-squares similarity transform is
fitted from detected landmarks to a canonical landmark layout, then the chip
is cut with batched bilinear warping (`ops/warp.py`) — all faces of a frame
batch in one program.

dlib fits the transform on a fixed average-landmark table; we fit against
our canonical 68-point template (`utils/synthetic.CANONICAL_LANDMARKS`)
mapped into chip coordinates with the same 0.25 padding convention.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.warp import gather_affine_warp, invert_affine, similarity_from_points
from ..utils.synthetic import CANONICAL_LANDMARKS

CHIP_SIZE = 150
PADDING = 0.25


def canonical_chip_landmarks(chip_size: int = CHIP_SIZE,
                             padding: float = PADDING) -> np.ndarray:
    """The canonical 68 landmarks in chip pixel coordinates.

    The unit face frame ([-1, 1]²) is centered in the chip with a margin of
    ``padding`` of the face size on each side — the dlib padding convention
    (0.25 → face occupies the middle 2/3 of the chip).
    """
    scale = chip_size / (2.0 * (1.0 + 2.0 * padding))
    center = chip_size / 2.0
    return (CANONICAL_LANDMARKS * scale + center).astype(np.float32)


_CHIP_TARGET = jnp.asarray(canonical_chip_landmarks())


@jax.jit
def chip_transforms(landmarks: jnp.ndarray) -> jnp.ndarray:
    """Per-face CHIP → IMAGE affine matrices from detected landmarks.

    landmarks: [N, 68, 2] image-coordinate landmarks.
    Returns [N, 2, 3] matrices mapping chip pixels to image pixels —
    the direction ``affine_warp`` consumes (output → input).
    """
    def one(lm):
        img_from_chip = similarity_from_points(_CHIP_TARGET, lm)
        return img_from_chip

    return jax.vmap(one)(landmarks)


@partial(jax.jit, static_argnames=("chip_size",))
def extract_chips(frames: jnp.ndarray, frame_idx: jnp.ndarray,
                  landmarks: jnp.ndarray, chip_size: int = CHIP_SIZE) -> jnp.ndarray:
    """Cut aligned face chips out of a frame batch.

    frames [T, H, W, 3], frame_idx [N], landmarks [N, 68, 2]
    → chips [N, chip_size, chip_size, 3] float32.
    """
    matrices = chip_transforms(landmarks)
    return gather_affine_warp(frames.astype(jnp.float32), frame_idx,
                              matrices, chip_size, chip_size)


def box_to_landmarks(boxes: jnp.ndarray) -> jnp.ndarray:
    """Mean-shape landmarks placed inside detection boxes.

    boxes [N, 4] (left, top, right, bottom) → [N, 68, 2].  This is the
    ERT cascade's shape initialisation and also serves as a geometric
    fallback when no landmark model is loaded.
    """
    boxes = jnp.asarray(boxes, dtype=jnp.float32)
    cx = (boxes[:, 0] + boxes[:, 2]) / 2.0
    cy = (boxes[:, 1] + boxes[:, 3]) / 2.0
    half_w = (boxes[:, 2] - boxes[:, 0]) / 2.0
    half_h = (boxes[:, 3] - boxes[:, 1]) / 2.0
    canon = jnp.asarray(CANONICAL_LANDMARKS)
    x = cx[:, None] + canon[None, :, 0] * half_w[:, None]
    y = cy[:, None] + canon[None, :, 1] * half_h[:, None]
    return jnp.stack([x, y], axis=-1)
