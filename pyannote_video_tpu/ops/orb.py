"""Batched ORB features: FAST corners + steered-BRIEF binary descriptors.

TPU-native replacement for ``cv2.ORB`` + FLANN-LSH matching used by shot
threading (reference `structure/thread.py:117-132,137-169`): keypoint
detection, orientation and description run as one fused XLA program over a
*batch* of frames with fixed keypoint slots; matching is an exact 2-NN
Hamming search expressed as an MXU matmul (`hamming_2nn`) — descriptor
counts per frame are small (≤ 500), so exact search beats approximate LSH
on TPU (SURVEY §2.2).

Differences from OpenCV (documented, behaviour-equivalent for threading):
* BRIEF sampling pattern is a seeded Gaussian pattern (BRIEF paper) rather
  than OpenCV's learned table (not copied); both give discriminative
  256-bit descriptors;
* corner ranking uses cv2's FAST max-threshold strength rather than
  Harris (85% corner recall vs cv2.FastFeatureDetector in tests).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

N_BITS = 256
PATCH = 31          # descriptor patch diameter
FAST_T = 20.0       # FAST threshold
MAX_KP = 500        # keypoint slots per frame (cv2.ORB default nfeatures)

# Bresenham circle of radius 3 — the FAST-9/16 test ring, clockwise from
# 12 o'clock, as (dx, dy).
_CIRCLE = np.asarray(
    [(0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
     (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3)],
    dtype=np.int32,
)


def _brief_pattern(seed: int = 7) -> np.ndarray:
    """[N_BITS, 4] sampling pairs (x1, y1, x2, y2), Gaussian σ = PATCH/5."""
    rng = np.random.default_rng(seed)
    sigma = PATCH / 5.0
    pts = np.clip(rng.normal(0.0, sigma, size=(N_BITS, 4)),
                  -(PATCH // 2), PATCH // 2)
    return pts.astype(np.float32)


_PATTERN = _brief_pattern()


def _shift2d(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift with edge clamp: out[y, x] = img[y+dy, x+dx]."""
    return jnp.roll(img, shift=(-dy, -dx), axis=(-2, -1))


@partial(jax.jit, static_argnames=("max_kp",))
def detect_and_describe(grays: jnp.ndarray, max_kp: int = MAX_KP,
                        threshold: float = FAST_T):
    """FAST-9 keypoints + oriented BRIEF descriptors for a frame batch.

    grays: [B, H, W] float32.
    Returns (keypoints [B, K, 3] (x, y, angle), valid [B, K] bool,
             descriptors [B, K, N_BITS] float32 in {0, 1}).
    """
    B, H, W = grays.shape

    # Backend determinism (thread F1 must not flap between CPU and TPU —
    # the decision rule is an exact match-count threshold): quantize the
    # input to integer gray levels, keep every downstream value integer-
    # exact in float32 (reductions of integers < 2^24 are order-
    # independent), and break top-k ties by pixel index.  cv2's ORB is
    # deterministic for the same reason — it operates on uint8.
    grays = jnp.round(grays)

    # light 5×5 box smoothing (stabilises both the FAST test and BRIEF):
    # ones-kernel sum at HIGHEST precision (integer-exact — sums of 25
    # values ≤ 255 — so CPU and TPU agree bit-for-bit), then ONE
    # deterministic elementwise division.  The k/25 value grid keeps
    # BRIEF discriminative (rounding to whole gray levels degenerated
    # descriptors in smooth regions into false cross-shot matches).
    kernel = jnp.ones((5, 5), dtype=jnp.float32)
    smooth = lax.conv_general_dilated(
        grays[:, None], kernel[None, None], (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=lax.Precision.HIGHEST,
    )[:, 0] / 25.0

    # --- FAST-9 corner test, fully vectorised over the ring --------------
    ring = jnp.stack(
        [_shift2d(grays, int(dy), int(dx)) for dx, dy in _CIRCLE], axis=1
    )  # [B, 16, H, W]
    center = grays[:, None]

    def arc9_strength(diffs):
        # cv2's corner strength: the largest t for which some 9-long
        # contiguous arc satisfies the test = max over arcs of the arc min
        best = jnp.full_like(diffs[:, 0], -jnp.inf)
        for start in range(16):
            arc_min = diffs[:, start]
            for k in range(1, 9):
                arc_min = jnp.minimum(arc_min, diffs[:, (start + k) % 16])
            best = jnp.maximum(best, arc_min)
        return best

    strength = jnp.maximum(
        arc9_strength(ring - center),   # bright arcs
        arc9_strength(center - ring),   # dark arcs
    )
    response = jnp.where(strength > threshold, strength, 0.0)

    # 3×3 non-maximum suppression
    local_max = lax.reduce_window(
        response, -jnp.inf, lax.max, (1, 3, 3), (1, 1, 1), "SAME"
    )
    response = jnp.where(response >= local_max, response, 0.0)

    # keep a safe border (descriptor patch + FAST ring)
    border = PATCH // 2 + 4
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inside = ((yy >= border) & (yy < H - border)
              & (xx >= border) & (xx < W - border))
    response = response * inside[None]

    # --- top-K keypoint slots --------------------------------------------
    # FAST strengths are integer-valued (diffs/min/max of integer grays),
    # so rank on an int32 composite key with the pixel index as tie-break:
    # XLA's top_k ordering of EQUAL keys is implementation-defined and was
    # a source of CPU-vs-TPU keypoint-set divergence.
    flat = response.reshape(B, H * W)
    hw = H * W
    idx = jax.lax.broadcasted_iota(jnp.int32, (B, hw), 1)
    key = flat.astype(jnp.int32) * hw + (hw - 1 - idx)
    top_key, _ = lax.top_k(key, max_kp)
    top_resp = top_key // hw
    top_idx = (hw - 1) - (top_key % hw)
    kp_y = (top_idx // W).astype(jnp.float32)
    kp_x = (top_idx % W).astype(jnp.float32)
    valid = top_resp > 0

    # --- orientation: intensity centroid in a radius-15 disc --------------
    r = PATCH // 2
    oy = jnp.arange(-r, r + 1, dtype=jnp.float32)
    ox = jnp.arange(-r, r + 1, dtype=jnp.float32)
    disc = (oy[:, None] ** 2 + ox[None, :] ** 2) <= r * r

    def moments(img, y0, x0):
        ys = y0 + oy[:, None] + jnp.zeros_like(ox)[None, :]
        xs = x0 + jnp.zeros_like(oy)[:, None] + ox[None, :]
        from .warp import bilinear_sample

        # quantize the patch so the moment sums are integer-exact
        # (order-independent, |sum| < 2^24) → the angle is identical
        # across backends
        patch = jnp.round(bilinear_sample(img, ys, xs)) * disc
        m10 = jnp.sum(patch * ox[None, :])
        m01 = jnp.sum(patch * oy[:, None])
        return jnp.arctan2(m01, m10)

    def frame_angles(img, ys, xs):
        return jax.vmap(lambda y, x: moments(img, y, x))(ys, xs)

    # moments are integer-exact (integer patch × integer offsets, |sum| <
    # 2^24); quantize the angle to 1024 bins so a ULP-level arctan2
    # difference between backends cannot rotate the BRIEF pattern
    angles = jax.vmap(frame_angles)(smooth, kp_y, kp_x)  # [B, K]
    bin_w = jnp.float32(2.0 * np.pi / 1024.0)
    angles = jnp.round(angles / bin_w) * bin_w

    # --- steered BRIEF ----------------------------------------------------
    pattern = jnp.asarray(_PATTERN)  # [256, 4]

    def describe(img, y0, x0, angle):
        # cv2 semantics: sample the NEAREST integer pixel of the smoothed
        # (integer-valued) image — the bit test compares exact integers,
        # so descriptors cannot flip on sub-ULP backend differences the
        # way bilinear samples near v1 == v2 did
        c, s = jnp.cos(angle), jnp.sin(angle)
        x1 = jnp.round(c * pattern[:, 0] - s * pattern[:, 1] + x0)
        y1 = jnp.round(s * pattern[:, 0] + c * pattern[:, 1] + y0)
        x2 = jnp.round(c * pattern[:, 2] - s * pattern[:, 3] + x0)
        y2 = jnp.round(s * pattern[:, 2] + c * pattern[:, 3] + y0)
        from .warp import bilinear_sample

        v1 = bilinear_sample(img, y1, x1)
        v2 = bilinear_sample(img, y2, x2)
        return (v1 < v2).astype(jnp.float32)

    def frame_desc(img, ys, xs, angs):
        return jax.vmap(lambda y, x, a: describe(img, y, x, a))(ys, xs, angs)

    descriptors = jax.vmap(frame_desc)(smooth, kp_y, kp_x, angles)

    keypoints = jnp.stack([kp_x, kp_y, angles], axis=-1)
    return keypoints, valid, descriptors


@jax.jit
def hamming_2nn(desc1: jnp.ndarray, valid1: jnp.ndarray,
                desc2: jnp.ndarray, valid2: jnp.ndarray):
    """Exact 2-NN Hamming distances via one MXU matmul.

    desc ∈ {0,1}^[K, 256]; returns (best [K], second [K]) distances for each
    row of desc1 against desc2 (invalid columns excluded; invalid rows get
    +inf).  Hamming(x, y) = |x| + |y| − 2·x·yᵀ for binary vectors.
    """
    x1 = desc1.astype(jnp.float32)
    x2 = desc2.astype(jnp.float32)
    ones1 = jnp.sum(x1, axis=1)[:, None]
    ones2 = jnp.sum(x2, axis=1)[None, :]
    cross = jnp.dot(x1, x2.T, preferred_element_type=jnp.float32)
    dist = ones1 + ones2 - 2.0 * cross
    dist = jnp.where(valid2[None, :], dist, jnp.inf)
    neg_top2, _ = lax.top_k(-dist, 2)
    best = -neg_top2[:, 0]
    second = -neg_top2[:, 1]
    best = jnp.where(valid1, best, jnp.inf)
    second = jnp.where(valid1, second, jnp.inf)
    return best, second


def count_ratio_matches(desc1, valid1, desc2, valid2,
                        ratio: float = 0.7) -> int:
    """Lowe-ratio match count (reference `_match`, `thread.py:152-169`)."""
    best, second = hamming_2nn(desc1, valid1, desc2, valid2)
    ok = (best < ratio * second) & jnp.isfinite(best)
    return int(jnp.sum(ok))


@jax.jit
def batched_ratio_matches(desc1: jnp.ndarray, valid1: jnp.ndarray,
                          desc2: jnp.ndarray, valid2: jnp.ndarray,
                          ratio: float = 0.7) -> jnp.ndarray:
    """Match counts for MANY descriptor pairs in one program.

    desc [Q, K, 256], valid [Q, K] → counts [Q] int32.  Used by shot
    threading to score every (shot, shot+k) pair in one dispatch instead of
    one device round-trip per pair (`pipeline/thread.py`).
    """
    def one(d1, v1, d2, v2):
        best, second = hamming_2nn(d1, v1, d2, v2)
        ok = (best < ratio * second) & jnp.isfinite(best)
        return jnp.sum(ok).astype(jnp.int32)

    return jax.vmap(one)(desc1, valid1, desc2, valid2)
