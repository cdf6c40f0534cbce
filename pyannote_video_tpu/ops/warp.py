"""Batched bilinear sampling / affine warps.

TPU-native replacement for dlib's face-chip extraction geometry
(``get_face_chip_details`` + ``extract_image_chip`` used inside
``compute_face_descriptor``, reference `face/face.py:73-76`): face chips are
cut out with a similarity transform and bilinear interpolation, batched over
all faces of a frame batch in one gather-based XLA program.

Also used by the DSST tracker (`ops/dsst.py`) to extract scaled patches.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def bilinear_sample(image: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Sample `image` [H, W, C] (or [H, W]) at float coords (ys, xs) [...].

    Out-of-bounds coordinates clamp to the edge (dlib's chip extraction
    behaviour for borders).  Implemented as four flat 1-D gathers — the form
    XLA lowers efficiently (2-D advanced indexing produces a much more
    expensive general gather).
    """
    H, W = image.shape[0], image.shape[1]
    squeeze = image.ndim == 2
    flat = image.reshape(H * W, -1)  # [H*W, C]
    out_shape = ys.shape

    ys = jnp.clip(ys.reshape(-1), 0.0, H - 1.0)
    xs = jnp.clip(xs.reshape(-1), 0.0, W - 1.0)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy = (ys - y0.astype(ys.dtype))[:, None]
    wx = (xs - x0.astype(xs.dtype))[:, None]

    # optimization_barrier: keep the index math out of the gather fusion
    # (Mosaic lowers fused-index gathers as scalar loops; see
    # gather_affine_warp)
    i00 = jax.lax.optimization_barrier(y0 * W + x0)
    i01 = jax.lax.optimization_barrier(y0 * W + x1)
    i10 = jax.lax.optimization_barrier(y1 * W + x0)
    i11 = jax.lax.optimization_barrier(y1 * W + x1)
    v00 = jnp.take(flat, i00, axis=0)
    v01 = jnp.take(flat, i01, axis=0)
    v10 = jnp.take(flat, i10, axis=0)
    v11 = jnp.take(flat, i11, axis=0)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    out = top * (1 - wy) + bot * wy  # [P, C]

    if squeeze:
        return out.reshape(out_shape)
    return out.reshape(*out_shape, image.shape[2])


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def affine_warp(image: jnp.ndarray, matrix: jnp.ndarray,
                out_h: int, out_w: int) -> jnp.ndarray:
    """Warp one image with a 2×3 affine matrix mapping OUTPUT → INPUT coords.

    ``in_xy = matrix @ [out_x, out_y, 1]``.  Returns [out_h, out_w, C].
    """
    ys_o, xs_o = jnp.mgrid[0:out_h, 0:out_w].astype(jnp.float32)
    in_x = matrix[0, 0] * xs_o + matrix[0, 1] * ys_o + matrix[0, 2]
    in_y = matrix[1, 0] * xs_o + matrix[1, 1] * ys_o + matrix[1, 2]
    return bilinear_sample(image, in_y, in_x)


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def batched_affine_warp(images: jnp.ndarray, matrices: jnp.ndarray,
                        out_h: int, out_w: int) -> jnp.ndarray:
    """vmap of affine_warp: images [B, H, W, C] × matrices [B, 2, 3]."""
    return jax.vmap(lambda im, m: affine_warp(im, m, out_h, out_w))(images, matrices)


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def gather_affine_warp(images: jnp.ndarray, frame_idx: jnp.ndarray,
                       matrices: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Extract N chips from a frame batch: chip i warps frame frame_idx[i].

    images [T, H, W, C], frame_idx [N] int32, matrices [N, 2, 3]
    → [N, out_h, out_w, C].  This is the detect→align→embed glue: many faces
    per frame batch, each with its own alignment transform.

    Implementation: ONE flat gather over the whole frame tensor — global
    index ``fi·H·W + y·W + x`` — so no per-face frame copies are ever
    materialized (a naive ``jnp.take(images, frame_idx)`` would build an
    [N, H, W, C] tensor: gigabytes for a 720p batch).
    """
    T, H, W = images.shape[0], images.shape[1], images.shape[2]
    C = images.shape[3]
    flat = images.reshape(T * H * W, C).astype(jnp.float32)

    ys_o, xs_o = jnp.mgrid[0:out_h, 0:out_w]
    ys_o = ys_o.astype(jnp.float32).reshape(-1)   # [P]
    xs_o = xs_o.astype(jnp.float32).reshape(-1)

    # output-pixel → input coords per face: [N, P]
    in_x = (matrices[:, 0, 0, None] * xs_o[None]
            + matrices[:, 0, 1, None] * ys_o[None]
            + matrices[:, 0, 2, None])
    in_y = (matrices[:, 1, 0, None] * xs_o[None]
            + matrices[:, 1, 1, None] * ys_o[None]
            + matrices[:, 1, 2, None])
    in_x = jnp.clip(in_x, 0.0, W - 1.0)
    in_y = jnp.clip(in_y, 0.0, H - 1.0)

    x0 = jnp.floor(in_x).astype(jnp.int32)
    y0 = jnp.floor(in_y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    wx = (in_x - x0.astype(jnp.float32))[..., None]
    wy = (in_y - y0.astype(jnp.float32))[..., None]

    base = (frame_idx.astype(jnp.int32) * (H * W))[:, None]  # [N, 1]

    def take(yy, xx):
        idx = (base + yy * W + xx).reshape(-1)
        # break producer fusion: XLA otherwise fuses the index arithmetic
        # into the gather, which Mosaic lowers as a scalar loop (~100×
        # slower than a materialized-index gather)
        idx = jax.lax.optimization_barrier(idx)
        return jnp.take(flat, idx, axis=0).reshape(in_x.shape + (C,))

    v00 = take(y0, x0)
    v01 = take(y0, x1)
    v10 = take(y1, x0)
    v11 = take(y1, x1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    out = top * (1 - wy) + bot * wy
    return out.reshape(frame_idx.shape[0], out_h, out_w, C)


def transpose_for_chips(images: jnp.ndarray) -> jnp.ndarray:
    """[T, H, W, C] → the [T·W, H·C] layout `separable_resize_chips_t`
    gathers from.  Hoist this OUT of per-frame loops: inside the DSST scan
    the transpose was re-materialised per step (~15 MB/frame of HBM
    traffic at 720p); transposing the whole shot once is a single fused
    op and the scan body then only pays for the columns it gathers."""
    T, H, W, C = images.shape
    return jnp.swapaxes(images, 1, 2).reshape(T * W, H * C)


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def separable_resize_chips(images: jnp.ndarray, frame_idx: jnp.ndarray,
                           matrices: jnp.ndarray, out_h: int,
                           out_w: int) -> jnp.ndarray:
    """Axis-aligned chip extraction via separable FULL-FRAME gathers.

    The TPU-fast path for face chips and tracker patches.  Per-pixel
    2-D gathers are scalar-bound on TPU (~1 elem/cycle → ~0.9 s for 512
    chips from a 720p batch); an intermediate design sliced a contiguous
    512×512 ROI per face (``dynamic_slice``) and resampled inside it, but
    the per-face ROI buffers dominated HBM traffic in the DSST scan
    (80 patches × 1 MB read+write per frame ≈ 225 MB/frame, ~60% of the
    whole tracking step, measured — 2× the remaining cost).  Here the
    horizontal pass gathers only the needed source *columns* from the
    (transposed) frame and the vertical pass gathers rows from that — every
    gather is along a major axis with a wide inner span, so Mosaic executes
    it at vector width, and traffic drops to ~90 MB/frame.  No region size
    cap: faces of any size sample exactly (the ROI path edge-clamps above
    512 px).

    images [T, H, W, C] (uint8 ok), frame_idx [N], matrices [N, 2, 3]
    (chip → image; rotation component ignored) → [N, out_h, out_w, C] f32.
    """
    T, H, W, C = images.shape
    return separable_resize_chips_t(transpose_for_chips(images), H, W, C,
                                    frame_idx, matrices, out_h, out_w)


@partial(jax.jit, static_argnames=("H", "W", "C", "out_h", "out_w"))
def separable_resize_chips_t(imT: jnp.ndarray, H: int, W: int, C: int,
                             frame_idx: jnp.ndarray, matrices: jnp.ndarray,
                             out_h: int, out_w: int) -> jnp.ndarray:
    """`separable_resize_chips` over a PRE-TRANSPOSED frame stack.

    imT [T·W, H·C] as built by `transpose_for_chips` (any dtype; uint8
    quarters the gather traffic vs float32).  Callers that extract many
    times from the same frames (the DSST scan: 2+ extractions per frame
    per direction) transpose once and pass imT + frame indices, so the
    scan body's only frame-resolution work is the column gathers.
    """
    N = frame_idx.shape[0]

    sx = matrices[:, 0, 0]
    sy = matrices[:, 1, 1]
    ox = matrices[:, 0, 2]
    oy = matrices[:, 1, 2]
    px = jnp.arange(out_w, dtype=jnp.float32)
    py = jnp.arange(out_h, dtype=jnp.float32)
    in_x = jnp.clip(ox[:, None] + sx[:, None] * px[None], 0.0, W - 1.0)
    in_y = jnp.clip(oy[:, None] + sy[:, None] * py[None], 0.0, H - 1.0)

    # horizontal 2-tap: gather length-H source columns per output column
    x0 = jnp.floor(in_x).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wx = (in_x - x0.astype(jnp.float32)).reshape(-1, 1)
    base = (frame_idx.astype(jnp.int32) * W)[:, None]
    i0 = lax.optimization_barrier((base + x0).reshape(-1))
    i1 = lax.optimization_barrier((base + x1).reshape(-1))
    cols = (jnp.take(imT, i0, axis=0).astype(jnp.float32) * (1.0 - wx)
            + jnp.take(imT, i1, axis=0).astype(jnp.float32) * wx)

    # vertical 2-tap: per-chip row gather along the H axis
    colsT = jnp.swapaxes(cols.reshape(N, out_w, H, C), 1, 2)  # [N,H,out_w,C]
    y0 = jnp.floor(in_y).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    wy = (in_y - y0.astype(jnp.float32))[:, :, None, None]
    j0 = lax.optimization_barrier(y0[:, :, None, None])
    j1 = lax.optimization_barrier(y1[:, :, None, None])
    return (jnp.take_along_axis(colsT, j0, axis=1) * (1.0 - wy)
            + jnp.take_along_axis(colsT, j1, axis=1) * wy)


def similarity_from_points(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Least-squares similarity transform (rotation+scale+translation).

    Finds s·R, t minimising ‖(s·R·src + t) − dst‖² (Umeyama without
    reflection handling — face alignment never mirrors).  Returns a 2×3
    matrix mapping src → dst.  This is the same estimation dlib's
    ``get_face_chip_details`` performs from the 68 landmarks.

    src, dst: [N, 2] point sets (x, y).
    """
    src = jnp.asarray(src, dtype=jnp.float32)
    dst = jnp.asarray(dst, dtype=jnp.float32)
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    s_c = src - mu_s
    d_c = dst - mu_d
    var_s = jnp.sum(s_c * s_c)
    # complex-number form of 2-D similarity LS fit:
    # a + ib = Σ conj(s)·d / Σ |s|²  (rotation+scale)
    a = jnp.sum(s_c[:, 0] * d_c[:, 0] + s_c[:, 1] * d_c[:, 1]) / jnp.maximum(var_s, 1e-12)
    b = jnp.sum(s_c[:, 0] * d_c[:, 1] - s_c[:, 1] * d_c[:, 0]) / jnp.maximum(var_s, 1e-12)
    rot = jnp.asarray([[a, -b], [b, a]], dtype=jnp.float32)
    t = mu_d - rot @ mu_s
    return jnp.concatenate([rot, t[:, None]], axis=1)


def invert_affine(matrix: jnp.ndarray) -> jnp.ndarray:
    """Invert a 2×3 affine matrix."""
    A = matrix[:, :2]
    t = matrix[:, 2]
    Ainv = jnp.linalg.inv(A)
    return jnp.concatenate([Ainv, (-Ainv @ t)[:, None]], axis=1)
