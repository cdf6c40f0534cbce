"""Batched box crop-and-resize as dense separable interpolation matmuls.

Serves the detector's refine cascade (`models/refiner.py`): for every
candidate box, resample a fixed-size patch from its source frame.  The
reference's equivalent operation is dlib's sub-window extraction inside
``loss_mmod`` / chip extraction (dlib/image_transforms/interpolation.h) —
a per-pixel bilinear gather loop on CPU.

TPU-first formulation: per-pixel gathers lower to ~1 element/cycle scalar
loops on TPU, so instead each candidate's bilinear resample is expressed
as two SMALL dense matmuls (row-interpolation matrix, then column) that
ride the MXU — the same dense-hat-matrix trick as the landmark cascade
(`models/landmarks.py`).  Unlike `ops/color.py:resize_bilinear` (static
whole-frame scales, host-precomputed 2-tap index maps), the crop windows
here are *traced* values, so the interpolation weights are built on
device with iota arithmetic — no host round-trip, no dynamic shapes.

Coordinates follow the half-pixel-center convention of
`ops/color.py:_interp_taps` (src = (dst+0.5)·scale − 0.5); samples
falling outside the frame contribute zero (black padding), which the
refiner's trainer reproduces exactly by sharing this function.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _hat_weights(starts: jnp.ndarray, sizes: jnp.ndarray, n_src: int,
                 n_dst: int, dtype) -> jnp.ndarray:
    """Bilinear interpolation matrices for 1-D crop windows.

    starts/sizes: [...] window origin / extent in source pixels.
    Returns [..., n_dst, n_src] with rows summing to ≤ 1 (exactly 1 for
    fully-interior samples; partial/zero at the borders = zero padding).
    """
    dst = (jnp.arange(n_dst, dtype=jnp.float32) + 0.5) / n_dst  # (0, 1)
    src = starts[..., None] + dst * sizes[..., None] - 0.5       # [..., D]
    grid = jnp.arange(n_src, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(src[..., None] - grid))   # [..., D, S]
    return w.astype(dtype)


@partial(jax.jit, static_argnames=("out_size",))
def crop_resize(frames: jnp.ndarray, boxes: jnp.ndarray,
                out_size: int = 64) -> jnp.ndarray:
    """Resample one ``out_size``² patch per box from its frame.

    frames: [B, H, W, C] float; boxes: [B, K, 4] (l, t, r, b) pixel
    coordinates (may extend past the frame — outside reads as zero).
    Returns [B, K, out_size, out_size, C] in the frames' dtype.
    """
    if frames.ndim != 4 or boxes.ndim != 3 or boxes.shape[-1] != 4:
        raise ValueError(f"crop_resize: frames [B,H,W,C] + boxes [B,K,4], "
                         f"got {frames.shape} / {boxes.shape}")
    H, W = frames.shape[1], frames.shape[2]
    dt = frames.dtype
    l, t, r, b = (boxes[..., i].astype(jnp.float32) for i in range(4))
    ry = _hat_weights(t, b - t, H, out_size, dt)        # [B, K, out, H]
    rx = _hat_weights(l, r - l, W, out_size, dt)        # [B, K, out, W]
    # rows then columns: [B,K,out,H]·[B,H,W,C] → [B,K,out,W,C] → [B,K,out,out,C]
    rows = jnp.einsum("bkah,bhwc->bkawc", ry, frames)
    return jnp.einsum("bkawc,bkow->bkaoc", rows, rx)
