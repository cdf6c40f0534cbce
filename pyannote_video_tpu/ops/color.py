"""Batched on-device color conversion + resize (ingest preprocessing).

TPU-native replacement for the per-frame ``cv2.cvtColor`` / ``cv2.resize``
calls on the reference's hot paths (`structure/shot.py:71-73`,
`structure/thread.py:142-143`, `video.py:403`): whole frame batches are
converted and resized in one fused XLA program, keeping data on device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# ITU-R BT.601 luma — matches cv2.COLOR_RGB2GRAY (see utils/imops.py).
_LUMA = jnp.asarray([0.299, 0.587, 0.114], dtype=jnp.float32)


def to_gray(frames: jnp.ndarray) -> jnp.ndarray:
    """RGB ``[..., 3]`` (uint8 or float) → float32 grayscale ``[...]``.

    The channel contraction is expressed as a dot so XLA maps it onto the
    MXU / fuses it with neighbours.
    """
    return jnp.tensordot(frames.astype(jnp.float32), _LUMA, axes=([-1], [0]))


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_bilinear(frames: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize of ``[B, H, W]`` or ``[B, H, W, C]`` batches.

    antialias=False matches OpenCV INTER_LINEAR (the reference's resize),
    which does not low-pass when downscaling.
    """
    if frames.ndim == 3:
        shape = (frames.shape[0], out_h, out_w)
    elif frames.ndim == 4:
        shape = (frames.shape[0], out_h, out_w, frames.shape[3])
    else:
        raise ValueError(f"expected [B,H,W] or [B,H,W,C], got {frames.shape}")
    return jax.image.resize(
        frames.astype(jnp.float32), shape, method="linear", antialias=False
    )


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def ingest_gray(frames_u8: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Fused uint8 RGB batch → resized float32 grayscale batch.

    Gray-then-resize order matches the shot stage (`structure/shot.py:71-73`).
    """
    return resize_bilinear(to_gray(frames_u8), out_h, out_w)


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def ingest_gray_resize_first(
    frames_u8: jnp.ndarray, out_h: int, out_w: int
) -> jnp.ndarray:
    """Fused resize-then-gray (the thread stage order,
    `structure/thread.py:142-143`)."""
    return to_gray(resize_bilinear(frames_u8.astype(jnp.float32), out_h, out_w))
