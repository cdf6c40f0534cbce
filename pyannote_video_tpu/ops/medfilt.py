"""1-D median filter (DFD series normalisation).

Normalises the DFD series before thresholding (`structure/shot.py:124`).
The reference uses ``scipy.signal.medfilt``, which zero-pads at the
boundaries; that depresses the local median near the start/end of the video
and produces spurious shot boundaries there.  We default to reflect padding
(strictly better behaviour on short clips and video edges) and keep
``mode="zero"`` for exact scipy parity.

The series is tiny (one value per frame pair) but keeping it on device
avoids a transfer between the DFD kernel and the thresholding math.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("kernel_size", "mode"))
def medfilt1d(y: jnp.ndarray, kernel_size: int, mode: str = "zero") -> jnp.ndarray:
    """Median filter of odd size over a 1-D series.

    mode="zero" matches ``scipy.signal.medfilt`` exactly; mode="reflect"
    mirrors the series at the boundaries.  If the kernel exceeds what the
    series length supports, it is clamped to the largest valid odd size.
    """
    if kernel_size % 2 != 1:
        raise ValueError("kernel_size must be odd")
    n = y.shape[0]
    if mode == "reflect":
        # reflect padding needs pad <= n - 1
        kernel_size = min(kernel_size, 2 * n - 1)
    half = kernel_size // 2
    if mode == "zero":
        padded = jnp.pad(y, (half, half), mode="constant", constant_values=0.0)
    elif mode == "reflect":
        padded = jnp.pad(y, (half, half), mode="reflect") if half > 0 else y
    else:
        raise ValueError(f"unknown pad mode: {mode}")
    # [N, k] sliding windows; N is tiny (frame pairs), so the copy is cheap
    idx = jnp.arange(n)[:, None] + jnp.arange(kernel_size)[None, :]
    windows = padded[idx]
    return jnp.median(windows, axis=1)
