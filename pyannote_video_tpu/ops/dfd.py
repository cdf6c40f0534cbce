"""Displaced-frame-difference (DFD) kernel for shot boundary detection.

TPU-native redesign of the reference's hottest code: per-pair Farneback
optical flow + a per-pixel Python warp loop (`structure/shot.py:75-99`).
The only consumer of the flow is the scalar motion-compensated residual
(`shot.py:99`), so flow estimation and warping are fused into one direct
block-matching DFD (SURVEY §2.2 "Option B"):

for every consecutive frame pair and every small block, find the block-wise
displacement (within a search radius) that minimises the mean absolute
residual, then average the minimal residuals over the frame.  Within a shot,
some displacement aligns content and the residual is small; across a cut,
nothing aligns and the residual stays large — the same separation the
Farneback+warp residual produces, at a tiny fraction of the cost.

The whole video runs as ONE jitted program over the ``[T, H, W]`` frame
tensor: the displacement search is a ``lax.fori_loop`` carrying a running
block-minimum (O(T·H·W) memory), and everything vectorises over T — no
per-frame host loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


@partial(jax.jit, static_argnames=("radius", "block"))
def dfd_series(gray: jnp.ndarray, radius: int = 3, block: int = 5) -> jnp.ndarray:
    """Displaced frame difference for all consecutive frame pairs.

    Parameters
    ----------
    gray : [T, H, W] float32
        Grayscale frames (already resized; the shot stage uses height 50,
        `structure/shot.py:53`).
    radius : int
        Displacement search radius in pixels (static).
    block : int
        Block size for the block-matching motion model (static).  The
        reference's Farneback flow is smooth over ~15 px windows
        (`shot.py:80`); blocks play the same regularising role.

    Returns
    -------
    dfd : [T-1] float32
        Mean minimal-residual per frame pair; ``dfd[i]`` compares frames
        ``i`` and ``i+1`` (the reference's pairwise series,
        `shot.py:101-117`).
    """
    T, H, W = gray.shape
    prev = gray[:-1]  # [P, H, W]
    cur = gray[1:]

    # crop to a multiple of the block size so pooling is a pure reshape
    Hc = (H // block) * block
    Wc = (W // block) * block
    prev = prev[:, :Hc, :Wc]

    # edge padding replicates the reference's coordinate clamping
    # (`shot.py:95-96`)
    pad = radius
    cur_pad = jnp.pad(cur, ((0, 0), (pad, pad), (pad, pad)), mode="edge")

    n_by, n_bx = Hc // block, Wc // block
    n_disp = (2 * radius + 1) ** 2

    def block_mean(x: jnp.ndarray) -> jnp.ndarray:
        # [P, Hc, Wc] -> [P, n_by, n_bx]
        return x.reshape(T - 1, n_by, block, n_bx, block).mean(axis=(2, 4))

    def body(d: jnp.ndarray, best: jnp.ndarray) -> jnp.ndarray:
        dy = d // (2 * radius + 1)
        dx = d % (2 * radius + 1)
        shifted = lax.dynamic_slice(
            cur_pad, (0, dy, dx), (T - 1, Hc, Wc)
        )
        resid = block_mean(jnp.abs(prev - shifted))
        return jnp.minimum(best, resid)

    init = jnp.full((T - 1, n_by, n_bx), jnp.inf, dtype=jnp.float32)
    best = lax.fori_loop(0, n_disp, body, init)
    return best.mean(axis=(1, 2))


def dfd_pairs_reference_style(
    prev: jnp.ndarray, cur: jnp.ndarray, radius: int = 3, block: int = 5
) -> jnp.ndarray:
    """DFD for explicit (prev, cur) batches — convenience for tests."""
    stacked = jnp.stack([prev, cur], axis=0)
    # vmap over the pair axis by interleaving: build [2, H, W] series per pair
    def one(pair):
        return dfd_series(pair, radius=radius, block=block)[0]

    return jax.vmap(one, in_axes=1)(stacked)
