"""Pallas TPU kernel for the block-matching displaced-frame-difference.

Hand-written kernel for the shot stage's hot op (`ops/dfd.py` documents the
algorithm).  The XLA formulation re-reads a shifted frame slice from HBM for
every displacement (49× traffic at radius 3); this kernel stages one frame
pair in VMEM per grid step and evaluates the whole displacement search
in-core:

* grid = one program per frame pair;
* the padded current frame and the previous frame live in VMEM blocks;
* per displacement, the residual's block sums are computed as two small
  matmuls with 0/1 block-pooling matrices (MXU work, no reshapes — TPU
  vector layout makes in-kernel reshapes across the lane dimension
  illegal);
* the running block-minimum and final scalar mean stay in registers;
  each program writes one f32 to SMEM.

Falls back to the XLA version on non-TPU backends (`dfd_series_auto`).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@lru_cache(maxsize=32)
def _pool_matrices(hc: int, wc: int, block: int):
    """0/1 block-pooling matrices: rows [n_by, hc], cols [wc, n_bx]."""
    n_by, n_bx = hc // block, wc // block
    by = np.zeros((n_by, hc), dtype=np.float32)
    for i in range(n_by):
        by[i, i * block : (i + 1) * block] = 1.0 / block
    bx = np.zeros((wc, n_bx), dtype=np.float32)
    for j in range(n_bx):
        bx[j * block : (j + 1) * block, j] = 1.0 / block
    return by, bx


PAIRS_PER_PROGRAM = 8  # sublane-aligned output rows per grid step


def _dfd_kernel(prev_ref, curp_ref, by_ref, bx_ref, out_ref, *, radius,
                hc, wc, block, subpixel):
    by = by_ref[:]              # [n_by, hc]
    bx = bx_ref[:]              # [wc, n_bx]
    n_by, n_bx = by.shape[0], bx.shape[1]
    R = 2 * radius + 1

    for p in range(PAIRS_PER_PROGRAM):
        prev = prev_ref[p]      # [hc, wc]

        def pooled_row(dy):
            row = []
            for dx in range(R):
                shifted = curp_ref[p, dy : dy + hc, dx : dx + wc]
                resid = jnp.abs(prev - shifted)
                # block means via two MXU matmuls:
                # [n_by, hc] @ [hc, wc] @ [wc, n_bx]
                row.append(jnp.dot(
                    jnp.dot(by, resid, preferred_element_type=jnp.float32),
                    bx, preferred_element_type=jnp.float32,
                ))
            return row

        best = jnp.full((n_by, n_bx), jnp.inf, dtype=jnp.float32)
        if not subpixel:
            for dy in range(R):
                for pooled in pooled_row(dy):
                    best = jnp.minimum(best, pooled)
        else:
            # V-corrected min (see ops/dfd.py docstring) with a sliding
            # 3-row window so at most 3·R pooled maps are live — matches
            # the XLA formulation's edge-padded correction exactly
            prev_row = None
            cur_row = pooled_row(0)
            for dy in range(R):
                next_row = pooled_row(dy + 1) if dy + 1 < R else None
                up = prev_row if prev_row is not None else cur_row
                down = next_row if next_row is not None else cur_row
                for dx in range(R):
                    left = cur_row[dx - 1] if dx > 0 else cur_row[dx]
                    right = cur_row[dx + 1] if dx + 1 < R else cur_row[dx]
                    corr = (jnp.abs(up[dx] - down[dx]) * 0.5
                            + jnp.abs(left - right) * 0.5)
                    best = jnp.minimum(
                        best, jnp.maximum(cur_row[dx] - corr, 0.0))
                prev_row, cur_row = cur_row, next_row
        # broadcast the scalar across the 128-lane output row (TPU tiling
        # requires lane-aligned VMEM blocks)
        out_ref[p, :] = jnp.full((128,), jnp.mean(best), dtype=jnp.float32)


@partial(jax.jit, static_argnames=("radius", "block", "subpixel"))
def dfd_series_pallas(gray: jnp.ndarray, radius: int = 3,
                      block: int = 5, subpixel: bool = True) -> jnp.ndarray:
    """Pallas DFD series: gray [T, H, W] float32 → [T-1] float32.

    Same contract as `ops/dfd.py:dfd_series`.
    """
    T, H, W = gray.shape
    hc = (H // block) * block
    wc = (W // block) * block
    n_pairs = T - 1
    # pad the pair axis to a whole number of programs
    ppp = PAIRS_PER_PROGRAM
    n_pad = (-n_pairs) % ppp
    prev = gray[:-1, :hc, :wc]
    cur = gray[1:]
    if n_pad:
        prev = jnp.concatenate([prev, jnp.zeros((n_pad, hc, wc),
                                                prev.dtype)], axis=0)
        cur = jnp.concatenate([cur, jnp.zeros((n_pad, H, W), cur.dtype)],
                              axis=0)
    # crop the padded frame to the kernel's block footprint: the shifted
    # window never reads past row hc+2r / col wc+2r, and when H/W are not
    # block multiples the un-cropped array would violate the TPU lowering
    # rule that VMEM blocks equal the array dims (or tile 8x128).  Original
    # pixels up to col wc+r-1 stay reachable — identical accesses to the
    # XLA formulation (`ops/dfd.py`).
    cur_pad = jnp.pad(cur, ((0, 0), (radius, radius), (radius, radius)),
                      mode="edge")[:, : hc + 2 * radius, : wc + 2 * radius]
    by, bx = _pool_matrices(hc, wc, block)

    kernel = partial(_dfd_kernel, radius=radius, hc=hc, wc=wc, block=block,
                     subpixel=subpixel)
    n_programs = (n_pairs + n_pad) // ppp

    out = pl.pallas_call(
        kernel,
        grid=(n_programs,),
        in_specs=[
            pl.BlockSpec((ppp, hc, wc), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ppp, hc + 2 * radius, wc + 2 * radius),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(by.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bx.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ppp, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pairs + n_pad, 128), jnp.float32),
    )(prev, cur_pad, jnp.asarray(by), jnp.asarray(bx))
    return out[:n_pairs, 0]


def dfd_series_auto(gray: jnp.ndarray, radius: int = 3,
                    block: int = 5, subpixel: bool = True) -> jnp.ndarray:
    """Pallas kernel on TPU, XLA formulation elsewhere."""
    from .dfd import dfd_series

    backend = jax.default_backend()
    if backend in ("tpu", "axon") and gray.shape[0] >= 2:
        try:
            return dfd_series_pallas(gray, radius=radius, block=block,
                                     subpixel=subpixel)
        except Exception:  # pragma: no cover - kernel lowering gaps
            pass
    return dfd_series(gray, radius=radius, block=block, subpixel=subpixel)
