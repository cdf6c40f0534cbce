"""Dense optical flow (Farneback) as batched separable convolutions.

Parity option for the shot stage's displaced-frame-difference
(SURVEY §2.2 "Option A"): the reference computes
``cv2.calcOpticalFlowFarneback(prev, cur, 0.5, 3, 15, 3, 5, 1.1, 0)``
and warps per pixel in Python (`structure/shot.py:75-99`).  Here the whole
algorithm — polynomial expansion, iterative displacement refinement over an
image pyramid, and the motion-compensated reconstruction — runs as one
jitted program over a *batch* of frame pairs.

Algorithm (Farnebäck 2003): each neighbourhood is approximated by a
quadratic ``f(x) ≈ xᵀAx + bᵀx + c`` fitted under a Gaussian applicability;
for two frames the displacement satisfies ``A·d = −½(b₂ − b₁)`` with
``A = (A₁+A₂)/2``; the solve is stabilised by averaging ``AᵀA`` and
``AᵀΔb`` over a window before the 2×2 inverse.  Matches OpenCV's
implementation structure (constant-G expansion, box-window accumulation,
coarse-to-fine).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .color import resize_bilinear

POLY_N = 5          # expansion window half-size (cv2 poly_n=5)
POLY_SIGMA = 1.1    # applicability sigma (cv2's default companion to n=5)
WIN_SIZE = 15       # displacement averaging window (reference winsize=15)
N_ITERS = 3         # iterations per level (reference)
N_LEVELS = 3        # pyramid levels (reference)
PYR_SCALE = 0.5     # pyramid scale (reference)


@lru_cache(maxsize=8)
def _poly_expansion_weights(n: int, sigma: float):
    """Precompute the separable correlation weights + normal-equation
    inverse for polynomial expansion (Farnebäck §4, OpenCV's
    FarnebackPrepareGaussian)."""
    x = np.arange(-n, n + 1, dtype=np.float64)
    w = np.exp(-(x**2) / (2.0 * sigma**2))
    w /= w.sum()
    # separable 1-D kernels: w, w·x, w·x²
    k0 = w
    k1 = w * x
    k2 = w * x * x
    # Gram matrix of basis [1, x, y, x², y², xy] under applicability
    s0 = w.sum()                # = 1
    s2 = (w * x * x).sum()
    s4 = (w * x * x * x * x).sum()
    # 2-D moments are products of 1-D ones (separable gaussian)
    # basis ordering: [1, x, y, x², y², xy]
    G = np.zeros((6, 6))
    G[0, 0] = s0 * s0
    G[0, 3] = G[3, 0] = s2 * s0
    G[0, 4] = G[4, 0] = s2 * s0
    G[1, 1] = s2 * s0
    G[2, 2] = s2 * s0
    G[3, 3] = s4 * s0
    G[4, 4] = s4 * s0
    G[3, 4] = G[4, 3] = s2 * s2
    G[5, 5] = s2 * s2
    Ginv = np.linalg.inv(G)
    return (k0.astype(np.float32), k1.astype(np.float32),
            k2.astype(np.float32), Ginv.astype(np.float32))


def _sep_corr(img: jnp.ndarray, ky: np.ndarray, kx: np.ndarray) -> jnp.ndarray:
    """Separable 2-D correlation over [B, H, W] with edge padding."""
    n = (len(ky) - 1) // 2
    x = jnp.pad(img, ((0, 0), (n, n), (0, 0)), mode="edge")
    kyj = jnp.asarray(ky, dtype=jnp.float32)
    # correlate rows: einsum over a sliding window via conv
    x = lax.conv_general_dilated(
        x[:, None], kyj.reshape(1, 1, -1, 1), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[:, 0]
    x = jnp.pad(x, ((0, 0), (0, 0), (n, n)), mode="edge")
    kxj = jnp.asarray(kx, dtype=jnp.float32)
    x = lax.conv_general_dilated(
        x[:, None], kxj.reshape(1, 1, 1, -1), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[:, 0]
    return x


def poly_expansion(img: jnp.ndarray, n: int = POLY_N,
                   sigma: float = POLY_SIGMA):
    """Quadratic expansion coefficients per pixel.

    img: [B, H, W] float32 → (A [B,H,W,2,2], b [B,H,W,2]).
    """
    k0, k1, k2, Ginv = _poly_expansion_weights(n, sigma)
    # moments m_{ij} = Σ w(x)w(y) x^i y^j f   (x → columns, y → rows)
    m00 = _sep_corr(img, k0, k0)
    m10 = _sep_corr(img, k0, k1)   # x moment
    m01 = _sep_corr(img, k1, k0)   # y moment
    m20 = _sep_corr(img, k0, k2)
    m02 = _sep_corr(img, k2, k0)
    m11 = _sep_corr(img, k1, k1)

    # solve G·coef = moments for basis [1, x, y, x², y², xy]
    moments = jnp.stack([m00, m10, m01, m20, m02, m11], axis=-1)
    coefs = jnp.einsum("ij,bhwj->bhwi", jnp.asarray(Ginv), moments)
    c1, cx, cy, cxx, cyy, cxy = [coefs[..., i] for i in range(6)]

    b = jnp.stack([cx, cy], axis=-1)
    A = jnp.stack(
        [jnp.stack([cxx, cxy / 2.0], axis=-1),
         jnp.stack([cxy / 2.0, cyy], axis=-1)],
        axis=-2,
    )
    return A, b


def _warp_field(field: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Sample `field` [B, H, W, C] at x + flow (bilinear, edge clamp)."""
    B, H, W = field.shape[0], field.shape[1], field.shape[2]
    C = field.shape[3]
    yy, xx = jnp.mgrid[0:H, 0:W]
    sx = jnp.clip(xx[None] + flow[..., 0], 0.0, W - 1.0)
    sy = jnp.clip(yy[None] + flow[..., 1], 0.0, H - 1.0)
    x0 = jnp.floor(sx).astype(jnp.int32)
    y0 = jnp.floor(sy).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    wx = (sx - x0)[..., None]
    wy = (sy - y0)[..., None]
    flat = field.reshape(B, H * W, C)

    def take(yy_, xx_):
        idx = jax.lax.optimization_barrier(yy_ * W + xx_)
        return jnp.take_along_axis(flat, idx.reshape(B, -1, 1), axis=1
                                   ).reshape(B, H, W, C)

    v00 = take(y0, x0)
    v01 = take(y0, x1)
    v10 = take(y1, x0)
    v11 = take(y1, x1)
    return ((v00 * (1 - wx) + v01 * wx) * (1 - wy)
            + (v10 * (1 - wx) + v11 * wx) * wy)


def _box_blur(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """[B, H, W, C] box filter (the displacement averaging window)."""
    k = np.ones(size, dtype=np.float32) / size
    B, H, W, C = x.shape
    flat = jnp.moveaxis(x, -1, 1).reshape(B * C, H, W)
    out = _sep_corr(flat, k, k)
    return jnp.moveaxis(out.reshape(B, C, H, W), 1, -1)


def _flow_level(prev: jnp.ndarray, cur: jnp.ndarray, flow: jnp.ndarray,
                win_size: int, n_iters: int) -> jnp.ndarray:
    """Refine `flow` at one pyramid level."""
    A1, b1 = poly_expansion(prev)
    A2, b2 = poly_expansion(cur)

    def body(_, flow):
        A2w = _warp_field(A2.reshape(*A2.shape[:3], 4), flow).reshape(A2.shape)
        b2w = _warp_field(b2, flow)
        A = 0.5 * (A1 + A2w)
        # Δb = −½(b₂(x+d) − b₁(x)) + A·d  (Farnebäck eq. 7 with prior d)
        db = -0.5 * (b2w - b1) + jnp.einsum("bhwij,bhwj->bhwi", A, flow)
        # accumulate normal equations over the window
        G = jnp.einsum("bhwki,bhwkj->bhwij", A, A)     # AᵀA [2,2]
        h = jnp.einsum("bhwki,bhwk->bhwi", A, db)      # AᵀΔb [2]
        Gf = _box_blur(G.reshape(*G.shape[:3], 4), win_size).reshape(G.shape)
        hf = _box_blur(h, win_size)
        det = (Gf[..., 0, 0] * Gf[..., 1, 1]
               - Gf[..., 0, 1] * Gf[..., 1, 0])
        det = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
        new_dx = (Gf[..., 1, 1] * hf[..., 0] - Gf[..., 0, 1] * hf[..., 1]) / det
        new_dy = (-Gf[..., 1, 0] * hf[..., 0] + Gf[..., 0, 0] * hf[..., 1]) / det
        return jnp.stack([new_dx, new_dy], axis=-1)

    return lax.fori_loop(0, n_iters, body, flow)


@partial(jax.jit, static_argnames=("levels", "win_size", "iters"))
def farneback_flow(prev: jnp.ndarray, cur: jnp.ndarray,
                   levels: int = N_LEVELS, win_size: int = WIN_SIZE,
                   iters: int = N_ITERS) -> jnp.ndarray:
    """Dense flow for frame-pair batches: [B, H, W] × 2 → [B, H, W, 2].

    flow[..., 0] is the x displacement, flow[..., 1] the y displacement —
    the convention the reference consumes (`shot.py:94`: ``dy, dx =
    flow[y, x]`` with cv2's (x, y) storage read as (dy=flow_x? see note)).
    """
    B, H, W = prev.shape
    dims = []
    h, w = H, W
    for _ in range(levels):
        dims.append((h, w))
        h = max(8, int(round(h * PYR_SCALE)))
        w = max(8, int(round(w * PYR_SCALE)))
    dims = dims[::-1]  # coarse → fine

    flow = jnp.zeros((B, dims[0][0], dims[0][1], 2), dtype=jnp.float32)
    for i, (lh, lw) in enumerate(dims):
        p = resize_bilinear(prev, lh, lw)
        c = resize_bilinear(cur, lh, lw)
        if i > 0:
            prev_h, prev_w = dims[i - 1]
            flow = resize_bilinear(flow, lh, lw)
            flow = flow * jnp.asarray([lw / prev_w, lh / prev_h],
                                      dtype=jnp.float32)
        flow = _flow_level(p, c, flow, win_size, iters)
    return flow


@jax.jit
def warped_residual(prev: jnp.ndarray, cur: jnp.ndarray,
                    flow: jnp.ndarray) -> jnp.ndarray:
    """Motion-compensated mean absolute residual per pair — the reference's
    DFD statistic computed from a flow field (`shot.py:93-99`)."""
    recon = _warp_field(cur[..., None], flow)[..., 0]
    return jnp.mean(jnp.abs(prev - recon), axis=(1, 2))


def dfd_series_farneback(gray: jnp.ndarray) -> jnp.ndarray:
    """Farneback-based DFD series over consecutive frames ([T, H, W])."""
    prev, cur = gray[:-1], gray[1:]
    flow = farneback_flow(prev, cur)
    return warped_residual(prev, cur, flow)
