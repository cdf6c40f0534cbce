"""Batched DSST/MOSSE correlation tracking in the Fourier domain.

TPU-native replacement for ``dlib.correlation_tracker`` (reference
`tracking.py:250-251` start, `tracking.py:203-204` update/confidence,
`tracking.py:165,231` get_position) — Danelljan et al.'s discriminative
scale-space correlation filter.  Instead of one C++ tracker object per face
updated in a Python loop, ALL live trackers of a shot occupy fixed slots in
one state pytree and advance together: each video frame is one batched FFT
correlation program over ``[N_slots, S_scales, P, P]`` patches, and a whole
frame block runs as a single ``lax.scan`` (`track_scan`).

Formulation (MOSSE numerator/denominator with multi-scale search):

    A ← (1−η)·A + η·(G ⊙ conj(F)),   B ← (1−η)·B + η·|F|²
    response = irfft2(F_z ⊙ A / (B + λ))          per scale
    confidence = peak-to-sidelobe ratio (PSR) — dlib's ``update()`` return
    value semantics; its default kill threshold 10 (`tracking.py:107`)
    works unchanged.

Scale space: the translation filter is evaluated at S relative scales and
the best response selects the scale step (a collapsed variant of DSST's
separate 1-D scale filter; same behaviour at face-video scale dynamics).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .warp import affine_warp

P = 64                 # patch resolution (P × P)
PATCH_SCALE = 2.0      # tracked box occupies 1/PATCH_SCALE of the patch
LAMBDA = 1e-2          # regularizer
ETA = 0.025            # filter learning rate
SCALE_STEPS = (0.96, 0.98, 1.0, 1.02, 1.04)
SIGMA_FACTOR = 1.0 / 16.0  # gaussian target sigma = P * factor
PSR_WINDOW = 5         # half-size of the peak exclusion window for PSR


class TrackState(NamedTuple):
    """Filter state is stored as float32 re/im pairs rather than complex64:
    the axon TPU backend cannot select/transfer complex buffers, and float
    state keeps the scan carry and host round-trips dtype-safe.  Complex
    values exist only transiently between rfft2 and irfft2 inside a step."""

    pos: jnp.ndarray     # [N, 2] center (cy, cx) in frame pixels
    size: jnp.ndarray    # [N, 2] (h, w) in frame pixels
    num_re: jnp.ndarray  # [N, P, Pr] float32 — Re(filter numerator A)
    num_im: jnp.ndarray  # [N, P, Pr] float32 — Im(A)
    den: jnp.ndarray     # [N, P, Pr] float32 — filter denominator B
    alive: jnp.ndarray   # [N] bool


def _rfft_shape() -> Tuple[int, int]:
    return P, P // 2 + 1


def init_state(n_slots: int) -> TrackState:
    pr = _rfft_shape()[1]
    return TrackState(
        pos=jnp.zeros((n_slots, 2), dtype=jnp.float32),
        size=jnp.ones((n_slots, 2), dtype=jnp.float32),
        num_re=jnp.zeros((n_slots, P, pr), dtype=jnp.float32),
        num_im=jnp.zeros((n_slots, P, pr), dtype=jnp.float32),
        den=jnp.zeros((n_slots, P, pr), dtype=jnp.float32),
        alive=jnp.zeros((n_slots,), dtype=bool),
    )


def _hann2d() -> jnp.ndarray:
    w = 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * jnp.arange(P) / (P - 1))
    return (w[:, None] * w[None, :]).astype(jnp.float32)


def _gaussian_target_fft() -> jnp.ndarray:
    """rfft2 of a (0,0)-centred wrapped Gaussian — response peak at the
    origin means zero displacement."""
    sigma = P * SIGMA_FACTOR
    idx = jnp.arange(P, dtype=jnp.float32)
    d = jnp.minimum(idx, P - idx)  # wrapped distance
    g = jnp.exp(-0.5 * (d[:, None] ** 2 + d[None, :] ** 2) / sigma**2)
    return jnp.fft.rfft2(g)


def _extract_patch(gray: jnp.ndarray, pos: jnp.ndarray, size: jnp.ndarray,
                   rel_scale: jnp.ndarray) -> jnp.ndarray:
    """Sample one P×P patch covering PATCH_SCALE×size×rel_scale at pos."""
    region = PATCH_SCALE * size * rel_scale  # (h, w)
    top = pos[0] - region[0] / 2.0
    left = pos[1] - region[1] / 2.0
    sy = region[0] / P
    sx = region[1] / P
    matrix = jnp.asarray(
        [[sx, 0.0, left], [0.0, sy, top]], dtype=jnp.float32
    )
    return affine_warp(gray, matrix, P, P)


def _features(patch: jnp.ndarray, hann: jnp.ndarray) -> jnp.ndarray:
    """MOSSE preprocessing: log, standardize, cosine window."""
    f = jnp.log1p(patch)
    f = f - f.mean()
    f = f / (jnp.sqrt((f**2).mean()) + 1e-5)
    return f * hann


def _slot_fft(gray: jnp.ndarray, pos: jnp.ndarray, size: jnp.ndarray,
              hann: jnp.ndarray) -> jnp.ndarray:
    patch = _extract_patch(gray, pos, size, jnp.float32(1.0))
    return jnp.fft.rfft2(_features(patch, hann))


@jax.jit
def start_tracks(state: TrackState, gray: jnp.ndarray, boxes: jnp.ndarray,
                 slots: jnp.ndarray, mask: jnp.ndarray) -> TrackState:
    """Initialise trackers in the given slots from detection boxes.

    gray [H, W] float32; boxes [M, 4] (left, top, right, bottom);
    slots [M] int32 target slot per box; mask [M] bool (padding rows off).
    Mirrors ``dlib.correlation_tracker().start_track`` (`tracking.py:250-251`).
    """
    hann = _hann2d()
    G = _gaussian_target_fft()

    pos = jnp.stack(
        [(boxes[:, 1] + boxes[:, 3]) / 2.0, (boxes[:, 0] + boxes[:, 2]) / 2.0],
        axis=1,
    )
    size = jnp.stack(
        [boxes[:, 3] - boxes[:, 1], boxes[:, 2] - boxes[:, 0]], axis=1
    )
    size = jnp.maximum(size, 4.0)

    F = jax.vmap(lambda p, s: _slot_fft(gray, p, s, hann))(pos, size)
    num = G[None] * jnp.conj(F)
    num_re = num.real
    num_im = num.imag
    den = (F * jnp.conj(F)).real

    def scatter(field, updates):
        safe = jnp.where(mask, slots, 0)
        upd = jnp.where(
            mask.reshape((-1,) + (1,) * (updates.ndim - 1)), updates,
            field[safe],
        )
        return field.at[safe].set(upd)

    return TrackState(
        pos=scatter(state.pos, pos),
        size=scatter(state.size, size),
        num_re=scatter(state.num_re, num_re),
        num_im=scatter(state.num_im, num_im),
        den=scatter(state.den, den),
        alive=scatter(state.alive, mask),
    )


@jax.jit
def step(state: TrackState, gray: jnp.ndarray,
         min_confidence: float = 10.0) -> Tuple[TrackState, jnp.ndarray, jnp.ndarray]:
    """Advance ALL slots one frame (batched dlib ``update``).

    Returns (new_state, boxes [N, 4], confidences [N]).  Slots whose PSR
    drops below ``min_confidence`` are marked dead (reference kill rule,
    `tracking.py:203-206`); dead slots freeze.
    """
    hann = _hann2d()
    G = _gaussian_target_fft()
    scale_steps = jnp.asarray(SCALE_STEPS, dtype=jnp.float32)

    def one(pos, size, num_re, num_im, den, alive):
        patches = jax.vmap(
            lambda rs: _features(_extract_patch(gray, pos, size, rs), hann)
        )(scale_steps)
        Fz = jnp.fft.rfft2(patches)
        num = jax.lax.complex(num_re, num_im)
        resp = jnp.fft.irfft2(Fz * num[None] / (den[None] + LAMBDA), s=(P, P))

        flat_idx = jnp.argmax(resp.reshape(-1))
        s_best = flat_idx // (P * P)
        py = (flat_idx % (P * P)) // P
        px = flat_idx % P
        peak = resp.reshape(-1)[flat_idx]

        r = resp[s_best]
        idx = jnp.arange(P)
        dy = jnp.minimum(jnp.abs(idx - py), P - jnp.abs(idx - py))
        dx = jnp.minimum(jnp.abs(idx - px), P - jnp.abs(idx - px))
        side = (dy[:, None] > PSR_WINDOW) | (dx[None, :] > PSR_WINDOW)
        n_side = jnp.maximum(jnp.sum(side), 1)
        mu = jnp.sum(r * side) / n_side
        var = jnp.sum(((r - mu) ** 2) * side) / n_side
        psr = (peak - mu) / jnp.sqrt(var + 1e-8)

        dy_pix = jnp.where(py <= P // 2, py, py - P).astype(jnp.float32)
        dx_pix = jnp.where(px <= P // 2, px, px - P).astype(jnp.float32)
        rel = scale_steps[s_best]
        region = PATCH_SCALE * size * rel
        new_pos = pos + jnp.stack(
            [dy_pix * region[0] / P, dx_pix * region[1] / P]
        )
        new_size = jnp.maximum(size * rel, 4.0)

        Fn = _slot_fft(gray, new_pos, new_size, hann)
        upd = G * jnp.conj(Fn)
        new_num_re = (1.0 - ETA) * num_re + ETA * upd.real
        new_num_im = (1.0 - ETA) * num_im + ETA * upd.imag
        new_den = (1.0 - ETA) * den + ETA * (Fn * jnp.conj(Fn)).real

        pos_o = jnp.where(alive, new_pos, pos)
        size_o = jnp.where(alive, new_size, size)
        num_re_o = jnp.where(alive, new_num_re, num_re)
        num_im_o = jnp.where(alive, new_num_im, num_im)
        den_o = jnp.where(alive, new_den, den)
        conf = jnp.where(alive, psr, -jnp.inf)
        return pos_o, size_o, num_re_o, num_im_o, den_o, conf

    pos, size, num_re, num_im, den, conf = jax.vmap(one)(
        state.pos, state.size, state.num_re, state.num_im, state.den,
        state.alive
    )
    alive = state.alive & (conf >= min_confidence)
    boxes = jnp.stack(
        [pos[:, 1] - size[:, 1] / 2, pos[:, 0] - size[:, 0] / 2,
         pos[:, 1] + size[:, 1] / 2, pos[:, 0] + size[:, 0] / 2],
        axis=1,
    )
    return TrackState(pos, size, num_re, num_im, den, alive), boxes, conf


@partial(jax.jit, static_argnames=())
def track_scan(state: TrackState, grays: jnp.ndarray,
               min_confidence: float = 10.0):
    """Track through a frame block with ONE compiled scan.

    grays [T, H, W] float32 → (final_state, boxes [T, N, 4], confs [T, N],
    alive_before [T, N]).  ``alive_before[t]`` tells which slots were live
    when frame t was processed (the reference records a tracker's position
    for every frame it survives into, `tracking.py:227-244`).
    """

    def body(st, gray):
        alive_before = st.alive
        st2, boxes, conf = step(st, gray, min_confidence)
        # pack per-frame outputs into ONE array so the host needs a single
        # readback per chunk (device->host round-trips are expensive)
        packed = jnp.concatenate(
            [boxes, conf[:, None], alive_before.astype(jnp.float32)[:, None]],
            axis=1,
        )
        return st2, packed

    final, packed = jax.lax.scan(body, state, grays)
    boxes = packed[:, :, 0:4]
    confs = packed[:, :, 4]
    alive = packed[:, :, 5] > 0.5
    return final, boxes, confs, alive
