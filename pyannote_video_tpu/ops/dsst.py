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

Scale space: a separate 1-D MOSSE filter over SCALE_N geometric scale
samples of the target (DSST's own design, dimensioned after fDSST — see
the scale-filter constants below); the translation filter runs at a
single scale.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np



P = 64                 # patch resolution (P × P)
PATCH_SCALE = 2.0      # tracked box occupies 1/PATCH_SCALE of the patch
LAMBDA = 1e-2          # regularizer
ETA = 0.025            # filter learning rate
SIGMA_FACTOR = 1.0 / 16.0  # gaussian target sigma = P * factor
PSR_WINDOW = 5         # half-size of the peak exclusion window for PSR
# --- 1-D scale filter (Danelljan's DSST scale space) -----------------------
# The round-2 build collapsed scale search into a 5-point penalty-gated
# argmax over the translation response; sustained zoom (3%/frame) lagged
# up to 15% behind ground truth.  This is the true DSST formulation: a
# separate 1-D MOSSE filter over SCALE_N scale samples of the target,
# trained/evaluated each frame — and the translation filter runs at a
# SINGLE scale (cheaper than the old 5-scale stack).
#
# Dimensioned after fDSST (Danelljan's own accelerated DSST): the round-3
# 33-sample × 16² -feature filter was 55% of the whole tracking scan's
# device time (measured; the resample stacks dominate).  fDSST halves the
# sample count; its parabolic sub-bin response interpolation was tried
# and REVERTED — on static targets the fit's ±½-bin noise random-walks
# the size ~1%/frame, so the peak is read by integer-bin argmax (the
# quantisation is the deadzone; see the scale-response block in `_step`).
# Together with 8²-px sample features (64 dims — fDSST compresses to 17
# by PCA; intensity features need a little more) the scale stage costs
# ~4× less with the zoom tracking error still inside the 10% test bound
# at 3%/frame zoom.
SCALE_N = 17           # scale samples per frame (fDSST: 17 vs DSST's 33)
SCALE_STEP = 1.02      # geometric spacing: factors SCALE_STEP**(n-8)
SCALE_FEAT = 8         # each sample resized to 8×8 → 64 features
SCALE_SIGMA = 1.0      # gaussian target sigma, in scale bins
SCALE_ETA = 0.025      # scale-filter learning rate


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
    s_num_re: jnp.ndarray  # [N, DF, Sr] float32 — Re(scale-filter numerator)
    s_num_im: jnp.ndarray  # [N, DF, Sr] float32 — Im(·)
    s_den: jnp.ndarray     # [N, Sr] float32 — scale-filter denominator
    alive: jnp.ndarray   # [N] bool


def _rfft_shape() -> Tuple[int, int]:
    return P, P // 2 + 1


_SCALE_DF = SCALE_FEAT * SCALE_FEAT
_SCALE_SR = SCALE_N // 2 + 1


def init_state(n_slots: int) -> TrackState:
    pr = _rfft_shape()[1]
    return TrackState(
        pos=jnp.zeros((n_slots, 2), dtype=jnp.float32),
        size=jnp.ones((n_slots, 2), dtype=jnp.float32),
        num_re=jnp.zeros((n_slots, P, pr), dtype=jnp.float32),
        num_im=jnp.zeros((n_slots, P, pr), dtype=jnp.float32),
        den=jnp.zeros((n_slots, P, pr), dtype=jnp.float32),
        s_num_re=jnp.zeros((n_slots, _SCALE_DF, _SCALE_SR),
                           dtype=jnp.float32),
        s_num_im=jnp.zeros((n_slots, _SCALE_DF, _SCALE_SR),
                           dtype=jnp.float32),
        s_den=jnp.zeros((n_slots, _SCALE_SR), dtype=jnp.float32),
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


def _scale_factors() -> jnp.ndarray:
    """Geometric scale-sample factors, index S//2 = current scale."""
    n = jnp.arange(SCALE_N, dtype=jnp.float32) - SCALE_N // 2
    return SCALE_STEP ** n


def _scale_target_fft() -> jnp.ndarray:
    """rfft of the 1-D gaussian target, peaked at the CENTER sample
    (Danelljan's convention: train and test both index scales
    symmetrically around the current one, so the response argmax is
    directly the best sample's index)."""
    s = jnp.arange(SCALE_N, dtype=jnp.float32) - SCALE_N // 2
    g = jnp.exp(-0.5 * (s / SCALE_SIGMA) ** 2)
    return jnp.fft.rfft(g)


def _scale_hann() -> jnp.ndarray:
    w = 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * jnp.arange(SCALE_N)
                            / (SCALE_N - 1))
    return w.astype(jnp.float32)


_SCALE_SUPER = 48      # super-patch resolution for hierarchical sampling
_STEP_SUPER = 128      # shared super-patch resolution inside _step_core


def _super_patch(imT: jnp.ndarray, H: int, W: int, frame_idx: jnp.ndarray,
                 pos: jnp.ndarray, region: jnp.ndarray,
                 res: int) -> jnp.ndarray:
    """One res² patch per slot covering ``region`` (h, w) centred at pos.

    The single frame-resolution structured access of a hierarchical
    sampling scheme; everything that needs sub-patches of the same
    neighbourhood resamples from this instead of touching the frame again.
    ``imT`` is the pre-transposed [T·W, H] gray stack
    (`warp.transpose_for_chips`) — built ONCE per shot so the scan body
    never re-materialises frame transposes.  Returns [N, res, res, 1] f32.
    """
    from .warp import separable_resize_chips_t

    top = pos[:, 0] - region[:, 0] / 2.0
    left = pos[:, 1] - region[:, 1] / 2.0
    zeros = jnp.zeros_like(top)
    mats = jnp.stack(
        [jnp.stack([region[:, 1] / res, zeros, left], axis=-1),
         jnp.stack([zeros, region[:, 0] / res, top], axis=-1)],
        axis=-2)                                            # [N, 2, 3]
    return separable_resize_chips_t(
        imT, H, W, 1, frame_idx.astype(jnp.int32), mats, res, res)


def _resample_super(supers: jnp.ndarray, frac_h: jnp.ndarray,
                    frac_w: jnp.ndarray, out_res: int) -> jnp.ndarray:
    """Centred sub-patches cut from super-patches.

    supers [N, SUP, SUP, 1]; frac_h/frac_w [N, S] — per-(slot, sample)
    fraction of the super-patch the sub-patch covers → [N, S, out, out].
    """
    from .warp import separable_resize_chips

    N, SUP = supers.shape[0], supers.shape[1]
    S = frac_h.shape[1]
    side_y = frac_h * SUP
    side_x = frac_w * SUP
    off_y = (SUP - side_y) / 2.0
    off_x = (SUP - side_x) / 2.0
    zeros = jnp.zeros_like(side_x)
    mats = jnp.stack(
        [jnp.stack([side_x / out_res, zeros, off_x], axis=-1),
         jnp.stack([zeros, side_y / out_res, off_y], axis=-1)],
        axis=-2).reshape(N * S, 2, 3)
    idx = jnp.repeat(jnp.arange(N, dtype=jnp.int32), S)
    out = separable_resize_chips(supers, idx, mats, out_res, out_res)
    return out[..., 0].reshape(N, S, out_res, out_res)


def _scale_fft_from_samples(samples: jnp.ndarray) -> jnp.ndarray:
    """[N, SCALE_N, F, F] scale samples → feature FFTs [N, DF, Sr].

    Per-sample standardization, hann window across the scale axis, rfft
    along scales per feature dimension (Danelljan's 1-D scale filter)."""
    N = samples.shape[0]
    feats = samples.reshape(N, SCALE_N, _SCALE_DF)
    feats = feats - feats.mean(axis=-1, keepdims=True)
    feats = feats / (jnp.sqrt((feats ** 2).mean(axis=-1, keepdims=True))
                     + 1e-5)
    feats = feats * _scale_hann()[None, :, None]
    return jnp.fft.rfft(feats.transpose(0, 2, 1), axis=-1)  # [N, DF, Sr]


def _scale_feature_ffts(imT: jnp.ndarray, H: int, W: int,
                        frame_idx: jnp.ndarray,
                        pos: jnp.ndarray, size: jnp.ndarray) -> jnp.ndarray:
    """Scale-sample feature FFTs: [N, DF, Sr] complex.

    Sample s covers ``size × SCALE_STEP**(s - S//2)`` centred at ``pos``
    (the target box itself — no translation-context padding), resized to
    SCALE_FEAT², standardized per sample, hann-windowed across the scale
    axis, then FFT'd along scales per feature dimension.

    Extraction is HIERARCHICAL: one super-patch per slot covering the
    largest scale sample is pulled from the full frame, and the SCALE_N
    samples are resampled from it.  Direct extraction cost scales with
    SCALE_N × frame-height column gathers (the 33-chip stack made the
    scale filter ~4× the translation filter's traffic and halved the
    whole-shot scan rate, measured r3); the super-patch form pays one
    frame-resolution gather per slot and SCALE_N cheap 48-px gathers.
    The largest sample maps 1:1 onto the super-patch; smaller ones
    downsample from it — two-stage bilinear, which if anything
    anti-aliases better than the 8×-decimating single stage.

    (Used on the init paths; `_step_core` amortises further — one shared
    `_STEP_SUPER` patch feeds scale measure + filter updates.)
    """
    N = pos.shape[0]
    factors = _scale_factors()
    span = float(SCALE_STEP ** (SCALE_N // 2))  # largest relative sample

    supers = _super_patch(imT, H, W, frame_idx, pos, span * size,
                          _SCALE_SUPER)
    frac = jnp.tile((factors / span)[None, :], (N, 1))      # [N, S]
    samples = _resample_super(supers, frac, frac, SCALE_FEAT)
    return _scale_fft_from_samples(samples)


def _scale_filter_init(imT, H, W, frame_idx, pos, size):
    """(num complex [N, DF, Sr], den [N, Sr]) for fresh scale filters."""
    F = _scale_feature_ffts(imT, H, W, frame_idx, pos, size)
    Gs = _scale_target_fft()
    num = Gs[None, None, :] * jnp.conj(F)
    den = jnp.sum((F * jnp.conj(F)).real, axis=1)
    return num, den


def _extract_patches(imT: jnp.ndarray, H: int, W: int,
                     frame_idx: jnp.ndarray,
                     pos: jnp.ndarray, size: jnp.ndarray,
                     rel_scales: jnp.ndarray) -> jnp.ndarray:
    """Batched patch sampling: [N slots] × [S scales] → [N, S, P, P].

    Patch (n, s) covers ``PATCH_SCALE × size[n] × rel_scales[s]`` centred at
    ``pos[n]`` in frame ``frame_idx[n]`` of the pre-transposed stack
    ``imT`` ([T·W, H], `warp.transpose_for_chips`).
    Uses separable full-frame structured access
    (`ops/warp.py:separable_resize_chips_t`) instead of per-pixel bilinear
    gathers: on TPU, Mosaic lowers fused gathers to ~1 element/cycle scalar
    loops, which made patch extraction 84% of the tracking step
    (10 ms/frame at 720p, measured); the separable column/row-gather form
    runs at vector width and avoids the per-patch ROI buffers that an
    earlier ``dynamic_slice`` variant materialized (~60% of the remaining
    step time).  No patch size cap — any face size samples exactly.
    """
    from .warp import separable_resize_chips_t

    N = pos.shape[0]
    S = rel_scales.shape[0]
    region = (PATCH_SCALE * size[:, None, :]
              * rel_scales[None, :, None])              # [N, S, 2] (h, w)
    top = pos[:, None, 0] - region[..., 0] / 2.0
    left = pos[:, None, 1] - region[..., 1] / 2.0
    sy = region[..., 0] / P
    sx = region[..., 1] / P
    zeros = jnp.zeros_like(sx)
    matrices = jnp.stack(
        [jnp.stack([sx, zeros, left], axis=-1),
         jnp.stack([zeros, sy, top], axis=-1)], axis=-2,
    ).reshape(N * S, 2, 3)
    idx = jnp.repeat(frame_idx.astype(jnp.int32), S)
    out = separable_resize_chips_t(imT, H, W, 1, idx, matrices, P, P)
    return out[..., 0].reshape(N, S, P, P)


def _features(patch: jnp.ndarray, hann: jnp.ndarray) -> jnp.ndarray:
    """MOSSE preprocessing: log, standardize, cosine window.

    Works on any [..., P, P] batch (statistics per patch).
    """
    f = jnp.log1p(patch)
    f = f - f.mean(axis=(-2, -1), keepdims=True)
    f = f / (jnp.sqrt((f**2).mean(axis=(-2, -1), keepdims=True)) + 1e-5)
    return f * hann


def _slot_ffts(imT: jnp.ndarray, H: int, W: int, frame_idx: jnp.ndarray,
               pos: jnp.ndarray, size: jnp.ndarray,
               hann: jnp.ndarray) -> jnp.ndarray:
    """rfft2 of the scale-1 feature patch for every slot: [N, P, Pr]."""
    patches = _extract_patches(
        imT, H, W, frame_idx, pos, size, jnp.ones((1,), dtype=jnp.float32)
    )[:, 0]
    return jnp.fft.rfft2(_features(patches, hann))


def _filter_init_from_boxes(imT: jnp.ndarray, H: int, W: int,
                            frame_idx: jnp.ndarray, boxes: jnp.ndarray):
    """MOSSE filter initialisation for a batch of boxes on one frame.

    ``frame_idx`` [M] names each box's frame in the pre-transposed stack.
    Returns (pos [M, 2], size [M, 2], num complex [M, P, Pr],
    den [M, P, Pr]) — shared by ``start_tracks`` (scatter into chosen
    slots) and ``restart_slots`` (full-width select) so the init math
    cannot diverge between the two paths.
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

    F = _slot_ffts(imT, H, W, frame_idx, pos, size, hann)
    num = G[None] * jnp.conj(F)
    den = (F * jnp.conj(F)).real
    s_num, s_den = _scale_filter_init(imT, H, W, frame_idx, pos, size)
    return pos, size, num, den, s_num, s_den


@jax.jit
def start_tracks(state: TrackState, gray: jnp.ndarray, boxes: jnp.ndarray,
                 slots: jnp.ndarray, mask: jnp.ndarray) -> TrackState:
    """Initialise trackers in the given slots from detection boxes.

    gray [H, W] float32; boxes [M, 4] (left, top, right, bottom);
    slots [M] int32 target slot per box; mask [M] bool (padding rows off).
    Mirrors ``dlib.correlation_tracker().start_track`` (`tracking.py:250-251`).
    """
    from .warp import transpose_for_chips

    H, W = gray.shape
    imT = transpose_for_chips(gray[None, ..., None])
    zero_idx = jnp.zeros((boxes.shape[0],), dtype=jnp.int32)
    pos, size, num, den, s_num, s_den = _filter_init_from_boxes(
        imT, H, W, zero_idx, boxes)

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
        num_re=scatter(state.num_re, num.real),
        num_im=scatter(state.num_im, num.imag),
        den=scatter(state.den, den),
        s_num_re=scatter(state.s_num_re, s_num.real),
        s_num_im=scatter(state.s_num_im, s_num.imag),
        s_den=scatter(state.s_den, s_den),
        alive=scatter(state.alive, mask),
    )


def restart_slots(state: TrackState, imT: jnp.ndarray, H: int, W: int,
                  frame_idx: jnp.ndarray, boxes: jnp.ndarray,
                  mask: jnp.ndarray) -> TrackState:
    """Re-initialise EVERY masked slot from its box — select, not scatter.

    imT: pre-transposed frame stack; frame_idx [N] the frame each slot
    restarts from; boxes [N, 4] (one per slot), mask [N] bool.  Unlike
    ``start_tracks`` (M detections scattered into M slots), this
    full-width variant has no duplicate-index scatter hazard, so it is
    safe inside vmapped/scanned code where masked-off rows must leave
    their slots bit-identical.
    """
    pos, size, num, den, s_num, s_den = _filter_init_from_boxes(
        imT, H, W, frame_idx, boxes)

    m1 = mask[:, None]
    m3 = mask[:, None, None]
    return TrackState(
        pos=jnp.where(m1, pos, state.pos),
        size=jnp.where(m1, size, state.size),
        num_re=jnp.where(m3, num.real, state.num_re),
        num_im=jnp.where(m3, num.imag, state.num_im),
        den=jnp.where(m3, den, state.den),
        s_num_re=jnp.where(m3, s_num.real, state.s_num_re),
        s_num_im=jnp.where(m3, s_num.imag, state.s_num_im),
        s_den=jnp.where(m1, s_den, state.s_den),
        alive=state.alive | mask,
    )


def _step_core(state: TrackState, imT: jnp.ndarray, H: int, W: int,
               slot_frame: jnp.ndarray, min_confidence):
    """Advance ALL slots one frame (batched dlib ``update``).

    imT: pre-transposed frame stack (`warp.transpose_for_chips` of
    [F, H, W, 1]); ``slot_frame[n]`` names the frame slot n tracks in —
    multiple independent lanes (forward/backward passes, parallel shots)
    advance in the same batched program.  Returns (new_state, boxes [N, 4],
    confidences [N]).  Slots whose PSR drops below ``min_confidence`` are
    marked dead (reference kill rule, `tracking.py:203-206`); dead slots
    freeze.
    """
    hann = _hann2d()
    G = _gaussian_target_fft()

    # --- translation: single-scale response (the separate 1-D scale
    # filter below handles size, Danelljan's DSST split) ------------------
    # ALL slots sampled in one structured-access batch, the whole response
    # stack in two batched FFTs — no per-slot loops.
    patches = _extract_patches(imT, H, W, slot_frame, state.pos, state.size,
                               jnp.ones((1,), dtype=jnp.float32))[:, 0]
    # NOTE: a DFT-as-matmul variant of this response (full 2-D DFT via
    # four [P, P] einsum chains on the MXU) was measured at device parity
    # with jnp.fft at P=64 (28 ms per 128-frame direction either way,
    # bf16-multiply error 4e-3) — the scan is dominated by patch
    # extraction + PSR reductions, not the FFTs, so the FFT form stays.
    Fz = jnp.fft.rfft2(_features(patches, hann))          # [N, P, Pr]
    num = jax.lax.complex(state.num_re, state.num_im)
    resp = jnp.fft.irfft2(Fz * num / (state.den + LAMBDA), s=(P, P))

    def psr_of(r):
        flat_idx = jnp.argmax(r.reshape(-1))
        py = flat_idx // P
        px = flat_idx % P
        peak = r.reshape(-1)[flat_idx]
        idx = jnp.arange(P)
        dy = jnp.minimum(jnp.abs(idx - py), P - jnp.abs(idx - py))
        dx = jnp.minimum(jnp.abs(idx - px), P - jnp.abs(idx - px))
        side = (dy[:, None] > PSR_WINDOW) | (dx[None, :] > PSR_WINDOW)
        n_side = jnp.maximum(jnp.sum(side), 1)
        mu = jnp.sum(r * side) / n_side
        var = jnp.sum(((r - mu) ** 2) * side) / n_side
        return (peak - mu) / jnp.sqrt(var + 1e-8), py, px

    psr, py, px = jax.vmap(psr_of)(resp)                  # [N] each

    dy_pix = jnp.where(py <= P // 2, py, py - P).astype(jnp.float32)
    dx_pix = jnp.where(px <= P // 2, px, px - P).astype(jnp.float32)
    region = PATCH_SCALE * state.size
    new_pos = state.pos + jnp.stack(
        [dy_pix * region[:, 0] / P, dx_pix * region[:, 1] / P], axis=1
    )

    # --- one shared super-patch at the new position ----------------------
    # The scale-measure stack, the translation-filter update patch, and the
    # scale-filter update stack all sample the same neighbourhood of
    # new_pos; ONE frame-resolution structured access covers the union
    # (PATCH_SCALE·span·size ≈ 2.75×size bounds 2×new_size and
    # span×{size, new_size} since new_size/size = rel ∈ [1/span, span]),
    # and the three consumers resample from it.  Cuts the scan's
    # frame-resolution extractions per step from 4 to 2 — extraction, not
    # FFT, dominates the step (measured; see `_extract_patches` notes).
    span = float(SCALE_STEP ** (SCALE_N // 2))
    sup_region = (PATCH_SCALE * span) * state.size          # [N, 2]
    supers = _super_patch(imT, H, W, slot_frame, new_pos, sup_region,
                          _STEP_SUPER)
    factors = _scale_factors()

    # --- scale: 1-D correlation over SCALE_N samples at the new position -
    frac_s = (factors[None, :, None] * state.size[:, None, :]
              / sup_region[:, None, :])                     # [N, S, 2]
    Fs = _scale_fft_from_samples(
        _resample_super(supers, frac_s[..., 0], frac_s[..., 1], SCALE_FEAT))
    s_num = jax.lax.complex(state.s_num_re, state.s_num_im)
    s_resp = jnp.fft.irfft(
        jnp.sum(s_num * Fs, axis=1) / (state.s_den + LAMBDA), n=SCALE_N,
        axis=-1,
    )                                                      # [N, SCALE_N]
    # integer-bin argmax, like dlib's DSST.  (A parabolic sub-bin
    # interpolation — fDSST's response refinement — was tried and reverted:
    # on STATIC targets the fit's ±½-bin noise has no deadzone, so size
    # random-walks ~1%/frame and long static tracks fragment; argmax
    # quantisation is itself the deadzone.  17 bins at 1.02 spacing track
    # the 3%/frame zoom tests inside the 10% bound without it.)
    peak = jnp.argmax(s_resp, axis=1)                      # [N]
    kbin = peak.astype(jnp.float32) - SCALE_N // 2
    rel = jnp.float32(SCALE_STEP) ** kbin                  # [N]
    new_size = jnp.maximum(state.size * rel[:, None], 4.0)

    # --- update both filters at the new position --------------------------
    frac_u = PATCH_SCALE * new_size / sup_region            # [N, 2]
    upd_patch = _resample_super(supers, frac_u[:, None, 0],
                                frac_u[:, None, 1], P)[:, 0]
    Fn = jnp.fft.rfft2(_features(upd_patch, hann))
    upd = G[None] * jnp.conj(Fn)
    new_num_re = (1.0 - ETA) * state.num_re + ETA * upd.real
    new_num_im = (1.0 - ETA) * state.num_im + ETA * upd.imag
    new_den = (1.0 - ETA) * state.den + ETA * (Fn * jnp.conj(Fn)).real

    # the scale filter trains on the MEASUREMENT stack Fs (sampled around
    # the previous size) instead of re-extracting a second stack at
    # new_size — half the scale stage's resample+FFT cost (the resample
    # stacks were the measured hot spot of the whole scan).  To train
    # consistently, the Gaussian response target is circularly SHIFTED to
    # the measured scale ``kbin`` (a phase ramp on its rfft): the filter
    # learns "this stack's true scale sits kbin off centre", exactly what
    # re-sampling at new_size and using a centred target would teach.
    Gs = _scale_target_fft()
    freqs = jnp.arange(_SCALE_SR, dtype=jnp.float32)
    ang = (-2.0 * jnp.pi / SCALE_N) * kbin[:, None] * freqs[None, :]
    shift = jax.lax.complex(jnp.cos(ang), jnp.sin(ang))    # [N, Sr]
    s_upd = (Gs[None, None, :] * shift[:, None, :]) * jnp.conj(Fs)
    new_s_num_re = (1.0 - SCALE_ETA) * state.s_num_re + SCALE_ETA * s_upd.real
    new_s_num_im = (1.0 - SCALE_ETA) * state.s_num_im + SCALE_ETA * s_upd.imag
    new_s_den = ((1.0 - SCALE_ETA) * state.s_den
                 + SCALE_ETA * jnp.sum((Fs * jnp.conj(Fs)).real, axis=1))

    a1 = state.alive[:, None]
    a3 = state.alive[:, None, None]
    pos = jnp.where(a1, new_pos, state.pos)
    size = jnp.where(a1, new_size, state.size)
    num_re = jnp.where(a3, new_num_re, state.num_re)
    num_im = jnp.where(a3, new_num_im, state.num_im)
    den = jnp.where(a3, new_den, state.den)
    s_num_re = jnp.where(a3, new_s_num_re, state.s_num_re)
    s_num_im = jnp.where(a3, new_s_num_im, state.s_num_im)
    s_den = jnp.where(a1, new_s_den, state.s_den)
    conf = jnp.where(state.alive, psr, -jnp.inf)
    alive = state.alive & (conf >= min_confidence)
    boxes = jnp.stack(
        [pos[:, 1] - size[:, 1] / 2, pos[:, 0] - size[:, 0] / 2,
         pos[:, 1] + size[:, 1] / 2, pos[:, 0] + size[:, 0] / 2],
        axis=1,
    )
    return (TrackState(pos, size, num_re, num_im, den,
                       s_num_re, s_num_im, s_den, alive), boxes, conf)


@jax.jit
def step(state: TrackState, gray: jnp.ndarray,
         min_confidence: float = 10.0) -> Tuple[TrackState, jnp.ndarray, jnp.ndarray]:
    """Single-frame convenience wrapper over ``_step_core``."""
    from .warp import transpose_for_chips

    H, W = gray.shape
    imT = transpose_for_chips(gray[None, ..., None])
    slot_frame = jnp.zeros((state.alive.shape[0],), dtype=jnp.int32)
    return _step_core(state, imT, H, W, slot_frame, min_confidence)


# ---------------------------------------------------------------------------
# Whole-shot scan: DSST + association + track bookkeeping in ONE dispatch
# ---------------------------------------------------------------------------
# Packed per-slot emission layout (host reads one array per shot):
PACK_BOX = slice(0, 4)   # l, t, r, b (pixel coords)
PACK_CONF = 4            # PSR confidence
PACK_STATUS = 5          # 0 dead / 1 tracked / 2 detection point
PACK_UID = 6             # track uid (int, stored as float)
PACK_DET = 7             # detection index at this frame (-1 if none)
PACK_WIDTH = 8


def _optimal_match(overlap: jnp.ndarray) -> jnp.ndarray:
    """Exact maximum-total-overlap one-to-one matching on device.

    overlap [N, D] (zeros = gated out / invalid) → match_slot [D] int32
    (slot per detection, -1 unmatched).  Same objective as the reference's
    Hungarian over the gated overlap matrix (`tracking.py:159-182`):
    maximise the summed overlap of the chosen pairs, zero-overlap pairs
    never matched.  Greedy-by-max diverges from this exactly where track
    identities are at stake — two crossing faces with near-equal mutual
    overlaps — so the live path runs the optimal matcher
    (`tests/test_warp_dsst.py` TestAssociation parity tests).

    D is small (≤ MAX_FACES = 8 detection slots) so exact assignment is a
    bitmask DP over detection subsets: dp[mask] = best total overlap with
    used-detection set ``mask`` after a prefix of trackers, advanced one
    tracker per `lax.scan` step ([2^D, D] gather + max — trivial next to
    the DSST FFT work), then a reverse scan backtracks the argmax
    choices.  Ties break deterministically (skip beats a tied match,
    lowest detection index wins) — the total always equals Hungarian's,
    and the pairing is identical whenever the optimum is unique.
    """
    N, D = overlap.shape
    if D > 12:  # 2^D DP table; crowd shots bucket detections past 12
        return _jv_match(overlap)
    M = 1 << D
    masks = jnp.arange(M, dtype=jnp.int32)
    d_idx = jnp.arange(D, dtype=jnp.int32)
    has_d = ((masks[:, None] >> d_idx[None, :]) & 1) > 0   # [M, D]
    prev_mask = masks[:, None] ^ (1 << d_idx[None, :])     # [M, D]

    NEG = jnp.float32(-1e30)
    # zero-gated pairs must never be chosen (reference keeps only
    # overlap > 0 pairs, `tracking.py:178`)
    ov = jnp.where(overlap > 0.0, overlap.astype(jnp.float32), NEG)

    dp0 = jnp.full((M,), NEG, dtype=jnp.float32).at[0].set(0.0)

    def fwd(dp, ov_n):
        # candidate: tracker n takes detection d, completing ``mask``
        cand = jnp.where(has_d, dp[prev_mask] + ov_n[None, :], NEG)  # [M, D]
        best = jnp.max(cand, axis=1)
        best_d = jnp.argmax(cand, axis=1).astype(jnp.int32)
        take = best > dp                                   # strict: ties skip
        new_dp = jnp.where(take, best, dp)
        choice = jnp.where(take, best_d, -1).astype(jnp.int32)
        return new_dp, choice

    dp, choices = jax.lax.scan(fwd, dp0, ov)               # choices [N, M]

    end_mask = jnp.argmax(dp).astype(jnp.int32)

    def bwd(carry, choice_n):
        mask, match_slot, n = carry
        d = choice_n[mask]
        assigned = d >= 0
        match_slot = jnp.where(assigned, match_slot.at[d].set(n), match_slot)
        mask = jnp.where(assigned, mask ^ (1 << jnp.maximum(d, 0)), mask)
        return (mask, match_slot, n - 1), None

    init = (end_mask, jnp.full((D,), -1, dtype=jnp.int32),
            jnp.int32(N - 1))
    (_, match_slot, _), _ = jax.lax.scan(bwd, init, choices, reverse=True)
    return match_slot


def _jv_match(overlap: jnp.ndarray) -> jnp.ndarray:
    """Exact assignment for wide matrices: Jonker–Volgenant on device.

    Same contract/objective as `_optimal_match` ([N, D] gated overlaps →
    match_slot [D]), used when D > 12 makes the bitmask DP table too big
    (crowd shots).  Shortest-augmenting-path over the zero-padded square
    cost matrix ``-overlap`` — the device port of the host implementation
    cross-checked against scipy (`core/assignment.py:hungarian`).  The
    outer row loop is a `lax.fori_loop`; the path search is a
    `lax.while_loop` whose per-iteration work is [n+1]-vector math, so the
    common unambiguous case (first candidate column free) exits after a
    couple of iterations per row.
    """
    N, D = overlap.shape
    n = max(N, D)
    cost = jnp.zeros((n + 2, n + 2), dtype=jnp.float32)
    # rows/cols are 1-indexed (index 0 is the JV virtual source); index
    # n+1 is a parking slot for masked scatter writes
    cost = cost.at[1:N + 1, 1:D + 1].set(-overlap.astype(jnp.float32))
    INF = jnp.float32(3.4e38)

    def solve_row(i, carry):
        u, v, p, way = carry
        p = p.at[0].set(i)
        minv = jnp.full((n + 2,), INF, dtype=jnp.float32).at[0].set(-INF)
        used = jnp.zeros((n + 2,), dtype=bool).at[n + 1].set(True)

        def path_cond(st):
            _, _, _, _, j0, done = st
            return ~done

        def path_body(st):
            u, v, minv, (used, way), j0, _ = st
            used = used.at[j0].set(True)
            i0 = p_ref[0][j0]
            cur = cost[i0, :] - u[i0] - v          # [n+2]
            upd = (~used) & (cur < minv)
            minv2 = jnp.where(upd, cur, minv)
            way2 = jnp.where(upd, j0, way)
            cand = jnp.where(used, INF, minv2)
            j1 = jnp.argmin(cand[: n + 1]).astype(jnp.int32)
            delta = cand[j1]
            # u[p[j]] += delta for used j (j>=1 real cols + virtual 0);
            # scatter via masked index (parking slot n+1 absorbs writes)
            row_idx = jnp.where(used, p_ref[0], n + 1)
            u2 = u.at[row_idx].add(
                jnp.where(used, delta, 0.0), mode="drop")
            v2 = jnp.where(used, v - delta, v)
            minv3 = jnp.where(used, minv2, minv2 - delta)
            done = p_ref[0][j1] == 0
            return (u2, v2, minv3, (used, way2), j1, done)

        # close over p (it only changes in the augmentation phase)
        p_ref = (p,)
        u, v, minv, (used, way), j0, _ = jax.lax.while_loop(
            path_cond, path_body,
            (u, v, minv, (used, way), jnp.int32(0), jnp.asarray(False)))

        def aug_cond(st):
            _, j0 = st
            return j0 != 0

        def aug_body(st):
            p, j0 = st
            j1 = way[j0]
            p = p.at[j0].set(p[j1])
            return p, j1

        p, _ = jax.lax.while_loop(aug_cond, aug_body, (p, j0))
        return u, v, p, way

    u0 = jnp.zeros((n + 2,), dtype=jnp.float32)
    v0 = jnp.zeros((n + 2,), dtype=jnp.float32)
    p0 = jnp.zeros((n + 2,), dtype=jnp.int32)
    way0 = jnp.zeros((n + 2,), dtype=jnp.int32)
    _, _, p, _ = jax.lax.fori_loop(1, n + 1, solve_row, (u0, v0, p0, way0))

    # p[j] = row assigned to column j (1-indexed); keep real positive pairs
    cols = jnp.arange(D, dtype=jnp.int32)
    rows = p[1:D + 1].astype(jnp.int32) - 1
    ok = (rows >= 0) & (rows < N) & (overlap[jnp.clip(rows, 0, N - 1),
                                            cols] > 0.0)
    return jnp.where(ok, rows, -1)


def shot_scan(state: TrackState, uid: jnp.ndarray, next_uid: jnp.ndarray,
              grays: jnp.ndarray, frame_valid: jnp.ndarray,
              det_boxes: jnp.ndarray, det_valid: jnp.ndarray,
              min_confidence, min_overlap_ratio, dup_containment):
    """Tracking over a whole shot in ONE compiled dispatch.

    The reference's per-frame Python loop (detect → Hungarian associate →
    per-tracker update, `tracking.py:184-259`) becomes a single compiled
    ``lax.scan``: every frame advances all tracker slots (batched DSST),
    detection frames run exact optimal association on device
    (`_optimal_match`), kill matched trackers, restart them from their
    detections (continuing the same track uid) and spawn new tracks for
    unmatched detections — the host reads back ONE packed array per shot
    and only rebuilds track lists.

    Parameters
    ----------
    state, uid, next_uid : N tracker slots and the fresh-uid counter.
    grays : [T, H, W] float32 (time-ordered; the caller flips for the
        backward pass).
    frame_valid : [T] bool — padding frames (shape bucketing) are skipped.
    det_boxes : [T, D, 4] float32, det_valid : [T, D] bool.
    min_overlap_ratio : the association gate (`tracking.py:129-134`).
    dup_containment : suppress spawning a new track for an unmatched
        detection whose containment overlap (intersection / min area) with
        a surviving tracker exceeds this — otherwise alignment jitter
        around the gate spawns duplicate parallel tracks (the reference
        inherits this failure mode; we fix it at association time).

    Returns
    -------
    (state, uid, next_uid), packed [T, N, PACK_WIDTH], dropped [T]
        ``dropped[t]`` counts detections that found no free slot (host
        retries the shot with a bigger slot bucket).
    """
    from .boxes import gated_overlap, overlap_min_ratio
    from .warp import transpose_for_chips

    N = state.alive.shape[0]
    T, H, W = grays.shape
    # ONE whole-shot transpose outside the scan: the per-frame extraction
    # paths gather columns from this; slicing + transposing a frame per
    # step cost ~15 MB/frame of HBM traffic at 720p (measured)
    imT = transpose_for_chips(grays[..., None])

    def det_branch(op):
        st, uid, next_uid, fidx, dboxes, dvalid, tboxes = op
        alive = st.alive
        ov = gated_overlap(tboxes, dboxes, min_overlap_ratio)
        ov = jnp.where(alive[:, None] & dvalid[None, :], ov, 0.0)
        match_slot = _optimal_match(ov)           # [D] slot or -1
        matched = match_slot >= 0

        # duplicate suppression: unmatched detection mostly contained in /
        # containing a surviving (unmatched) tracker → no new track
        slot_matched = jnp.zeros((N,), dtype=jnp.int32).at[
            jnp.where(matched, match_slot, 0)
        ].add(matched.astype(jnp.int32)) > 0
        cont = overlap_min_ratio(tboxes, dboxes)  # [N, D]
        live_unmatched = alive & ~slot_matched
        cont_live = jnp.where(live_unmatched[:, None], cont, 0.0)
        dup = (jnp.max(cont_live, axis=0) > dup_containment) & dvalid
        # the suppressing slot ABSORBS the duplicate's detection node (the
        # host links fwd/bwd tracks through it), otherwise the opposite
        # pass — which meets the duplicate first — still spawns a twin
        dup_slot = jnp.argmax(cont_live, axis=0).astype(jnp.int32)
        spawn = dvalid & ~matched & ~dup

        # free-slot assignment for spawns (stable: lowest slots first)
        free = ~alive
        slot_order = jnp.argsort(~free)           # free slots first
        n_free = jnp.sum(free)
        rank = jnp.cumsum(spawn.astype(jnp.int32)) - 1
        has_slot = spawn & (rank < n_free)
        new_slot = slot_order[jnp.clip(rank, 0, N - 1)].astype(jnp.int32)
        dropped = jnp.sum(spawn & ~has_slot)
        target = jnp.where(matched, match_slot,
                           jnp.where(has_slot, new_slot, -1))
        restart = target >= 0

        # per-slot view of the (injective) detection → slot map
        onehot = (target[None, :] == jnp.arange(N)[:, None]) & restart[None, :]
        slot_has_det = jnp.any(onehot, axis=1)
        det_for_slot = jnp.argmax(onehot, axis=1).astype(jnp.int32)

        # fresh uids for spawned tracks; matched restarts keep their uid
        fresh = restart & ~matched
        fresh_rank = jnp.cumsum(fresh.astype(jnp.int32)) - 1
        slot_is_fresh = slot_has_det & fresh[det_for_slot]
        uid = jnp.where(slot_is_fresh,
                        next_uid + fresh_rank[det_for_slot], uid)
        next_uid = next_uid + jnp.sum(fresh)

        # restart trackers from their detection boxes: fresh filter state —
        # dlib start_track semantics (`tracking.py:250-259`); a matched
        # slot's old filter dies and its detection re-seeds the same slot,
        # continuing the track uid
        slot_boxes = dboxes[det_for_slot]
        st = restart_slots(st, imT, H, W,
                           jnp.full((N,), fidx, dtype=jnp.int32),
                           slot_boxes, slot_has_det)

        # absorbed-duplicate links (disjoint from restarted slots: the
        # suppressor is live and unmatched, restarts hit matched/free slots)
        onehot_abs = ((dup_slot[None, :] == jnp.arange(N)[:, None])
                      & dup[None, :])
        slot_abs = jnp.any(onehot_abs, axis=1) & live_unmatched
        abs_det = jnp.argmax(onehot_abs, axis=1).astype(jnp.int32)

        return (st, uid, next_uid, slot_has_det, det_for_slot, slot_boxes,
                slot_abs, abs_det, dropped)

    def frame_body(op):
        st, uid, next_uid, fidx, dboxes, dvalid = op
        alive_before = st.alive
        st2, tboxes, conf = _step_core(
            st, imT, H, W, jnp.full((N,), fidx, dtype=jnp.int32),
            min_confidence)
        # the frame-level cond already guards whole-frame validity;
        # per-slot passthrough selects would only add state traffic
        st = st2
        tracked = alive_before & (conf >= min_confidence)

        def no_dets(op2):
            sub, uid0, next_uid = op2[0], op2[1], op2[2]
            return (sub, uid0, next_uid,
                    jnp.zeros((N,), dtype=bool),
                    jnp.zeros((N,), dtype=jnp.int32),
                    jnp.zeros((N, 4), dtype=jnp.float32),
                    jnp.zeros((N,), dtype=bool),
                    jnp.zeros((N,), dtype=jnp.int32),
                    jnp.int32(0))

        (st, uid, next_uid, slot_has_det, det_for_slot, slot_boxes,
         slot_abs, abs_det, dropped) = jax.lax.cond(
            jnp.any(dvalid), det_branch, no_dets,
            (st, uid, next_uid, fidx, dboxes, dvalid, tboxes),
        )

        out_box = jnp.where(slot_has_det[:, None], slot_boxes, tboxes)
        out_status = jnp.where(slot_has_det, 2.0,
                               jnp.where(tracked, 1.0, 0.0))
        out_det = jnp.where(slot_has_det, det_for_slot.astype(jnp.float32),
                            jnp.where(slot_abs, abs_det.astype(jnp.float32),
                                      -1.0))
        packed = jnp.concatenate(
            [out_box, conf[:, None], out_status[:, None],
             uid.astype(jnp.float32)[:, None], out_det[:, None]], axis=1,
        )
        return (st, uid, next_uid), packed, dropped

    def body(carry, inp):
        st, uid, next_uid = carry
        fidx, f_valid, dboxes, dvalid = inp

        def run(_):
            return frame_body((st, uid, next_uid, fidx,
                               dboxes, dvalid & f_valid))

        def skip(_):
            return ((st, uid, next_uid),
                    jnp.zeros((N, PACK_WIDTH), dtype=jnp.float32),
                    jnp.int32(0))

        carry2, packed, dropped = jax.lax.cond(f_valid, run, skip, None)
        return carry2, (packed, dropped)

    (state, uid, next_uid), (packed, dropped) = jax.lax.scan(
        body, (state, uid, next_uid),
        (jnp.arange(T, dtype=jnp.int32), frame_valid, det_boxes, det_valid),
    )
    return (state, uid, next_uid), packed, dropped


shot_scan_jit = jax.jit(shot_scan)


@partial(jax.jit, static_argnames=())
def track_scan(state: TrackState, grays: jnp.ndarray,
               min_confidence: float = 10.0):
    """Track through a frame block with ONE compiled scan.

    grays [T, H, W] float32 → (final_state, boxes [T, N, 4], confs [T, N],
    alive_before [T, N]).  ``alive_before[t]`` tells which slots were live
    when frame t was processed (the reference records a tracker's position
    for every frame it survives into, `tracking.py:227-244`).
    """
    from .warp import transpose_for_chips

    T, H, W = grays.shape
    N = state.alive.shape[0]
    imT = transpose_for_chips(grays[..., None])

    def body(st, fidx):
        alive_before = st.alive
        st2, boxes, conf = _step_core(
            st, imT, H, W, jnp.full((N,), fidx, dtype=jnp.int32),
            min_confidence)
        # pack per-frame outputs into ONE array so the host needs a single
        # readback per chunk (device->host round-trips are expensive)
        packed = jnp.concatenate(
            [boxes, conf[:, None], alive_before.astype(jnp.float32)[:, None]],
            axis=1,
        )
        return st2, packed

    final, packed = jax.lax.scan(body, state, jnp.arange(T, dtype=jnp.int32))
    boxes = packed[:, :, 0:4]
    confs = packed[:, :, 4]
    alive = packed[:, :, 5] > 0.5
    return final, boxes, confs, alive
