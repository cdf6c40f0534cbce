"""Serve-scale bootstrapped hard-negative mining for the detector.

dlib's MMOD trainer mines false positives from whole images through the
SAME pyramid it serves with (dlib/dnn/loss.h ``loss_mmod_``: every cell
of every pyramid level above the margin is a candidate loss term) — so
whatever configuration fires at serve time is, by construction, inside
the training distribution.  The 128 px crop trainer here historically
lacked that property: its clutter negatives are rendered AT crop scale,
while a serve-time distractor reaches the detector through 4-6 chained
3/4 downscales of a full frame, with accumulated resample blur and a
context window larger than the object.  Measured gap (r5, detector v5):
trainer crops' hardest negative cells score ≤ 3 logits while the SAME
generator families pushed through the serve pyramid reach 7.5, and the
wide-probe decoy tail sat at 9.9 — invisible to crop-scale training
pressure, however the clutter families are tuned.

This module closes the gap the way dlib does, bootstrapped: render
NEGATIVE frames (no faces) at frame scale from the trainer's own
generator families, run the CURRENT weights' chained pyramid exactly as
serving does (`models/detector.py:pyramid_candidates` semantics, bf16
resample chain included), and harvest 128 px crops AROUND the
highest-scoring cells — from the level image the detector actually saw,
not the original frame.  The trainer mixes these into every batch as
all-negative crops and refreshes the buffer as the weights move, so new
FP families surface as old ones are crushed.

Eval-shift hygiene: mining renders through `train.data`'s families only
(`_draw_clutter`, featureless heads, `_photometric_aug`); nothing here
imports `utils/synthetic_shift.py`.
"""

from __future__ import annotations

from dataclasses import replace
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.detector import STRIDE, WINDOW, forward_maps, pyramid_scales
from ..ops.color import resize_bilinear
from ..utils.synthetic import FaceParams, _background, render_face
from .data import _draw_clutter, _photometric_aug

MINE_H, MINE_W = 360, 480   # frame scale: deep enough for a 5-level chain
MINE_MIN_LOGIT = 0.0        # harvest cells above the negative hinge target
MINE_PER_FRAME = 3          # top cells kept per frame per level


def negative_frame(rng: np.random.Generator,
                   h: int = MINE_H, w: int = MINE_W) -> np.ndarray:
    """One frame-scale NEGATIVE scene: background mosaic + the trainer's
    distractor families at a broad size band (clutter up to ~45% of the
    frame height — the serve pyramid, not the renderer, brings it into
    the detector's window band)."""
    bg = _background(w, h, rng).astype(np.float32)
    if rng.random() < 0.6:  # featureless skin-tone head
        decoy = replace(FaceParams.random(rng),
                        eye_r=0.0, mouth_w=0.0, nose_len=0.2)
        dh = float(rng.uniform(0.12, 0.45) * h)
        render_face(bg, float(rng.uniform(dh, w - dh)),
                    float(rng.uniform(dh / 2, h - dh / 2)), dh, decoy)
    for _ in range(int(rng.integers(2, 6))):
        _draw_clutter(bg, rng, float(rng.uniform(0.6, 4.0) * WINDOW))
    return np.clip(_photometric_aug(bg, rng), 0, 255).astype(np.uint8)


@partial(jax.jit, static_argnames=("dims",))
def _pyramid_maps(params, frames, dims: Tuple[Tuple[int, int], ...]):
    """Chained-downsample pyramid (serve semantics, bf16 chain) returning
    each level's (logits, level image) instead of decoded boxes."""
    outs = []
    cur = frames.astype(jnp.bfloat16)
    for (lh, lw) in dims:
        if (lh, lw) != (cur.shape[1], cur.shape[2]):
            cur = resize_bilinear(cur, lh, lw)
        maps, _ = forward_maps(params, cur)
        outs.append((maps[..., 0], cur))
    return outs


class HardNegativeMiner:
    """Ring buffer of serve-mined hard-negative crops.

    ``refresh(params)`` renders a few negative frames, runs the serve
    pyramid under the CURRENT params, and stores 128 px crops centered on
    every cell scoring above ``MINE_MIN_LOGIT`` (top ``MINE_PER_FRAME``
    per frame per level).  ``sample(rng, n)`` draws crops for the trainer
    to substitute into its batch (labels all-negative).
    """

    def __init__(self, crop: int = 128, capacity: int = 512,
                 frames_per_refresh: int = 8, seed: int = 77):
        self.crop = crop
        self.capacity = capacity
        self.frames_per_refresh = frames_per_refresh
        self._rng = np.random.default_rng(seed)
        self._buf: List[np.ndarray] = []
        self._next = 0  # ring write cursor once full
        self.mined_total = 0
        self.last_max_logit = float("-inf")
        scales = [s for s in pyramid_scales(MINE_H, MINE_W) if s <= 1.0]
        self._dims = tuple(
            (max(STRIDE * 2, int(round(MINE_H * s))),
             max(STRIDE * 2, int(round(MINE_W * s)))) for s in scales)

    def __len__(self) -> int:
        return len(self._buf)

    def _store(self, patch: np.ndarray) -> None:
        if len(self._buf) < self.capacity:
            self._buf.append(patch)
        else:
            self._buf[self._next] = patch
            self._next = (self._next + 1) % self.capacity
        self.mined_total += 1

    def refresh(self, params) -> int:
        """Mine under ``params``; returns the number of crops harvested."""
        frames = np.stack([negative_frame(self._rng)
                           for _ in range(self.frames_per_refresh)])
        levels = _pyramid_maps(params, jnp.asarray(frames, jnp.float32),
                               self._dims)
        c, found, mx = self.crop, 0, float("-inf")
        for logits_j, imgs_j in levels:
            logits = np.asarray(logits_j, np.float32)
            imgs = np.asarray(imgs_j, np.float32)
            B, mh, mw = logits.shape
            flat = logits.reshape(B, -1)
            for b in range(B):
                top = np.argsort(flat[b])[::-1][:MINE_PER_FRAME]
                for i in top:
                    sc = float(flat[b, i])
                    mx = max(mx, sc)
                    if sc < MINE_MIN_LOGIT:
                        break  # sorted: the rest are lower
                    r, col = divmod(int(i), mw)
                    cy, cx = r * STRIDE + STRIDE // 2, \
                        col * STRIDE + STRIDE // 2
                    lh, lw = imgs.shape[1:3]
                    y0 = int(np.clip(cy - c // 2, 0, max(lh - c, 0)))
                    x0 = int(np.clip(cx - c // 2, 0, max(lw - c, 0)))
                    patch = imgs[b, y0:y0 + c, x0:x0 + c]
                    if patch.shape[0] < c or patch.shape[1] < c:
                        patch = np.pad(
                            patch, ((0, c - patch.shape[0]),
                                    (0, c - patch.shape[1]), (0, 0)),
                            mode="edge")
                    self._store(np.clip(patch, 0, 255).astype(np.uint8))
                    found += 1
        self.last_max_logit = mx
        return found

    def sample(self, rng: np.random.Generator, n: int) -> List[np.ndarray]:
        if not self._buf:
            return []
        idx = rng.integers(0, len(self._buf), size=min(n, len(self._buf)))
        return [self._buf[int(i)] for i in idx]
