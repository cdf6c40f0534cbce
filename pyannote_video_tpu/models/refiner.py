"""Candidate-refining CNN — stage 2 of the face-detection cascade.

The pyramid FCN (`models/detector.py`) is a high-recall *proposer*: at a
0.5-logit gate it recovers every real face on all probed seeds and
domains, but a single dense stage that must score every (position, scale)
cell cannot simultaneously hold BOTH score tails — eight measured
retrains (r4–r5) traded "posed/occluded faces score high" against
"face-like props (pale dials, featureless heads) score low", with the
wide-seed margin never beating −0.9.  The classical fix — and what this
module is — is a cascade: a small classifier re-scores the top proposals
at a *canonical scale and position*, where "two dark marks on a pale
disc" and "a blurred rolled face" are trivially separable because the
network sees each candidate centred, contextualised and at fixed
resolution.  (The reference's dlib MMOD detector achieves its margin
with millions of real photos; on this synthetic distribution the
cascade is the capacity-honest equivalent.)

TPU-first shape: candidate selection is a device-side ``top_k``, crops
are gather-free dense-matmul resamples (`ops/crop.py`), and the whole
refine step fuses into the SAME jitted program as the pyramid
(`FaceDetector._pyramid_fn`), so streaming/CLI/bench/probe all serve the
cascade with no extra dispatch.  The final score of a refined candidate
is the refiner logit; unrefined slots (below top-K at stage 1) drop to
``UNREFINED``, far under any operating threshold.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .nn import Params, batch_norm, bn_init, conv, conv_init
from ..ops.crop import crop_resize

# refined-candidate crop geometry: square window at CONTEXT × the
# candidate's larger side, centred on the candidate — enough surround to
# judge "is the blob attached to hair/shoulders or floating on a shelf"
CROP = 64
CONTEXT = 1.40
# proposals re-scored per frame.  Stage-1 keeps TOPK per pyramid level
# (~13 levels at 480p); a real face occupies 2-4 of those slots across
# adjacent levels, so 16 covers several faces + distractors per frame.
REFINE_K = 16
# score assigned to candidates outside stage-1's top-K — below any
# plausible operating threshold on the refined-logit scale
UNREFINED = -12.0
# stage-1 proposal gate: refined scores only *replace* stage-1 logits
# above this (the probe-verified full-recall level, see
# evals/probe_detector.py); below it a crop is likelier noise than face
# and keeps UNREFINED regardless of what the refiner thinks of it.
PROPOSAL_GATE = 0.5


def init_params(key, widths: Tuple[int, ...] = (32, 64, 96, 128),
                hidden: int = 128) -> Params:
    """4× stride-2 3×3 conv stack (64² → 4²) + 2-layer dense head.

    ~0.5 M parameters — an order of magnitude smaller than the embedder;
    the job is one binary decision on a centred 64² patch.
    """
    ks = jax.random.split(key, len(widths) + 2)
    params: Params = {}
    c_in = 3
    for i, c_out in enumerate(widths, start=1):
        params[f"c{i}"] = conv_init(ks[i - 1], 3, 3, c_in, c_out)
        params[f"bn{i}"] = bn_init(c_out)
        c_in = c_out
    feat = (CROP // (2 ** len(widths))) ** 2 * c_in
    w1 = jax.random.normal(ks[-2], (feat, hidden)) * np.sqrt(2.0 / feat)
    w2 = jax.random.normal(ks[-1], (hidden, 1)) * np.sqrt(2.0 / hidden)
    params["d1"] = {"w": w1, "b": jnp.zeros((hidden,))}
    params["d2"] = {"w": w2, "b": jnp.zeros((1,))}
    return params


def forward(params: Params, crops: jnp.ndarray, train: bool = False,
            compute_dtype=jnp.bfloat16):
    """crops [N, CROP, CROP, 3] float (0-255) → logits [N].

    Returns (logits, updated-params); params change only in train mode
    (batch-norm statistics).
    """
    x = crops.astype(compute_dtype) / 256.0 - 0.5
    new: Dict[str, Params] = {}
    i = 1
    while f"c{i}" in params:
        x = conv(params[f"c{i}"], x, stride=2, dlib_padding=False,
                 compute_dtype=compute_dtype)
        x, new[f"bn{i}"] = batch_norm(params[f"bn{i}"], x, train=train)
        x = jax.nn.relu(x)
        i += 1
    x = x.reshape(x.shape[0], -1)
    h = x @ params["d1"]["w"].astype(jnp.float32) + params["d1"]["b"]
    h = jax.nn.relu(h)
    logits = h @ params["d2"]["w"].astype(jnp.float32) + params["d2"]["b"]
    if train:
        return logits[:, 0], {**params, **new}
    return logits[:, 0], params


def crop_boxes(boxes: jnp.ndarray, context: float = CONTEXT) -> jnp.ndarray:
    """Candidate boxes [..., 4] → square context windows [..., 4]."""
    l, t, r, b = (boxes[..., i] for i in range(4))
    cx, cy = (l + r) / 2.0, (t + b) / 2.0
    half = jnp.maximum(r - l, b - t) * (context / 2.0)
    return jnp.stack([cx - half, cy - half, cx + half, cy + half], axis=-1)


def refine_scores(ref_params: Params, frames: jnp.ndarray,
                  scores: jnp.ndarray, boxes: jnp.ndarray,
                  compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Re-score each frame's top stage-1 candidates with the refiner.

    frames [B, H, W, 3] float (the SAME array the pyramid consumed —
    original detect resolution, not a pyramid level); scores [B, K_total];
    boxes [B, K_total, 4] in frame coordinates.  Returns new scores
    [B, K_total]: refiner logits on the refined top-K slots (where stage 1
    cleared PROPOSAL_GATE), ``UNREFINED`` elsewhere.
    """
    B, K_total = scores.shape
    k = min(REFINE_K, K_total)
    top_s, top_i = jax.lax.top_k(scores, k)                      # [B, k]
    top_boxes = jnp.take_along_axis(boxes, top_i[..., None], axis=1)
    windows = crop_boxes(top_boxes)
    crops = crop_resize(frames.astype(compute_dtype), windows, CROP)
    logits, _ = forward(ref_params, crops.reshape((B * k,) + crops.shape[2:]),
                        compute_dtype=compute_dtype)
    logits = logits.reshape(B, k)
    logits = jnp.where(top_s > PROPOSAL_GATE, logits, UNREFINED)
    out = jnp.full((B, K_total), UNREFINED, dtype=scores.dtype)
    return out.at[jnp.arange(B)[:, None], top_i].set(
        logits.astype(scores.dtype))
