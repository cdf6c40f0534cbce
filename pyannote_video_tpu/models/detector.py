"""CNN face detector: multi-scale FCN over an image pyramid, batched on TPU.

TPU-native counterpart of the detector behind ``Face.iterfaces``
(reference `face/face.py:54,64-67`; per BASELINE.json the target detector is
dlib's MMOD CNN rather than the HOG default).  Architecture follows dlib's
MMOD face net: a stride-8 downsampler (3× conv5×5/2) + 3× conv5×5/1 body +
detection head, slid over an image pyramid (factor 3/4 per level — coarser
than dlib's ``pyramid_down<6>`` because the regression head covers the
wider inter-level size band; see PYRAMID_RATIO).

TPU-first design decisions:

* the whole frame *batch* runs through every pyramid level as one XLA
  program per level (static shapes, unrolled levels) — no per-frame loop;
* per level, a device-side top-K picks candidate cells and decodes boxes in
  original-image coordinates, so only ``[B, K, 6]`` candidates ever reach
  the host (never full score maps);
* the head regresses box deltas on top of the fixed 40×40 MMOD window —
  a strictly-better extension of MMOD's fixed-window decoding;
* final gating = host-side NMS over a few dozen candidates.

SAME padding everywhere keeps the cell→pixel geometry exact:
cell (i, j) at stride 8 ↔ window center ((j+0.5)·8, (i+0.5)·8) at level
scale.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .nn import Params, batch_norm, bn_init, conv, conv_init, load_params
from ..ops.boxes import nms
from ..ops.color import resize_bilinear

WINDOW = 40          # base detection window (px) — MMOD face window size
STRIDE = 8           # total downsampling of the FCN
# dlib's pyramid_down<6> uses 5/6; the box-regression head covers a ±20%
# size band, which spans the gaps of a coarser 3/4 pyramid — 10 levels at
# 720p instead of 15 for ~35% less detector compute at equal recall
PYRAMID_RATIO = 0.75
DETECT_SMALLEST = WINDOW  # smallest detectable face without upsampling
TOPK = 16            # candidates per level per frame
# operating threshold on the REFINED cascade score (`models/refiner.py`;
# serving gates on the stage-2 logit of each stage-1 proposal).  The
# single-stage pyramid could not hold a wide-seed margin — measured over
# eight r4-r5 retrains, min(real) − max(fp) never beat −0.9 because
# "posed low-evidence face must score high" and "pale face-like prop must
# score low" fight over the same dense-map capacity.  The cascade's
# refined logits separate cleanly; the calibration table lives in
# evals/PROBE_wide.jsonl (regenerate with evals/probe_detector.py --wide
# after any retrain) and the threshold sits mid-gap.
DEFAULT_THRESHOLD = 4.0
# threshold for the pyramid logits when NO refiner is loaded
# (PYV_NO_REFINE=1 or missing weights): calibrated on seeds 101/202/303
# (real faces >= 7.1, worst distractor 4.1).  On wider seed sweeps the
# single-stage tails overlap (see above) — the refined path is the fix.
STAGE1_THRESHOLD = 4.5


def init_params(key, deep_width: int = 45) -> Params:
    """dlib's MMOD channel plan (16/32/32/45), with an optional wider
    stride-8 tail.

    A 32/64-channel variant (widening EVERY layer) was measured 20%
    SLOWER end-to-end on v5e despite better MXU utilization — the
    full-resolution stem layers are bandwidth-bound, so their extra FLOPs
    just cost HBM traffic.  ``deep_width`` widens ONLY c4-c6 + head,
    which run on 1/8-resolution maps: their HBM traffic is 1/64 of the
    stem's and wider channels fill the MXU better, so the cost is noise.
    The packaged weights train at 96 since r5: at 45 channels,
    serve-scale hard-negative mining never converged — every mining
    refresh surfaced fresh 9-11-logit pale-disc decoys because the net
    cannot keep "dark dots on a pale blob" and "eyes+mouth on a face"
    apart at that capacity (the shared mode IS most of what 45 channels
    can represent; measured across the v5-v7 fine-tunes, wide-probe
    fp_max never fell below 8.9 while trainer-frame FPs were crushed
    to 0 each round).  dlib-imported ``.dat`` models keep their own
    channel plan — the forward pass reads shapes from the params."""
    ks = jax.random.split(key, 8)
    dw = deep_width
    return {
        "c1": conv_init(ks[0], 5, 5, 3, 16),
        "bn1": bn_init(16),
        "c2": conv_init(ks[1], 5, 5, 16, 32),
        "bn2": bn_init(32),
        "c3": conv_init(ks[2], 5, 5, 32, 32),
        "bn3": bn_init(32),
        "c4": conv_init(ks[3], 5, 5, 32, dw),
        "bn4": bn_init(dw),
        "c5": conv_init(ks[4], 5, 5, dw, dw),
        "bn5": bn_init(dw),
        "c6": conv_init(ks[5], 5, 5, dw, dw),
        "bn6": bn_init(dw),
        # head: 1 score + 4 box deltas (dx, dy, log dw, log dh)
        "head": conv_init(ks[6], 9, 9, dw, 5),
    }


def s2d_stem_weights(c1: Params) -> Params:
    """Space-to-depth repack of the stride-2 5×5 stem — EXACT transform.

    The first conv is the pyramid's bandwidth anomaly: 3 input channels
    at full level resolution with stride 2, the worst shape for the MXU's
    lane tiling.  Repacking 2×2 pixel blocks into channels turns it into
    a stride-1 3×3 conv over 12 channels on a half-resolution grid — the
    same dot products in a tiling-friendly layout.  Derivation (symmetric
    pad 2, the `nn.conv` dlib_padding=False convention):
    ``out(y) = Σ_ky w[ky]·in(2y+ky−2)`` and ``sd(y', a) = in(2y'+a)``
    give ``in(2y+ky−2) = sd(y−1+⌊ky/2⌋, ky mod 2)`` — a 3-tap stride-1
    kernel with pad 1, zero at (tap 2, parity 1).  Exactness is pinned by
    tests/test_models.py (s2d parity).
    """
    w = np.asarray(c1["w"])                       # [5, 5, C, O]
    kh, kw, C, O = w.shape
    assert kh == 5 and kw == 5, "s2d transform is derived for 5×5 stems"
    w2 = np.zeros((3, 3, 4 * C, O), dtype=w.dtype)
    for ky in range(5):
        for kx in range(5):
            ch = ((ky % 2) * 2 + (kx % 2)) * C
            w2[ky // 2, kx // 2, ch:ch + C] = w[ky, kx]
    return {"w": jnp.asarray(w2), "b": jnp.asarray(np.asarray(c1["b"]))}


def with_s2d_stem(params: Params) -> Params:
    """Serving-time param set with the derived space-to-depth stem.

    Derived, never trained or serialized: trainers and the ``.dat``
    exporters see only the canonical 5×5 stem.  ``PYV_NO_S2D=1`` keeps
    the plain stride-2 stem (A/B kill switch).
    """
    import os

    if os.environ.get("PYV_NO_S2D") == "1" or "c1_s2d" in params:
        return params
    return {**params, "c1_s2d": s2d_stem_weights(params["c1"])}


def with_refiner(params: Params,
                 refiner_path: Optional[str] = None) -> Params:
    """Serving-time param set with the stage-2 refine cascade attached
    under the ``"refiner"`` key (`models/refiner.py`).

    Like ``c1_s2d``, a runtime-only key: trainers and the ``.dat``
    exporters never see it, and the stage-1 and refiner weight FILES stay
    separate (`models/weights/`).  ``PYV_NO_REFINE=1`` serves the plain
    single-stage pyramid (A/B kill switch); with no trained refiner
    available the single-stage path is also what you get.
    """
    import os

    if os.environ.get("PYV_NO_REFINE") == "1" or "refiner" in params:
        return params
    if refiner_path is not None:
        return {**params, "refiner": load_params(refiner_path)}
    from .weights import default_refiner_params

    ref = default_refiner_params()
    return {**params, "refiner": ref} if ref is not None else params


def _space_to_depth2(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] → [B, ⌈H/2⌉, ⌈W/2⌉, 4C] (zero-padding odd dims —
    equivalent to the stride-2 conv's own high-side padding)."""
    B, H, W, C = x.shape
    if H % 2 or W % 2:
        x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        H, W = x.shape[1], x.shape[2]
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // 2, W // 2, 4 * C)


def forward_maps(params: Params, images: jnp.ndarray, train: bool = False,
                 compute_dtype=jnp.bfloat16):
    """FCN forward: images [B, h, w, 3] float → maps [B, h/8, w/8, 5].

    Returns (maps, updated_params); params change only in train mode.
    When the params carry a ``c1_s2d`` entry (derived at load time by
    `FaceDetector`, never trained or serialized), the stem runs the
    space-to-depth form — identical outputs, better MXU tiling.
    """
    # normalize in the compute dtype: a float32 materialization of the
    # full-resolution level would double its HBM traffic
    x = images.astype(compute_dtype) / 256.0 - 0.5
    new: Dict[str, Params] = {}
    if "c1_s2d" in params and not train:
        h = conv(params["c1_s2d"], _space_to_depth2(x), stride=1,
                 dlib_padding=False, compute_dtype=compute_dtype)
        h, new["bn1"] = batch_norm(params["bn1"], h, train=False)
        h = jax.nn.relu(h)
        rest = (2, 2, 1, 1, 1)
    else:
        h = x
        rest = (2, 2, 2, 1, 1, 1)
    for i, stride in zip(range(7 - len(rest), 7), rest):
        h = conv(params[f"c{i}"], h, stride=stride, dlib_padding=False,
                 compute_dtype=compute_dtype)
        h, bn = batch_norm(params[f"bn{i}"], h, train=train)
        h = jax.nn.relu(h)
        new[f"bn{i}"] = bn
    maps = conv(params["head"], h, stride=1, dlib_padding=False,
                compute_dtype=compute_dtype)
    if train:
        return maps, {**params, **new}
    return maps, params


def pyramid_scales(height: int, width: int, upsample: int = 0,
                   min_dim: float = WINDOW + 8) -> List[float]:
    """Pyramid level scales (original → level), largest first.

    ``upsample`` adds 2× levels above the original resolution so faces
    smaller than the 40 px window become detectable (the reference calls its
    detector with one level of upsampling, `face/face.py:66`).
    """
    scales = [2.0 ** u for u in range(upsample, 0, -1)]
    s = 1.0
    while min(height, width) * s >= min_dim:
        scales.append(s)
        s *= PYRAMID_RATIO
    if not scales:
        scales = [1.0]
    return scales


def _decode_level(params: Params, imgs: jnp.ndarray, scale: float):
    """FCN + device top-K decode for ONE already-resized pyramid level.

    Returns (scores [B, K], boxes [B, K, 4]) in ORIGINAL image coordinates.
    """
    maps, _ = forward_maps(params, imgs)
    B, mh, mw, _ = maps.shape
    logits = maps[..., 0].reshape(B, mh * mw)
    k = min(TOPK, mh * mw)
    top_scores, top_idx = jax.lax.top_k(logits, k)

    rows = (top_idx // mw).astype(jnp.float32)
    cols = (top_idx % mw).astype(jnp.float32)
    deltas = maps[..., 1:].reshape(B, mh * mw, 4)
    d = jnp.take_along_axis(deltas, top_idx[..., None], axis=1)

    # cell center in level coords, regressed window, mapped back to original
    cx = (cols + 0.5) * STRIDE + d[..., 0] * WINDOW
    cy = (rows + 0.5) * STRIDE + d[..., 1] * WINDOW
    w = WINDOW * jnp.exp(jnp.clip(d[..., 2], -1.5, 1.5))
    h = WINDOW * jnp.exp(jnp.clip(d[..., 3], -1.5, 1.5))
    inv = 1.0 / scale
    boxes = jnp.stack(
        [(cx - w / 2) * inv, (cy - h / 2) * inv,
         (cx + w / 2) * inv, (cy + h / 2) * inv],
        axis=-1,
    )
    return top_scores, boxes


@partial(jax.jit, static_argnames=("level_h", "level_w"))
def _level_candidates(params: Params, frames: jnp.ndarray,
                      level_h: int, level_w: int, scale: float):
    """One pyramid level resized directly from the original frames."""
    imgs = resize_bilinear(frames.astype(jnp.bfloat16), level_h, level_w)
    return _decode_level(params, imgs, scale)


def pyramid_candidates(params: Params, frames: jnp.ndarray,
                       level_dims) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ALL pyramid levels with CHAINED downsampling — dlib's own
    ``pyramid_down`` semantics (each level resamples the previous one, not
    the original), which cuts the resize traffic: every sub-1 level reads
    a source only 4/3 its own size instead of the full-resolution frame,
    and the scale-1.0 level skips its resize entirely.  The whole chain
    runs in bfloat16 (the pyramid FCN is bandwidth-bound; conv
    accumulation stays float32 via preferred_element_type).

    ``level_dims``: [(level_h, level_w, scale)] largest first, as built by
    the callers from `pyramid_scales`.  Returns (scores [B, K_total],
    boxes [B, K_total, 4]) in original-image coordinates.
    """
    ss, bb = [], []
    cur = frames.astype(jnp.bfloat16)
    for (lh, lw, s) in level_dims:
        if s > 1.0:
            # upsampled levels always interpolate the original frames
            imgs = resize_bilinear(frames.astype(jnp.bfloat16), lh, lw)
        elif (lh, lw) == (cur.shape[1], cur.shape[2]):
            imgs = cur
        else:
            imgs = resize_bilinear(cur, lh, lw)
            cur = imgs
        sc, bx = _decode_level(params, imgs, s)
        ss.append(sc)
        bb.append(bx)
    return jnp.concatenate(ss, axis=1), jnp.concatenate(bb, axis=1)


class FaceDetector:
    """Multi-scale CNN face detector.

    Parameters
    ----------
    model_path : str, optional
        .npz parameter file (defaults to the packaged synthetic-data
        weights if present, else random init).
    threshold : float, optional
        Detection logit threshold; defaults to DEFAULT_THRESHOLD when the
        refine cascade is loaded, STAGE1_THRESHOLD otherwise (the two
        stages score on different logit scales).
    upsample : int
        Number of 2× upsampling pyramid levels (reference uses 1,
        `face/face.py:66`).
    refiner_path : str, optional
        .npz for the stage-2 crop refiner (`models/refiner.py`); defaults
        to the packaged weights.  ``PYV_NO_REFINE=1`` serves the plain
        single-stage pyramid (A/B kill switch).
    """

    def __init__(self, model_path: Optional[str] = None,
                 threshold: Optional[float] = None,
                 upsample: int = 0, params: Optional[Params] = None,
                 nms_iou: float = 0.3, refiner_path: Optional[str] = None):
        import os

        if params is not None:
            self.params = params
        elif model_path is not None:
            self.params = load_params(model_path)
        else:
            from .weights import default_detector_params

            self.params = default_detector_params()
        self.params = with_refiner(with_s2d_stem(self.params), refiner_path)
        if threshold is None:
            threshold = (DEFAULT_THRESHOLD if "refiner" in self.params
                         else STAGE1_THRESHOLD)
        self.threshold = threshold
        self.upsample = upsample
        self.nms_iou = nms_iou
        self._pyramid_fns = {}

    def _pyramid_fn(self, H: int, W: int):
        """One jitted program per input shape covering ALL pyramid levels —
        a per-level dispatch would pay the device-call latency ×15.  When
        the refine cascade is loaded, its top-K crop re-scoring fuses into
        the same program (scores out are stage-2 logits; boxes are always
        stage-1 regressions)."""
        key = (H, W)
        if key not in self._pyramid_fns:
            level_dims = [
                (max(STRIDE * 2, int(round(H * s))),
                 max(STRIDE * 2, int(round(W * s))), s)
                for s in pyramid_scales(H, W, upsample=self.upsample)
            ]
            @jax.jit
            def run(params, frames):
                scores, boxes = pyramid_candidates(params, frames, level_dims)
                if "refiner" in params:  # pytree structure: trace-static
                    from .refiner import refine_scores

                    scores = refine_scores(params["refiner"], frames,
                                           scores, boxes)
                return scores, boxes

            self._pyramid_fns[key] = run
        return self._pyramid_fns[key]

    def detect_batch(self, frames: np.ndarray) -> List[List[Tuple[float, float, float, float]]]:
        """Detect faces in a frame batch [B, H, W, 3] uint8.

        Returns per-frame lists of (left, top, right, bottom) boxes —
        the ``detect_func`` contract of the tracking engine
        (`tracking.py:74-76`).
        """
        frames_j = jnp.asarray(frames, dtype=jnp.float32)
        B, H, W = frames.shape[0], frames.shape[1], frames.shape[2]
        scores_j, boxes_j = self._pyramid_fn(H, W)(self.params, frames_j)
        scores = np.asarray(scores_j)   # [B, K_total]
        boxes = np.asarray(boxes_j)     # [B, K_total, 4]

        out: List[List[Tuple[float, float, float, float]]] = []
        for i in range(B):
            mask = scores[i] > self.threshold
            cand_boxes = boxes[i][mask]
            cand_scores = scores[i][mask]
            keep = nms(cand_boxes, cand_scores, iou_threshold=self.nms_iou) if len(
                cand_boxes
            ) else []
            out.append([tuple(float(v) for v in cand_boxes[j]) for j in keep])
        return out

    def __call__(self, frame: np.ndarray):
        """Single-frame detection (reference ``detect_func`` shape)."""
        return self.detect_batch(frame[None])[0]
