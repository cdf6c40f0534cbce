"""Fused detect → align → embed: the flagship single-XLA-program pipeline.

The reference runs detection, landmarking and embedding as separate
per-face dlib calls inside per-frame Python loops
(`face/face.py:105-132`, `scripts/pyannote-face.py:287-311`).  Here the
whole stack — pyramid detection, device NMS, landmark placement, chip
alignment and the ResNet-29 embedder — runs as ONE jitted program over a
frame batch with fixed face slots (static shapes; empty slots are masked).
This is the north-star kernel of BASELINE.json ("fused so
detect→align→embed runs as one XLA program over frame batches").
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import detector as det
from .detector import DEFAULT_THRESHOLD
from . import embedder as emb
from .chip import box_to_landmarks, extract_chips
from .nn import Params

MAX_FACES = 8  # face slots per frame


class FusedOutput(NamedTuple):
    boxes: jnp.ndarray       # [B, M, 4] pixel coords
    scores: jnp.ndarray      # [B, M]
    valid: jnp.ndarray       # [B, M] bool
    landmarks: jnp.ndarray   # [B, M, 68, 2]
    embeddings: jnp.ndarray  # [B, M, 128]


def _device_nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thresh: float,
                max_out: int):
    """Greedy NMS on device: boxes [K, 4], scores [K] → (boxes, scores,
    valid) with max_out slots.

    Only ``max_out`` winners are ever emitted, so the loop runs max_out
    iterations (pick best live candidate, suppress its overlaps) instead of
    walking all K candidates in score order — identical output to full
    greedy NMS truncated to max_out picks, at K/max_out× fewer sequential
    steps (the fori tail was ~20% of the detect stage at K=160)."""
    from ..ops.boxes import iou, overlap_min_ratio

    iou_mat = iou(boxes, boxes)  # [K, K]
    cont_mat = overlap_min_ratio(boxes, boxes)
    sup = (iou_mat > iou_thresh) | (cont_mat > 0.7)

    def body(i, state):
        live_scores, out_idx, out_scores = state
        idx = jnp.argmax(live_scores)
        sc = live_scores[idx]
        out_idx = out_idx.at[i].set(idx)
        out_scores = out_scores.at[i].set(sc)
        # a winner's self-IoU is normally 1 so sup[idx, idx] removes it,
        # but a degenerate candidate (inverted box with IoU 0, NaN coords)
        # would otherwise stay live and be re-picked every iteration —
        # force self-suppression explicitly
        live_scores = jnp.where(sup[idx], -jnp.inf, live_scores)
        live_scores = live_scores.at[idx].set(-jnp.inf)
        return live_scores, out_idx, out_scores

    out_idx = jnp.zeros((max_out,), dtype=jnp.int32)
    out_scores = jnp.full((max_out,), -jnp.inf, dtype=scores.dtype)
    _, out_idx, out_scores = jax.lax.fori_loop(
        0, max_out, body, (scores, out_idx, out_scores)
    )
    return (
        jnp.take(boxes, out_idx, axis=0),
        out_scores,
        jnp.isfinite(out_scores),
    )


class FusedFacePipeline:
    """detect→align→embed over frame batches, one compiled program per shape.

    Parameters default to the packaged synthetic-trained weights.
    """

    def __init__(self, detector_params: Optional[Params] = None,
                 embedder_params: Optional[Params] = None,
                 landmark_params: Optional[dict] = None,
                 threshold: Optional[float] = None, nms_iou: float = 0.3,
                 upsample: int = 0, max_faces: int = MAX_FACES):
        from .weights import default_detector_params, default_embedder_params
        from .landmarks import LandmarkPredictor

        self.detector_params = det.with_refiner(det.with_s2d_stem(
            detector_params or default_detector_params()))
        if threshold is None:
            threshold = (DEFAULT_THRESHOLD
                         if "refiner" in self.detector_params
                         else det.STAGE1_THRESHOLD)
        self.embedder_params = embedder_params or default_embedder_params()
        if landmark_params is None:
            landmark_params = LandmarkPredictor().params
        self.landmark_params = landmark_params
        self.landmark_arrays = {
            k: v for k, v in landmark_params.items()
            if k not in ("n_stages", "depth", "bilinear_tail")
        }
        self.threshold = threshold
        self.nms_iou = nms_iou
        self.upsample = upsample
        self.max_faces = max_faces
        self._jitted = {}

    # -- the fused program --------------------------------------------------

    def _build(self, H: int, W: int):
        scales = det.pyramid_scales(H, W, upsample=self.upsample)
        level_dims = [
            (max(det.STRIDE * 2, int(round(H * s))),
             max(det.STRIDE * 2, int(round(W * s))), s)
            for s in scales
        ]
        max_faces = self.max_faces
        threshold = self.threshold
        nms_iou = self.nms_iou

        # the cascade's stage/depth counts are static (they set the loop
        # structure); only the weight arrays travel as jit arguments — big
        # closure constants stall the remote TPU compiler
        lm_static = {
            "n_stages": int(self.landmark_params.get("n_stages", 0)),
            "depth": int(self.landmark_params.get("depth", 3)),
        }
        if "bilinear_tail" in self.landmark_params:
            lm_static["bilinear_tail"] = int(
                self.landmark_params["bilinear_tail"])
        has_cascade = lm_static["n_stages"] > 0

        @jax.jit
        def fused(det_params, emb_params, lm_arrays, frames_u8):
            lm_params = {**lm_arrays, **lm_static}
            frames = frames_u8.astype(jnp.float32)
            B = frames.shape[0]

            # chained-pyramid detection (dlib pyramid_down semantics —
            # each level resamples the previous; models/detector.py)
            scores, boxes = det.pyramid_candidates(det_params, frames,
                                                   level_dims)
            if "refiner" in det_params:  # stage-2 cascade (models/refiner.py)
                from .refiner import refine_scores

                scores = refine_scores(det_params["refiner"], frames,
                                       scores, boxes)
            # below-threshold candidates can never be selected
            scores = jnp.where(scores > threshold, scores, -jnp.inf)

            nms_fn = lambda b, s: _device_nms(b, s, nms_iou, max_faces)
            sel_boxes, sel_scores, valid = jax.vmap(nms_fn)(boxes, scores)

            # landmarks: the trained ERT cascade runs INSIDE the fused
            # program on per-face crops (reference extract path,
            # `face/face.py:69-76`); mean-shape placement only when no
            # cascade weights are available
            flat_boxes = sel_boxes.reshape(B * max_faces, 4)
            frame_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), max_faces)
            if has_cascade:
                from .landmarks import predict_crops
                from ..ops.color import to_gray

                landmarks = predict_crops(
                    lm_params, to_gray(frames_u8), frame_idx, flat_boxes
                )  # [B*M, 68, 2]
            else:
                landmarks = box_to_landmarks(flat_boxes)  # [B*M, 68, 2]

            chips = extract_chips(frames_u8, frame_idx, landmarks)
            embeddings = emb.forward(emb_params, chips, train=False)[0]

            return FusedOutput(
                boxes=sel_boxes,
                scores=sel_scores,
                valid=valid,
                landmarks=landmarks.reshape(B, max_faces, 68, 2),
                embeddings=embeddings.reshape(B, max_faces, emb.EMBED_DIM),
            )

        return fused

    def build_detect_only(self, H: int, W: int):
        """Pyramid detection + device NMS as one jitted program — no
        landmark/embedding tail.

        ``(det_params, frames_u8 [B, H, W, 3]) → (boxes [B, M, 4],
        scores [B, M], valid [B, M])``.  This is what the tracking stage
        consumes (the reference's ``track`` command runs detection only,
        `pyannote-face.py:239-269`; landmarks/embeddings are the
        ``extract`` stage's per-track work).  The full fused program
        would compute the ERT cascade + chip warp + ResNet-29 for all
        ``max_faces`` slots of every detection frame — measured ~0.4 ms
        per face slot, i.e. ~70% of the detect stage wasted when the
        consumer only needs boxes.
        """
        scales = det.pyramid_scales(H, W, upsample=self.upsample)
        level_dims = [
            (max(det.STRIDE * 2, int(round(H * s))),
             max(det.STRIDE * 2, int(round(W * s))), s)
            for s in scales
        ]
        max_faces = self.max_faces
        threshold = self.threshold
        nms_iou = self.nms_iou

        @jax.jit
        def detect_only(det_params, frames_u8):
            frames = frames_u8.astype(jnp.float32)
            scores, boxes = det.pyramid_candidates(det_params, frames,
                                                   level_dims)
            if "refiner" in det_params:  # stage-2 cascade (models/refiner.py)
                from .refiner import refine_scores

                scores = refine_scores(det_params["refiner"], frames,
                                       scores, boxes)
            scores = jnp.where(scores > threshold, scores, -jnp.inf)
            nms_fn = lambda b, s: _device_nms(b, s, nms_iou, max_faces)
            return jax.vmap(nms_fn)(boxes, scores)

        return detect_only

    def __call__(self, frames: np.ndarray) -> FusedOutput:
        """frames [B, H, W, 3] uint8 → FusedOutput (device arrays)."""
        H, W = frames.shape[1], frames.shape[2]
        key = (H, W, frames.shape[0])
        if key not in self._jitted:
            self._jitted[key] = self._build(H, W)
        return self._jitted[key](
            self.detector_params, self.embedder_params, self.landmark_arrays,
            jnp.asarray(frames),
        )
