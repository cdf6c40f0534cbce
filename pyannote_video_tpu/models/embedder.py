"""ResNet-29 face embedder (dlib ``face_recognition_model_v1`` architecture).

TPU-native implementation of the network behind
``compute_face_descriptor`` (reference `face/face.py:62,73-76`): dlib's
29-conv metric-learning ResNet (dnn_face_recognition_ex.cpp topology):

    conv32 7×7/2 → maxpool 3×3/2
    → 3× res32                       (alevel4)
    → down64  + 3× res64             (alevel3)
    → down128 + 2× res128            (alevel2)
    → down256 + 2× res256            (alevel1)
    → down256                        (alevel0)
    → global avg pool → fc(128, no bias)

on 150×150 aligned face chips, producing 128-d embeddings.  A ``width``
multiplier scales all channel counts; the packaged synthetic-trained
weights use the FULL dlib width (stem 32, fc 256→128, ~5.6M params), so
`.dat`-converted dlib weights drop in with no shape changes.

The whole network is one jitted program over the chip batch; bfloat16
compute on the MXU with float32 accumulation.
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .nn import (
    Params,
    conv,
    conv_init,
    batch_norm,
    bn_init,
    global_avg_pool,
    max_pool,
    resblock,
    resblock_init,
)

CHIP_SIZE = 150
EMBED_DIM = 128

# (channels, n_plain_blocks) per level after the stem; each level except the
# first starts with a down-sampling block.  Matches dlib's
# alevel4..alevel0 stack (29 convs total at width 1.0).
_LEVELS: List[Tuple[int, int]] = [(32, 3), (64, 3), (128, 2), (256, 2), (256, 0)]

# dlib input normalisation: (pixel - 122.782) / 256
_INPUT_MEAN = 122.782
_INPUT_SCALE = 256.0


def _ch(base: int, width: float) -> int:
    return max(8, int(round(base * width)))


def init_params(key, width: float = 1.0) -> Params:
    keys = jax.random.split(key, 64)
    ki = iter(keys)
    params: Params = {"stem": conv_init(next(ki), 7, 7, 3, _ch(32, width)),
                      "stem_bn": bn_init(_ch(32, width))}
    c_in = _ch(32, width)
    blocks: Params = {}
    idx = 0
    for level, (c_base, n_plain) in enumerate(_LEVELS):
        c_out = _ch(c_base, width)
        if level > 0:
            blocks[f"block{idx}"] = resblock_init(next(ki), c_in, c_out)
            idx += 1
            c_in = c_out
        for _ in range(n_plain):
            blocks[f"block{idx}"] = resblock_init(next(ki), c_in, c_out)
            idx += 1
            c_in = c_out
    params["blocks"] = blocks
    fc = jax.random.normal(next(ki), (c_in, EMBED_DIM), dtype=jnp.float32)
    params["fc"] = fc * np.sqrt(1.0 / c_in)
    return params


def _block_plan() -> List[bool]:
    """down-flag per block index, derived from _LEVELS."""
    plan: List[bool] = []
    for level, (_, n_plain) in enumerate(_LEVELS):
        if level > 0:
            plan.append(True)
        plan.extend([False] * n_plain)
    return plan


BLOCK_PLAN = _block_plan()  # [False×3, True, F×3, True, F×2, True, F×2, True]


def forward(params: Params, chips: jnp.ndarray, train: bool = False,
            compute_dtype=jnp.bfloat16):
    """Chips ``[B, 150, 150, 3]`` uint8/float → embeddings ``[B, 128]``.

    Returns (embeddings, updated_params) — params only change in train mode
    (batch-norm statistics).
    """
    x = (chips.astype(jnp.float32) - _INPUT_MEAN) / _INPUT_SCALE

    h = conv(params["stem"], x, stride=2, compute_dtype=compute_dtype)
    h, stem_bn = batch_norm(params["stem_bn"], h, train=train)
    h = jax.nn.relu(h)
    h = max_pool(h, 3, 2)

    new_blocks = {}
    for i, down in enumerate(BLOCK_PLAN):
        h, bp = resblock(params["blocks"][f"block{i}"], h, down=down,
                         train=train, compute_dtype=compute_dtype)
        new_blocks[f"block{i}"] = bp

    pooled = global_avg_pool(h)
    emb = jnp.dot(pooled, params["fc"], preferred_element_type=jnp.float32)
    # L2-normalise the embedding — but ONLY for heads trained with the
    # normalisation (the packaged synthetic checkpoints).  dlib's net emits
    # UNnormalised 128-d embeddings and the 0.6 Euclidean clustering
    # threshold (`face/clustering.py:138`) is calibrated on those, so
    # weights converted from a real .dat (models/dlib_convert.py) carry
    # ``normalized_head=0`` and skip the rescale.  Why normalise at all for
    # synthetic training: an unnormalised head trained on a finite
    # synthetic identity bank drifts to a large-radius shell (‖e‖≈240
    # observed) where UNSEEN identities embed unstably — frame-to-frame
    # distances of 10-40 against the 0.6 threshold.  Fixing the scale makes
    # the hinge margins angular, which generalises: distances are bounded
    # by 2 and vary smoothly for out-of-bank faces, at the same 0.6
    # operating point.
    normed = emb * jax.lax.rsqrt(jnp.sum(emb * emb, axis=-1, keepdims=True)
                                 + 1e-12)
    flag = params.get("normalized_head")
    if flag is None:
        # absent in pre-flag checkpoints, all of which were trained with
        # the normalised head
        emb = normed
    else:
        emb = jnp.where(jnp.asarray(flag).astype(bool), normed, emb)

    if train:
        new_params = {**params, "stem_bn": stem_bn, "blocks": new_blocks}
        return emb, new_params
    return emb, params


@partial(jax.jit, static_argnames=())
def embed(params: Params, chips: jnp.ndarray) -> jnp.ndarray:
    """Inference entry point: jitted, bfloat16 MXU compute."""
    emb, _ = forward(params, chips, train=False)
    return emb


class FaceEmbedder:
    """Convenience wrapper holding parameters.

    ``FaceEmbedder(path)`` mirrors the reference's
    ``dlib.face_recognition_model_v1(model_path)`` constructor shape
    (`face/face.py:62`); paths point at our .npz parameter files.
    """

    def __init__(self, model_path: str | None = None, width: float = 1.0,
                 params: Params | None = None):
        from .nn import load_params

        if params is not None:
            self.params = params
        elif model_path is not None:
            self.params = load_params(model_path)
        else:
            # packaged weights, like FaceDetector/LandmarkPredictor — the
            # no-path constructor previously random-initialised, which made
            # `pyannote-face extract "" ""` silently emit untrained
            # embeddings (clusters never merged).  An explicit non-default
            # width requests a fresh model at that width (the packaged
            # weights are width 1.0), so it must not be silently ignored.
            from .weights import EMBEDDER_FILE, default_embedder_params

            if width == 1.0 and EMBEDDER_FILE.exists():
                self.params = default_embedder_params()
            else:
                self.params = init_params(jax.random.PRNGKey(0), width=width)

    def __call__(self, chips) -> np.ndarray:
        return np.asarray(embed(self.params, jnp.asarray(chips)))
