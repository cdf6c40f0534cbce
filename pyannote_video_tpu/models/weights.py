"""Packaged model parameters.

Weights trained on the synthetic face distribution (`train/`) are committed
under ``models/weights/`` so tests and the default pipeline work out of the
box in this environment (no dlib model files are available here — see
SURVEY §2.2).  Converters from dlib ``.dat`` files plug in here when those
files exist.
"""

from __future__ import annotations

import os
import warnings
from pathlib import Path

import jax

from .nn import Params, load_params

WEIGHTS_DIR = Path(__file__).parent / "weights"

DETECTOR_FILE = WEIGHTS_DIR / "detector_synthetic.npz"
REFINER_FILE = WEIGHTS_DIR / "refiner_synthetic.npz"
EMBEDDER_FILE = WEIGHTS_DIR / "embedder_synthetic.npz"
LANDMARKS_FILE = WEIGHTS_DIR / "landmarks_synthetic.npz"

# width multiplier the packaged synthetic embedder was trained at —
# full dlib ResNet-29 width (`/root/reference/pyannote/video/face/face.py:62`
# loads dlib's width-1.0 model; capability parity needs the same capacity)
EMBEDDER_WIDTH = 1.0


def default_detector_params() -> Params:
    from . import detector

    if DETECTOR_FILE.exists():
        return load_params(str(DETECTOR_FILE))
    warnings.warn(
        "no packaged detector weights found; using random initialisation "
        "(train with train/train_detector.py)"
    )
    return detector.init_params(jax.random.PRNGKey(42))


def default_refiner_params() -> "Params | None":
    """Packaged refine-cascade weights (`models/refiner.py`), or None.

    Unlike the other defaults this does NOT fall back to random
    initialisation: with no trained refiner the detector serves the plain
    single-stage pyramid (a random second stage would destroy recall).
    """
    if REFINER_FILE.exists():
        return load_params(str(REFINER_FILE))
    return None


def default_embedder_params() -> Params:
    from . import embedder

    if EMBEDDER_FILE.exists():
        return load_params(str(EMBEDDER_FILE))
    warnings.warn(
        "no packaged embedder weights found; using random initialisation "
        "(train with train/train_embedder.py)"
    )
    return embedder.init_params(jax.random.PRNGKey(42), width=EMBEDDER_WIDTH)
