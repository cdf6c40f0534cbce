"""pyannote-video-tpu: a TPU-native video face-processing framework.

Brand-new JAX/XLA/Pallas implementation with the capabilities of
``pyannote/pyannote-video`` (reference mounted at /root/reference): shot
boundary detection, shot threading, face tracking-by-detection, facial
landmarking, face embedding, and face clustering — re-designed around
batched frame tensors and fused XLA programs instead of per-frame Python
loops.

Public API mirrors the reference's re-exports
(`/root/reference/pyannote/video/__init__.py:33-44`).  Imports are lazy so
that host-only pieces (core structures, file formats, CLIs' --help) do not
pay JAX startup cost.
"""

try:  # single source of truth: pyproject.toml [project] version
    from importlib.metadata import version as _pkg_version

    __version__ = _pkg_version("pyannote-video-tpu")
except Exception:  # not installed (running from a source checkout)
    import pathlib as _pathlib
    import re as _re

    try:
        _pyproject = (_pathlib.Path(__file__).resolve().parent.parent
                      / "pyproject.toml").read_text()
        __version__ = _re.search(
            r'^version\s*=\s*"([^"]+)"', _pyproject, _re.M
        ).group(1)
    except Exception:
        __version__ = "0.0.0+unknown"

from .core import Annotation, Segment, Timeline  # host-only, cheap

_LAZY = {
    "Video": ("pyannote_video_tpu.io.video", "Video"),
    "Shot": ("pyannote_video_tpu.pipeline.shot", "Shot"),
    "Thread": ("pyannote_video_tpu.pipeline.thread", "Thread"),
    "TrackingByDetection": ("pyannote_video_tpu.pipeline.tracking", "TrackingByDetection"),
    "Face": ("pyannote_video_tpu.pipeline.face", "Face"),
    "FaceTracking": ("pyannote_video_tpu.pipeline.face_tracking", "FaceTracking"),
    "FaceClustering": ("pyannote_video_tpu.pipeline.clustering", "FaceClustering"),
}

__all__ = [
    "__version__",
    "Annotation",
    "Segment",
    "Timeline",
] + list(_LAZY)


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        value = getattr(importlib.import_module(module), attr)
        globals()[name] = value
        return value
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
