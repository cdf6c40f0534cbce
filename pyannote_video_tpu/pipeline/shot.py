"""Shot boundary detection — batched displaced-frame-difference on TPU.

Re-design of the reference `Shot` (`structure/shot.py:39-147`): same
constructor surface ``Shot(video, height=50, context=2.0, threshold=1.0)``,
same output (an iterable of ``Segment`` shots), same decision rule
(median-filter normalisation + threshold with consecutive-crossing
suppression, `shot.py:119-147`).  The per-frame Python loop + Farneback
flow + per-pixel warp (`shot.py:75-117`, the reference's slowest code) is
replaced by one fused XLA program per frame chunk: device-side gray+resize
(`ops/color.py`) into a ``[T, h, w]`` tensor, then the block-matching DFD
kernel (`ops/dfd.py`).

Note: the reference passes ``(height, w*height/h)`` as OpenCV's
``(width, height)`` dsize, so it actually produces *width*-50 frames
(`shot.py:62,73`).  We implement the intended semantics (output height =
``height``); the DFD statistic is orientation-agnostic so decisions are
unaffected.
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from ..core import Segment
from ..io.video import Video
from ..ops.color import ingest_gray
from ..ops.dfd import dfd_series
from ..ops.medfilt import medfilt1d


class Shot:
    """Shot boundary detection based on displaced frame difference.

    Parameters
    ----------
    video : Video
    height : int, optional
        Frames are resized to this height before the DFD. Defaults to 50.
    context : float, optional
        Median filtering context in seconds. Defaults to 2.
    threshold : float, optional
        Normalised-DFD threshold. Defaults to 1.
    radius, block : int, optional
        Block-matching search radius / block size of the DFD kernel.
    batch_size : int, optional
        Frames per host→device chunk.
    """

    def __init__(self, video: Video, height: int = 50, context: float = 2.0,
                 threshold: float = 1.0, radius: int = 3, block: int = 5,
                 batch_size: int = 256, pad_mode: str = "reflect",
                 method: str = "block", subpixel: bool = True,
                 noise_floor: float = 1.0):
        self.video = video
        self.pad_mode = pad_mode
        # sub-pixel V-interpolation in the block DFD (ops/dfd.py): kills the
        # slow-pan false-boundary mode of integer displacement search
        self.subpixel = subpixel
        # additive denominator floor for the median normalisation, in DFD
        # units.  The reference's exact rule is (y - med)/med
        # (`shot.py:127`), which explodes when the between-cut residual
        # approaches zero (very clean/static footage): any fluctuation then
        # normalises arbitrarily high.  The default floor of one gray level
        # bounds that amplification; on realistic footage the DFD median is
        # well above 1, so boundary decisions match the reference
        # (`noise_floor=0.0` restores the bare reference formula).
        self.noise_floor = noise_floor
        # "block": fused block-matching DFD (default, fastest).
        # "farneback": dense-flow-compensated residual — the reference's
        # exact formulation (`shot.py:75-99`) via ops/flow.py.
        if method not in ("block", "farneback"):
            raise ValueError(f"unknown DFD method: {method}")
        self.method = method
        self.height = height
        self.context = context
        self.threshold = threshold
        self.radius = radius
        self.block = block
        self.batch_size = batch_size

        w, h = self.video.size
        self._out_h = height
        self._out_w = max(self.block, int(round(w * height / h)))

        # kernel size: odd, >= 3, ~ context/step (reference `shot.py:64-67`)
        kernel_size = self.context / self.video.step
        self._kernel_size = max(3, int(np.ceil(kernel_size) // 2 * 2 + 1))

    # -- device work --------------------------------------------------------

    def dfd_values(self) -> Tuple[np.ndarray, np.ndarray]:
        """Compute the full DFD series, chunked over the video.

        Returns ``(timestamps, dfd)`` where ``timestamps[i]`` is the time of
        the *second* frame of pair i — matching the reference's
        ``iter_dfd`` convention (`shot.py:101-117`).
        """
        ts_out: List[np.ndarray] = []
        dfd_out: List[np.ndarray] = []
        carry_frame: Optional[np.ndarray] = None  # last gray frame of prev chunk

        for ts, frames in self.video.iterbatches(self.batch_size):
            gray = ingest_gray(jnp.asarray(frames), self._out_h, self._out_w)
            if carry_frame is not None:
                gray = jnp.concatenate([carry_frame[None], gray], axis=0)
                pair_ts = ts
            else:
                pair_ts = ts[1:]
            if gray.shape[0] >= 2:
                if self.method == "farneback":
                    from ..ops.flow import dfd_series_farneback

                    d = dfd_series_farneback(gray)
                else:
                    # hand-written Pallas kernel on TPU, XLA elsewhere
                    from ..ops.dfd_pallas import dfd_series_auto

                    d = dfd_series_auto(gray, radius=self.radius,
                                        block=self.block,
                                        subpixel=self.subpixel)
                dfd_out.append(np.asarray(d))
                ts_out.append(np.asarray(pair_ts))
            carry_frame = np.asarray(gray[-1])

        if not dfd_out:
            return np.empty(0), np.empty(0)
        return np.concatenate(ts_out), np.concatenate(dfd_out)

    def iter_dfd(self) -> Iterator[Tuple[float, float]]:
        """Pairwise DFD as (t, value) pairs — reference-compatible surface."""
        ts, dfd = self.dfd_values()
        for t, v in zip(ts, dfd):
            yield float(t), float(v)

    # -- decision rule (reference semantics, `shot.py:119-147`) -------------

    def boundaries(self) -> Tuple[np.ndarray, np.ndarray]:
        """(timestamps, normalized DFD series) after median normalisation."""
        ts, y = self.dfd_values()
        if len(y) == 0:
            return ts, y
        filtered = np.asarray(
            medfilt1d(jnp.asarray(y), self._kernel_size, mode=self.pad_mode)
        )
        denom = filtered + self.noise_floor
        normalized = (y - filtered) / np.where(denom == 0.0, 1e-12, denom)
        return ts, normalized

    def __iter__(self) -> Iterator[Segment]:
        ts, normalized = self.boundaries()

        previous = self.video.start
        if len(normalized):
            # threshold with consecutive-crossing suppression; the `_i = 0`
            # initialisation (which also suppresses a crossing at index 1)
            # reproduces the reference exactly (`shot.py:132-143`)
            _i = 0
            for i in np.where(normalized > self.threshold)[0]:
                if i == _i + 1:
                    _i = i
                    continue
                yield Segment(previous, float(ts[i]))
                previous = float(ts[i])
                _i = i

        last_segment = Segment(previous, self.video.end)
        if last_segment:
            yield last_segment
