"""Video ingest: decode backends + the public ``Video`` class.

TPU-native redesign of the reference's ffmpeg-pipe reader
(`/root/reference/pyannote/video/video.py:94-510`).  The public surface
matches the reference — ``Video(filename, start, end, step, ffmpeg,
verbose)``, ``.iterframes()``, ``__iter__``, ``__call__(t)``,
``.frame_size`` setter, ``.duration/.frame_rate/.size`` — but the internals
are organized around *batch* delivery for device feeding:
``iterbatches(batch_size)`` yields ``[B, H, W, 3] uint8`` blocks with
timestamps, which the pipeline stages stage onto the TPU with
double-buffered ``device_put`` (see ``io/batch.py``).

Three decode backends (TPUs don't decode video — this stays host-side):

* ``FFmpegPipeSource`` — ffmpeg subprocess rawvideo pipe, the reference's
  strategy (`video.py:345-348`) re-implemented (with seek-vs-skip logic per
  `video.py:491-495`);
* ``OpenCVSource`` — cv2.VideoCapture, used when no ffmpeg binary exists;
* ``ArraySource`` — in-memory ``[T, H, W, 3]`` frames, for synthetic
  fixtures and benchmarks.
"""

from __future__ import annotations

import os
import re
import shutil
import subprocess as sp
import warnings
from typing import Iterator, Optional, Tuple

import numpy as np

from ..utils.imops import bilinear_resize


def _cvsecs(time) -> float:
    """Convert '01:01:33.045', (min, sec), (hr, min, sec) or float to seconds.

    Same accepted formats as the reference (`video.py:61-91`).
    """
    if isinstance(time, str):
        if ("," not in time) and ("." not in time):
            time = time + ".0"
        finds = re.findall(r"(\d+):(\d+):(\d+)[,|.](\d+)", time)[0]
        return (
            3600 * int(finds[0])
            + 60 * int(finds[1])
            + int(finds[2])
            + float(finds[3]) / (10 ** len(finds[3]))
        )
    if isinstance(time, tuple):
        if len(time) == 3:
            hr, mn, sec = time
        else:
            hr, mn, sec = 0, time[0], time[1]
        return 3600 * hr + 60 * mn + sec
    return time


class FrameSource:
    """Abstract decode backend: native-size RGB frames by frame index."""

    fps: float
    size: Tuple[int, int]  # (width, height)
    duration: float
    nframes: int
    has_audio: bool = False

    def read_at(self, index: int) -> np.ndarray:
        """Return frame `index` (0-based) as (H, W, 3) uint8 RGB."""
        raise NotImplementedError

    def close(self) -> None:
        pass


class ArraySource(FrameSource):
    """In-memory frames — synthetic fixtures, benches, already-decoded data."""

    def __init__(self, frames: np.ndarray, fps: float = 25.0):
        frames = np.asarray(frames)
        if frames.ndim != 4 or frames.shape[-1] != 3:
            raise ValueError(f"expected [T, H, W, 3] frames, got {frames.shape}")
        self._frames = frames
        self.fps = float(fps)
        self.nframes = frames.shape[0]
        self.size = (frames.shape[2], frames.shape[1])
        self.duration = self.nframes / self.fps

    def read_at(self, index: int) -> np.ndarray:
        index = min(max(index, 0), self.nframes - 1)
        return self._frames[index]


class OpenCVSource(FrameSource):
    """cv2.VideoCapture backend (default when no ffmpeg binary exists)."""

    def __init__(self, filename: str):
        import cv2

        self._cv2 = cv2
        if not os.path.exists(filename):
            raise IOError(f"video file not found: {filename}")
        self._cap = cv2.VideoCapture(filename)
        if not self._cap.isOpened():
            raise IOError(f"could not open video file: {filename}")
        self.fps = self._cap.get(cv2.CAP_PROP_FPS) or 25.0
        self.size = (
            int(self._cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
            int(self._cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
        )
        self.nframes = int(self._cap.get(cv2.CAP_PROP_FRAME_COUNT))
        self.duration = self.nframes / self.fps
        self._pos = 0  # next frame index the capture will deliver
        self._last: Optional[np.ndarray] = None

    def read_at(self, index: int) -> np.ndarray:
        if index < 0:
            index = 0
        if index != self._pos:
            # Sequential fast path: decode-skip small forward jumps instead
            # of seeking (container seeks land on keyframes and can be
            # inexact); same tradeoff as the reference (`video.py:491-495`).
            if 0 <= index - self._pos <= 25:
                while self._pos < index:
                    ok, _ = self._cap.read()
                    if not ok:
                        break
                    self._pos += 1
            else:
                self._cap.set(self._cv2.CAP_PROP_POS_FRAMES, index)
                self._pos = index
        ok, bgr = self._cap.read()
        if not ok:
            if self._last is None:
                raise IOError("failed to read first frame")
            if not getattr(self, "_warned_short_read", False):
                self._warned_short_read = True
                warnings.warn(
                    f"short read at frame {index}/{self.nframes}; "
                    "using the last valid frame instead.",
                    UserWarning,
                )
            return self._last
        self._pos += 1
        rgb = bgr[:, :, ::-1]
        self._last = rgb
        return rgb

    def close(self) -> None:
        if getattr(self, "_cap", None) is not None:
            self._cap.release()
            self._cap = None


class FFmpegPipeSource(FrameSource):
    """ffmpeg subprocess rawvideo pipe.

    Re-implementation of the reference's strategy: metadata from ffmpeg
    stderr (`video.py:189-330`), frames from an rgb24 rawvideo stdout pipe
    (`video.py:345-348`), respawn-with-seek on backward jumps or jumps more
    than 100 frames ahead, decode-skip otherwise (`video.py:491-495`).
    """

    def __init__(self, filename: str, ffmpeg: Optional[str] = None):
        self.filename = filename
        self.ffmpeg = ffmpeg or shutil.which("ffmpeg")
        if self.ffmpeg is None:
            raise IOError("no ffmpeg binary found")
        if not os.path.exists(filename):
            raise IOError(f"video file not found: {filename}")

        info = self._probe()
        self.fps = info["fps"]
        self.size = info["size"]
        self.duration = info["duration"]
        self.nframes = int(self.duration * self.fps) + 1
        self.has_audio = info["has_audio"]

        self._proc: Optional[sp.Popen] = None
        self._pos = 0  # next frame index the pipe will deliver
        self._last: Optional[np.ndarray] = None

    def _probe(self) -> dict:
        proc = sp.Popen(
            [self.ffmpeg, "-i", self.filename],
            stdout=sp.PIPE,
            stderr=sp.PIPE,
            stdin=sp.DEVNULL,
        )
        _, stderr = proc.communicate()
        text = stderr.decode("utf8", errors="replace")

        m = re.search(r"Duration: (\d\d:\d\d:\d\d\.\d+)", text)
        if m is None:
            raise IOError(f"failed to read duration of {self.filename}:\n{text}")
        duration = _cvsecs(m.group(1))

        video_lines = [
            l for l in text.splitlines() if " Video: " in l and re.search(r"\d+x\d+", l)
        ]
        if not video_lines:
            raise IOError(f"no video stream found in {self.filename}:\n{text}")
        line = video_lines[0]
        m = re.search(r" (\d+)x(\d+)[, ]", line)
        if m is None:
            raise IOError(f"failed to read video dimensions of {self.filename}")
        size = (int(m.group(1)), int(m.group(2)))

        fps = None
        m = re.search(r"(\d+\.?\d*) tbr", line)
        if m:
            fps = float(m.group(1))
        else:
            m = re.search(r"(\d+\.?\d*) fps", line)
            if m:
                fps = float(m.group(1))
        if fps is None:
            raise IOError(f"failed to read frame rate of {self.filename}")
        # snap near-NTSC rates to x*1000/1001 like the reference
        # (`video.py:299-305`)
        coef = 1000.0 / 1001.0
        for x in [23, 24, 25, 30, 50]:
            if fps != x and abs(fps - x * coef) < 0.01:
                fps = x * coef

        has_audio = any(" Audio: " in l for l in text.splitlines())
        return {"duration": duration, "size": size, "fps": fps, "has_audio": has_audio}

    def _spawn(self, t: float = 0.0) -> None:
        self.close()
        if t > 0:
            # two-stage seek: coarse container seek before -i, precise
            # decode seek after, same as the reference (`video.py:337-341`)
            offset = min(1.0, t)
            i_arg = ["-ss", f"{t - offset:.06f}", "-i", self.filename, "-ss", f"{offset:.06f}"]
        else:
            i_arg = ["-i", self.filename]
        cmd = (
            [self.ffmpeg]
            + i_arg
            + ["-loglevel", "error", "-f", "image2pipe", "-pix_fmt", "rgb24",
               "-vcodec", "rawvideo", "-"]
        )
        w, h = self.size
        self._proc = sp.Popen(
            cmd,
            bufsize=3 * w * h + 100,
            stdout=sp.PIPE,
            stderr=sp.PIPE,
            stdin=sp.DEVNULL,
        )

    def _read_next(self) -> np.ndarray:
        w, h = self.size
        nbytes = 3 * w * h
        s = self._proc.stdout.read(nbytes)
        if len(s) != nbytes:
            if self._last is None:
                raise IOError(f"failed to read first frame of {self.filename}")
            warnings.warn(
                f"short read ({len(s)}/{nbytes} bytes) at frame "
                f"{self._pos}/{self.nframes}; using the last valid frame.",
                UserWarning,
            )
            return self._last
        frame = np.frombuffer(s, dtype=np.uint8).reshape(h, w, 3)
        self._last = frame
        return frame

    def read_at(self, index: int) -> np.ndarray:
        if self._proc is None:
            self._spawn(0.0)
            self._pos = 0
        if index < self._pos or index > self._pos + 100:
            self._spawn(index / self.fps)
            self._pos = index
        else:
            w, h = self.size
            while self._pos < index:  # decode-skip forward
                self._proc.stdout.read(3 * w * h)
                self._pos += 1
        frame = self._read_next()
        self._pos = index + 1
        return frame

    def sequential_batches(self, batch_size: int, start_index: int = 0,
                           end_index: Optional[int] = None):
        """Stream [B, H, W, 3] uint8 batches via the native ring-buffer
        reader (native/framefeed.c): the pipe drains on a GIL-free thread,
        overlapping ffmpeg decode with downstream work.  Falls back to the
        synchronous reader when the extension is unavailable.
        """
        from .framefeed import load

        w, h = self.size
        end_index = self.nframes if end_index is None else end_index
        self._spawn(start_index / self.fps if start_index else 0.0)
        self._pos = start_index

        feeder_mod = load()
        frame_bytes = 3 * w * h
        index = start_index
        if feeder_mod is not None:
            reader = feeder_mod.Reader(self._proc.stdout.fileno(),
                                       frame_bytes, 64)
            try:
                while index < end_index:
                    n = min(batch_size, end_index - index)
                    out = np.empty((n, h, w, 3), dtype=np.uint8)
                    got = reader.read_batch(out, n)
                    if got == 0:
                        break
                    yield index, out[:got]
                    index += got
            finally:
                reader.close()
        else:
            while index < end_index:
                n = min(batch_size, end_index - index)
                frames = []
                for _ in range(n):
                    frames.append(self._read_next())
                    self._pos += 1
                yield index, np.stack(frames)
                index += n
        self._pos = index

    def close(self) -> None:
        if getattr(self, "_proc", None) is not None:
            self._proc.terminate()
            self._proc.stdout.close()
            self._proc.stderr.close()
            self._proc = None

    def __del__(self):
        self.close()


def _open_source(filename, ffmpeg: Optional[str] = None, fps: float = 25.0) -> FrameSource:
    if isinstance(filename, FrameSource):
        return filename
    if isinstance(filename, np.ndarray):
        return ArraySource(filename, fps=fps)
    if ffmpeg is not None or shutil.which("ffmpeg"):
        return FFmpegPipeSource(filename, ffmpeg=ffmpeg)
    return OpenCVSource(filename)


class Video:
    """Public video reader; reference-compatible surface (`video.py:94-187`).

    Parameters
    ----------
    filename : str | np.ndarray | FrameSource
        Path to video file, or an in-memory ``[T, H, W, 3] uint8`` array,
        or an explicit decode backend.
    start, end : float, optional
        Iteration bounds in seconds (default: full video).
    step : float, optional
        Iteration stride in seconds (default: one frame, 1/fps).
    ffmpeg : str, optional
        Path to the ffmpeg binary (forces the ffmpeg backend).
    verbose : bool, optional
        Show a progress bar while iterating.
    fps : float, optional
        Frame rate when `filename` is an array (default 25).
    """

    def __init__(self, filename, start=None, end=None, step=None,
                 ffmpeg=None, verbose=False, fps=25.0):
        self.filename = filename if isinstance(filename, str) else "<memory>"
        self.verbose = verbose
        self._source = _open_source(filename, ffmpeg=ffmpeg, fps=fps)

        self._fps = self._source.fps
        self._size = tuple(self._source.size)  # native (width, height)
        self._width, self._height = self._size  # output frame size
        self._duration = self._source.duration
        self._nframes = self._source.nframes
        self.has_audio = self._source.has_audio

        self.start = 0.0 if start is None else _cvsecs(start)
        # deviation from the reference: `end` is clamped to the video
        # duration (the reference iterates past the end, re-reading the last
        # frame with a warning per frame, `video.py:374-396`)
        self.end = self._duration if end is None else min(_cvsecs(end), self._duration)
        self.step = 1.0 / self._fps if step is None else step

    # -- metadata ----------------------------------------------------------

    @property
    def duration(self) -> float:
        """Video duration in seconds."""
        return self._duration

    @property
    def frame_rate(self) -> float:
        return self._fps

    @property
    def size(self) -> Tuple[int, int]:
        """Native video size (width, height) in pixels."""
        return self._size

    @property
    def frame_size(self):
        """Delivered frame size (width, height); set to downscale on read."""
        return [self._width, self._height]

    @frame_size.setter
    def frame_size(self, value) -> None:
        self._width, self._height = int(value[0]), int(value[1])

    # -- frame access -------------------------------------------------------

    def _t_to_index(self, t: float) -> int:
        # Same +1e-5 anti-jitter rounding as the reference (`video.py:486`),
        # 0-based here.
        return int(self._fps * t + 0.00001)

    def _postprocess(self, frame: np.ndarray) -> np.ndarray:
        w, h = self._size
        if self._width != w or self._height != h:
            frame = bilinear_resize(frame, self._width, self._height)
        return frame

    def __call__(self, t: float) -> np.ndarray:
        """Random access: frame at time `t`, resized to `frame_size`."""
        return self._postprocess(self._source.read_at(self._t_to_index(t)))

    def __iter__(self):
        return self.iterframes(with_time=True)

    def timestamps(self) -> np.ndarray:
        """The iteration time grid (reference: `video.py:432`).

        Index-based rather than ``np.arange(start, end, step)``: float
        accumulation in arange can admit a phantom frame at the tail when
        ``start`` is nonzero (e.g. resumed runs).
        """
        return self._grid(self.start, self.end, self.step)

    @staticmethod
    def _grid(start: float, end: float, step: float) -> np.ndarray:
        """Drift-safe time grid shared by `timestamps` and `iterbatches`."""
        n = int(np.ceil((end - start) / step - 1e-9))
        return start + step * np.arange(max(n, 0))

    def iterframes(self, with_time=False, with_context=False, context=1):
        """Iterate over frames as (H, W, 3) RGB uint8 arrays.

        Same options as the reference (`video.py:411-464`): with_time yields
        (t, frame); with_context in {'left', 'right', 'center'} yields a
        deque of `context` frames.
        """
        from collections import deque

        if with_context:
            frames: deque = deque([], context)
            times: deque = deque([], context)

        grid = self.timestamps()
        iterator = grid
        if self.verbose:
            from tqdm import tqdm

            iterator = tqdm(iterable=grid, total=len(grid), leave=True,
                            mininterval=1.0, unit="frames", unit_scale=True)

        for t in iterator:
            rgb = self(t)
            if with_context:
                frames.append(rgb)
                times.append(t)
                if len(frames) < context:
                    continue
                out = frames
                if with_time:
                    if with_context == "right":
                        t_out = times[0]
                    elif with_context == "center":
                        t_out = times[context // 2]
                    else:
                        t_out = t
                    yield t_out, out
                else:
                    yield out
            else:
                if with_time:
                    yield t, rgb
                else:
                    yield rgb

    def iterbatches(self, batch_size: int, start=None, end=None,
                    step=None) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Iterate frames in batches for device feeding.

        Yields ``(timestamps [B], frames [B, H, W, 3] uint8)``; the final
        batch may be shorter.  This is the TPU pipeline's ingest surface —
        stages batch frames here, stage them on-device and run fused XLA
        programs over the batch instead of per-frame host loops.
        """
        start = self.start if start is None else start
        end = self.end if end is None else end
        step = self.step if step is None else step
        # same index-based grid as `timestamps()` — np.arange float
        # accumulation could emit a phantom tail frame on resumed runs
        # with nonzero start
        grid = self._grid(start, end, step)
        for chunk_start in range(0, len(grid), batch_size):
            ts = grid[chunk_start : chunk_start + batch_size]
            frames = np.stack([self(t) for t in ts], axis=0)
            yield ts, frames

    def close(self) -> None:
        self._source.close()

    def __del__(self):
        try:
            self._source.close()
        except Exception:
            pass
