"""Streaming end-to-end driver: decode → YUV420 staging → overlapped
``device_put`` → back-to-back fused device programs.

This is the sustained-throughput path the per-kernel benchmarks exclude:
a feeder thread decodes video frames and packs them to planar YUV 4:2:0
(half the bytes of RGB24 — the format real codecs emit natively), the
main thread keeps ``depth`` batches in flight on the device, and a
user-supplied ``compute(carry, ts, y, u, v) -> (carry, result)`` runs on
batch *k* while batch *k+1* transfers.  The carry threads tracker /
shot-boundary state across batch edges (`ops/dsst.py:shot_scan` takes
state in and returns it, so chunked streaming tracking is exact).

Replaces the reference's synchronous decode→compute frame loop
(`pyannote/video/video.py:332-358` feeding `tracking.py:406`) with a
pipelined design; on production hosts the decoder emits YUV planes
directly (ffmpeg ``yuv420p`` / V4L2 NV12) so the host never touches RGB.

Instrumentation: per-leg seconds (decode, pack, transfer-blocked,
compute-blocked) and wall time, so a bench can report pipelining
efficiency and the binding leg rather than a single opaque fps.
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Iterable, Iterator, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# host-side packing


def pack_yuv420(frames_rgb: np.ndarray) -> Tuple[np.ndarray, np.ndarray,
                                                 np.ndarray]:
    """RGB uint8 batch [B, H, W, 3] → planar (Y [B,H,W], U, V [B,H/2,W/2]).

    Uses cv2's C conversion path (limited-range BT.601 I420, the exact
    convention `ops/color.py:yuv420_to_rgb` inverts); falls back to the
    NumPy reference packer when cv2 is unavailable.
    """
    try:
        import cv2
    except ImportError:  # pragma: no cover - cv2 is present in this image
        from ..ops.color import rgb_to_yuv420
        return rgb_to_yuv420(frames_rgb)

    B, H, W, _ = frames_rgb.shape
    y = np.empty((B, H, W), dtype=np.uint8)
    u = np.empty((B, H // 2, W // 2), dtype=np.uint8)
    v = np.empty((B, H // 2, W // 2), dtype=np.uint8)
    for b in range(B):
        i420 = cv2.cvtColor(frames_rgb[b], cv2.COLOR_RGB2YUV_I420)
        y[b] = i420[:H]
        u[b] = i420[H : H + H // 4].reshape(H // 2, W // 2)
        v[b] = i420[H + H // 4 :].reshape(H // 2, W // 2)
    return y, u, v


def video_yuv_batches(path: str, batch_size: int,
                      drop_last: bool = True) -> Iterator:
    """Decode a video file straight to pre-packed YUV420 batches.

    cv2 decodes to BGR and the I420 pack happens per frame while it is
    still cache-hot (BGR→I420 directly — no intermediate RGB pass, ~1 ms
    per 720p frame single-threaded).  Yields ``(timestamps [B],
    (y [B,H,W], u, v [B,H/2,W/2]))`` for `run_stream(..., pack=False)`.
    A production decoder hands over the codec's own YUV planes and skips
    even this; the reference instead pipes full RGB24 out of ffmpeg
    (`video.py:345-348`), 2× the bytes of 4:2:0.
    """
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"could not open {path}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
    ys, us, vs, ts = [], [], [], []
    i = 0
    try:
        while True:
            ok, bgr = cap.read()
            if not ok:
                break
            H, W = bgr.shape[:2]
            i420 = cv2.cvtColor(bgr, cv2.COLOR_BGR2YUV_I420)
            ys.append(i420[:H])
            us.append(i420[H : H + H // 4].reshape(H // 2, W // 2))
            vs.append(i420[H + H // 4 :].reshape(H // 2, W // 2))
            ts.append(i / fps)
            i += 1
            if len(ys) == batch_size:
                yield (np.asarray(ts), (np.stack(ys), np.stack(us),
                                        np.stack(vs)))
                ys, us, vs, ts = [], [], [], []
        if ys and not drop_last:
            yield (np.asarray(ts), (np.stack(ys), np.stack(us),
                                    np.stack(vs)))
    finally:
        cap.release()


def write_yuv_file(path: str, batches: Iterable) -> int:
    """Dump YUV420 batches to a raw I420 stream file; returns frame count.

    Frame layout is ffmpeg's ``-pix_fmt yuv420p`` raw order (Y plane, then
    U, then V) so the file doubles as an ``ffmpeg -f rawvideo`` input.
    """
    n = 0
    with open(path, "wb") as fh:
        for _, (y, u, v) in batches:
            for b in range(y.shape[0]):
                fh.write(y[b].tobytes())
                fh.write(u[b].tobytes())
                fh.write(v[b].tobytes())
                n += 1
    return n


def yuv_file_batches(path: str, height: int, width: int, batch_size: int,
                     fps: float = 25.0, drop_last: bool = True) -> Iterator:
    """Read a raw I420 stream file as pre-packed YUV420 batches.

    The pre-decoded source: models a production decoder (multi-core ffmpeg
    ``-pix_fmt yuv420p`` pipe, NVDEC/VPU output) handing planar frames to
    the ingest, so the streaming bench can separate the decode leg (a
    software-codec cost that scales with host cores) from the
    transfer/compute legs this framework owns.  Yields
    ``(timestamps [B], (y [B,H,W], u, v [B,H/2,W/2]))`` for
    ``run_stream(..., pack=False)``.
    """
    ysz = height * width
    csz = (height // 2) * (width // 2)
    fsz = ysz + 2 * csz
    i = 0
    with open(path, "rb") as fh:
        while True:
            raw = np.fromfile(fh, dtype=np.uint8, count=fsz * batch_size)
            n = raw.size // fsz
            if n == 0:
                break
            if n < batch_size and drop_last:
                break
            raw = raw[: n * fsz].reshape(n, fsz)
            y = raw[:, :ysz].reshape(n, height, width)
            u = raw[:, ysz : ysz + csz].reshape(n, height // 2, width // 2)
            v = raw[:, ysz + csz :].reshape(n, height // 2, width // 2)
            ts = (np.arange(i, i + n)) / fps
            i += n
            yield ts, (y, u, v)
            if n < batch_size:
                break


# ---------------------------------------------------------------------------
# instrumentation


@dataclass
class StreamStats:
    """Per-leg accounting for one streaming run."""

    frames: int = 0
    batches: int = 0
    bytes_shipped: int = 0
    decode_s: float = 0.0      # packer thread: source read time
    pack_s: float = 0.0        # packer thread: RGB→YUV420 packing time
    transfer_s: float = 0.0    # shipper thread: device_put + completion
    feed_wait_s: float = 0.0   # main thread blocked waiting for batches
    compute_s: float = 0.0     # main thread blocked in dispatch+sync
    wall_s: float = 0.0
    legs: dict = field(default_factory=dict)  # isolated leg rates (optional)

    @property
    def fps(self) -> float:
        return self.frames / self.wall_s if self.wall_s else 0.0

    @property
    def transfer_gbps(self) -> float:
        return (self.bytes_shipped / self.wall_s / 1e9) if self.wall_s else 0.0

    def as_dict(self) -> dict:
        d = {
            "frames": self.frames,
            "batches": self.batches,
            "wall_s": round(self.wall_s, 3),
            "fps": round(self.fps, 1),
            "shipped_gb": round(self.bytes_shipped / 1e9, 3),
            "decode_s": round(self.decode_s, 3),
            "pack_s": round(self.pack_s, 3),
            "transfer_s": round(self.transfer_s, 3),
            "feed_wait_s": round(self.feed_wait_s, 3),
            "compute_blocked_s": round(self.compute_s, 3),
        }
        if self.legs:
            d["legs"] = self.legs
        return d


# ---------------------------------------------------------------------------
# feeder thread


_SENTINEL = object()


class _Stage:
    """One pipeline stage: apply ``fn`` to upstream items on a thread.

    The bounded output queue gives backpressure: a stage never runs more
    than ``depth`` items ahead, so peak host memory is depth × batch
    bytes per stage (the TPU-side analog of the reference's single-frame
    pipe buffer).  Errors propagate to the consumer.  Because pack runs
    in C (cv2) and ``device_put`` blocks in socket/DMA I/O with the GIL
    released, decode, transfer, and compute genuinely overlap even on a
    single-core host.
    """

    def __init__(self, upstream: Iterable, fn: Callable, depth: int):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._fn = fn
        self._err: Optional[BaseException] = None
        self.pull_s = 0.0   # time spent in upstream next() (incl. waits)
        self.busy_s = 0.0   # time spent inside fn
        self.wait_s = 0.0   # consumer time blocked on this stage's queue
        self._thread = threading.Thread(
            target=self._run, args=(iter(upstream),), daemon=True)
        self._thread.start()

    def _run(self, it: Iterator) -> None:
        try:
            while True:
                t0 = time.perf_counter()
                try:
                    item = next(it)
                except StopIteration:
                    break
                t1 = time.perf_counter()
                out = self._fn(item)
                t2 = time.perf_counter()
                self.pull_s += t1 - t0
                self.busy_s += t2 - t1
                self._q.put(out)
        except BaseException as e:  # propagate into the consumer
            self._err = e
        finally:
            self._q.put(_SENTINEL)

    def __iter__(self):
        while True:
            t0 = time.perf_counter()
            item = self._q.get()
            self.wait_s += time.perf_counter() - t0
            if item is _SENTINEL:
                if self._err is not None:
                    raise self._err
                return
            yield item


# ---------------------------------------------------------------------------
# the driver


def run_stream(batches: Iterable,
               compute: Callable,
               carry,
               depth: int = 2,
               pack: bool = True,
               sync: Optional[Callable] = None) -> Tuple[object, list,
                                                         StreamStats]:
    """Drive ``compute`` over a stream of frame batches, overlapped.

    batches  iterable of ``(timestamps [B], frames [B, H, W, 3] uint8)``
             (or pre-packed ``(ts, (y, u, v))`` with ``pack=False``);
    compute  ``(carry, ts, y, u, v) -> (carry, result)`` — must only
             dispatch device work and return device arrays (no blocking);
    carry    initial carry (e.g. ``(dsst.init_state(N), prev_gray)``);
    depth    device batches kept in flight (2 = classic double buffer);
    sync     optional ``result -> float`` forcing completion of one
             result (defaults to a 1-element readback of the first leaf).

    Returns ``(final_carry, results, stats)``.  Three threads pipeline
    the legs — decode+pack, ``device_put`` transfer, compute+sync — so
    wall time approaches the slowest leg, not the sum: through a
    relay/tunnel this is what hides per-dispatch and transfer latency.
    """
    stats = StreamStats()
    if sync is None:
        def sync(res):
            leaf = jax.tree_util.tree_leaves(res)[0]
            return float(jnp.ravel(leaf)[0])

    def do_pack(item):
        ts, frames = item
        planes = pack_yuv420(frames) if pack else frames
        return ts, planes

    def do_put(item):
        ts, (y, u, v) = item
        stats.bytes_shipped += y.nbytes + u.nbytes + v.nbytes
        dev = (jax.device_put(y), jax.device_put(u), jax.device_put(v))
        # force the transfer on THIS thread (socket/DMA I/O, GIL
        # released) so the compute thread never blocks on shipping
        for d in dev:
            float(jnp.ravel(d)[0])
        return ts, dev, int(y.shape[0])

    t_start = time.perf_counter()
    packer = _Stage(batches, do_pack, depth)
    shipper = _Stage(packer, do_put, depth)

    inflight: list = []   # dispatched, unsynced results
    results: list = []
    for ts, (dy, du, dv), n in shipper:
        td0 = time.perf_counter()
        carry, res = compute(carry, ts, dy, du, dv)
        stats.compute_s += time.perf_counter() - td0
        stats.frames += n
        stats.batches += 1
        inflight.append(res)
        if len(inflight) > depth:
            td0 = time.perf_counter()
            done = inflight.pop(0)
            sync(done)
            stats.compute_s += time.perf_counter() - td0
            results.append(done)
    for done in inflight:
        td0 = time.perf_counter()
        sync(done)
        stats.compute_s += time.perf_counter() - td0
        results.append(done)

    stats.wall_s = time.perf_counter() - t_start
    stats.decode_s = packer.pull_s    # upstream next() does the decode
    stats.pack_s = packer.busy_s
    stats.transfer_s = shipper.busy_s
    stats.feed_wait_s = shipper.wait_s
    return carry, results, stats


# ---------------------------------------------------------------------------
# leg isolation + projection helpers (used by bench.py)


def isolate_legs(batches: list, compute: Callable, carry,
                 sync: Optional[Callable] = None) -> dict:
    """Measure each pipeline leg alone on a fixed in-RAM batch list.

    Returns per-leg seconds for: decode+pack (host), transfer (synced
    device_put), compute (device-resident inputs).  The overlapped wall
    time from `run_stream` divided into these gives the pipelining
    efficiency: wall ≈ max(legs) is perfect overlap, wall ≈ sum(legs)
    is none.
    """
    if sync is None:
        def sync(res):
            leaf = jax.tree_util.tree_leaves(res)[0]
            return float(jnp.ravel(leaf)[0])

    # host leg: pack only (decode is the caller's source-specific cost)
    t0 = time.perf_counter()
    packed = [(ts, pack_yuv420(frames)) for ts, frames in batches]
    t_pack = time.perf_counter() - t0

    # transfer leg: ship every batch, forcing completion via readback
    t0 = time.perf_counter()
    dev = []
    for ts, (y, u, v) in packed:
        dy, du, dv = jax.device_put(y), jax.device_put(u), jax.device_put(v)
        dev.append((ts, (dy, du, dv)))
    # force all transfers (single tiny readback per batch)
    for _, (dy, du, dv) in dev:
        float(jnp.ravel(dy)[0])
        float(jnp.ravel(du)[0])
        float(jnp.ravel(dv)[0])
    t_transfer = time.perf_counter() - t0

    # compute leg: device-resident inputs, one sync at the end of each
    t0 = time.perf_counter()
    c = carry
    for ts, (dy, du, dv) in dev:
        c, res = compute(c, ts, dy, du, dv)
        sync(res)
    t_compute = time.perf_counter() - t0

    n_frames = sum(int(b[1].shape[0]) if isinstance(b[1], np.ndarray)
                   else int(b[1][0].shape[0]) for b in batches)
    gb = sum(y.nbytes + u.nbytes + v.nbytes
             for _, (y, u, v) in packed) / 1e9
    return {
        "pack_s": round(t_pack, 3),
        "transfer_s": round(t_transfer, 3),
        "compute_s": round(t_compute, 3),
        "pack_fps": round(n_frames / t_pack, 1) if t_pack else None,
        "transfer_fps": round(n_frames / t_transfer, 1),
        "transfer_gbps": round(gb / t_transfer, 5),
        "compute_fps": round(n_frames / t_compute, 1),
    }


def pipelining_efficiency(wall_s: float, leg_seconds: Iterable[float]
                          ) -> float:
    """1.0 = wall equals the slowest leg (perfect overlap); 0.0 = legs
    ran strictly serially (wall equals their sum)."""
    legs = [s for s in leg_seconds if s > 0]
    if not legs:
        return 1.0
    total, worst = sum(legs), max(legs)
    if total - worst <= 1e-9:
        return 1.0
    return max(0.0, min(1.0, (total - wall_s) / (total - worst)))


def project_fps(bytes_per_frame: float, compute_fps: float,
                link_gbps: float, decode_fps: Optional[float] = None
                ) -> float:
    """Sustained fps on a host whose device link runs at ``link_gbps``
    (e.g. 12 GB/s effective PCIe gen3 x16), assuming the measured
    compute rate and perfect overlap: min over the legs."""
    transfer_fps = link_gbps * 1e9 / bytes_per_frame
    legs = [compute_fps, transfer_fps]
    if decode_fps:
        legs.append(decode_fps)
    return min(legs)
