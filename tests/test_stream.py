"""Streaming driver (`io/stream.py`): packing parity, overlapped-vs-serial
result equivalence, carry threading, and the accounting helpers."""

import numpy as np
import pytest

import jax.numpy as jnp

from pyannote_video_tpu.io.stream import (
    isolate_legs,
    pack_yuv420,
    pipelining_efficiency,
    project_fps,
    run_stream,
)
from pyannote_video_tpu.ops.color import rgb_to_yuv420, yuv420_to_rgb


def _batches(n=4, b=6, h=32, w=48, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        ts = np.arange(b, dtype=np.float64) + i * b
        frames = rng.integers(0, 255, size=(b, h, w, 3), dtype=np.uint8)
        out.append((ts, frames))
    return out


class TestPack:
    def test_cv2_pack_matches_numpy_reference(self):
        # luma: identical coefficients, so exact (±1 rounding) even on
        # noise.  Chroma: cv2 sites its 4:2:0 samples differently from our
        # box average — unbounded on noise, so chroma parity is asserted
        # on smooth content, where any correct I420 packer must agree.
        _, noise = _batches(1)[0]
        y1, _, _ = pack_yuv420(noise)
        y2, _, _ = rgb_to_yuv420(noise)
        assert np.abs(y1.astype(int) - y2.astype(int)).max() <= 1

        gx = np.linspace(0, 255, 48, dtype=np.float32)
        gy = np.linspace(0, 255, 32, dtype=np.float32)
        smooth = np.stack([
            np.tile(gx, (32, 1)),
            np.tile(gy[:, None], (1, 48)),
            np.full((32, 48), 128.0),
        ], axis=-1).astype(np.uint8)[None]
        y1, u1, v1 = pack_yuv420(smooth)
        y2, u2, v2 = rgb_to_yuv420(smooth)
        assert np.abs(y1.astype(int) - y2.astype(int)).max() <= 1
        assert np.abs(u1.astype(int) - u2.astype(int)).max() <= 3
        assert np.abs(v1.astype(int) - v2.astype(int)).max() <= 3

    def test_roundtrip_through_device_unpack(self):
        # pack → device unpack recovers smooth images closely (chroma
        # subsampling only destroys pixel-level alternation)
        x = np.zeros((1, 16, 16, 3), np.uint8)
        x[..., 0], x[..., 1], x[..., 2] = 180, 90, 40
        y, u, v = pack_yuv420(x)
        rgb = np.asarray(yuv420_to_rgb(jnp.asarray(y), jnp.asarray(u),
                                       jnp.asarray(v)))
        assert np.abs(rgb - x.astype(np.float32)).max() < 6.0


class TestRunStream:
    def _compute(self):
        def compute(carry, ts, y, u, v):
            # running sum of luma + frame count, a deliberately
            # carry-dependent program
            total = carry + jnp.sum(y.astype(jnp.float32))
            return total, total
        return compute

    def test_matches_serial_reference(self):
        batches = _batches()
        compute = self._compute()
        carry, results, stats = run_stream(batches, compute,
                                           jnp.float32(0.0), depth=2)
        # serial reference
        ref = 0.0
        for _, frames in batches:
            y, _, _ = pack_yuv420(frames)
            ref += float(y.astype(np.float64).sum())
        assert float(carry) == pytest.approx(ref, rel=1e-6)
        assert len(results) == len(batches)
        assert float(results[-1]) == pytest.approx(ref, rel=1e-6)

    def test_stats_accounting(self):
        batches = _batches()
        _, _, stats = run_stream(batches, self._compute(),
                                 jnp.float32(0.0), depth=2)
        n = sum(len(ts) for ts, _ in batches)
        assert stats.frames == n
        assert stats.batches == len(batches)
        # YUV420 = 1.5 bytes/pixel
        _, f0 = batches[0]
        assert stats.bytes_shipped == int(n * f0.shape[1] * f0.shape[2] * 1.5)
        assert stats.wall_s > 0 and stats.fps > 0
        d = stats.as_dict()
        assert {"frames", "fps", "decode_s", "pack_s"} <= set(d)

    def test_prepacked_source(self):
        batches = [(ts, pack_yuv420(frames)) for ts, frames in _batches()]
        carry, _, stats = run_stream(batches, self._compute(),
                                     jnp.float32(0.0), depth=2, pack=False)
        assert stats.pack_s < 1e-3  # no packing work, only timer ticks
        assert float(carry) > 0

    def test_feeder_error_propagates(self):
        def bad():
            yield _batches(1)[0]
            raise RuntimeError("decoder died")
        with pytest.raises(RuntimeError, match="decoder died"):
            run_stream(bad(), self._compute(), jnp.float32(0.0))


class TestVideoYUVBatches:
    def test_decode_pack_roundtrip(self, tmp_path):
        import cv2

        from pyannote_video_tpu.io.stream import video_yuv_batches

        # smooth moving gradient, MJPG-encodable without ffmpeg
        path = str(tmp_path / "grad.avi")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"),
                            25, (64, 48))
        frames = []
        for i in range(10):
            g = np.zeros((48, 64, 3), np.uint8)
            g[:, :, 0] = np.linspace(10 + 5 * i, 200, 64)[None, :]
            g[:, :, 1] = 90
            g[:, :, 2] = np.linspace(40, 150, 48)[:, None]
            frames.append(g)
            w.write(g[:, :, ::-1])
        w.release()

        got = list(video_yuv_batches(path, 4))
        assert len(got) == 2  # drop_last=True drops the 2-frame tail
        ts, (y, u, v) = got[0]
        assert y.shape == (4, 48, 64) and u.shape == (4, 24, 32)
        assert np.allclose(ts, np.arange(4) / 25.0)
        # luma must match the direct pack of the (MJPG-lossy) frame
        rgb = np.asarray(yuv420_to_rgb(jnp.asarray(y), jnp.asarray(u),
                                       jnp.asarray(v)))
        assert np.abs(rgb[0] - frames[0].astype(np.float32)).mean() < 8.0

        tail = list(video_yuv_batches(path, 4, drop_last=False))
        assert len(tail) == 3 and tail[-1][1][0].shape[0] == 2


class TestAccounting:
    def test_isolate_legs(self):
        batches = _batches(2)
        def compute(carry, ts, y, u, v):
            return carry, jnp.sum(y.astype(jnp.float32))
        legs = isolate_legs(batches, compute, None)
        assert legs["transfer_fps"] > 0 and legs["transfer_gbps"] >= 0
        assert legs["compute_fps"] > 0 and legs["pack_fps"] > 0

    def test_pipelining_efficiency_bounds(self):
        assert pipelining_efficiency(3.0, [3.0, 1.0, 1.0]) == 1.0  # = max
        assert pipelining_efficiency(5.0, [3.0, 1.0, 1.0]) == 0.0  # = sum
        mid = pipelining_efficiency(4.0, [3.0, 1.0, 1.0])
        assert 0.0 < mid < 1.0
        assert pipelining_efficiency(10.0, []) == 1.0

    def test_project_fps(self):
        # 720p YUV420 = 1.3824 MB/frame; 12 GB/s link >> compute ⇒
        # compute-bound
        bpf = 1280 * 720 * 1.5
        assert project_fps(bpf, 500.0, 12.0) == 500.0
        # slow link binds
        assert project_fps(bpf, 500.0, 0.047) == pytest.approx(
            0.047e9 / bpf)
        # decode can bind
        assert project_fps(bpf, 500.0, 12.0, decode_fps=80.0) == 80.0


class TestYUVFileSource:
    def test_write_read_roundtrip(self, tmp_path):
        from pyannote_video_tpu.io.stream import (
            write_yuv_file,
            yuv_file_batches,
        )

        rng = np.random.default_rng(3)
        frames = rng.integers(0, 255, size=(10, 48, 64, 3), dtype=np.uint8)
        planes = rgb_to_yuv420(frames)
        src = [(np.arange(4) / 25.0, tuple(p[:4] for p in planes)),
               (np.arange(4, 10) / 25.0, tuple(p[4:] for p in planes))]
        path = str(tmp_path / "clip.i420")
        n = write_yuv_file(path, src)
        assert n == 10

        got = list(yuv_file_batches(path, 48, 64, 4))
        assert len(got) == 2  # drop_last drops the 2-frame tail
        ts, (y, u, v) = got[1]
        assert y.shape == (4, 48, 64) and u.shape == (4, 24, 32)
        np.testing.assert_array_equal(y, planes[0][4:8])
        np.testing.assert_array_equal(u, planes[1][4:8])
        np.testing.assert_array_equal(v, planes[2][4:8])
        np.testing.assert_allclose(ts, np.arange(4, 8) / 25.0)

        tail = list(yuv_file_batches(path, 48, 64, 4, drop_last=False))
        assert len(tail) == 3 and tail[-1][1][0].shape[0] == 2
