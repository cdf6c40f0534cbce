"""Benchmark: fused detect→align→embed throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The metric is the BASELINE.json north star: 720p frames/second/chip through
the fused detect→align→embed XLA program (pyramid CNN detection + device
NMS + landmark placement + separable chip warp + ResNet-29 embedding),
batch=64, device-resident frames.  ``vs_baseline`` is the ratio against the
≥250 fps/chip target (BASELINE.json:5; the reference publishes no numbers
of its own — BASELINE.md).

Timing notes for this environment: the axon relay adds ~30-40 ms dispatch
latency per synchronisation (included in the measurement — we sync once per
batch via a scalar readback, as a real pipeline would) and caps host→device
transfer at ~0.4 GB/s (~140 fps of raw 720p feed).  The transfer is
excluded from the kernel metric — it is a tunnel artifact, overlappable via
``pyannote_video_tpu.io.batch.prefetch_to_device`` and an order of
magnitude faster on production PCIe hosts.
"""

import json
import time

import numpy as np

TARGET_FPS = 250.0  # BASELINE.json north-star: >=250 fps/chip @ 720p
BATCH = 64
H, W = 720, 1280
WARMUP = 2
ITERS = 5


def main():
    import jax
    import jax.numpy as jnp

    from pyannote_video_tpu.models.fused import FusedFacePipeline

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 255, size=(BATCH, H, W, 3), dtype=np.uint8)
    )
    _ = float(jnp.sum(frames[0, 0, 0]))  # materialize on device

    pipe = FusedFacePipeline(max_faces=8)
    fused = pipe._build(H, W)

    def run():
        out = fused(pipe.detector_params, pipe.embedder_params, frames)
        # force full execution with a tiny readback (block_until_ready does
        # not reliably block through the axon relay)
        return float(jnp.sum(out.scores))

    for _ in range(WARMUP):
        run()

    t0 = time.perf_counter()
    for _ in range(ITERS):
        run()
    dt = (time.perf_counter() - t0) / ITERS

    fps = BATCH / dt
    print(json.dumps({
        "metric": "720p detect+align+embed fps/chip (fused XLA program, batch=64)",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / TARGET_FPS, 3),
    }))


if __name__ == "__main__":
    main()
