"""Benchmark: fused detect→align→embed throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The metric is the BASELINE.json north star: 720p frames/second/chip through
the fused detect→align→embed XLA program (pyramid CNN detection + device
NMS + landmark placement + chip warp + ResNet-29 embedding), batch=64.
``vs_baseline`` is the ratio against the ≥250 fps/chip target
(BASELINE.json:5; the reference publishes no numbers of its own —
BASELINE.md).
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

    from pyannote_video_tpu.io.batch import prefetch_to_device
    from pyannote_video_tpu.models.fused import FusedFacePipeline

    rng = np.random.default_rng(0)
    batches = [
        rng.integers(0, 255, size=(BATCH, H, W, 3), dtype=np.uint8)
        for _ in range(ITERS)
    ]

    pipe = FusedFacePipeline(max_faces=8)
    # compile + warm up
    for _ in range(WARMUP):
        out = pipe(batches[0])
        jax.block_until_ready(out)

    # steady state: host→device transfer double-buffered behind compute
    t0 = time.perf_counter()
    out = None
    for dev_frames in prefetch_to_device(iter(batches), size=2):
        out = pipe(dev_frames)
    jax.block_until_ready(out)
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
