"""Device feeding: double-buffered host→device batch prefetch.

The host→device transfer of raw frame batches is a hard throughput floor
if serialized with compute (this environment's tunnel moves ~0.05 GB/s —
several seconds per 64×720p batch).  ``prefetch_to_device`` keeps N
batches in flight: while the TPU computes on batch k, batch k+1 is
already transferring — the JAX-native equivalent of the reference's
single-producer ffmpeg pipe (`video.py:332-358`), upgraded to overlap
I/O with compute.  For the full three-thread streaming pipeline with YUV420
packing and per-leg instrumentation, see `io/stream.py`.
"""

from __future__ import annotations

from collections import deque
from typing import Iterable, Iterator, Tuple

import jax
import numpy as np


def prefetch_to_device(iterator: Iterable, size: int = 2) -> Iterator:
    """Yield items with up to `size` already device_put ahead.

    Items may be arrays or (timestamps, frames) tuples; arrays inside are
    transferred asynchronously by ``jax.device_put`` and only awaited when
    consumed by a computation.
    """
    queue: deque = deque()

    def put(item):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x) if isinstance(x, np.ndarray) else x,
            item,
        )

    it = iter(iterator)
    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out


def device_batches(video, batch_size: int, prefetch: int = 2,
                   **kwargs) -> Iterator[Tuple[np.ndarray, jax.Array]]:
    """Video → device-resident (timestamps, frames) batches, prefetched."""
    return prefetch_to_device(video.iterbatches(batch_size, **kwargs),
                              size=prefetch)
