"""Shot-queue scheduler: shot-level parallelism over devices/hosts.

Shots are the workload's embarrassingly parallel unit — tracking never
crosses a shot boundary (reference `tracking.py:408-417`, SURVEY §5).  This
scheduler fans independent shots out over workers:

* single host, one device: sequential fallback (still batched per shot);
* single host, multiple devices: round-robin device placement — each shot's
  programs run under ``jax.default_device`` for its assigned chip;
* multi host: rank r of world W takes shots r, r+W, r+2W, ... (DCN-level
  sharding by work division; results merge by shot index, so output files
  are deterministic regardless of worker count).

Per-shot stage work stays one-XLA-program-per-batch; the scheduler only
decides placement and ordering.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Iterator, List, Optional, Sequence, Tuple

import jax

from ..core import Segment


@dataclass
class ShotResult:
    index: int
    segment: Segment
    value: object


class ShotScheduler:
    """Distribute per-shot work across local devices and/or hosts.

    Parameters
    ----------
    devices : list, optional
        Devices to round-robin over (default: all local devices).
    rank, world : int
        Multi-host work division (this worker processes shots where
        ``index % world == rank``).
    """

    def __init__(self, devices: Optional[Sequence] = None,
                 rank: int = 0, world: int = 1):
        self.devices = list(devices) if devices is not None else jax.devices()
        self.rank = rank
        self.world = world

    def my_shots(self, shots: Sequence[Segment]) -> List[Tuple[int, Segment]]:
        return [
            (i, s) for i, s in enumerate(shots) if i % self.world == self.rank
        ]

    def run(self, shots: Sequence[Segment],
            process: Callable[[Segment], object]) -> Iterator[ShotResult]:
        """Process this worker's shots, placing work round-robin on devices.

        Yields ShotResults in this worker's shot order (globally mergeable
        by ``index``).
        """
        for k, (index, segment) in enumerate(self.my_shots(shots)):
            device = self.devices[k % len(self.devices)]
            with jax.default_device(device):
                value = process(segment)
            yield ShotResult(index=index, segment=segment, value=value)


def merge_results(results: Sequence[ShotResult]) -> List[object]:
    """Merge per-shot results from any number of workers into shot order."""
    return [r.value for r in sorted(results, key=lambda r: r.index)]
