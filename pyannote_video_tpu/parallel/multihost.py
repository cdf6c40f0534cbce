"""Multi-host (DCN) execution: jax.distributed wiring + shot-shard merge.

The reference is single-process (SURVEY §2.3); episode-level scaling across
hosts is new design.  Model: every worker runs the SAME CLI command with
``--rank r --world W`` — shots are embarrassingly parallel
(`tracking.py:408-417`), so worker r processes shots ``r, r+W, r+2W, …``
and writes ``<output>.part{r}``; any worker (or a follow-up invocation)
merges the parts into the final stage file deterministically.  When a
``--coordinator host:port`` is given, ``jax.distributed`` is initialised so
all workers form one JAX process group (required for multi-host TPU slices,
where collectives ride DCN; for independent single-host workers the
coordinator is unnecessary — work division alone suffices).
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional, Tuple

_INITIALIZED = False


def init_distributed(coordinator: Optional[str], rank: int,
                     world: int) -> None:
    """Initialise the JAX process group (idempotent; no-op for world<=1
    or when no coordinator is given)."""
    global _INITIALIZED
    if world <= 1 or not coordinator or _INITIALIZED:
        return
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=world,
        process_id=rank,
    )
    _INITIALIZED = True


def env_worker() -> Tuple[int, int, Optional[str]]:
    """(rank, world, coordinator) from the environment.

    Honoured variables: PYV_RANK, PYV_WORLD, PYV_COORDINATOR — explicit
    CLI flags win over these.
    """
    return (
        int(os.environ.get("PYV_RANK", "0")),
        int(os.environ.get("PYV_WORLD", "1")),
        os.environ.get("PYV_COORDINATOR") or None,
    )


def part_path(output: str, rank: int) -> str:
    return f"{output}.part{rank}"


def merge_tracking_parts(output: str, world: int,
                         wait_s: float = 0.0,
                         include_existing: bool = False) -> int:
    """Merge ``<output>.part{0..world-1}`` into ``<output>``.

    Tracks are renumbered deterministically by (first timestamp, source
    rank, local id) so the merged file is identical regardless of worker
    count or completion order.  With ``wait_s`` > 0, waits for missing
    part files (workers still running).  ``include_existing`` folds tracks
    already present in ``output`` into the merge pool (rank −1) — the
    ``--resume`` case, where pre-restart tracks would otherwise be lost
    when this function rewrites the file.  Returns the number of tracks.
    """
    from ..core import formats

    paths = [part_path(output, r) for r in range(world)]
    deadline = time.time() + wait_s
    missing = [p for p in paths if not os.path.exists(p)]
    while missing and time.time() < deadline:
        time.sleep(0.2)
        missing = [p for p in paths if not os.path.exists(p)]
    if missing:
        raise FileNotFoundError(f"missing worker outputs: {missing}")

    tracks: Dict[Tuple[float, int, int], List] = {}
    if include_existing and os.path.exists(output):
        for point in formats.read_tracking(output):
            tracks.setdefault((-1, point.identifier), []).append(point)
    for r, p in enumerate(paths):
        for point in formats.read_tracking(p):
            key = (r, point.identifier)
            tracks.setdefault(key, []).append(point)

    ordered = sorted(
        tracks.items(),
        key=lambda kv: (min(pt.t for pt in kv[1]), kv[0][0], kv[0][1]),
    )
    with open(output, "w") as fp:
        for new_id, (_, points) in enumerate(ordered):
            for pt in sorted(points, key=lambda q: q.t):
                fp.write(formats.FACE_TEMPLATE.format(
                    t=pt.t, identifier=new_id, status=pt.status,
                    left=pt.left, right=pt.right, top=pt.top,
                    bottom=pt.bottom,
                ))
    return len(ordered)
