"""Multi-chip dry run: exercise the full sharded execution paths on a mesh.

Run by the driver (via ``__graft_entry__.dryrun_multichip``) with N virtual
CPU devices to validate that the multi-chip shardings compile and execute
without N real chips.  Covers the three parallel paths of the framework
(SURVEY §2.3 — new design; the reference is single-process):

1. the sharded **training step** (dp over the chip batch + tp over the
   embedder's wide filters, `parallel/sharding.py`);
2. the sharded **fused inference program** (detect→align→embed with the
   frame batch dp-sharded, `models/fused.py`);
3. the **shot scheduler** (shot-level work division across workers with
   deterministic merge, `parallel/scheduler.py`).

This module must be importable in a fresh process whose environment forces
the CPU platform with N virtual devices BEFORE jax initializes — see
``__graft_entry__.dryrun_multichip`` for the re-exec wrapper.
"""

from __future__ import annotations

import numpy as np


def run_dryrun(n_devices: int) -> None:
    import jax

    # Defensive: if the interpreter's sitecustomize imported jax before our
    # env took effect, flip the live config (backends are lazy, so this
    # works as long as no device was touched yet — conftest.py does the
    # same for the test suite).
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    if jax.device_count() < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, have {jax.device_count()}; "
            "launch with JAX_PLATFORMS=cpu and "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n_devices}"
        )

    import jax.numpy as jnp
    import optax

    from ..models import embedder
    from ..models.fused import FusedFacePipeline
    from .mesh import make_mesh, data_sharding
    from .scheduler import ShotScheduler, merge_results
    from .sharding import make_train_step, shard_params_for_tp
    from ..core import Segment

    model_par = 2 if n_devices % 2 == 0 and n_devices > 1 else 1
    mesh = make_mesh(n_devices=n_devices, model_parallelism=model_par)
    rng = np.random.default_rng(0)

    # -- 1. sharded train step (dp batch + tp params) -----------------------
    with mesh:
        params = embedder.init_params(jax.random.PRNGKey(0), width=0.25)
        params = shard_params_for_tp(params, mesh)
        tx = optax.adam(1e-3)
        opt_state = tx.init(params)
        step = make_train_step(mesh, tx)

        batch = max(n_devices, 8)
        chips = jax.device_put(
            jnp.asarray(rng.integers(0, 255, (batch, 150, 150, 3)),
                        dtype=jnp.float32),
            data_sharding(mesh),
        )
        labels = jax.device_put(
            jnp.asarray(rng.integers(0, 4, (batch,)), dtype=jnp.int32),
            data_sharding(mesh),
        )
        params, opt_state, loss = step(params, opt_state, chips, labels)
        jax.block_until_ready(loss)
        print(f"dryrun[train]: mesh={dict(mesh.shape)} "
              f"loss={float(loss):.4f} OK")

    # -- 2. sharded fused inference (dp over the frame batch) ---------------
    dp = mesh.shape["data"]
    fb = max(2 * dp, 4)
    pipe = FusedFacePipeline(max_faces=4)
    fused = pipe._build(96, 128)
    frames = jax.device_put(
        jnp.asarray(rng.integers(0, 255, (fb, 96, 128, 3)), dtype=jnp.uint8),
        data_sharding(mesh),
    )
    with mesh:
        out = fused(pipe.detector_params, pipe.embedder_params,
                    pipe.landmark_arrays, frames)
        jax.block_until_ready(out.scores)
    print(f"dryrun[fused]: frames={fb}x96x128 dp={dp} "
          f"emb={tuple(out.embeddings.shape)} OK")

    # -- 3. shot scheduler: 2 workers, deterministic merge ------------------
    shots = [Segment(float(i), float(i) + 1.0) for i in range(6)]

    def process(seg: Segment):
        x = jnp.full((4,), seg.start)
        return float(jnp.sum(x * 2.0))

    results = []
    for rank in range(2):
        sched = ShotScheduler(rank=rank, world=2)
        results.extend(sched.run(shots, process))
    merged = merge_results(results)
    expected = [8.0 * s.start for s in shots]
    if merged != expected:
        raise RuntimeError(f"scheduler merge mismatch: {merged} != {expected}")
    print(f"dryrun[scheduler]: 2 workers x {len(shots)} shots merged OK")

    print(f"dryrun_multichip({n_devices}): mesh={dict(mesh.shape)} "
          f"loss={float(loss):.4f} OK")


if __name__ == "__main__":
    import sys

    run_dryrun(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
