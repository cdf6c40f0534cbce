"""Tests for the parallel layer: mesh, shardings, shot scheduler."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyannote_video_tpu.core import Segment
from pyannote_video_tpu.parallel.mesh import data_sharding, make_mesh
from pyannote_video_tpu.parallel.scheduler import ShotScheduler, merge_results


class TestMesh:
    def test_mesh_shapes(self):
        mesh = make_mesh(n_devices=8, model_parallelism=2)
        assert dict(mesh.shape) == {"data": 4, "model": 2}
        mesh1 = make_mesh(n_devices=1)
        assert dict(mesh1.shape) == {"data": 1, "model": 1}

    def test_indivisible_raises(self):
        with pytest.raises(ValueError):
            make_mesh(n_devices=7, model_parallelism=2)

    @pytest.mark.slow

    def test_sharded_embed_runs(self):
        from pyannote_video_tpu.models import embedder
        from pyannote_video_tpu.parallel.sharding import sharded_embed_fn

        mesh = make_mesh(n_devices=8, model_parallelism=1)
        with mesh:
            params = embedder.init_params(jax.random.PRNGKey(0), width=0.125)
            run = sharded_embed_fn(mesh)
            chips = jax.device_put(
                jnp.zeros((8, 150, 150, 3)), data_sharding(mesh)
            )
            out = run(params, chips)
            assert out.shape == (8, 128)


class TestDryrun:
    @pytest.mark.slow
    def test_run_dryrun_in_process(self, capsys):
        # the test env already provides 8 virtual CPU devices (conftest),
        # so the driver-facing dryrun body runs in-process here
        from pyannote_video_tpu.parallel.dryrun import run_dryrun

        run_dryrun(8)
        out = capsys.readouterr().out
        assert "dryrun[train]" in out
        assert "dryrun[fused]" in out
        assert "dryrun[scheduler]" in out
        assert "OK" in out

    @pytest.mark.slow

    def test_graft_entry_reexec_child(self):
        # simulate the driver: this parent cannot see 8 devices from the
        # dryrun's perspective unless the child re-exec path works; force
        # the child path by lying about the requirement being unmet is not
        # possible in-process, so run the real wrapper in a subprocess with
        # a single-device env.
        import subprocess, sys, os

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = ""  # parent sees 1 device
        env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax; assert jax.device_count() == 1; "
             "import __graft_entry__ as g; g.dryrun_multichip(4)"],
            env=env, cwd="/root/repo", capture_output=True, text=True,
            timeout=900,
        )
        assert proc.returncode == 0, proc.stdout + proc.stderr
        assert "dryrun_multichip(4)" in proc.stdout


class TestShotScheduler:
    def test_round_robin_and_merge(self):
        shots = [Segment(i, i + 1) for i in range(10)]
        # two workers split the shots; merged results restore order
        results = []
        for rank in range(2):
            sched = ShotScheduler(devices=jax.devices()[:2], rank=rank, world=2)
            results.extend(
                sched.run(shots, process=lambda seg: seg.start * 10)
            )
        merged = merge_results(results)
        assert merged == [i * 10 for i in range(10)]

    def test_device_placement(self):
        shots = [Segment(i, i + 1) for i in range(4)]
        sched = ShotScheduler(devices=jax.devices()[:4])
        devices_used = []

        def process(seg):
            x = jnp.ones((4,)) * seg.start
            devices_used.append(list(x.devices())[0].id)
            return float(x.sum())

        list(sched.run(shots, process))
        assert len(set(devices_used)) == 4  # round-robin over 4 devices
