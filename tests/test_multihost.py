"""Multi-host (DCN) execution tests: jax.distributed wiring + worker-sharded
tracking with deterministic merge (new design — SURVEY §2.3/§5; the
reference is single-process)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env(n_devices=2):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    return env


class TestDistributedInit:
    def test_two_process_psum_over_dcn(self, tmp_path):
        """Two processes form one JAX group and psum across DCN (Gloo)."""
        script = tmp_path / "worker.py"
        script.write_text(
            "import sys\n"
            "import jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "from pyannote_video_tpu.parallel.multihost import "
            "init_distributed\n"
            "init_distributed('localhost:29531', int(sys.argv[1]), 2)\n"
            "import jax.numpy as jnp\n"
            "out = jax.pmap(lambda x: jax.lax.psum(x, 'i'), axis_name='i')("
            "jnp.ones(jax.local_device_count()))\n"
            "print('GLOBAL', jax.device_count(), float(out[0]))\n"
        )
        p1 = subprocess.Popen([sys.executable, str(script), "1"],
                              env=_env(), stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
        p0 = subprocess.run([sys.executable, str(script), "0"],
                            env=_env(), stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True, timeout=300)
        out1, _ = p1.communicate(timeout=300)
        assert p0.returncode == 0, p0.stdout
        assert p1.returncode == 0, out1
        assert "GLOBAL 4 4.0" in p0.stdout
        assert "GLOBAL 4 4.0" in out1


class TestWorkerShardedTracking:
    @pytest.mark.slow
    @pytest.mark.parametrize("no_stream", ["0", "1"],
                             ids=["streaming", "legacy"])
    def test_two_worker_track_matches_single(self, tmp_path, no_stream):
        """2-worker shot-sharded `track` + merge == single-process output
        (same point set; track numbering is the deterministic merge
        order).  Both engine paths shard: streaming (the default — the
        full-grid plan + segment_filter make sharded output bit-identical
        to single-worker) and the legacy per-shot seek loop
        (PYV_NO_STREAM=1, kept for custom detectors)."""
        from pyannote_video_tpu.core import Segment, Timeline, dump, formats
        from pyannote_video_tpu.utils.synthetic import (
            synthetic_episode, write_synthetic_video,
        )
        from pyannote_video_tpu.parallel.multihost import (
            merge_tracking_parts,
        )

        ep = synthetic_episode(n_shots=2, shot_frames=8, width=160,
                               height=120, seed=13, face_height_ratio=0.45)
        clip = str(tmp_path / "clip.avi")
        write_synthetic_video(clip, ep)
        shot_json = str(tmp_path / "shot.json")
        with open(shot_json, "w") as fp:
            dump(Timeline([Segment(s, e) for s, e in ep.shots]), fp)

        script = os.path.join(REPO, "scripts", "pyannote-face.py")
        single = str(tmp_path / "single.txt")
        env = dict(_env(), PYV_NO_STREAM=no_stream)
        run = lambda args: subprocess.run(
            [sys.executable, script] + args, env=env,
            capture_output=True, text=True, timeout=900)

        r = run(["track", "--every", "0.2", clip, shot_json, single])
        assert r.returncode == 0, r.stdout + r.stderr

        sharded = str(tmp_path / "sharded.txt")
        # worker 1 first so rank 0's merge finds both parts immediately
        r1 = run(["track", "--every", "0.2", "--rank", "1", "--world", "2",
                  clip, shot_json, sharded])
        assert r1.returncode == 0, r1.stdout + r1.stderr
        r0 = run(["track", "--every", "0.2", "--rank", "0", "--world", "2",
                  clip, shot_json, sharded])
        assert r0.returncode == 0, r0.stdout + r0.stderr
        assert os.path.exists(sharded)

        def point_set(path):
            return sorted(
                (round(p.t, 3), round(p.left, 3), round(p.top, 3),
                 round(p.right, 3), round(p.bottom, 3), p.status)
                for p in formats.read_tracking(path)
            )

        assert point_set(sharded) == point_set(single)

        # merge is idempotent/deterministic
        n = merge_tracking_parts(sharded, 2)
        assert point_set(sharded) == point_set(single)
        assert n == len({p.identifier
                         for p in formats.read_tracking(sharded)})

    def test_merge_include_existing_keeps_resume_tracks(self, tmp_path):
        """--resume + --world>1: pre-restart tracks in the output survive
        the part merge (regression: the merge rewrote the file from parts
        only)."""
        from pyannote_video_tpu.core import formats
        from pyannote_video_tpu.parallel.multihost import (
            merge_tracking_parts, part_path,
        )

        out = str(tmp_path / "t.txt")
        line = "{t:.3f} {identifier:d} {left:.3f} {top:.3f} {right:.3f} {bottom:.3f} {status}\n"
        with open(out, "w") as fp:  # one kept pre-restart track at t=0.1
            fp.write(line.format(t=0.1, identifier=0, left=0.1, top=0.1,
                                 right=0.2, bottom=0.2, status="detection"))
        for r, t in ((0, 1.0), (1, 2.0)):
            with open(part_path(out, r), "w") as fp:
                fp.write(line.format(t=t, identifier=0, left=0.3, top=0.3,
                                     right=0.4, bottom=0.4,
                                     status="detection"))

        n = merge_tracking_parts(out, 2, include_existing=True)
        assert n == 3
        pts = formats.read_tracking(out)
        times = sorted(round(p.t, 3) for p in pts)
        assert times == [0.1, 1.0, 2.0]
        # deterministic renumbering by first timestamp
        by_id = {p.identifier: p.t for p in pts}
        assert by_id[0] == 0.1 and by_id[1] == 1.0 and by_id[2] == 2.0
