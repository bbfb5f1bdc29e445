"""Multi-host (multi-controller) runtime tests: two real OS processes via
``jax.distributed`` on CPU (SURVEY.md §4.5), exercising
``parallel.multihost.initialize`` + global-mesh ``render_sharded`` +
``gather_image_to_host`` against a single-process render.

The BASELINE multi-host bar (">90% linear scaling to 2 hosts") cannot be
*measured* without 2 real hosts; what can be validated without hardware —
and is, here — is that the multi-controller code path produces the exact
single-process image and that every process gathers the same full frame.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import fraytracer_tpu as ft
from fraytracer_tpu.ops.march import MarchConfig
from fraytracer_tpu.scene.generators import torus_csg_scene

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def worker_outputs(tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("mh"))
    coord = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coord, "2", str(pid), outdir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in (0, 1)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        logs.append(out.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    return outdir


def _single_process_image():
    scene = ft.flatten(torus_csg_scene(seed=19, n_tori=32))
    cam = ft.look_at((0, 0, -10), (0, 0, 0), fov_degrees=60.0)
    cfg = ft.RenderConfig(width=32, height=32,
                          march=MarchConfig(backend="jnp", max_steps=128))
    return np.asarray(ft.render(scene, cam, cfg))


def test_two_process_render_matches_single(worker_outputs):
    ref = _single_process_image()
    for pid in (0, 1):
        data = np.load(os.path.join(worker_outputs, f"proc{pid}.npz"))
        np.testing.assert_allclose(data["full"], ref, atol=1e-6,
                                   err_msg=f"gathered frame (proc {pid})")


def test_two_process_shards_tile_the_frame(worker_outputs):
    """Each process's addressable shards are disjoint row blocks; together
    the two processes cover all 32 rows exactly once."""
    ref = _single_process_image()
    covered = np.zeros(32, bool)
    for pid in (0, 1):
        data = np.load(os.path.join(worker_outputs, f"proc{pid}.npz"))
        for start, shard in zip(data["starts"], data["shards"]):
            rows = shard.shape[0]
            assert not covered[start:start + rows].any(), "overlap"
            covered[start:start + rows] = True
            np.testing.assert_allclose(shard, ref[start:start + rows],
                                       atol=1e-6)
    assert covered.all()


def test_two_process_collective_max(worker_outputs):
    ref = _single_process_image()
    for pid in (0, 1):
        m = np.load(os.path.join(worker_outputs, f"max{pid}.npy"))
        np.testing.assert_allclose(m, ref.max(), atol=1e-6)
