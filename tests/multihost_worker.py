"""Worker for the 2-process multi-host test (SURVEY.md §4.5).

Launched by tests/test_multihost.py as
``python tests/multihost_worker.py <coord> <nprocs> <pid> <outdir>``.
Each process owns 4 virtual CPU devices (8 global), initializes the
multi-controller runtime via ``parallel.multihost.initialize``, renders the
seeded CSG scene with image rows sharded over the *global* mesh, gathers
the frame with ``gather_image_to_host``, and writes its local shard + the
gathered frame for the parent to compare against a single-process render.
"""
import os
import sys

coord, nprocs, pid, outdir = (sys.argv[1], int(sys.argv[2]),
                              int(sys.argv[3]), sys.argv[4])

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# initialize the multi-controller runtime BEFORE any jax array op touches
# the backend (importing the package is fine; creating arrays is not)
from fraytracer_tpu.parallel import multihost  # noqa: E402

multihost.initialize(coordinator_address=coord, num_processes=nprocs,
                     process_id=pid)

import numpy as np  # noqa: E402

import fraytracer_tpu as ft  # noqa: E402
from fraytracer_tpu.ops.march import MarchConfig  # noqa: E402
from fraytracer_tpu.parallel import mesh as pmesh  # noqa: E402
from fraytracer_tpu.scene.generators import torus_csg_scene  # noqa: E402


def main():
    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.device_count() == 4 * nprocs, jax.device_count()

    scene = ft.flatten(torus_csg_scene(seed=19, n_tori=32))
    cam = ft.look_at((0, 0, -10), (0, 0, 0), fov_degrees=60.0)
    cfg = ft.RenderConfig(width=32, height=32,
                          march=MarchConfig(backend="jnp", max_steps=128))

    gmesh = multihost.global_mesh()
    assert gmesh.size == 4 * nprocs
    img = pmesh.render_sharded(scene, cam, cfg, gmesh)

    # every process sees the full logical value; its addressable shards are
    # its local row blocks
    local_rows = []
    for shard in img.addressable_shards:
        local_rows.append((shard.index[0].start or 0, np.asarray(shard.data)))

    full = multihost.gather_image_to_host(img)
    np.savez(os.path.join(outdir, f"proc{pid}.npz"),
             full=full,
             starts=np.asarray([s for s, _ in local_rows]),
             shards=np.stack([d for _, d in local_rows]))

    # cross-host collective smoke: exposure max over the global mesh
    m = pmesh.exposure_max_sharded(img, gmesh)
    np.save(os.path.join(outdir, f"max{pid}.npy"), np.asarray(m))
    print(f"proc {pid} done", flush=True)


if __name__ == "__main__":
    main()
