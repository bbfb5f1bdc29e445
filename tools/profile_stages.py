#!/usr/bin/env python
"""Stage-level timing of the benchmark render: primary march, shadow
marches, normals/material resolve, shading. Also march step statistics
and cull candidate counts. Run on the TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import fraytracer_tpu as ft
from fraytracer_tpu import camera as cam
from fraytracer_tpu.ops import sdf, shade
from fraytracer_tpu.ops.march import MarchConfig, march
from fraytracer_tpu.scene.generators import torus_csg_scene

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
TORI = int(sys.argv[2]) if len(sys.argv) > 2 else 1000


def timed(name, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    # force a scalar readback as completion barrier
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        float(jnp.sum(leaf.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:34s} {dt*1e3:9.2f} ms")
    return out, dt


def main():
    scene = ft.flatten(torus_csg_scene(seed=19, n_tori=TORI))
    camera = ft.look_at((0.0, 0.0, -10.0), (0.0, 0.0, 0.0), fov_degrees=60.0)
    backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    mcfg = MarchConfig(max_steps=192, bound_skip=True, backend=backend,
                       relax_omega=1.4)
    cfg = ft.RenderConfig(width=SIZE, height=SIZE, epsilon=0.01, length=30.0,
                          march=mcfg)
    print(f"backend={backend} size={SIZE} tori={TORI}")

    rays = cam.camera_rays(camera, SIZE, SIZE, cfg.epsilon, cfg.length)
    flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), rays)
    from fraytracer_tpu.render import _block_perm, _auto_block
    perm, _inv = _block_perm(SIZE, SIZE, _auto_block(SIZE, SIZE))
    flat = jax.tree.map(lambda x: x[perm], flat)

    TILE = 65536

    def tiled(fn):
        """Apply fn over 64k-ray tiles of a flat Rays batch (+extras) via
        lax.map, like render._trace_tiled."""
        def run(s, r, *extra):
            chunk = jax.tree.map(
                lambda x: x.reshape((-1, TILE) + x.shape[1:]), (r,) + extra)
            return jax.lax.map(lambda c: fn(s, *c), chunk)
        return jax.jit(run)

    march_j = tiled(lambda s, r: march(s, r, mcfg))
    res, t_march = timed("primary march", march_j, scene, flat)
    res = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), res)

    steps = np.asarray(res.steps).reshape(-1, 1024)
    hit = np.asarray(res.hit)
    print(f"  hit rate {hit.mean():.3f}; per-tile steps: "
          f"mean {steps[:, 0].mean():.1f} p50 {np.percentile(steps[:, 0], 50):.0f} "
          f"p90 {np.percentile(steps[:, 0], 90):.0f} max {steps[:, 0].max()}")

    # normals + material at hit points
    def normal_mat(s, r, rr):
        pos = r.at(rr.t - r.epsilon)
        n = sdf.scene_normal(s, pos)
        midx, alb = sdf.material_at(s, pos)
        return n, midx, alb
    nm_j = tiled(normal_mat)
    _, t_nm = timed("normal + material_at", nm_j, scene, flat, res)

    # one full surface_hit + shade (includes 2 shadow marches)
    trace_j = tiled(lambda s, r: shade.trace(s, r, mcfg))
    _, t_trace = timed("full trace (march+nm+2 shadows)", trace_j, scene, flat)

    # shadow marches alone: reconstruct the shadow rays of light 0/1
    hitinfo = tiled(lambda s, r: shade.surface_hit(s, r, mcfg))(scene, flat)
    hitinfo = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), hitinfo)
    jax.block_until_ready(hitinfo)
    for i in range(scene.num_lights):
        def shadow(s, r, hi, i=i):
            ldir, budget, _ = shade.light_dir_and_dist(s, i, hi.position)
            cos = jnp.sum(hi.normal * ldir, axis=-1)
            facing = hi.hit & (cos > 0.0)
            sr = ft.types.Rays(origin=hi.position, direction=ldir,
                               length=jnp.where(facing, budget, 0.0),
                               epsilon=r.epsilon)
            return march(s, sr, mcfg).hit
        sh_j = tiled(shadow)
        _, t_sh = timed(f"shadow march light{i}", sh_j, scene, flat, hitinfo)

    # full render end to end
    render_j = jax.jit(lambda s, c: ft.render(s, c, cfg))
    _, t_rend = timed("ft.render end-to-end", render_j, scene, camera)

    # cull stats
    from fraytracer_tpu.ops.pallas import march_kernel as mk
    pairs = mk._cull_pairs(scene.kind_counts, scene.plan, mcfg.cull_threshold)
    if pairs:
        from fraytracer_tpu.ops.march import bound_skip_start
        t0v, miss0, t_exitv = bound_skip_start(scene, flat)
        t_hi = jnp.where(miss0, t0v,
                         jnp.minimum(flat.length, t_exitv))
        n = flat.origin.shape[0]
        grid = n // mk.ray_tile()
        cones = mk._tile_cones(flat.origin, flat.direction, t0v, t_hi,
                               flat.epsilon, grid, tile=mk.ray_tile())
        for (_g, kind, _ki, lo, hi) in pairs:
            kp = scene.prim_params[kind][lo:hi]
            kb = sdf._prim_bound_rows(kind, kp)
            sel = mk._cone_candidates(kb, cones, 128)
            c = np.asarray(sel.count)
            print(f"  cull[{kind}]: candidates/tile mean {c.mean():.1f} "
                  f"p50 {np.percentile(c, 50):.0f} p90 {np.percentile(c, 90):.0f} "
                  f"max {c.max()} overflow>{128}: {(c > 128).mean():.3f}")


if __name__ == "__main__":
    main()
