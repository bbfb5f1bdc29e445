#!/usr/bin/env python
"""Minimal stage breakdown on TPU: primary march kernel, cull prep, and the
normals/materials stage, each timed alone (no lax.map tiling, minimal
compiles).  Usage: python tools/probe_breakdown.py [size] [tori] [stages]
where stages is a comma list from {march,cull,nm,shadow}."""
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
from fraytracer_tpu.ops.march import MarchConfig, march, bound_skip_start
from fraytracer_tpu.scene.generators import torus_csg_scene
from fraytracer_tpu.render import _block_perm, _auto_block

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
TORI = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
STAGES = (sys.argv[3].split(",") if len(sys.argv) > 3
          else ["march", "cull", "nm"])


def timed(name, fn, *args, reps=3):
    t0 = time.perf_counter()
    out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    compile_s = time.perf_counter() - t0
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        float(jnp.sum(leaf.astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} {best*1e3:9.2f} ms   (compile {compile_s:.1f}s)",
          flush=True)
    return out


def main():
    scene = ft.flatten(torus_csg_scene(seed=19, n_tori=TORI))
    camera = ft.look_at((0.0, 0.0, -10.0), (0.0, 0.0, 0.0), fov_degrees=60.0)
    backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    mcfg = MarchConfig(max_steps=192, bound_skip=True, backend=backend,
                       relax_omega=1.4)
    print(f"backend={backend} size={SIZE} tori={TORI}", flush=True)

    rays = cam.camera_rays(camera, SIZE, SIZE, 0.01, 30.0)
    flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), rays)
    perm, _inv = _block_perm(SIZE, SIZE, _auto_block(SIZE, SIZE))
    flat = jax.tree.map(lambda x: x[perm], flat)

    if "march" in STAGES:
        march_j = jax.jit(lambda s, r: march(s, r, mcfg))
        res = timed("march (pallas+cull+omega)", march_j, scene, flat)
        steps = np.asarray(res.steps).reshape(-1, 1024)[:, 0]
        hit = np.asarray(res.hit)
        print(f"  hit {hit.mean():.3f} tile-steps mean {steps.mean():.1f} "
              f"p50 {np.percentile(steps, 50):.0f} "
              f"p90 {np.percentile(steps, 90):.0f} max {steps.max()}",
              flush=True)

    if "cull" in STAGES:
        from fraytracer_tpu.ops.pallas import march_kernel as mk

        def cull_prep(s, r):
            t0v, miss0, t_exitv = bound_skip_start(s, r)
            length = jnp.minimum(r.length, t_exitv)
            t_hi = jnp.where(length > 0.0, t0v + length, t0v)
            n = r.origin.shape[0]
            grid = n // mk.ray_tile()
            cones = mk._tile_cones(r.origin, r.direction, t0v, t_hi,
                                   r.epsilon, grid, tile=mk.ray_tile())
            outs = []
            pairs = mk._cull_pairs(s.kind_counts, s.plan, mcfg.cull_threshold)
            for (_g, kind, _ki, lo, hi) in pairs:
                kp = s.prim_params[kind][lo:hi]
                kb = sdf._prim_bound_rows(kind, kp)
                sel = mk._cone_candidates(kb, cones, 128)
                outs.append((kp[sel.idx], sel.count, sel.lo_key))
            return outs
        timed("cull prep (cones+sort+gather)", jax.jit(cull_prep),
              scene, flat)

    if "surf" in STAGES:
        from fraytracer_tpu.ops.march import march_surface
        surf_j = jax.jit(lambda s, r: march_surface(s, r, mcfg))
        timed("march+surface (fused)", surf_j, scene, flat)

    if "trace" in STAGES:
        trace_j = jax.jit(lambda s, r: shade.trace(s, r, mcfg))
        timed("full trace (3 marches, fused)", trace_j, scene, flat)

    if "nm" in STAGES:
        res = jax.jit(lambda s, r: march(s, r, mcfg))(scene, flat)

        def normal_mat(s, r, t, hit):
            pos = r.at(t - r.epsilon)
            from fraytracer_tpu.ops.point_eval import culled_surface_eval
            out = culled_surface_eval(s, pos, hit, m=mcfg.cull_m,
                                      threshold=mcfg.cull_threshold)
            return out
        timed("normals+materials (culled)", jax.jit(normal_mat),
              scene, flat, res.t, res.hit)

    if "shadow" in STAGES:
        from fraytracer_tpu.ops.march import march_occlusion
        res = jax.jit(lambda s, r: march(s, r, mcfg))(scene, flat)
        pos = flat.at(res.t - flat.epsilon)

        def shadow(s, pos, hit, li):
            ldir, budget, _ = shade.light_dir_and_dist(s, li, pos)
            sr = ft.types.Rays(origin=pos, direction=ldir,
                               length=jnp.where(hit, budget, 0.0),
                               epsilon=jnp.full(pos.shape[:-1], 0.01))
            return march_occlusion(s, sr, mcfg)
        timed("shadow occl (light0 dir)",
              jax.jit(lambda s, p, h: shadow(s, p, h, 0)),
              scene, pos, res.hit)
        timed("shadow occl (light1 point)",
              jax.jit(lambda s, p, h: shadow(s, p, h, 1)),
              scene, pos, res.hit)


if __name__ == "__main__":
    main()
