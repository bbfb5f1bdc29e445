#!/usr/bin/env python
"""A/B: block-granular re-tiling/compaction of occlusion batches.

Measures, on the benchmark workload (1024², 1000 tori):
  1. the directional-light occlusion stage: baseline vs axial block sort
     vs activity block compaction (in-jit fori_loop — the tunnel's
     ~3.4 ms/dispatch floor is NOT device time);
  2. the point-light occlusion stage: baseline vs activity compaction;
  3. the full frame with the winning config.

Usage: python tools/probe_shadow_sort.py [size] [tori]
"""
import dataclasses
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
from fraytracer_tpu.ops.march import (MarchConfig, march_occlusion,
                                      march_surface)
from fraytracer_tpu.ops.shade import light_dir_and_dist
from fraytracer_tpu.render import _auto_block, _block_perm
from fraytracer_tpu.scene.generators import torus_csg_scene
from fraytracer_tpu.types import Rays

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
TORI = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
K = 16


def loop_time(name, fn, *args):
    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    float(jfn(*args))
    print(f"  [{name}] compile {time.perf_counter()-t0:.1f}s", flush=True)
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        float(jfn(*args))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{name:44s} {best*1e3:8.2f} ms", flush=True)
    return best


def main():
    backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    print(f"backend={backend} size={SIZE} tori={TORI}", flush=True)
    scene = ft.flatten(torus_csg_scene(seed=19, n_tori=TORI))
    camera = ft.look_at((0.0, 0.0, -10.0), (0.0, 0.0, 0.0),
                        fov_degrees=60.0)
    base = MarchConfig(max_steps=192, bound_skip=True, backend=backend,
                       relax_omega=1.4)
    rays = cam.camera_rays(camera, SIZE, SIZE, 0.01, 30.0)
    flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), rays)
    perm, _inv = _block_perm(SIZE, SIZE, _auto_block(SIZE, SIZE))
    flat = jax.tree.map(lambda x: x[perm], flat)

    # the actual shadow workload: primary hit set
    res, nrm, _midx = jax.jit(
        lambda s, r: march_surface(s, r, base))(scene, flat)
    pos = flat.at(res.t - flat.epsilon)

    def shadow_for(i):
        ldir, budget, _sc = light_dir_and_dist(scene, i, pos)
        cosn = jnp.sum(nrm * ldir, axis=-1)
        facing = res.hit & (cosn > 0.0)
        sh = Rays(origin=pos, direction=ldir,
                  length=jnp.where(facing, budget, 0.0),
                  epsilon=flat.epsilon)
        if scene.light_kind[i] == 1:        # point
            apex = scene.light_vec[i]
            akey = budget
        else:
            apex = None
            akey = jnp.sum(pos * ldir, axis=-1)
        return sh, akey, apex, facing

    from fraytracer_tpu.ops.pallas.gather import BLOCK
    for li, lname in ((0, "directional"), (1, "point")):
        sh, akey, apex, facing = shadow_for(li)
        jax.block_until_ready((sh, akey))
        nb = sh.origin.shape[0] // BLOCK
        actb = np.asarray(sh.length).reshape(nb, BLOCK) > 0
        print(f"{lname}: facing {int(jnp.sum(facing))} / {SIZE*SIZE}, "
              f"dead blocks {int((~actb.any(1)).sum())}/{nb}", flush=True)
        variants = [
            ("base", dict(shadow_block_sort=False,
                          shadow_block_compact=False)),
            ("compact", dict(shadow_block_sort=False,
                             shadow_block_compact=True)),
        ]
        if apex is None:
            variants.append(("axial sort", dict(shadow_block_sort=True,
                                                shadow_block_compact=False)))
        for vname, kw in variants:
            cfg = dataclasses.replace(base, **kw)

            def f(s, r, k, cfg=cfg, apex=apex):
                def body(i, acc):
                    r2 = r.replace(origin=r.origin + acc * 1e-38)
                    h = march_occlusion(s, r2, cfg, cone_apex=apex,
                                        axial_key=k)
                    return acc + jnp.sum(h.astype(jnp.float32)) * 1e-9
                return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
            loop_time(f"occl {lname} {vname}", f, scene, sh, akey)

    # full frame with defaults (compact on)
    for fname, kw in (("frame compact=off", dict(shadow_block_compact=False)),
                      ("frame compact=on", dict(shadow_block_compact=True))):
        cfgr = ft.RenderConfig(width=SIZE, height=SIZE, epsilon=0.01,
                               length=30.0,
                               march=dataclasses.replace(base, **kw))

        def f(s, c, cfgr=cfgr):
            def body(i, acc):
                pp = dict(s.prim_params)
                k0 = next(iter(pp))
                pp[k0] = pp[k0] + acc * 1e-38
                img = ft.render(s.replace(prim_params=pp), c, cfgr)
                return acc + jnp.sum(img) * 1e-6
            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
        loop_time(fname, f, scene, camera)


if __name__ == "__main__":
    main()
