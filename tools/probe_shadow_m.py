#!/usr/bin/env python
"""Where do the shadow-occlusion milliseconds go?

Hypothesis: the host-side candidate-table build (top_k + row gathers at
m=cull_m_shadow=1024 slots/tile) dominates, not the kernel.  Measures
march_occlusion for both benchmark lights at several cull_m_shadow
values, plus the true per-tile candidate counts (overflow headroom).

Usage: python tools/probe_shadow_m.py [size] [tori]
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
    c = time.perf_counter() - t0
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        float(jfn(*args))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{name:52s} {best*1e3:8.2f} ms (compile {c:.0f}s)", flush=True)
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
    res, nrm, _midx = jax.jit(
        lambda s, r: march_surface(s, r, base))(scene, flat)
    pos = flat.at(res.t - flat.epsilon)

    # true candidate counts per march (conservative-count headroom)
    from fraytracer_tpu.ops import sdf as _sdf
    from fraytracer_tpu.ops.march import bound_skip_start
    from fraytracer_tpu.ops.pallas.march_kernel import (_cand_mask,
                                                        _cone_candidates,
                                                        _tile_cones,
                                                        ray_tile)

    def counts(sh, apex):
        tile = ray_tile()
        n = sh.origin.shape[0]
        grid = n // tile
        t0, miss0, t_exit = bound_skip_start(scene, sh)
        length = jnp.minimum(sh.length, t_exit)
        length = jnp.where(miss0, 0.0, length)
        thi = jnp.where(length > 0.0, length, t0)
        cones = _tile_cones(sh.origin, sh.direction, t0, thi, sh.epsilon,
                            grid, tile, conv_apex=apex)
        SUBF = 4
        conesf = _tile_cones(sh.origin, sh.direction, t0, thi, sh.epsilon,
                             grid * SUBF, tile // SUBF, conv_apex=apex)
        kb = _sdf._prim_bound_rows("torus", scene.prim_params["torus"])
        cm = jnp.any(_cand_mask(kb, conesf, apex is not None)
                     .reshape(grid, SUBF, -1), axis=1)
        sel = _cone_candidates(kb, cones, 8, converging=apex is not None,
                               cand=cm)
        c = np.asarray(sel.count)
        return c.max(), np.percentile(c, 99), c.mean()

    for li, lname in ((0, "directional"), (1, "point")):
        ldir, budget, _sc = light_dir_and_dist(scene, li, pos)
        cosn = jnp.sum(nrm * ldir, axis=-1)
        facing = res.hit & (cosn > 0.0)
        sh = Rays(origin=pos, direction=ldir,
                  length=jnp.where(facing, budget, 0.0),
                  epsilon=flat.epsilon)
        if scene.light_kind[li] == 1:
            apex = scene.light_vec[li]
            akey = budget
        else:
            apex = None
            akey = jnp.sum(pos * ldir, axis=-1)
        jax.block_until_ready(sh)
        cmax, c99, cmean = counts(sh, apex)
        print(f"{lname}: cand count max={cmax} p99={c99:.0f} "
              f"mean={cmean:.1f}", flush=True)
        for m in (1024, 512, 256, 128):
            cfg = dataclasses.replace(base, cull_m_shadow=m,
                                      shadow_block_compact=False)

            def f(s, r, k, cfg=cfg, apex=apex):
                def body(i, acc):
                    r2 = r.replace(origin=r.origin + acc * 1e-38)
                    h = march_occlusion(s, r2, cfg, cone_apex=apex,
                                        axial_key=k)
                    return acc + jnp.sum(h.astype(jnp.float32)) * 1e-9
                return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
            loop_time(f"occl {lname} m_shadow={m}", f, scene, sh, akey)


if __name__ == "__main__":
    main()
