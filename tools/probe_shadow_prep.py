#!/usr/bin/env python
"""Split the occlusion march cost: host-side candidate prep (cones +
membership + top_k sort + table row-gathers + key tables) vs the kernel.

Usage: python tools/probe_shadow_prep.py [size] [tori]
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
from fraytracer_tpu.ops import sdf as _sdf
from fraytracer_tpu.ops.march import (MarchConfig, bound_skip_start,
                                      march_occlusion, march_surface)
from fraytracer_tpu.ops.pallas.march_kernel import (_cand_mask,
                                                    _cone_candidates,
                                                    _pair_m, _prep_rows,
                                                    _tile_cones, ray_tile,
                                                    CAND_UNROLL)
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
    print(f"{name:46s} {best*1e3:8.2f} ms (compile {c:.0f}s)", flush=True)
    return best


def prep_checksum(scene, sh, m_shadow, apex):
    """Replicates pallas_march_raw's host prep for the one culled pair."""
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
    oa = jnp.sum((sh.origin.reshape(grid, tile, 3)
                  - cones.apex[:, None, :])
                 * cones.axis[:, None, :], axis=-1)
    kparams = jax.lax.stop_gradient(scene.prim_params["torus"])
    kb = _sdf._prim_bound_rows("torus", kparams)
    cm = jnp.any(_cand_mask(kb, conesf, apex is not None)
                 .reshape(grid, SUBF, -1), axis=1)
    m = _pair_m(m_shadow, kb.shape[0])
    sel = _cone_candidates(kb, cones, m, converging=apex is not None,
                           cand=cm)
    prepped = _prep_rows("torus", kparams)
    table = prepped[sel.idx]
    lo_c = jnp.max(sel.lo_key.reshape(grid, -1, CAND_UNROLL), axis=-1)
    hi_c = jnp.min(sel.hi_key.reshape(grid, -1, CAND_UNROLL), axis=-1)
    return (jnp.sum(table) + jnp.sum(lo_c) + jnp.sum(hi_c)
            + jnp.sum(oa) + jnp.sum(sel.idx))


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

    ldir, budget, _sc = light_dir_and_dist(scene, 0, pos)
    cosn = jnp.sum(nrm * ldir, axis=-1)
    facing = res.hit & (cosn > 0.0)
    sh = Rays(origin=pos, direction=ldir,
              length=jnp.where(facing, budget, 0.0), epsilon=flat.epsilon)
    akey = jnp.sum(pos * ldir, axis=-1)
    jax.block_until_ready(sh)

    for m in (1024, 512):
        def fp(s, r, m=m):
            def body(i, acc):
                r2 = r.replace(origin=r.origin + acc * 1e-38)
                return acc + prep_checksum(s, r2, m, None) * 1e-12
            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
        loop_time(f"prep only (dir, m={m})", fp, scene, sh)
        cfg = dataclasses.replace(base, cull_m_shadow=m,
                                  shadow_block_compact=False)

        def fo(s, r, k, cfg=cfg):
            def body(i, acc):
                r2 = r.replace(origin=r.origin + acc * 1e-38)
                h = march_occlusion(s, r2, cfg, axial_key=k)
                return acc + jnp.sum(h.astype(jnp.float32)) * 1e-9
            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
        loop_time(f"occl total (dir, m={m})", fo, scene, sh, akey)

    # primary march prep for comparison (m=256)
    def fpp(s, r):
        def body(i, acc):
            r2 = r.replace(origin=r.origin + acc * 1e-38)
            return acc + prep_checksum(s, r2, 256, None) * 1e-12
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
    loop_time("prep only (primary rays, m=256)", fpp, scene, flat)


if __name__ == "__main__":
    main()
