#!/usr/bin/env python
"""Backward-pass stage breakdown at the benchmark config (run on TPU).

Times (K-chained dispatches, RTT amortized):
  * fwd render
  * fwd+bwd of sum(render^2) w.r.t. scene params
  * grad of sum(march.t) alone            (implicit-diff t VJP)
  * grad of sum(normal) alone             (fused-surface normal VJP)
  * the point_eval culled dist_fn fwd/bwd at the hit points
  * the param gather + scatter-add pair in isolation
"""
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
from fraytracer_tpu.ops.march import MarchConfig, march, march_surface
from fraytracer_tpu.scene.generators import torus_csg_scene
from fraytracer_tpu.render import _block_perm, _auto_block

SIZE = int(os.environ.get("AB_SIZE", "1024"))
K = int(os.environ.get("AB_K", "4"))


def timed_k(name, fn, *args, k=K):
    t0 = time.perf_counter()
    out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    compile_s = time.perf_counter() - t0
    best = 1e30
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        float(jnp.sum(leaf.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / k)
    print(f"{name:44s} {best*1e3:9.2f} ms/call (compile {compile_s:.1f}s)",
          flush=True)
    return best


def main():
    scene = ft.flatten(torus_csg_scene(seed=19, n_tori=1000))
    camera = ft.look_at((0.0, 0.0, -10.0), (0.0, 0.0, 0.0),
                        fov_degrees=60.0)
    backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    mcfg = MarchConfig(max_steps=192, bound_skip=True, backend=backend,
                       relax_omega=1.4)
    cfg = ft.RenderConfig(width=SIZE, height=SIZE, epsilon=0.01,
                          length=30.0, march=mcfg)
    print(f"backend={backend} size={SIZE}", flush=True)

    rays = cam.camera_rays(camera, SIZE, SIZE, 0.01, 30.0)
    flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), rays)
    perm, _inv = _block_perm(SIZE, SIZE, _auto_block(SIZE, SIZE))
    flat = jax.tree.map(lambda x: x[perm], flat)

    timed_k("fwd render", jax.jit(
        lambda s, c: ft.render(s, c, cfg)), scene, camera)

    def loss(s):
        return jnp.sum(ft.render(s, camera, cfg) ** 2)
    timed_k("fwd+bwd render", jax.jit(jax.grad(loss)), scene)

    def loss_t(s, r):
        return jnp.sum(jnp.where(march(s, r, mcfg).hit,
                                 march(s, r, mcfg).t, 0.0))
    timed_k("grad sum(t) march only", jax.jit(jax.grad(loss_t)),
            scene, flat)

    def loss_n(s, r):
        res, nrm, midx = march_surface(s, r, mcfg)
        return jnp.sum(jnp.where(res.hit[..., None], nrm, 0.0))
    timed_k("grad sum(normal) fused surface", jax.jit(jax.grad(loss_n)),
            scene, flat)

    # the culled point-eval dist_fn at the hit points
    res = jax.jit(lambda s, r: march(s, r, mcfg))(scene, flat)
    pos = np.asarray(flat.at(res.t - flat.epsilon))
    hit = np.asarray(res.hit)
    pos_j, hit_j = jnp.asarray(pos), jnp.asarray(hit)
    from fraytracer_tpu.ops.point_eval import build_culled_eval

    def dist_grad(s, p, h):
        built = build_culled_eval(s, p, h, m=mcfg.cull_m,
                                  threshold=mcfg.cull_threshold)
        dist_fn, _mat, reshape, n, ok = built
        q = reshape(p)
        g = jax.grad(lambda sc: jnp.sum(dist_fn(sc, q)))(s)
        return g
    timed_k("point_eval dist grad (scene)", jax.jit(dist_grad),
            scene, pos_j, hit_j)

    def dist_fwd(s, p, h):
        built = build_culled_eval(s, p, h, m=mcfg.cull_m,
                                  threshold=mcfg.cull_threshold)
        dist_fn, _mat, reshape, n, ok = built
        return dist_fn(s, reshape(p))
    timed_k("point_eval dist fwd only", jax.jit(dist_fwd),
            scene, pos_j, hit_j)

    # raw gather + scatter-add cost of the shape the backward uses
    kp = scene.prim_params["torus"]
    Gt = pos.shape[0] // 1024
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, kp.shape[0], (Gt, 256)),
        jnp.int32)

    def gather_scatter(kp, idx):
        tab = kp[idx]                      # [G, 256, P]
        ct = tab * 1.0001
        g = jnp.zeros_like(kp).at[idx].add(ct)
        return g
    timed_k("gather+scatter-add [G,256,P]", jax.jit(gather_scatter),
            kp, idx)


if __name__ == "__main__":
    main()
