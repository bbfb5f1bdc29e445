#!/usr/bin/env python
"""A/B: strided early-out + window-clamp sweep for all three marches.

Usage: python tools/probe_eo_clamp.py [size] [tori]
(EO_STRIDE is a module constant read at kernel build: set FT_EO_STRIDE.)
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import fraytracer_tpu as ft
from fraytracer_tpu import camera as cam
from fraytracer_tpu.ops.march import MarchConfig
from fraytracer_tpu.scene.generators import torus_csg_scene

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


def main():
    backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    import fraytracer_tpu.ops.pallas.march_kernel as MK
    print(f"backend={backend} size={SIZE} tori={TORI} "
          f"EO_STRIDE={MK.EO_STRIDE}", flush=True)
    scene = ft.flatten(torus_csg_scene(seed=19, n_tori=TORI))
    camera = ft.look_at((0.0, 0.0, -10.0), (0.0, 0.0, 0.0),
                        fov_degrees=60.0)
    base = MarchConfig(max_steps=192, bound_skip=True, backend=backend,
                       relax_omega=1.4)
    for name, kw in (
        ("frame eo=off", dict()),
        ("frame eo=on", dict(cull_early_out=True)),
        ("frame eo=on clamp .0625", dict(cull_early_out=True,
                                         cull_window_clamp=0.0625)),
        ("frame eo=off clamp .0625", dict(cull_window_clamp=0.0625)),
        ("frame eo=off clamp .25", dict(cull_window_clamp=0.25)),
    ):
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
        loop_time(name, f, scene, camera)


if __name__ == "__main__":
    main()
