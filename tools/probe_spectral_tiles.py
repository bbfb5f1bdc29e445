#!/usr/bin/env python
"""Spectral wavefront A/B: bounce-round march tile height.

Bounce-round tiles (4096 lanes = 512 pixel-major parents) span enough
surface curvature that their direction spread collapses the cone test to
a bounding ball.  Smaller tiles (1024 lanes = 128 parents) see 4× less
spread at the cost of 4× the per-tile prologue.  Measures the full
spectral render at tile_sub ∈ {32 (default), 16, 8} plus the march m
table size, at the benchmark spectral config (512²×8 bins, depth 4).

Usage: python tools/probe_spectral_tiles.py [size] [tori]
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
from fraytracer_tpu.ops.march import MarchConfig
from fraytracer_tpu.ops.wavefront import (WavefrontConfig,
                                          render_spectral_with_stats)
from fraytracer_tpu.scene.generators import spectral_csg_scene

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 512
TORI = int(sys.argv[2]) if len(sys.argv) > 2 else 1000


def main():
    backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    print(f"backend={backend} size={SIZE} tori={TORI}", flush=True)
    scene = ft.flatten(spectral_csg_scene(seed=19, n_tori=TORI))
    camera = ft.look_at((0.0, 0.0, -10.0), (0.0, 0.0, 0.0),
                        fov_degrees=60.0)
    base = MarchConfig(max_steps=192, bound_skip=True, backend=backend,
                       relax_omega=1.4)

    for name, kw in (
        ("tile_sub=32 (default)", dict()),
        ("tile_sub=16", dict(tile_sub=16)),
        ("tile_sub=8", dict(tile_sub=8)),
        ("tile_sub=8 m=256", dict(tile_sub=8, cull_m_shadow=256)),
    ):
        mcfg = dataclasses.replace(base, **kw)
        wcfg = WavefrontConfig(depth=4, epsilon=0.01, length=30.0,
                               march=mcfg)
        fn = jax.jit(
            lambda s, c, wcfg=wcfg: (lambda img, n: (jnp.sum(img), n))(
                *render_spectral_with_stats(s, c, SIZE, SIZE, wcfg)))
        t0 = time.perf_counter()
        chk, n = fn(scene, camera)
        float(chk)
        comp = time.perf_counter() - t0
        best = 1e30
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(4):
                chk, n = fn(scene, camera)
            float(chk)
            best = min(best, (time.perf_counter() - t0) / 4)
        print(f"{name:28s} {best*1e3:9.1f} ms  rays={float(n):.3g} "
              f"({float(n)/best/1e6:.2f} M rays/s) compile {comp:.0f}s",
              flush=True)


if __name__ == "__main__":
    main()
