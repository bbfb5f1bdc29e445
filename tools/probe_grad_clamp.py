#!/usr/bin/env python
"""Quantify the silhouette-gradient clamp (VERDICT r4 #6).

The implicit-diff backward divides by ``denom = ∇f·d̂`` clamped to
``≥ min_denom`` (ops/march.py `_implicit_t_denom`): grazing hits have
near-tangent rays (|∇f·d̂| → 0), where dt/dθ = -∂f/∂θ / denom blows up.
The clamp bounds the magnitude at the cost of *biasing* those lanes'
gradients low.  This probe measures, on the benchmark scene:

1. the fraction of hit lanes that are clamped at several min_denom values;
2. the fraction of backward gradient MASS (|ct_t / denom_clamped|, the
   actual per-lane scale entering the scene-VJP) on clamped lanes;
3. the relative change of the full scene-parameter gradient when the
   clamp is halved/quartered (how much signal the clamp is eating);
4. a small inverse-rendering fit (cli.py fit loop) per clamp value —
   final loss + parameter recovery.

Usage: python tools/probe_grad_clamp.py [size] [tori]
"""
import dataclasses
import json
import os
import sys

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
from fraytracer_tpu.types import SurfaceHit, dot

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 256
TORI = int(sys.argv[2]) if len(sys.argv) > 2 else 1000


def clamp_stats(scene, camera, cfg, size):
    """(frac hit lanes clamped, frac gradient mass on clamped lanes)."""

    @jax.jit
    def run(scene):
        rays = cam.camera_rays(camera, size, size, 0.01, 30.0)
        rays = jax.tree.map(
            lambda x: x.reshape((-1,) + x.shape[2:]), rays)
        res = march(scene, rays, cfg)
        hit = res.hit
        x0 = rays.at(res.t)

        # denom at the hit points (same formula as _implicit_t_denom),
        # chunked so the dense [chunk, K] matrices stay bounded
        def denom_chunk(args):
            q, d = args
            g = jax.grad(
                lambda qq: jnp.sum(sdf.scene_distance(scene, qq)))(q)
            return jnp.abs(dot(g, d))

        ch = 16384
        n = x0.shape[0]
        denom_raw = jax.lax.map(
            denom_chunk, (x0.reshape(-1, ch, 3),
                          rays.direction.reshape(-1, ch, 3))).reshape(n)
        clamped = hit & (denom_raw < cfg.min_denom)
        frac_lanes = jnp.sum(clamped) / jnp.maximum(jnp.sum(hit), 1)

        # per-lane |dL/dt| for the bench loss L = Σ image², via a zero
        # offset injected into t ahead of the recomputed shading
        def loss_of_delta(delta):
            t = jax.lax.stop_gradient(res.t) + delta

            def shade_chunk(args):
                rr, tt, hh = args
                pos = rr.at(tt - rr.epsilon)
                nrm = sdf.scene_normal(scene, pos)
                midx, albedo = sdf.material_at(scene, pos)
                sh = SurfaceHit(hit=hh, position=pos, normal=nrm,
                                color=albedo,
                                material=jnp.where(hh, midx, -1), t=tt)
                return shade.shade(scene, rr, sh, cfg)

            chunked = (jax.tree.map(lambda x: x.reshape((-1, ch)
                                    + x.shape[1:]), rays),
                       t.reshape(-1, ch), hit.reshape(-1, ch))
            img = jax.lax.map(jax.checkpoint(shade_chunk), chunked)
            return jnp.sum(img ** 2)

        ct_t = jax.grad(loss_of_delta)(jnp.zeros_like(res.t))
        mass = jnp.abs(ct_t) / jnp.maximum(denom_raw, cfg.min_denom)
        mass = jnp.where(hit, mass, 0.0)
        frac_mass = (jnp.sum(jnp.where(clamped, mass, 0.0))
                     / jnp.maximum(jnp.sum(mass), 1e-20))
        return frac_lanes, frac_mass

    fl, fm = run(scene)
    return float(fl), float(fm)


def scene_grad(scene, camera, cfg, size):
    def loss(s):
        return jnp.mean(ft.render(
            s, camera, ft.RenderConfig(width=size, height=size,
                                       epsilon=0.01, length=30.0,
                                       march=cfg)) ** 2)
    g = jax.grad(loss)(scene)
    return jnp.concatenate([x.reshape(-1)
                            for x in jax.tree.leaves(g.prim_params)])


def mini_fit(seed_scene, camera, cfg, size, steps=30, lr=0.15,
             perturb=0.03):
    target = ft.render(seed_scene, camera,
                       ft.RenderConfig(width=size, height=size,
                                       epsilon=0.01, length=30.0,
                                       march=cfg))
    init = jax.tree.map(
        lambda x: x + perturb * jax.random.normal(
            jax.random.key(7), x.shape, x.dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        seed_scene.prim_params)
    scene = seed_scene.replace(prim_params=init)

    def perr(s):
        return float(sum(jnp.sum(jnp.abs(a - b)) for a, b in zip(
            jax.tree.leaves(s.prim_params),
            jax.tree.leaves(seed_scene.prim_params))))

    @jax.jit
    def step(s):
        def loss(s):
            img = ft.render(s, camera,
                            ft.RenderConfig(width=size, height=size,
                                            epsilon=0.01, length=30.0,
                                            march=cfg))
            return jnp.mean((img - target) ** 2)
        l, g = jax.value_and_grad(loss)(s)
        new = jax.tree.map(
            lambda p, gg: p - lr * gg
            if jnp.issubdtype(p.dtype, jnp.floating) else p, s, g)
        return new, l

    e0 = perr(scene)
    l0 = None
    for _ in range(steps):
        scene, l = step(scene)
        if l0 is None:
            l0 = float(l)
    return {"loss_first": l0, "loss_last": float(l),
            "param_recovery": 1.0 - perr(scene) / max(e0, 1e-12)}


def main():
    backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    scene = ft.flatten(torus_csg_scene(seed=19, n_tori=TORI))
    camera = ft.look_at((0.0, 0.0, -10.0), (0.0, 0.0, 0.0),
                        fov_degrees=60.0)
    base = MarchConfig(max_steps=192, backend=backend, relax_omega=1.4)
    out = {"size": SIZE, "tori": TORI, "backend": backend}

    for md in (0.05, 0.025, 0.0125):
        cfg = dataclasses.replace(base, min_denom=md)
        fl, fm = clamp_stats(scene, camera, cfg, SIZE)
        out[f"clamped_lane_frac@{md}"] = round(fl, 5)
        out[f"clamped_mass_frac@{md}"] = round(fm, 5)
        print(f"min_denom={md}: clamped lanes {fl:.4f}, "
              f"gradient mass {fm:.4f}", flush=True)

    g0 = scene_grad(scene, camera,
                    dataclasses.replace(base, min_denom=0.05), SIZE)
    for md in (0.025, 0.0125):
        gm = scene_grad(scene, camera,
                        dataclasses.replace(base, min_denom=md), SIZE)
        rel = float(jnp.linalg.norm(gm - g0) / jnp.linalg.norm(g0))
        out[f"grad_rel_change@{md}"] = round(rel, 5)
        print(f"grad change 0.05 -> {md}: {rel:.4f} relative L2",
              flush=True)

    fit_size, fit_tori = min(SIZE, 128), min(TORI, 100)
    fscene = ft.flatten(torus_csg_scene(seed=19, n_tori=fit_tori))
    for md in (0.05, 0.025, 0.0125):
        r = mini_fit(fscene, camera,
                     dataclasses.replace(base, min_denom=md), fit_size)
        out[f"fit@{md}"] = r
        print(f"fit min_denom={md}: {r}", flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
