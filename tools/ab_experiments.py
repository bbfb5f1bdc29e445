#!/usr/bin/env python
"""A/B throughput experiments on the benchmark scene (run on TPU).

Times each variant with K chained async dispatches and ONE readback, so the
tunneled backend's fixed per-dispatch/readback latency (~24 ms measured on
axon) is amortized out and the numbers reflect device time.

Usage: python tools/ab_experiments.py [exp1,exp2,...]
Experiments: pipeline, compact, omega, clamp, trace
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

import dataclasses

import fraytracer_tpu as ft
from fraytracer_tpu import camera as cam
from fraytracer_tpu.ops import shade
from fraytracer_tpu.ops.march import MarchConfig, march
from fraytracer_tpu.scene.generators import torus_csg_scene
from fraytracer_tpu.render import _block_perm, _auto_block

SIZE = int(os.environ.get("AB_SIZE", "1024"))
TORI = int(os.environ.get("AB_TORI", "1000"))
EXPS = (sys.argv[1].split(",") if len(sys.argv) > 1
        else ["pipeline", "compact"])
K = int(os.environ.get("AB_K", "8"))


def timed_k(name, fn, *args, k=K):
    """Compile, then time k chained dispatches + one readback."""
    t0 = time.perf_counter()
    out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    compile_s = time.perf_counter() - t0
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        float(jnp.sum(leaf.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / k)
    print(f"{name:44s} {best*1e3:9.2f} ms/call (k={k}, compile {compile_s:.1f}s)",
          flush=True)
    return best


def main():
    scene = ft.flatten(torus_csg_scene(seed=19, n_tori=TORI))
    camera = ft.look_at((0.0, 0.0, -10.0), (0.0, 0.0, 0.0),
                        fov_degrees=60.0)
    backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    base = MarchConfig(max_steps=192, bound_skip=True, backend=backend,
                       relax_omega=1.4)
    print(f"backend={backend} size={SIZE} tori={TORI} K={K}", flush=True)

    rays = cam.camera_rays(camera, SIZE, SIZE, 0.01, 30.0)
    flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), rays)
    perm, _inv = _block_perm(SIZE, SIZE, _auto_block(SIZE, SIZE))
    flat = jax.tree.map(lambda x: x[perm], flat)

    if "pipeline" in EXPS:
        # does chaining dispatches amortize the per-call floor?
        march_j = jax.jit(lambda s, r: march(s, r, base))
        timed_k("march k=1 (RTT incl.)", march_j, scene, flat, k=1)
        timed_k("march k=8 (RTT amortized)", march_j, scene, flat, k=8)

    if "compact" in EXPS:
        for flag in (False, True):
            cfg = dataclasses.replace(base, shadow_compact=flag)
            tr = jax.jit(lambda s, r, cfg=cfg: shade.trace(s, r, cfg))
            timed_k(f"full trace shadow_compact={flag}", tr, scene, flat)

    if "omega" in EXPS:
        for om in (1.2, 1.4, 1.6, 1.8):
            cfg = dataclasses.replace(base, relax_omega=om)
            tr = jax.jit(lambda s, r, cfg=cfg: shade.trace(s, r, cfg))
            timed_k(f"full trace omega={om}", tr, scene, flat)

    if "clamp" in EXPS:
        for cl in (0.5, 0.25, 0.125):
            cfg = dataclasses.replace(base, cull_window_clamp=cl)
            tr = jax.jit(lambda s, r, cfg=cfg: shade.trace(s, r, cfg))
            timed_k(f"full trace clamp={cl}", tr, scene, flat)

    if "trace" in EXPS:
        tr = jax.jit(lambda s, r: shade.trace(s, r, base))
        timed_k("full trace (base cfg)", tr, scene, flat)

    if "shadowsub" in EXPS:
        import dataclasses as _dc
        for sub in (0, 16, 8):
            cfg = _dc.replace(base, shadow_tile_sub=sub)
            tr = jax.jit(lambda s, r, cfg=cfg: shade.trace(s, r, cfg))
            timed_k(f"full trace shadow_tile_sub={sub}", tr, scene, flat)

    if "loopjit" in EXPS:
        # pure device time: KL frames inside ONE jit (no dispatch floor)
        KL = 16

        @jax.jit
        def trace_k(s, r):
            def body(i, acc):
                r2 = jax.tree.map(lambda x: x, r)
                r2 = r2.replace(origin=r.origin + acc * 1e-38)
                return acc + jnp.sum(shade.trace(s, r2, base)) * 1e-9
            return jax.lax.fori_loop(0, KL, body, jnp.float32(0.0))

        t0 = time.perf_counter()
        float(trace_k(scene, flat))
        print(f"loopjit compile {time.perf_counter()-t0:.1f}s", flush=True)
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            float(trace_k(scene, flat))
            best = min(best, (time.perf_counter() - t0) / KL)
        print(f"{'full trace (in-jit loop, device-only)':44s} "
              f"{best*1e3:9.2f} ms/frame", flush=True)

    if "tile" in EXPS:
        # per-tile fixed-cost curve: 1-sphere scene at several sizes
        sph = ft.flatten(ft.Scene(
            root=ft.sphere((0.0, 0.0, 0.0), 3.5,
                           material=ft.solid(0.5, 0.5, 0.5)),
            background=(0.1, 0.1, 0.1)))
        from fraytracer_tpu.ops.pallas.march_kernel import ray_tile
        tile = ray_tile()
        for sz in (256, 512, 1024):
            r2 = cam.camera_rays(camera, sz, sz, 0.01, 30.0)
            f2 = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), r2)
            p2, _ = _block_perm(sz, sz, _auto_block(sz, sz))
            f2 = jax.tree.map(lambda x: x[p2], f2)
            ntiles = (sz * sz) // tile
            mj = jax.jit(lambda s, r: march(s, r, base))
            t = timed_k(f"1-sphere march {sz}^2 ({ntiles} tiles)",
                        mj, sph, f2)
            print(f"   -> {t/ntiles*1e6:.2f} us/tile", flush=True)
            tb = timed_k(f"bench march {sz}^2 ({ntiles} tiles)",
                         mj, scene, f2)
            print(f"   -> {tb/ntiles*1e6:.2f} us/tile", flush=True)

    if "shadowconv" in EXPS:
        # converging-cone point shadow: time + width with cone_apex
        import dataclasses as _dc
        from fraytracer_tpu.ops.march import march_occlusion
        from fraytracer_tpu.ops.pallas.march_kernel import ray_tile
        tile = ray_tile()
        march_b = jax.jit(lambda s, r: march(s, r, base))
        res = march_b(scene, flat)
        pos = flat.at(res.t - flat.epsilon)
        ldir, budget, _sc = shade.light_dir_and_dist(scene, 1, pos)
        sr = ft.types.Rays(origin=pos, direction=ldir,
                           length=jnp.where(res.hit, budget, 0.0),
                           epsilon=jnp.full(pos.shape[:-1], 0.01))
        cfg_sh = _dc.replace(base, cull_m=max(base.cull_m,
                                              base.cull_m_shadow))
        apex = scene.light_vec[1]
        occ_j = jax.jit(lambda s, r: march_occlusion(s, r, cfg_sh,
                                                     cone_apex=apex))
        timed_k("point shadow occl (converging cone)", occ_j, scene, sr)
        occ_p = jax.jit(lambda s, r: march_occlusion(s, r, cfg_sh))
        timed_k("point shadow occl (plain cone)", occ_p, scene, sr)
        # candidate counts with/without apex
        from fraytracer_tpu.ops.pallas import march_kernel as mk
        from fraytracer_tpu.ops import sdf as _sdf
        from fraytracer_tpu.ops.march import bound_skip_start

        def counts(r, ap):
            t0v, miss0, t_exitv = bound_skip_start(scene, r)
            length = jnp.minimum(r.length, t_exitv)
            length = jnp.where(miss0, 0.0, length)
            t_hi = jnp.where(length > 0.0, t0v + length, t0v)
            g = r.origin.shape[0] // tile
            cones = mk._tile_cones(r.origin, r.direction, t0v, t_hi,
                                   r.epsilon, g, tile, conv_apex=ap)
            pr = mk._cull_pairs(scene.kind_counts, scene.plan,
                                base.cull_threshold)
            (_g, kind, _ki, lo, hi) = pr[0]
            kb = _sdf._prim_bound_rows(kind,
                                       scene.prim_params[kind][lo:hi])
            sel = mk._cone_candidates(kb, cones, 1024,
                                      converging=ap is not None)
            return sel.count
        for name, ap in (("plain", None), ("converging", apex)):
            c = np.asarray(jax.jit(lambda r, ap=ap: counts(r, ap))(sr))
            print(f"  point-shadow candidates/tile ({name}): "
                  f"mean {c.mean():.0f} p90 {np.percentile(c, 90):.0f} "
                  f"max {c.max()}", flush=True)

    if "diag" in EXPS:
        import dataclasses as _dc
        # per-step fixed overhead: a 1-sphere scene (scalar dense path, no
        # cull pairs) — time/step = loop latching + reductions + 1 eval
        sph = ft.flatten(ft.Scene(
            root=ft.sphere((0.0, 0.0, 0.0), 3.5,
                           material=ft.solid(0.5, 0.5, 0.5)),
            background=(0.1, 0.1, 0.1)))
        march_s = jax.jit(lambda s, r: march(s, r, base))
        t_sph = timed_k("march 1-sphere scene", march_s, sph, flat)
        res = march_s(sph, flat)
        from fraytracer_tpu.ops.pallas.march_kernel import ray_tile
        tile = ray_tile()
        ts = np.asarray(res.steps).reshape(-1, tile).max(1)
        print(f"  1-sphere tile-steps sum {ts.sum()} -> "
              f"{t_sph/max(ts.sum(),1)*1e6:.2f} us/tile-step", flush=True)

        # benchmark scene: tile steps + per-step cost, march + shadows
        march_b = jax.jit(lambda s, r: march(s, r, base))
        t_b = timed_k("march benchmark", march_b, scene, flat)
        res = march_b(scene, flat)
        ts_b = np.asarray(res.steps).reshape(-1, tile).max(1)
        print(f"  bench tile-steps sum {ts_b.sum()} mean {ts_b.mean():.1f} "
              f"p90 {np.percentile(ts_b, 90):.0f} max {ts_b.max()} -> "
              f"{t_b/max(ts_b.sum(),1)*1e6:.2f} us/tile-step", flush=True)
        # window widths
        mw = _dc.replace(base, debug_window_stats=True)
        res_w = jax.jit(lambda s, r: march(s, r, mw))(scene, flat)
        ws = np.asarray(res_w.steps).reshape(-1, tile)[:, 0]
        print(f"  bench width sum {ws.sum()} mean/step "
              f"{ws.sum()/max(ts_b.sum(),1):.2f}", flush=True)

        # shadow rays as full march to read step counts
        pos = flat.at(res.t - flat.epsilon)
        for li in (0, 1):
            ldir, budget, _sc = shade.light_dir_and_dist(scene, li, pos)
            sr = ft.types.Rays(origin=pos, direction=ldir,
                               length=jnp.where(res.hit, budget, 0.0),
                               epsilon=jnp.full(pos.shape[:-1], 0.01))
            cfg_sh = _dc.replace(base, cull_m=max(base.cull_m,
                                                  base.cull_m_shadow))
            sh_j = jax.jit(lambda s, r, cfg_sh=cfg_sh: march(s, r, cfg_sh))
            t_sh = timed_k(f"shadow light{li} full march", sh_j, scene, sr)
            rsh = sh_j(scene, sr)
            tss = np.asarray(rsh.steps).reshape(-1, tile).max(1)
            mws = _dc.replace(cfg_sh, debug_window_stats=True)
            rw = jax.jit(lambda s, r, mws=mws: march(s, r, mws))(scene, sr)
            wss = np.asarray(rw.steps).reshape(-1, tile)[:, 0]
            act_tiles = (tss > 0).mean()
            print(f"  shadow{li} tile-steps sum {tss.sum()} "
                  f"mean {tss.mean():.1f} max {tss.max()} "
                  f"active-tiles {act_tiles:.2f} "
                  f"width/step {wss.sum()/max(tss.sum(),1):.2f} -> "
                  f"{t_sh/max(tss.sum(),1)*1e6:.2f} us/tile-step",
                  flush=True)

    if "stages" in EXPS:
        from fraytracer_tpu.ops.march import march_surface, march_occlusion
        march_j = jax.jit(lambda s, r: march(s, r, base))
        timed_k("march only", march_j, scene, flat)
        surf_j = jax.jit(lambda s, r: march_surface(s, r, base))
        timed_k("march+surface", surf_j, scene, flat)
        res = march_j(scene, flat)
        pos = flat.at(res.t - flat.epsilon)

        def shadow(s, pos, hit, li):
            ldir, budget, _ = shade.light_dir_and_dist(s, li, pos)
            sr = ft.types.Rays(origin=pos, direction=ldir,
                               length=jnp.where(hit, budget, 0.0),
                               epsilon=jnp.full(pos.shape[:-1], 0.01))
            return march_occlusion(s, sr, base)
        timed_k("shadow light0 (dir, uncompacted)",
                jax.jit(lambda s, p, h: shadow(s, p, h, 0)),
                scene, pos, res.hit)
        timed_k("shadow light1 (point, uncompacted)",
                jax.jit(lambda s, p, h: shadow(s, p, h, 1)),
                scene, pos, res.hit)
        from fraytracer_tpu.ops.march import occlusion_compacted

        def shadow_c(s, pos, hit, li):
            ldir, budget, _ = shade.light_dir_and_dist(s, li, pos)
            sr = ft.types.Rays(origin=pos, direction=ldir,
                               length=jnp.where(hit, budget, 0.0),
                               epsilon=jnp.full(pos.shape[:-1], 0.01))
            return occlusion_compacted(s, sr, hit, base)
        timed_k("shadow light0 (dir, compacted)",
                jax.jit(lambda s, p, h: shadow_c(s, p, h, 0)),
                scene, pos, res.hit)
        timed_k("shadow light1 (point, compacted)",
                jax.jit(lambda s, p, h: shadow_c(s, p, h, 1)),
                scene, pos, res.hit)


if __name__ == "__main__":
    main()
