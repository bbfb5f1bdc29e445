"""Pallas march kernel parity tests (interpret mode on CPU): the fused
kernel must reproduce the jnp reference march bit-for-bit in hits and to
float tolerance in distances (SURVEY.md §7 stage 3)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import fraytracer_tpu as ft
from fraytracer_tpu.ops.march import MarchConfig, march
from fraytracer_tpu.scene.generators import csg_demo_scene, torus_csg_scene

JNP = MarchConfig(backend="jnp", max_steps=128)
PAL = MarchConfig(backend="pallas_interpret", max_steps=128)


def flat_camera_rays(w, h, eps=0.01, length=30.0, pos=(0, 0, -10)):
    cam = ft.look_at(pos, (0, 0, 0))
    rays = ft.camera_rays(cam, w, h, eps, length)
    return jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), rays)


def assert_parity(scene, rays, atol=2e-6):
    r_jnp = march(scene, rays, JNP)
    r_pal = march(scene, rays, PAL)
    hits = np.asarray(r_jnp.hit)
    np.testing.assert_array_equal(hits, np.asarray(r_pal.hit))
    if hits.any():
        np.testing.assert_allclose(np.asarray(r_pal.t)[hits],
                                   np.asarray(r_jnp.t)[hits], atol=atol)


def test_parity_torus_csg():
    # 48 tori ≥ the round-5 default cull_threshold (48): the kernel path
    # is now the CULLED march, whose window caps change the step sequence
    # — hits stay exactly equal (assert_parity checks that), hit t lands
    # within the epsilon shell (eps=0.01) rather than bit-equal
    scene = ft.flatten(torus_csg_scene(seed=19, n_tori=48))
    assert_parity(scene, flat_camera_rays(32, 32), atol=1e-3)
    # and bit-tight parity on the same scene with culling off
    r_jnp = march(scene, flat_camera_rays(32, 32), JNP)
    import dataclasses as dc
    r_pal = march(scene, flat_camera_rays(32, 32),
                  dc.replace(PAL, cull=False))
    hits = np.asarray(r_jnp.hit)
    np.testing.assert_array_equal(hits, np.asarray(r_pal.hit))
    np.testing.assert_allclose(np.asarray(r_pal.t)[hits],
                               np.asarray(r_jnp.t)[hits], atol=2e-6)


def test_parity_all_primitive_kinds():
    """One scene containing every primitive kind exercises every SoA
    distance function in the kernel."""
    scene = ft.flatten(ft.Scene(root=ft.union(
        ft.sphere((0, 0, 0), 0.8, material=ft.solid(1, 0, 0)),
        ft.capsule((-2, -1, 0), (-2, 1, 0), 0.3),
        ft.torus((2, 0, 0), (0, 1, 0.3), 0.7, 0.2),
        ft.triangle((-1, 1.5, 0), (1, 1.5, 0), (0, 2.5, 0.5), 0.1),
        ft.box((0, -2, 0), (0.6, 0.4, 0.5), 0.05),
        ft.cone((2, -2.5, 0), (2, -1, 0), 0.6, 0.1),
        ft.plane((0, 1, 0), -3.5),
    )))
    assert_parity(scene, flat_camera_rays(32, 32, length=40.0))


def test_parity_smooth_union_and_subtract():
    scene = ft.flatten(ft.Scene(root=ft.subtract(
        ft.intersect(
            ft.smooth_union(0.3,
                            ft.sphere((0, 0, 0), 1.0),
                            ft.sphere((0.8, 0.3, 0), 0.7)),
            ft.sphere((0, 0, 0), 1.5),
        ),
        ft.box((0.3, 0.5, -0.7), (0.4, 0.4, 0.4), 0.05),
    )))
    assert_parity(scene, flat_camera_rays(24, 24), atol=1e-5)


def test_parity_nonmultiple_batch():
    """Ray counts that don't divide the tile exercise the padding path."""
    scene = ft.flatten(torus_csg_scene(seed=19, n_tori=16))
    rays = flat_camera_rays(30, 11)  # 330 rays: one tile + 74 padded
    assert_parity(scene, rays)


def test_parity_budget_and_miss():
    scene = ft.flatten(ft.Scene(root=ft.sphere((0, 0, 0), 1.0)))
    origins = np.array([[0, 0, -5.0]] * 4, np.float32)
    dirs = np.array([[0, 0, 1.0], [0, 1, 0], [0, 0, 1.0], [0, 0, -1.0]],
                    np.float32)
    lengths = np.array([100.0, 100.0, 3.0, 100.0], np.float32)
    rays = ft.make_rays(origins, dirs, lengths, 1e-3)
    r_pal = march(scene, rays, PAL)
    assert bool(r_pal.hit[0])        # direct hit
    assert not bool(r_pal.hit[1])    # perpendicular miss
    assert not bool(r_pal.hit[2])    # budget exhausted (SdfForm.fs:94)
    assert not bool(r_pal.hit[3])    # walks away


def test_pallas_gradients_match_jnp():
    """Implicit-diff gradients are backend-independent (the reattachment
    uses the jnp distance, only t* comes from the kernel)."""
    scene = ft.flatten(ft.Scene(root=ft.sphere((0, 0, 0), 1.0)))
    rays = ft.make_rays([0, 0, -5.0], [0, 0, 1.0], 100.0, 1e-4)

    def t_of(r, cfg):
        s = scene.replace(prim_params={
            "sphere": scene.prim_params["sphere"].at[0, 3].set(r)})
        return jnp.sum(march(s, jax.tree.map(lambda x: x[None], rays),
                             cfg).t)

    g_jnp = jax.grad(lambda r: t_of(r, JNP))(jnp.float32(1.0))
    g_pal = jax.grad(lambda r: t_of(r, PAL))(jnp.float32(1.0))
    np.testing.assert_allclose(float(g_pal), float(g_jnp), atol=1e-4)
    np.testing.assert_allclose(float(g_pal), -1.0, atol=1e-3)


def test_full_render_pallas_matches_jnp():
    """End-to-end render through the pallas backend (block pixel ordering +
    cone culling + overflow fallback) matches the jnp render."""
    scene = ft.flatten(torus_csg_scene(seed=19, n_tori=96))
    cam = ft.look_at((0, 0, -10), (0, 0, 0))
    a = np.asarray(ft.render(scene, cam, ft.RenderConfig(
        width=64, height=64, march=MarchConfig(backend="jnp",
                                               max_steps=128))))
    b = np.asarray(ft.render(scene, cam, ft.RenderConfig(
        width=64, height=64,
        march=MarchConfig(backend="pallas_interpret", max_steps=128,
                          cull=True, cull_threshold=64, cull_m=128))))
    # culling prunes far primitives from the min → step sequences differ →
    # hits land at (slightly) different points inside the epsilon shell;
    # shading then differs by O(epsilon * curvature), not exactly 0
    assert np.abs(a - b).max() < 2e-3
    # gross cull regressions can't hide inside the shading tolerance: the
    # two backends must agree exactly on what was hit (advisor round 1)
    rays = flat_camera_rays(64, 64)
    h_j = march(scene, rays, MarchConfig(backend="jnp", max_steps=128)).hit
    h_p = march(scene, rays, MarchConfig(backend="pallas_interpret",
                                         max_steps=128, cull=True,
                                         cull_threshold=64, cull_m=128)).hit
    np.testing.assert_array_equal(np.asarray(h_j), np.asarray(h_p))


def test_cull_candidates_conservative(rng):
    """Every primitive whose surface any tile ray can hit must be in that
    tile's candidate list (cone test soundness)."""
    import jax.numpy as jnp
    from fraytracer_tpu.ops import sdf as S
    from fraytracer_tpu.ops.pallas.march_kernel import (RAY_TILE,
                                                        _cone_candidates,
                                                        _tile_cones)
    scene = ft.flatten(torus_csg_scene(seed=3, n_tori=64))
    cam = ft.look_at((0, 0, -10), (0, 0, 0))
    rays = ft.camera_rays(cam, 32, 32, 0.01, 30.0)
    flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), rays)
    grid = flat.origin.shape[0] // RAY_TILE
    cones = _tile_cones(flat.origin, flat.direction,
                        jnp.zeros_like(flat.length), flat.length,
                        flat.epsilon, grid)
    bounds = S._prim_bound_rows("torus", scene.prim_params["torus"])
    sel = _cone_candidates(bounds, cones, 64)
    idx, count = sel.idx, sel.count
    cand_sets = [set(np.asarray(idx[g][:int(count[g])])) for g in range(grid)]

    # brute force: sample points along every ray; any prim whose bound is
    # within 2*eps of a sample must be a candidate of that ray's tile
    o = np.asarray(flat.origin).reshape(grid, RAY_TILE, 3)
    d = np.asarray(flat.direction).reshape(grid, RAY_TILE, 3)
    b = np.asarray(bounds)
    ts = np.linspace(0.0, 30.0, 40)
    for g in range(grid):
        sel = rng.choice(RAY_TILE, size=24, replace=False)
        pts = (o[g, sel, None, :] + ts[None, :, None]
               * d[g, sel, None, :]).reshape(-1, 3)
        dist = np.linalg.norm(pts[:, None, :] - b[None, :, 0:3], axis=-1) \
            - b[None, :, 3]
        reachable = np.where(dist.min(axis=0) < 2 * 0.01)[0]
        for prim in reachable:
            assert prim in cand_sets[g], (g, prim)


def test_cull_candidates_conservative_boundskip(rng):
    """Same soundness property with the march range the kernel actually
    uses: t0/t_hi from bound_skip_start (t_lo > 0 exercises the entry-side
    prune, advisor round 1).  Brute force samples only t in [t_lo, t_hi]
    per ray."""
    import jax.numpy as jnp
    from fraytracer_tpu.ops import sdf as S
    from fraytracer_tpu.ops.march import bound_skip_start
    from fraytracer_tpu.ops.pallas.march_kernel import (RAY_TILE,
                                                        _cone_candidates,
                                                        _tile_cones)
    scene = ft.flatten(torus_csg_scene(seed=7, n_tori=48))
    rays = flat_camera_rays(32, 32)
    t0, miss0, t_exit = bound_skip_start(scene, rays)
    length = jnp.where(miss0, 0.0, jnp.minimum(rays.length, t_exit))
    t_hi = jnp.where(length > 0.0, length, t0)
    grid = rays.origin.shape[0] // RAY_TILE
    cones = _tile_cones(rays.origin, rays.direction, t0, t_hi,
                        rays.epsilon, grid)
    bounds = S._prim_bound_rows("torus", scene.prim_params["torus"])
    sel = _cone_candidates(bounds, cones, 48)
    cand_sets = [set(np.asarray(sel.idx[g][:int(sel.count[g])]))
                 for g in range(grid)]

    o = np.asarray(rays.origin).reshape(grid, RAY_TILE, 3)
    d = np.asarray(rays.direction).reshape(grid, RAY_TILE, 3)
    lo = np.asarray(t0).reshape(grid, RAY_TILE)
    hi = np.asarray(t_hi).reshape(grid, RAY_TILE)
    b = np.asarray(bounds)
    fr = np.linspace(0.0, 1.0, 40)
    for g in range(grid):
        sel_rays = rng.choice(RAY_TILE, size=24, replace=False)
        for ri in sel_rays:
            if hi[g, ri] <= lo[g, ri]:
                continue
            ts = lo[g, ri] + fr * (hi[g, ri] - lo[g, ri])
            pts = o[g, ri] + ts[:, None] * d[g, ri]
            dist = (np.linalg.norm(pts[:, None, :] - b[None, :, 0:3],
                                   axis=-1) - b[None, :, 3])
            for prim in np.where(dist.min(axis=0) < 2 * 0.01)[0]:
                assert prim in cand_sets[g], (g, int(prim))


def test_axial_window_keys_sound(rng):
    """The per-step axial window's skip predicates must never exclude a
    primitive that is within `clamp` of an active ray point: for random
    sub-ranges [tau_lo, tau_hi] of each tile's march range, every primitive
    whose bound comes within clamp of a sampled point must satisfy
    lo_key >= plo - clamp and hi_key <= phi + clamp, where plo/phi are the
    per-lane axial range bounds min(oa + tau_lo*cos_lo) / max(oa + tau_hi)
    the kernel computes."""
    import jax.numpy as jnp
    from fraytracer_tpu.ops import sdf as S
    from fraytracer_tpu.ops.pallas.march_kernel import (RAY_TILE,
                                                        _cone_candidates,
                                                        _tile_cones)
    scene = ft.flatten(torus_csg_scene(seed=11, n_tori=48))
    rays = flat_camera_rays(32, 32)
    grid = rays.origin.shape[0] // RAY_TILE
    cones = _tile_cones(rays.origin, rays.direction,
                        jnp.zeros_like(rays.length), rays.length,
                        rays.epsilon, grid)
    bounds = S._prim_bound_rows("torus", scene.prim_params["torus"])
    m = 48
    sel = _cone_candidates(bounds, cones, m)
    clamp = 0.5

    o = np.asarray(rays.origin).reshape(grid, RAY_TILE, 3)
    d = np.asarray(rays.direction).reshape(grid, RAY_TILE, 3)
    apex = np.asarray(cones.apex)
    axis = np.asarray(cones.axis)
    b = np.asarray(bounds)
    idx = np.asarray(sel.idx)
    lo_key = np.asarray(sel.lo_key)
    hi_key = np.asarray(sel.hi_key)
    cos_lo = np.asarray(cones.cos_lo)
    for g in range(grid):
        cnt = int(np.asarray(sel.count)[g])
        row_of = {int(idx[g, j]): j for j in range(min(cnt, m))}
        oa = np.sum((o[g] - apex[g]) * axis[g], axis=-1)  # [RAY_TILE]
        for _ in range(6):
            tau_lo = float(rng.uniform(0, 25))
            tau_hi = tau_lo + float(rng.uniform(0.1, 5))
            plo = (oa + tau_lo * cos_lo[g]).min()
            phi = (oa + tau_hi).max()
            sel_rays = rng.choice(RAY_TILE, size=12, replace=False)
            ts = np.linspace(tau_lo, tau_hi, 12)
            pts = (o[g, sel_rays, None, :]
                   + ts[None, :, None] * d[g, sel_rays, None, :]
                   ).reshape(-1, 3)
            dist = (np.linalg.norm(pts[:, None, :] - b[None, :, 0:3],
                                   axis=-1) - b[None, :, 3])
            for prim in np.where(dist.min(axis=0) < clamp - 1e-2)[0]:
                j = row_of.get(int(prim))
                if j is None:
                    continue  # covered by the selection-soundness test
                assert lo_key[g, j] >= plo - clamp, \
                    (g, int(prim), "behind-skip would drop a near prim")
                assert hi_key[g, j] <= phi + clamp, \
                    (g, int(prim), "ahead-skip would drop a near prim")


def test_cull_candidates_conservative_divergent(rng):
    """Soundness for tiles whose directions span >90° (cos_min < 0):
    backward-pointing lanes march their axial coordinate *down*, so the
    entry-side bound must use max_len·cos_lo, not t_min·cos_lo (advisor
    round 2, high).  Rays fan out from points near the origin in random
    directions — the wavefront-bounce / point-light-shadow shape."""
    import jax.numpy as jnp
    from fraytracer_tpu.ops import sdf as S
    from fraytracer_tpu.ops.pallas.march_kernel import (RAY_TILE,
                                                        _cone_candidates,
                                                        _tile_cones)
    scene = ft.flatten(torus_csg_scene(seed=5, n_tori=64))
    n = RAY_TILE
    o = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    length = np.full((n,), 12.0, np.float32)
    eps = np.full((n,), 0.01, np.float32)
    cones = _tile_cones(jnp.asarray(o), jnp.asarray(d),
                        jnp.zeros((n,), jnp.float32), jnp.asarray(length),
                        jnp.asarray(eps), 1)
    assert float(cones.cos_lo[0]) < 0.0  # the tile really is divergent
    bounds = S._prim_bound_rows("torus", scene.prim_params["torus"])
    sel = _cone_candidates(bounds, cones, 64)
    cand = set(np.asarray(sel.idx[0][:int(sel.count[0])]))

    b = np.asarray(bounds)
    ts = np.linspace(0.0, 12.0, 60)
    ridx = rng.choice(n, size=48, replace=False)
    pts = (o[ridx, None, :] + ts[None, :, None] * d[ridx, None, :]) \
        .reshape(-1, 3)
    dist = np.linalg.norm(pts[:, None, :] - b[None, :, 0:3], axis=-1) \
        - b[None, :, 3]
    for prim in np.where(dist.min(axis=0) < 2 * 0.01)[0]:
        assert prim in cand, int(prim)


def test_occlusion_march_equivalent():
    """The any-hit occlusion kernel finds exactly the full march's hit set
    (same stepping and termination; it only drops the t/d outputs) — for
    both the plain and the omega-relaxed stepping, with and without cull."""
    from fraytracer_tpu.ops.march import march_occlusion
    scene = ft.flatten(torus_csg_scene(seed=19, n_tori=96))
    rays = flat_camera_rays(48, 48)
    for kw in (dict(), dict(relax_omega=1.4),
               dict(cull=True, cull_threshold=64, cull_m=128),
               dict(relax_omega=1.4, cull=True, cull_threshold=64,
                    cull_m=128)):
        cfg = MarchConfig(backend="pallas_interpret", max_steps=192, **kw)
        full = march(scene, rays, cfg).hit
        occ = march_occlusion(scene, rays, cfg)
        np.testing.assert_array_equal(np.asarray(full), np.asarray(occ), kw)
    # jnp backend path
    cfg = MarchConfig(backend="jnp", max_steps=192)
    np.testing.assert_array_equal(
        np.asarray(march(scene, rays, cfg).hit),
        np.asarray(march_occlusion(scene, rays, cfg)))


def test_intersect_group_cull_parity():
    """A few-hundred-member intersect group takes the kernel's culled
    'max' path (the reference's boundary max-distance pruning,
    SdfForm.fs:51-67, re-expressed as window skip bounds) — VERDICT r3
    #7: no dense fallback, exact parity with the jnp march, and exact
    fused-surface normals/materials."""
    from fraytracer_tpu.ops import sdf
    from fraytracer_tpu.ops.march import march_surface
    from fraytracer_tpu.ops.pallas.march_kernel import _cull_pairs
    rng = np.random.default_rng(11)
    spheres = [
        ft.sphere(tuple(rng.uniform(-0.5, 0.5, 3)), 2.0,
                  material=ft.solid(*rng.uniform(0.2, 1.0, 3)))
        for _ in range(256)
    ]
    scene = ft.flatten(ft.Scene(root=ft.intersect(*spheres),
                                background=(0.1, 0.1, 0.1)))
    pairs = _cull_pairs(scene.kind_counts, scene.plan, 192)
    assert pairs, "the intersect group must form a cull pair"
    rays = flat_camera_rays(32, 32, pos=(0, 0, -6))
    cfg_j = MarchConfig(backend="jnp", max_steps=192)
    cfg_p = MarchConfig(backend="pallas_interpret", max_steps=192,
                        cull=True, cull_threshold=192, cull_m=512)
    r_j = march(scene, rays, cfg_j)
    r_p = march(scene, rays, cfg_p)
    hits = np.asarray(r_j.hit)
    assert hits.mean() > 0.1
    np.testing.assert_array_equal(hits, np.asarray(r_p.hit))
    np.testing.assert_allclose(np.asarray(r_p.t)[hits],
                               np.asarray(r_j.t)[hits], atol=2e-6)
    res, nrm, midx = march_surface(scene, rays, cfg_p)
    pos = rays.at(res.t - rays.epsilon)
    n_ref = np.asarray(sdf.scene_normal(scene, pos))
    m_ref, _ = sdf.material_at(scene, pos)
    h = np.asarray(res.hit)
    assert np.abs(np.asarray(nrm) - n_ref)[h].max() < 1e-3
    assert (np.asarray(midx)[h] == np.asarray(m_ref)[h]).all()


def test_occlusion_converging_cone_equivalent():
    """Point-light-style shadow rays (every ray's budget ends exactly at
    one point): occlusion with the converging-cone candidate selection
    (``cone_apex``) must find exactly the hit set of the full march and of
    the apex-less occlusion — the cone only changes which candidates are
    *examined*, never the result."""
    from fraytracer_tpu.ops.march import march_occlusion
    scene = ft.flatten(torus_csg_scene(seed=19, n_tori=96))
    light = jnp.asarray([-0.5, 0.0, -2.0])
    rng = np.random.default_rng(3)
    # origins on a sphere shell around the scene (like backed-off surface
    # hits), directions exactly at the light, budget = distance
    o = rng.normal(size=(1024, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 3.2
    diff = np.asarray(light) - o
    dist = np.linalg.norm(diff, axis=-1)
    d = diff / dist[:, None]
    # a few inactive lanes (non-facing analog)
    act = rng.uniform(size=1024) > 0.2
    rays = ft.types.Rays(
        origin=jnp.asarray(o, jnp.float32),
        direction=jnp.asarray(d, jnp.float32),
        length=jnp.asarray(np.where(act, dist, 0.0), jnp.float32),
        epsilon=jnp.full((1024,), 0.01, jnp.float32))
    for kw in (dict(cull=True, cull_threshold=64, cull_m=128),
               dict(relax_omega=1.4, cull=True, cull_threshold=64,
                    cull_m=128)):
        cfg = MarchConfig(backend="pallas_interpret", max_steps=192, **kw)
        full = np.asarray(march(scene, rays, cfg).hit)
        occ_plain = np.asarray(march_occlusion(scene, rays, cfg))
        occ_conv = np.asarray(
            march_occlusion(scene, rays, cfg, cone_apex=light))
        # plain occlusion shares the full march's windows → identical
        # trajectories → identical hits
        np.testing.assert_array_equal(full, occ_plain, kw)
        # the converging cone changes candidate selection and therefore
        # step caps → sample points differ → epsilon-shell (grazing)
        # lanes may legally flip, but only a hair's breadth of them
        flips = (full != occ_conv).mean()
        assert flips <= 0.005, (kw, flips)


def test_relaxed_march_equivalent():
    """Over-relaxed march (omega=1.4) with the safe fallback finds exactly
    the same hit set, with hit distances within the epsilon shell, in fewer
    or equal steps."""
    scene = ft.flatten(torus_csg_scene(seed=19, n_tori=64))
    rays = flat_camera_rays(32, 32)
    base = march(scene, rays, MarchConfig(backend="pallas_interpret",
                                          max_steps=192))
    relaxed = march(scene, rays, MarchConfig(backend="pallas_interpret",
                                             max_steps=192,
                                             relax_omega=1.4))
    hits = np.asarray(base.hit)
    np.testing.assert_array_equal(hits, np.asarray(relaxed.hit))
    if hits.any():
        tdiff = np.abs(np.asarray(relaxed.t) - np.asarray(base.t))[hits]
        assert tdiff.max() < 3 * 0.01  # within the epsilon shell
    assert int(np.asarray(relaxed.steps).max()) <= \
        int(np.asarray(base.steps).max())


def test_occlusion_converging_cone_mixed_side_exact():
    """Shadow tiles whose origins STRADDLE the point light: lanes on the
    negative axial side of the apex march through the half-space where the
    converging-cone reach formula gives zero lateral reach, so without the
    per-tile wedge fallback their occluders are excluded from the candidate
    table — false 'unoccluded' light leaks (advisor r4 high).  Every
    far-side lane here passes through a fat occluder, so the converging
    path must report them occluded exactly like the plain path."""
    from fraytracer_tpu.ops.march import march_occlusion
    rng = np.random.default_rng(7)
    light = np.array([0.0, 0.0, 0.0])
    n = 1024
    # majority side: origins scattered around (0, 0, -3), aiming at the
    # light — these dominate the tile's mean direction (axis ≈ -z after
    # the converging flip)
    o = rng.normal(scale=0.3, size=(n, 3)) + np.array([0.0, 0.0, -3.0])
    # far side: 48 lanes at (2, 0, 3) — OPPOSITE side of the light along
    # the axis (o_par < 0), each blocked by an occluder at the segment
    # midpoint (1, 0, 1.5), laterally 1.0 off the light axis
    far = np.arange(0, 48)
    o[far] = np.array([2.0, 0.0, 3.0]) + rng.normal(scale=0.05,
                                                    size=(48, 3))
    diff = light - o
    dist = np.linalg.norm(diff, axis=-1)
    d = diff / dist[:, None]
    rays = ft.types.Rays(
        origin=jnp.asarray(o, jnp.float32),
        direction=jnp.asarray(d, jnp.float32),
        length=jnp.asarray(dist, jnp.float32),
        epsilon=jnp.full((n,), 0.01, jnp.float32))
    # scene: 97 spheres in one union group (⇒ a culled pair); most far
    # away, plus a fat occluder on the far-side lanes' segments and one
    # decoy near the majority origins — WITHOUT it the root bound misses
    # the majority lanes entirely, bound-skip deactivates them, and the
    # tile cone collapses to the far side (no straddling ⇒ no repro)
    spheres = [ft.sphere(tuple(c), 0.4) for c in
               rng.normal(scale=0.5, size=(95, 3)) + np.array([8.0, 8.0, 8.0])]
    spheres.append(ft.sphere((1.0, 0.0, 1.5), 0.45))
    spheres.append(ft.sphere((-1.2, 0.0, -2.5), 0.3))
    scene = ft.flatten(ft.Scene(root=ft.union(*spheres)))
    cfg = MarchConfig(backend="pallas_interpret", max_steps=192,
                      cull=True, cull_threshold=64, cull_m=128)
    occ_plain = np.asarray(march_occlusion(scene, rays, cfg))
    occ_conv = np.asarray(
        march_occlusion(scene, rays, cfg, cone_apex=jnp.asarray(light)))
    assert occ_plain[far].all(), "sanity: far-side lanes must be occluded"
    # deep (non-grazing) occlusions: the converging path must agree exactly
    np.testing.assert_array_equal(occ_conv[far], occ_plain[far])


def test_surface_max_group_excluded_member_floor():
    """Slot-mode surface pass on a scene where a culled intersect group has
    cone-EXCLUDED members at the hit tiles (advisor r4 high): the scanned
    group max underestimates the true max (can go negative inside the
    scanned members) and without the excluded-member floor it wrongly wins
    the union against the sphere the rays actually hit — flipping 100% of
    normals.  The floor (2·eps, code 0) restores exact parity with the
    dense reference."""
    from fraytracer_tpu.ops import sdf
    from fraytracer_tpu.ops.march import march_surface
    from fraytracer_tpu.ops.pallas.march_kernel import _cull_pairs
    rng = np.random.default_rng(5)
    # 256 fat spheres all containing the origin region (their pairwise
    # intersection covers the unit ball) + 8 far members that empty the
    # intersection and are cone-excluded at the camera tiles.  256 is a
    # CAND_UNROLL multiple, so the scan stops exactly at the candidates.
    members = [ft.sphere(tuple(c), 2.0) for c in
               rng.uniform(-0.3, 0.3, size=(256, 3))]
    members += [ft.sphere(tuple(c), 1.0) for c in
                rng.normal(scale=0.5, size=(8, 3)) + 40.0]
    target = ft.sphere((0, 0, 0), 1.0, material=ft.solid(0.9, 0.2, 0.1))
    scene = ft.flatten(ft.Scene(root=ft.union(
        ft.intersect(*members), target)))
    pairs = _cull_pairs(scene.kind_counts, scene.plan, 192)
    assert any(p[4] - p[3] == 264 for p in pairs), \
        "the 264-member intersect must form a cull pair"
    rays = flat_camera_rays(32, 32, pos=(0, 0, -6))
    cfg = MarchConfig(backend="pallas_interpret", max_steps=192,
                      cull=True, cull_threshold=192, cull_m=512)
    res, nrm, midx = march_surface(scene, rays, cfg)
    h = np.asarray(res.hit)
    assert h.mean() > 0.05, "sanity: rays must hit the target sphere"
    pos = rays.at(res.t - rays.epsilon)
    n_ref = np.asarray(sdf.scene_normal(scene, pos))
    m_ref, _ = sdf.material_at(scene, pos)
    assert np.abs(np.asarray(nrm) - n_ref)[h].max() < 1e-3
    assert (np.asarray(midx)[h] == np.asarray(m_ref)[h]).all()


def test_occlusion_block_sort_pure_permutation():
    """Block-granular shadow re-tiling (shadow_block_sort) is a pure
    permutation of lanes: the hit set must equal the unsorted call's
    exactly, for active sets that leave whole blocks dead (compaction
    side effect) and spread origins (depth along the light axis)."""
    from fraytracer_tpu.ops.march import march_occlusion
    scene = ft.flatten(torus_csg_scene(seed=19, n_tori=96))
    rng = np.random.default_rng(9)
    n = 4096  # 4 blocks of 1024
    ldir = np.array([0.3, 0.9, 0.2])
    ldir /= np.linalg.norm(ldir)
    o = rng.normal(scale=1.5, size=(n, 3))
    act = rng.uniform(size=n) > 0.3
    act[1024:2048] = False  # one fully dead block
    rays = ft.types.Rays(
        origin=jnp.asarray(o, jnp.float32),
        direction=jnp.broadcast_to(jnp.asarray(ldir, jnp.float32), (n, 3)),
        length=jnp.asarray(np.where(act, 25.0, 0.0), jnp.float32),
        epsilon=jnp.full((n,), 0.01, jnp.float32))
    akey = jnp.asarray(o @ ldir, jnp.float32)
    import dataclasses as dc
    base = MarchConfig(backend="pallas_interpret", max_steps=192,
                       cull=True, cull_threshold=64, cull_m=128)
    off = np.asarray(march_occlusion(
        scene, rays, dc.replace(base, shadow_block_sort=False,
                                shadow_block_compact=False),
        axial_key=akey))
    for kw in (dict(shadow_block_sort=True, shadow_block_compact=False),
               dict(shadow_block_sort=False, shadow_block_compact=True)):
        on = np.asarray(march_occlusion(
            scene, rays, dc.replace(base, **kw), axial_key=akey))
        assert off.sum() > 0, "sanity: some occlusions"
        np.testing.assert_array_equal(on, off, kw)


def test_intersect_cull_with_smooth_union_coexists():
    """VERDICT r4 #7: a scene mixing a large intersect group with a smooth
    union must still cull the intersect (no silent dense fallback) — the
    AD-mode surface pass now has a max-window variant.  Exact march parity
    with the jnp backend plus surface normal/material parity at hits."""
    from fraytracer_tpu.ops import sdf
    from fraytracer_tpu.ops.march import march_surface
    from fraytracer_tpu.ops.pallas.march_kernel import _cull_pairs
    rng = np.random.default_rng(13)
    members = [
        ft.sphere(tuple(c), 2.0, material=ft.solid(0.2, 0.6, 0.9))
        for c in rng.uniform(-0.4, 0.4, size=(256, 3))
    ]
    scene = ft.flatten(ft.Scene(root=ft.union(
        ft.intersect(*members),
        ft.smooth_union(0.3,
                        ft.sphere((2.4, 0.0, 0.0), 0.7,
                                  material=ft.solid(0.9, 0.5, 0.1)),
                        ft.sphere((2.9, 0.5, 0.0), 0.5)),
    ), background=(0.1, 0.1, 0.1)))
    pairs = _cull_pairs(scene.kind_counts, scene.plan, 192)
    assert any(p[4] - p[3] == 256 for p in pairs), \
        "the intersect group must cull despite the smooth union (AD mode)"
    rays = flat_camera_rays(32, 32, pos=(0, 0, -6))
    cfg_j = MarchConfig(backend="jnp", max_steps=192)
    cfg_p = MarchConfig(backend="pallas_interpret", max_steps=192,
                        cull=True, cull_threshold=192, cull_m=512)
    r_j = march(scene, rays, cfg_j)
    r_p = march(scene, rays, cfg_p)
    hits = np.asarray(r_j.hit)
    assert hits.mean() > 0.1
    np.testing.assert_array_equal(hits, np.asarray(r_p.hit))
    np.testing.assert_allclose(np.asarray(r_p.t)[hits],
                               np.asarray(r_j.t)[hits], atol=2e-6)
    res, nrm, midx = march_surface(scene, rays, cfg_p)
    pos = rays.at(res.t - rays.epsilon)
    n_ref = np.asarray(sdf.scene_normal(scene, pos))
    m_ref, _ = sdf.material_at(scene, pos)
    h = np.asarray(res.hit)
    assert np.abs(np.asarray(nrm) - n_ref)[h].max() < 1e-3
    assert (np.asarray(midx)[h] == np.asarray(m_ref)[h]).all()


def test_early_out_exact_parity():
    """The strided running-min early-out (cull_early_out, EO_STRIDE
    chunks per sync) only skips chunks that provably cannot change the
    group min — hits and distances must match the un-early-out march
    exactly, including overshoot reads clamped to the last chunk."""
    import dataclasses as dc
    scene = ft.flatten(torus_csg_scene(seed=19, n_tori=96))
    rays = flat_camera_rays(48, 48)
    base = MarchConfig(backend="pallas_interpret", max_steps=192,
                       cull=True, cull_threshold=64, cull_m=128,
                       relax_omega=1.4)
    off = march(scene, rays, dc.replace(base, cull_early_out=False))
    on = march(scene, rays, dc.replace(base, cull_early_out=True))
    np.testing.assert_array_equal(np.asarray(off.hit), np.asarray(on.hit))
    h = np.asarray(off.hit)
    np.testing.assert_allclose(np.asarray(on.t)[h], np.asarray(off.t)[h],
                               atol=1e-6)
