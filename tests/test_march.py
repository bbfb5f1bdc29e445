"""March semantics: analytic hit distances, budget misses, bound-skip
equivalence (SURVEY.md §4.2 golden/property tests)."""
import numpy as np
import jax.numpy as jnp

import fraytracer_tpu as ft
from fraytracer_tpu.ops.march import MarchConfig, march


def unit_sphere_scene(r=1.0):
    return ft.flatten(ft.Scene(root=ft.sphere((0, 0, 0), r,
                                              material=ft.solid(1, 1, 1))))


def test_hit_distance_matches_analytic():
    """Sphere-trace hit t vs analytic ray-sphere intersection: t* = |o| - r,
    converged to within epsilon."""
    flat = unit_sphere_scene()
    eps = 1e-4
    rays = ft.make_rays(
        origin=np.array([[0, 0, -5.0], [0, 0.5, -5.0]]),
        direction=np.array([[0, 0, 1.0], [0, 0, 1.0]]),
        length=100.0, epsilon=eps)
    res = march(flat, rays, MarchConfig(bound_skip=False, max_steps=256))
    assert bool(res.hit[0]) and bool(res.hit[1])
    np.testing.assert_allclose(float(res.t[0]), 4.0, atol=2 * eps)
    # second ray hits at z = -sqrt(1 - 0.25)
    np.testing.assert_allclose(float(res.t[1]), 5 - np.sqrt(0.75), atol=2e-3)


def test_miss_goes_inactive():
    flat = unit_sphere_scene()
    rays = ft.make_rays([0, 0, -5.0], [0, 1.0, 0], 100.0, 1e-4)
    res = march(flat, rays, MarchConfig(bound_skip=False))
    assert not bool(res.hit)


def test_budget_exhaustion_is_miss():
    """Reference semantics: Length budget exhausts → miss (SdfForm.fs:94)."""
    flat = unit_sphere_scene()
    rays = ft.make_rays([0, 0, -5.0], [0, 0, 1.0], 3.0, 1e-4)
    res = march(flat, rays, MarchConfig(bound_skip=False))
    assert not bool(res.hit)
    # ...but a budget that reaches the surface hits
    rays2 = ft.make_rays([0, 0, -5.0], [0, 0, 1.0], 4.5, 1e-4)
    assert bool(march(flat, rays2, MarchConfig(bound_skip=False)).hit)


def test_zero_budget_is_miss():
    flat = unit_sphere_scene()
    rays = ft.make_rays([0, 0, -5.0], [0, 0, 1.0], 0.0, 1e-4)
    assert not bool(march(flat, rays).hit)


def test_bound_skip_equivalent(rng):
    """bound_skip fast-forward must not change hit/miss or hit distance."""
    scene = ft.Scene(root=ft.union(
        ft.sphere((0, 0, 0), 1.0, material=ft.solid(1, 0, 0)),
        ft.torus((1, 0.5, 0), (0, 1, 0), 0.8, 0.2,
                 material=ft.solid(0, 1, 0)),
    ))
    flat = ft.flatten(scene)
    n = 256
    origin = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    origin[:, 2] = -8.0
    target = rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    target[:, 2] = 0
    d = target - origin
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = ft.make_rays(origin, d, 30.0, 1e-3)

    r_skip = march(flat, rays, MarchConfig(bound_skip=True))
    r_ref = march(flat, rays, MarchConfig(bound_skip=False))
    np.testing.assert_array_equal(np.asarray(r_skip.hit),
                                  np.asarray(r_ref.hit))
    hits = np.asarray(r_ref.hit)
    np.testing.assert_allclose(np.asarray(r_skip.t)[hits],
                               np.asarray(r_ref.t)[hits], atol=5e-3)
    # skip must not be slower in steps
    assert int(jnp.max(r_skip.steps)) <= int(jnp.max(r_ref.steps))


def test_inside_start_hits_immediately():
    flat = unit_sphere_scene()
    rays = ft.make_rays([0, 0, 0.0], [0, 0, 1.0], 10.0, 1e-3)
    res = march(flat, rays, MarchConfig(bound_skip=False))
    assert bool(res.hit)
    np.testing.assert_allclose(float(res.t), 0.0, atol=1e-6)


def test_oracle_march_parity(rng):
    """Batch march t agrees with the scalar oracle march."""
    from fraytracer_tpu.oracle.cpu_ref import Oracle
    scene = ft.Scene(root=ft.subtract(
        ft.sphere((0, 0, 0), 1.5, material=ft.solid(1, 1, 1)),
        ft.sphere((0.5, 0.5, -0.8), 0.8)))
    flat = ft.flatten(scene)
    oracle = Oracle(scene)
    n = 64
    o = np.tile(np.array([0, 0, -6.0]), (n, 1))
    tgt = rng.uniform(-1.2, 1.2, (n, 3))
    tgt[:, 2] = 0
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    eps = 1e-3
    rays = ft.make_rays(o.astype(np.float32), d.astype(np.float32), 30.0, eps)
    res = march(flat, rays, MarchConfig(bound_skip=False))
    for i in range(n):
        hit, t = oracle.march(o[i], d[i], eps, 30.0)
        assert hit == bool(res.hit[i]), i
        if hit:
            np.testing.assert_allclose(float(res.t[i]), t, atol=5e-3)
