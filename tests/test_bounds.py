"""Bounding-sphere algebra invariants (SdfBoundary.fs:7-63 semantics):
bounds actually bound the SDFs, and the root bound contains the surface."""
import numpy as np
import jax.numpy as jnp
import pytest

import fraytracer_tpu as ft
from fraytracer_tpu.ops import sdf
from fraytracer_tpu.scene.generators import torus_csg_scene

PRIMS = [
    ft.sphere((0.3, -0.2, 0.5), 0.7),
    ft.capsule((-1, 0, 0), (1, 0.5, 0.3), 0.3),
    ft.torus((0.1, 0.2, -0.3), (1, 2, 0.5), 0.8, 0.2),
    ft.triangle((0, 0, 0), (1, 0.2, 0), (0.3, 1, 0.5), 0.15),
    ft.box((0.2, -0.1, 0.4), (0.5, 0.8, 0.3), 0.05),
    ft.cone((0, -1, 0), (0.2, 1, 0.1), 0.6, 0.2),
]


@pytest.mark.parametrize("prim", PRIMS)
def test_prim_bound_is_lower_bound(prim, rng):
    """getMinDistance-style property (SdfBoundary.fs:58-61): for any point,
    distance-to-bound ≤ true SDF (nothing of the prim lies outside)."""
    flat = ft.flatten(ft.Scene(root=prim))
    pb = np.asarray(sdf.prim_bounds(flat))[0]
    pts = rng.uniform(-4, 4, size=(256, 3)).astype(np.float32)
    d = np.asarray(ft.scene_distance(flat, jnp.asarray(pts)))
    lower = np.linalg.norm(pts - pb[0:3], axis=-1) - pb[3]
    assert np.all(d >= lower - 1e-4)


def test_root_bound_contains_surface(rng):
    """Sampled near-surface points of the benchmark scene lie inside the
    root bound."""
    flat = ft.flatten(torus_csg_scene(seed=19, n_tori=64))
    bound = np.asarray(sdf.root_bound(flat))
    pts = rng.uniform(-4, 4, size=(2048, 3)).astype(np.float32)
    d = np.asarray(ft.scene_distance(flat, jnp.asarray(pts)))
    inside_scene = pts[d < 0.0]
    assert len(inside_scene) > 0
    dist_to_bound = np.linalg.norm(inside_scene - bound[0:3], axis=-1)
    assert np.all(dist_to_bound <= bound[3] + 1e-3)


def test_union_bound_contains_children():
    a = ft.sphere((0, 0, 0), 1.0)
    b = ft.sphere((3, 0, 0), 0.5)
    flat = ft.flatten(ft.Scene(root=ft.union(a, b)))
    bound = np.asarray(sdf.root_bound(flat))
    pb = np.asarray(sdf.prim_bounds(flat))
    for row in pb:
        # child fully inside parent: |c_child - c| + r_child <= R
        assert (np.linalg.norm(row[0:3] - bound[0:3]) + row[3]
                <= bound[3] + 1e-5)


def test_subtract_bound_is_a_bound():
    flat = ft.flatten(ft.Scene(root=ft.subtract(
        ft.sphere((0, 0, 0), 1.0), ft.sphere((0.5, 0, 0), 0.5))))
    bound = np.asarray(sdf.root_bound(flat))
    np.testing.assert_allclose(bound, [0, 0, 0, 1.0], atol=1e-6)


def test_intersect_bound_conservative():
    flat = ft.flatten(ft.Scene(root=ft.intersect(
        ft.sphere((0, 0, 0), 2.0), ft.sphere((1, 0, 0), 0.5))))
    bound = np.asarray(sdf.root_bound(flat))
    # conservative: smallest child
    np.testing.assert_allclose(bound, [1, 0, 0, 0.5], atol=1e-6)


def test_bound_min_distance_property(rng):
    flat = ft.flatten(torus_csg_scene(seed=19, n_tori=32))
    bound = sdf.root_bound(flat)
    pts = rng.uniform(-8, 8, size=(512, 3)).astype(np.float32)
    d = np.asarray(ft.scene_distance(flat, jnp.asarray(pts)))
    lb = np.asarray(sdf.bound_min_distance(bound, jnp.asarray(pts)))
    assert np.all(d >= lb - 1e-3)
