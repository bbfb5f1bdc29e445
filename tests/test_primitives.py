"""Unit tests: each primitive SDF vs closed-form values and the scalar
oracle (SURVEY.md §4.1)."""
import numpy as np
import jax.numpy as jnp
import pytest

import fraytracer_tpu as ft
from fraytracer_tpu.oracle.cpu_ref import build_distance


def eval_one(prim, pts):
    flat = ft.flatten(ft.Scene(root=prim))
    return np.asarray(ft.scene_distance(flat, jnp.asarray(pts, jnp.float32)))


def test_sphere_closed_form():
    s = ft.sphere((1.0, 2.0, 3.0), 0.5)
    pts = np.array([[1, 2, 3], [1, 2, 4], [1, 2.5, 3]], np.float32)
    d = eval_one(s, pts)
    np.testing.assert_allclose(d, [-0.5, 0.5, 0.0], atol=1e-6)


def test_capsule_closed_form():
    c = ft.capsule((0, 0, 0), (2, 0, 0), 0.25)
    pts = np.array([
        [1, 0, 0],      # on axis middle: -0.25
        [1, 1, 0],      # 1 above axis: 0.75
        [3, 0, 0],      # 1 beyond end: 0.75
        [-1, 0, 0],     # 1 before start: 0.75
    ], np.float32)
    np.testing.assert_allclose(eval_one(c, pts), [-0.25, 0.75, 0.75, 0.75],
                               atol=1e-6)


def test_torus_closed_form():
    t = ft.torus((0, 0, 0), (0, 1, 0), 1.0, 0.25)
    pts = np.array([
        [1, 0, 0],       # on the major circle: -0.25
        [0, 0, 0],       # center: 1 - 0.25
        [2, 0, 0],       # 1 outside circle: 0.75
        [1, 0.25, 0],    # on the surface above circle: 0
    ], np.float32)
    np.testing.assert_allclose(eval_one(t, pts), [-0.25, 0.75, 0.75, 0.0],
                               atol=1e-6)


def test_box_closed_form():
    b = ft.box((0, 0, 0), (1, 2, 3))
    pts = np.array([
        [0, 0, 0],    # inside: -min(half) = -1
        [2, 0, 0],    # 1 outside +x face
        [1, 2, 3],    # corner: 0
        [3, 4, 3],    # outside corner: sqrt(4+4)=2.828
    ], np.float32)
    np.testing.assert_allclose(
        eval_one(b, pts), [-1.0, 1.0, 0.0, np.sqrt(8.0)], atol=1e-5)


def test_plane_closed_form():
    p = ft.plane((0, 1, 0), 2.0)
    pts = np.array([[0, 3, 0], [5, 2, -7], [0, 0, 0]], np.float32)
    np.testing.assert_allclose(eval_one(p, pts), [1.0, 0.0, -2.0], atol=1e-6)


def test_cone_closed_form():
    # cylinder special case: ra == rb
    c = ft.cone((0, 0, 0), (0, 2, 0), 0.5, 0.5)
    pts = np.array([
        [0, 1, 0],     # axis middle: -0.5
        [1.5, 1, 0],   # 1 outside side
        [0, 3, 0],     # 1 above top cap
    ], np.float32)
    np.testing.assert_allclose(eval_one(c, pts), [-0.5, 1.0, 1.0], atol=1e-5)


def test_triangle_closed_form():
    t = ft.triangle((0, 0, 0), (2, 0, 0), (0, 2, 0), 0.1)
    pts = np.array([
        [0.5, 0.5, 0],   # on the face plane: -0.1
        [0.5, 0.5, 1],   # 1 above face
        [-1, 0, 0],      # 1 from vertex v1
    ], np.float32)
    np.testing.assert_allclose(eval_one(t, pts), [-0.1, 0.9, 0.9], atol=1e-5)


@pytest.mark.parametrize("prim", [
    ft.sphere((0.3, -0.2, 0.5), 0.7),
    ft.capsule((-1, 0, 0), (1, 0.5, 0.3), 0.3),
    ft.torus((0.1, 0.2, -0.3), (1, 2, 0.5), 0.8, 0.2),
    ft.triangle((0, 0, 0), (1, 0.2, 0), (0.3, 1, 0.5), 0.15),
    ft.box((0.2, -0.1, 0.4), (0.5, 0.8, 0.3), 0.05),
    ft.cone((0, -1, 0), (0.2, 1, 0.1), 0.6, 0.2),
    ft.plane((0.3, 1, -0.2), 0.4),
])
def test_matches_oracle(prim, rng):
    """JAX batched distance == scalar oracle closure at random points."""
    oracle_fn = build_distance(prim)
    pts = rng.uniform(-3, 3, size=(64, 3))
    want = np.array([oracle_fn(p) for p in pts])
    got = eval_one(prim, pts.astype(np.float32))
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("prim", [
    ft.sphere((0.3, -0.2, 0.5), 0.7),
    ft.capsule((-1, 0, 0), (1, 0.5, 0.3), 0.3),
    ft.torus((0.1, 0.2, -0.3), (0, 1, 0), 0.8, 0.2),
    ft.box((0.2, -0.1, 0.4), (0.5, 0.8, 0.3), 0.05),
    ft.cone((0, -1, 0), (0.2, 1, 0.1), 0.6, 0.2),
])
def test_lipschitz(prim, rng):
    """SDFs are 1-Lipschitz — required for sphere-tracing correctness."""
    pts = rng.uniform(-3, 3, size=(128, 3)).astype(np.float32)
    d = eval_one(prim, pts)
    for _ in range(3):
        step = rng.normal(size=(128, 3)).astype(np.float32)
        step /= np.linalg.norm(step, axis=-1, keepdims=True)
        eps = rng.uniform(0.01, 0.5, size=(128, 1)).astype(np.float32)
        d2 = eval_one(prim, pts + step * eps)
        assert np.all(np.abs(d2 - d) <= eps[:, 0] + 1e-4)


def test_normals_unit(rng):
    """Analytic normals are unit length everywhere off-surface."""
    s = ft.Scene(root=ft.union(
        ft.sphere((0, 0, 0), 1.0),
        ft.torus((1, 0, 0), (0, 1, 0), 0.8, 0.2),
        ft.box((-1, 0.5, 0), (0.4, 0.4, 0.4), 0.1),
    ))
    flat = ft.flatten(s)
    pts = rng.uniform(-3, 3, size=(256, 3)).astype(np.float32)
    n = np.asarray(ft.scene_normal(flat, jnp.asarray(pts)))
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-3)
