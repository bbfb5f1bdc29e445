"""CSG combinator identities and oracle parity (SURVEY.md §4.1):
union = min, intersect = max, subtract = max(a, -b) (SdfForm.fs:42-67),
smooth union = -k·log Σ exp(-d/k) (SdfForm.fs:69-91)."""
import numpy as np
import jax.numpy as jnp
import pytest

import fraytracer_tpu as ft
from fraytracer_tpu.oracle.cpu_ref import build_distance

A = ft.sphere((0, 0, 0), 1.0)
B = ft.sphere((1.2, 0, 0), 0.8)
C = ft.box((0, 1, 0), (0.5, 0.5, 0.5), 0.1)


def dist(node, pts):
    flat = ft.flatten(ft.Scene(root=node))
    return np.asarray(ft.scene_distance(flat, jnp.asarray(pts, jnp.float32)))


@pytest.fixture
def pts(rng):
    return rng.uniform(-3, 3, size=(128, 3)).astype(np.float32)


def test_union_is_min(pts):
    got = dist(ft.union(A, B, C), pts)
    want = np.minimum(dist(A, pts), np.minimum(dist(B, pts), dist(C, pts)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_intersect_is_max(pts):
    got = dist(ft.intersect(A, B, C), pts)
    want = np.maximum(dist(A, pts), np.maximum(dist(B, pts), dist(C, pts)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_subtract_is_max_a_negb(pts):
    got = dist(ft.subtract(A, B), pts)
    want = np.maximum(dist(A, pts), -dist(B, pts))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_union_of_one_is_identity(pts):
    np.testing.assert_allclose(dist(ft.union(A), pts), dist(A, pts))


def test_nested_unions_flatten(pts):
    nested = ft.union(ft.union(A, B), C)
    flat_node = ft.union(A, B, C)
    np.testing.assert_allclose(dist(nested, pts), dist(flat_node, pts),
                               atol=1e-6)


def test_smooth_union_bounds(pts):
    """Smooth min undershoots hard min by at most k·log(n)."""
    k = 0.2
    got = dist(ft.smooth_union(k, A, B, C), pts)
    hard = np.minimum(dist(A, pts), np.minimum(dist(B, pts), dist(C, pts)))
    assert np.all(got <= hard + 1e-5)
    assert np.all(got >= hard - k * np.log(3.0) - 1e-5)


def test_mixed_tree_matches_oracle(pts):
    """Deep mixed CSG tree: JAX eval == scalar oracle closure tree."""
    node = ft.subtract(
        ft.intersect(
            ft.union(A, B, ft.smooth_union(0.3, C,
                                           ft.sphere((0, -1, 0), 0.7))),
            ft.sphere((0, 0, 0), 2.5),
        ),
        ft.torus((0, 0, 0), (0, 0, 1), 1.5, 0.4),
    )
    oracle_fn = build_distance(node)
    want = np.array([oracle_fn(p.astype(np.float64)) for p in pts])
    np.testing.assert_allclose(dist(node, pts), want, atol=2e-5)


def test_operator_sugar(pts):
    np.testing.assert_allclose(dist(A | B, pts), dist(ft.union(A, B), pts))
    np.testing.assert_allclose(dist(A & B, pts), dist(ft.intersect(A, B), pts))
    np.testing.assert_allclose(dist(A - B, pts), dist(ft.subtract(A, B), pts))
