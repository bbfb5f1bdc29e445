"""End-to-end render tests: full image vs the scalar float64 oracle
(SURVEY.md §4.3, BASELINE correctness gate: allclose pre-quantization)."""
import numpy as np
import jax
import jax.numpy as jnp

import fraytracer_tpu as ft
from fraytracer_tpu.oracle.cpu_ref import Oracle
from fraytracer_tpu.ops.march import MarchConfig


def small_scene():
    return ft.Scene(
        root=ft.subtract(
            ft.intersect(
                ft.union(
                    ft.sphere((0, 0, 0), 1.0, material=ft.solid(0.8, 0.2, 0.2)),
                    ft.torus((0.7, 0.2, 0), (0.3, 1, 0), 0.8, 0.25,
                             material=ft.solid(0.2, 0.7, 0.3)),
                    ft.box((-0.8, -0.4, 0.3), (0.4, 0.4, 0.4), 0.1,
                           material=ft.solid(0.2, 0.3, 0.9)),
                ),
                ft.sphere((0, 0, 0), 1.6),
            ),
            ft.sphere((0.4, 0.6, -0.9), 0.6),
        ),
        background=(0.1, 0.1, 0.1),
        lights=(
            ft.directional_light((-0.5, -1, 1), (0.5, 0.5, 0.5)),
            ft.point_light((-0.5, 0, -2), (10.0, 0.0, 0.0)),
        ),
    )


def test_image_allclose_oracle():
    """The BASELINE gate: rendered float image ≈ scalar oracle (atol 1e-5
    where both agree on hit/miss; a tiny fraction of edge pixels may resolve
    differently in f32 vs f64 — bounded below)."""
    scene = small_scene()
    W = H = 48
    cfg = ft.RenderConfig(width=W, height=H, epsilon=0.01, length=30.0,
                          march=MarchConfig(bound_skip=False, max_steps=512))
    img = np.asarray(ft.render(ft.flatten(scene),
                               ft.look_at((0, 0, -10), (0, 0, 0),
                                          fov_degrees=60.0), cfg))
    want = Oracle(scene).render((0, 0, -10), (0, 0, 0), fov_degrees=60.0,
                                width=W, height=H, epsilon=0.01, length=30.0)
    diff = np.abs(img - want).max(axis=-1)
    # all but a small fraction of pixels match to high precision
    frac_loose = float((diff > 1e-4).mean())
    assert frac_loose < 0.02, f"{frac_loose:.3f} of pixels off (f32/f64 edges)"
    # and the median error is at reference atol
    assert float(np.median(diff)) < 1e-5


def test_render_is_deterministic():
    scene = ft.flatten(small_scene())
    cam = ft.look_at((0, 0, -10), (0, 0, 0))
    cfg = ft.RenderConfig(width=32, height=32)
    a = np.asarray(ft.render(scene, cam, cfg))
    b = np.asarray(ft.render(scene, cam, cfg))
    np.testing.assert_array_equal(a, b)


def test_background_on_empty_scene():
    scene = ft.Scene(root=ft.sphere((100, 100, 100), 0.1),
                     background=(0.25, 0.5, 0.75))
    img = np.asarray(ft.render(ft.flatten(scene),
                               ft.look_at((0, 0, -5), (0, 0, 0)),
                               ft.RenderConfig(width=8, height=8)))
    np.testing.assert_allclose(img, np.broadcast_to([0.25, 0.5, 0.75],
                                                    (8, 8, 3)), atol=1e-6)


def test_orthographic_render():
    """BASELINE config 1: single sphere, lambertian, orthographic."""
    scene = ft.Scene(
        root=ft.sphere((0, 0, 0), 1.0, material=ft.solid(0.9, 0.9, 0.9)),
        background=(0.0, 0.0, 0.0),
        lights=(ft.directional_light((0, 0, 1), (1.0, 1.0, 1.0)),),
    )
    cam = ft.look_at((0, 0, -5), (0, 0, 0), ortho_scale=4.0)
    img = np.asarray(ft.render(ft.flatten(scene),
                               cam, ft.RenderConfig(width=64, height=64)))
    center = img[32, 32]
    corner = img[0, 0]
    assert center[0] > 0.1          # lit sphere in the middle
    np.testing.assert_allclose(corner, 0.0, atol=1e-6)  # background corner
    # orthographic sphere silhouette: radius 1, image spans ±ortho_scale=±4
    # → pi r² / 64 of pixels are hits
    hit_frac = float((img[..., 0] > 0.01).mean())
    assert abs(hit_frac - np.pi / 64) < 0.02


def test_aspect_nonsquare():
    scene = ft.flatten(small_scene())
    cam = ft.look_at((0, 0, -10), (0, 0, 0))
    img = np.asarray(ft.render(scene, cam,
                               ft.RenderConfig(width=64, height=32)))
    assert img.shape == (32, 64, 3)
