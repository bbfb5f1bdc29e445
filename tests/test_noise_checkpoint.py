"""Procedural noise (Spline.fs/Noise.fs parity-of-capability) and scene
checkpoint round-trip tests."""
import numpy as np
import jax
import jax.numpy as jnp

import fraytracer_tpu as ft
from fraytracer_tpu.scene.generators import torus_csg_scene
from fraytracer_tpu.utils.checkpoint import load_scene, save_scene
from fraytracer_tpu.utils.noise import (catmull_rom_1d, fbm, gradient_noise,
                                        value_noise)


def test_catmull_rom_interpolates_knots():
    knots = jnp.asarray([0.0, 1.0, 4.0, 9.0, 16.0])
    for i in range(5):
        np.testing.assert_allclose(float(catmull_rom_1d(knots, float(i))),
                                   float(knots[i]), atol=1e-6)
    # midpoint between knots lies between them
    mid = float(catmull_rom_1d(knots, 1.5))
    assert 1.0 < mid < 4.0


def test_value_noise_range_and_determinism(rng):
    p = jnp.asarray(rng.uniform(-10, 10, (256, 3)), jnp.float32)
    a = np.asarray(value_noise(p))
    b = np.asarray(value_noise(p))
    np.testing.assert_array_equal(a, b)
    assert a.min() >= -1.0 - 1e-5 and a.max() <= 1.0 + 1e-5
    assert a.std() > 0.1  # not constant


def test_gradient_noise_zero_at_lattice():
    """Gradient noise vanishes at integer lattice points."""
    pts = jnp.asarray(np.mgrid[0:3, 0:3, 0:3].reshape(3, -1).T, jnp.float32)
    v = np.asarray(gradient_noise(pts))
    np.testing.assert_allclose(v, 0.0, atol=1e-6)


def test_noise_is_differentiable():
    g = jax.grad(lambda p: jnp.sum(gradient_noise(p)))(
        jnp.asarray([[0.3, 0.7, 1.2]], jnp.float32))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_fbm_smoother_with_gain():
    p = jnp.asarray(np.linspace(0, 8, 512)[:, None] * [1, 0, 0], jnp.float32)
    v = np.asarray(fbm(p, octaves=4))
    assert np.isfinite(v).all()
    assert v.std() > 0.05


def test_checkpoint_roundtrip(tmp_path):
    scene = ft.flatten(torus_csg_scene(seed=19, n_tori=24))
    path = str(tmp_path / "scene.npz")
    save_scene(path, scene)
    loaded = load_scene(path)

    assert loaded.plan == scene.plan
    assert loaded.kind_counts == scene.kind_counts
    assert loaded.prim_material == scene.prim_material
    for k, _ in scene.kind_counts:
        np.testing.assert_array_equal(np.asarray(loaded.prim_params[k]),
                                      np.asarray(scene.prim_params[k]))

    # renders identically
    cam = ft.look_at((0, 0, -10), (0, 0, 0))
    cfg = ft.RenderConfig(width=16, height=16)
    np.testing.assert_array_equal(
        np.asarray(ft.render(scene, cam, cfg)),
        np.asarray(ft.render(loaded, cam, cfg)))


def test_procedural_material_varies_spatially():
    """Procedural material albedo varies across the surface and stays a
    blend of the two endpoint colors."""
    scene = ft.flatten(ft.Scene(
        root=ft.plane((0, 0, -1), -2.0,
                      material=ft.procedural((1, 0, 0), (0, 0, 1),
                                             scale=3.0)),
        background=(0, 0, 0),
        lights=(ft.directional_light((0, 0, 1), (3.0, 3.0, 3.0)),),
    ))
    cam = ft.look_at((0, 0, -6), (0, 0, 0))
    img = np.asarray(ft.render(scene, cam, ft.RenderConfig(
        width=48, height=48, length=20.0)))
    # red and blue channels anti-correlated (blend), with real variation
    r, b = img[..., 0].ravel(), img[..., 2].ravel()
    assert r.std() > 0.01 and b.std() > 0.01
    assert np.corrcoef(r, b)[0, 1] < -0.5
