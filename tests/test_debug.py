"""Scene validation and NaN-guard tests (SURVEY.md §5)."""
import numpy as np
import jax.numpy as jnp

import fraytracer_tpu as ft
from fraytracer_tpu.scene.generators import torus_csg_scene
from fraytracer_tpu.utils.debug import validate_scene


def test_valid_scene_passes():
    assert validate_scene(ft.flatten(torus_csg_scene(seed=19,
                                                     n_tori=16))) == []


def test_bad_radius_detected():
    scene = ft.flatten(ft.Scene(root=ft.sphere((0, 0, 0), 1.0)))
    bad = scene.replace(prim_params={
        "sphere": scene.prim_params["sphere"].at[0, 3].set(-1.0)})
    assert any("radius" in p for p in validate_scene(bad))


def test_nonfinite_detected():
    scene = ft.flatten(ft.Scene(root=ft.sphere((0, 0, 0), 1.0)))
    bad = scene.replace(mat_albedo=scene.mat_albedo.at[0, 0].set(jnp.nan))
    assert any("mat_albedo" in p for p in validate_scene(bad))


def test_degenerate_axis_detected():
    scene = ft.flatten(ft.Scene(root=ft.torus((0, 0, 0), (0, 1, 0),
                                              1.0, 0.25)))
    bad = scene.replace(prim_params={
        "torus": scene.prim_params["torus"].at[0, 3:6].set(0.0)})
    assert any("axis" in p for p in validate_scene(bad))


def test_render_produces_no_nans():
    """Mask-correctness smoke: a full render of the benchmark scene is
    finite everywhere (inactive-lane masking never leaks NaN/Inf)."""
    scene = ft.flatten(torus_csg_scene(seed=19, n_tori=48))
    cam = ft.look_at((0, 0, -10), (0, 0, 0))
    img = np.asarray(ft.render(scene, cam,
                               ft.RenderConfig(width=48, height=48)))
    assert np.isfinite(img).all()
