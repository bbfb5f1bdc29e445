"""Camera geometry tests (Camera.fs:33-54 semantics with the degree/tan
fixes documented in camera.py)."""
import math

import numpy as np
import jax.numpy as jnp

import fraytracer_tpu as ft
from fraytracer_tpu.camera import camera_rays, look_at


def test_center_ray_is_forward():
    cam = look_at((0, 0, -10), (0, 0, 0), fov_degrees=60)
    rays = camera_rays(cam, 65, 65, 0.01, 30.0)  # odd size → exact center
    center = np.asarray(rays.direction[32, 32])
    np.testing.assert_allclose(center, [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(rays.origin[32, 32]),
                               [0, 0, -10], atol=1e-6)


def test_directions_unit_norm():
    cam = look_at((1, 2, -5), (0, 0, 0), fov_degrees=75)
    rays = camera_rays(cam, 32, 32, 0.01, 30.0)
    n = np.linalg.norm(np.asarray(rays.direction), axis=-1)
    np.testing.assert_allclose(n, 1.0, atol=1e-6)


def test_fov_edge_angle():
    """Horizontal half-angle at the image edge ≈ fov/2."""
    fov = 90.0
    cam = look_at((0, 0, -10), (0, 0, 0), fov_degrees=fov)
    w = 257
    rays = camera_rays(cam, w, w, 0.01, 30.0)
    d = np.asarray(rays.direction[w // 2, -1])  # center row, right edge
    angle = math.degrees(math.atan2(abs(d[0]), d[2]))
    # pixel centers stop half a pixel short of the exact edge
    expected = math.degrees(math.atan(math.tan(math.radians(fov / 2))
                                      * (1 - 1.0 / w)))
    assert abs(angle - expected) < 0.1


def test_row0_is_top():
    cam = look_at((0, 0, -10), (0, 0, 0), fov_degrees=60)
    rays = camera_rays(cam, 33, 33, 0.01, 30.0)
    assert float(rays.direction[0, 16, 1]) > 0    # top row looks up (+y)
    assert float(rays.direction[-1, 16, 1]) < 0   # bottom row looks down


def test_up_vector_respected():
    cam = look_at((0, 0, -10), (0, 0, 0), up=(1, 0, 0), fov_degrees=60)
    rays = camera_rays(cam, 33, 33, 0.01, 30.0)
    # with up=+x, the top row should look toward +x
    assert float(rays.direction[0, 16, 0]) > 0


def test_orthographic_parallel_dirs():
    cam = look_at((0, 0, -5), (0, 0, 0), ortho_scale=4.0)
    rays = camera_rays(cam, 16, 16, 0.01, 30.0)
    d = np.asarray(rays.direction)
    np.testing.assert_allclose(d, np.broadcast_to([0, 0, 1], d.shape),
                               atol=1e-6)
    o = np.asarray(rays.origin)
    assert np.ptp(o[..., 0]) > 3.0  # origins spread across the plane
    assert np.ptp(o[..., 1]) > 3.0


def test_epsilon_length_propagate():
    cam = look_at((0, 0, -10), (0, 0, 0))
    rays = camera_rays(cam, 8, 8, 0.02, 25.0)
    np.testing.assert_allclose(np.asarray(rays.epsilon), 0.02)
    np.testing.assert_allclose(np.asarray(rays.length), 25.0)
