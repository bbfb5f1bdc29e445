"""Tone-map pipeline tests (Image.fs:37-50 / FColor.fs:43-55 semantics)."""
import numpy as np
import jax
import jax.numpy as jnp

from fraytracer_tpu.ops.tonemap import auto_exposure_scale, tonemap


def test_exposure_clamp():
    dark = jnp.full((4, 4, 3), 1e-5)
    np.testing.assert_allclose(float(auto_exposure_scale(dark)), 0.01,
                               rtol=1e-6)  # clamp (Image.fs:43)
    bright = jnp.full((4, 4, 3), 2.0)
    np.testing.assert_allclose(float(auto_exposure_scale(bright)), 2.0,
                               rtol=1e-6)


def test_max_channel_maps_near_255():
    img = jnp.zeros((2, 2, 3)).at[0, 0, 0].set(4.0)
    out = np.asarray(tonemap(img, jax.random.key(0), gamma=1.0))
    assert out[0, 0, 0] in (254, 255)
    assert out.dtype == np.uint8


def test_gamma_monotone():
    ramp = jnp.linspace(0, 1, 16).reshape(4, 4, 1) * jnp.ones((4, 4, 3))
    out = np.asarray(tonemap(ramp, jax.random.key(1), gamma=2.2,
                             max_value=jnp.float32(1.0))).astype(np.int32)
    flat = out[..., 0].reshape(-1)
    assert np.all(np.diff(flat) >= -1)  # monotone up to 1-level dither


def test_dither_statistics():
    """Dithering a constant mid-gray: mean quantized value ≈ c·254.5 and
    both adjacent levels occur (the point of FColor.fs:43-48)."""
    c = 0.5
    img = jnp.full((64, 64, 3), c)
    out = np.asarray(tonemap(img, jax.random.key(2), gamma=1.0,
                             max_value=jnp.float32(1.0))).astype(np.float64)
    assert abs(out.mean() - c * 254.5) < 0.5
    assert len(np.unique(out)) == 2  # dithers between adjacent levels


def test_deterministic_given_key():
    img = jnp.linspace(0, 2, 48).reshape(4, 4, 3)
    a = np.asarray(tonemap(img, jax.random.key(7)))
    b = np.asarray(tonemap(img, jax.random.key(7)))
    np.testing.assert_array_equal(a, b)
