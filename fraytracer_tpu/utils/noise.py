"""Procedural noise: Catmull-Rom splines, value noise, gradient noise.

Batched JAX re-expression of the reference's vestigial procedural-texture
stack (``Spline.fs:13-30`` Catmull-Rom interpolation; ``Noise.fs:7-113``
permutation-table value/gradient noise) — the backing for the "wood, cloud"
procedural materials goal (reference ``README.md:10``).  All functions are
shape-polymorphic over ``p [..., 3]`` and differentiable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_TABLE_SIZE = 256


def _permutation(seed: int) -> np.ndarray:
    """Doubled permutation table (reference Noise.fs:7-26)."""
    rng = np.random.default_rng(seed)
    p = rng.permutation(_TABLE_SIZE)
    return np.concatenate([p, p]).astype(np.int32)


_PERM = _permutation(19)
_GRADS = None


def catmull_rom(p0: Array, p1: Array, p2: Array, p3: Array, t: Array) -> Array:
    """Catmull-Rom cubic interpolation (reference Spline.catmulRom1D,
    Spline.fs:13-30): interpolates between p1 (t=0) and p2 (t=1)."""
    t2 = t * t
    t3 = t2 * t
    return 0.5 * ((2.0 * p1)
                  + (-p0 + p2) * t
                  + (2.0 * p0 - 5.0 * p1 + 4.0 * p2 - p3) * t2
                  + (-p0 + 3.0 * p1 - 3.0 * p2 + p3) * t3)


def catmull_rom_1d(knots: Array, t: Array) -> Array:
    """Spline through a knot array sampled at t ∈ [0, n-1] (clamped)."""
    knots = jnp.asarray(knots, jnp.float32)
    n = knots.shape[0]
    t = jnp.clip(t, 0.0, n - 1.0)
    i = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, n - 2)
    f = t - i

    def at(j):
        return knots[jnp.clip(j, 0, n - 1)]

    return catmull_rom(at(i - 1), at(i), at(i + 1), at(i + 2), f)


def _hash3(ix: Array, iy: Array, iz: Array) -> Array:
    """Lattice hash via the permutation table (Noise.fs lattice lookup)."""
    perm = jnp.asarray(_PERM)
    m = _TABLE_SIZE - 1
    return perm[perm[perm[ix & m] + (iy & m)] + (iz & m)]


def _smoothstep(t: Array) -> Array:
    """Quintic fade (C2-continuous; the reference uses smoothstep-lerped
    lattice values, Noise.fs:72-110)."""
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


def value_noise(p: Array) -> Array:
    """Lattice value noise in [-1, 1] (reference Noise.fs:38-53, with
    smooth interpolation instead of its Catmull-Rom column scheme)."""
    pi = jnp.floor(p)
    pf = p - pi
    ix = pi[..., 0].astype(jnp.int32)
    iy = pi[..., 1].astype(jnp.int32)
    iz = pi[..., 2].astype(jnp.int32)
    w = _smoothstep(pf)

    def corner(dx, dy, dz):
        h = _hash3(ix + dx, iy + dy, iz + dz)
        return h.astype(jnp.float32) / (_TABLE_SIZE - 1) * 2.0 - 1.0

    def lerp(a, b, t):
        return a + (b - a) * t

    c000, c100 = corner(0, 0, 0), corner(1, 0, 0)
    c010, c110 = corner(0, 1, 0), corner(1, 1, 0)
    c001, c101 = corner(0, 0, 1), corner(1, 0, 1)
    c011, c111 = corner(0, 1, 1), corner(1, 1, 1)
    x00 = lerp(c000, c100, w[..., 0])
    x10 = lerp(c010, c110, w[..., 0])
    x01 = lerp(c001, c101, w[..., 0])
    x11 = lerp(c011, c111, w[..., 0])
    y0 = lerp(x00, x10, w[..., 1])
    y1 = lerp(x01, x11, w[..., 1])
    return lerp(y0, y1, w[..., 2])


def gradient_noise(p: Array) -> Array:
    """Perlin-style gradient noise in ~[-1, 1] (reference Noise.fs:72-110)."""
    pi = jnp.floor(p)
    pf = p - pi
    ix = pi[..., 0].astype(jnp.int32)
    iy = pi[..., 1].astype(jnp.int32)
    iz = pi[..., 2].astype(jnp.int32)
    w = _smoothstep(pf)

    # 12 edge-gradient directions
    dirs = jnp.asarray(np.array([
        [1, 1, 0], [-1, 1, 0], [1, -1, 0], [-1, -1, 0],
        [1, 0, 1], [-1, 0, 1], [1, 0, -1], [-1, 0, -1],
        [0, 1, 1], [0, -1, 1], [0, 1, -1], [0, -1, -1],
    ], np.float32))

    def corner(dx, dy, dz):
        h = _hash3(ix + dx, iy + dy, iz + dz) % 12
        g = dirs[h]
        off = pf - jnp.asarray([dx, dy, dz], jnp.float32)
        return jnp.sum(g * off, axis=-1)

    def lerp(a, b, t):
        return a + (b - a) * t

    x00 = lerp(corner(0, 0, 0), corner(1, 0, 0), w[..., 0])
    x10 = lerp(corner(0, 1, 0), corner(1, 1, 0), w[..., 0])
    x01 = lerp(corner(0, 0, 1), corner(1, 0, 1), w[..., 0])
    x11 = lerp(corner(0, 1, 1), corner(1, 1, 1), w[..., 0])
    y0 = lerp(x00, x10, w[..., 1])
    y1 = lerp(x01, x11, w[..., 1])
    return lerp(y0, y1, w[..., 2])


def fbm(p: Array, octaves: int = 4, lacunarity: float = 2.0,
        gain: float = 0.5, noise=gradient_noise) -> Array:
    """Fractional Brownian motion over any base noise."""
    total = jnp.zeros(p.shape[:-1], p.dtype)
    amp, freq, norm = 1.0, 1.0, 0.0
    for _ in range(octaves):
        total = total + amp * noise(p * freq)
        norm += amp
        amp *= gain
        freq *= lacunarity
    return total / norm
