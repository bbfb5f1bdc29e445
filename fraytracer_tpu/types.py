"""Core value types of the TPU-native SDF renderer.

TPU-first reinterpretation of the reference's domain records
(``/root/reference/src/FrayTracer/Types.fs:9-79``): instead of per-ray structs
and per-scene closures, everything is a **batch**.  A ``Rays`` value holds a
structure-of-arrays bundle of many rays at once; trace results are likewise
batched and masked (a ``hit`` boolean replaces the F# ``voption``).

All containers are registered JAX pytrees (via ``flax.struct``) so they flow
through ``jit`` / ``grad`` / ``vmap`` / ``shard_map`` unchanged.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


@struct.dataclass
class Rays:
    """A batch of rays (structure-of-arrays).

    Mirrors the semantics of the reference ``Ray`` record
    (``Types.fs:10-17``): ``origin`` + unit ``direction``, a remaining travel
    budget ``length`` (decremented as the ray marches), and the hit threshold
    ``epsilon``.  Shapes: ``origin``/``direction`` are ``[..., 3]``;
    ``length``/``epsilon`` broadcast against the batch ``[...]``.
    """

    origin: Array      # [..., 3] float32
    direction: Array   # [..., 3] float32, unit norm
    length: Array      # [...]    float32 remaining travel budget
    epsilon: Array     # [...]    float32 hit threshold

    @property
    def batch_shape(self):
        return self.origin.shape[:-1]

    def at(self, t: Array) -> Array:
        """Point ``origin + t * direction`` (reference ``Ray.get``, Ray.fs:6-7)."""
        return self.origin + t[..., None] * self.direction

    def move(self, t: Array) -> "Rays":
        """Advance origins by ``t`` and decrement the budget
        (reference ``Ray.move``, Ray.fs:9-13)."""
        return self.replace(origin=self.at(t), length=self.length - t)


def make_rays(origin, direction, length, epsilon) -> Rays:
    origin = jnp.asarray(origin, jnp.float32)
    direction = jnp.asarray(direction, jnp.float32)
    batch = jnp.broadcast_shapes(origin.shape[:-1], direction.shape[:-1])
    return Rays(
        origin=jnp.broadcast_to(origin, batch + (3,)),
        direction=jnp.broadcast_to(direction, batch + (3,)),
        length=jnp.broadcast_to(jnp.asarray(length, jnp.float32), batch),
        epsilon=jnp.broadcast_to(jnp.asarray(epsilon, jnp.float32), batch),
    )


@struct.dataclass
class MarchResult:
    """Result of sphere-tracing a batch of rays against a scene.

    Replaces the reference's ``SdfFormTraceResult`` option (``Types.fs:33-37``):
    ``hit`` masks which lanes converged; ``t`` is the travel distance at the
    hit (undefined-but-finite on miss lanes); ``distance`` is the final SDF
    value; ``steps`` the number of march iterations taken (for profiling).
    """

    hit: Array       # [...] bool
    t: Array         # [...] float32 travelled distance along the ray
    distance: Array  # [...] float32 SDF value at termination
    steps: Array     # [...] int32


@struct.dataclass
class SurfaceHit:
    """Shading-ready hit info (reference ``SdfObjectTraceResult``,
    ``Types.fs:57-65``): backed-off position, unit normal, surface albedo and
    the winning material index (argmin over the material-bearing leaves,
    semantics of ``SdfObject.fs:26-46``)."""

    hit: Array        # [...] bool
    position: Array   # [..., 3] hit position backed off by epsilon
    normal: Array     # [..., 3] unit surface normal
    color: Array      # [..., 3] surface albedo at the hit
    material: Array   # [...] int32 winning material index (-1 on miss)
    t: Array          # [...] float32


def dot(a: Array, b: Array) -> Array:
    """Batched 3-vector dot product over the trailing axis."""
    return jnp.sum(a * b, axis=-1)


def norm(v: Array, eps: float = 1e-20) -> Array:
    """Safe Euclidean norm over the trailing axis (grad-safe at 0)."""
    return jnp.sqrt(jnp.sum(v * v, axis=-1) + eps)


def normalize(v: Array, eps: float = 1e-20) -> Array:
    """Unit vector over the trailing axis (grad-safe at 0)."""
    return v / norm(v, eps)[..., None]


def cross(a: Array, b: Array) -> Array:
    return jnp.cross(a, b)
