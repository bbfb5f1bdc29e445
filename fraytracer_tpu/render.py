"""Top-level render API.

The batched equivalent of the reference's ``Image.render`` + ``SdfScene.trace``
pipeline (Image.fs:26-35, SdfScene.fs:7-28): one jitted function maps the
whole [H, W] pixel grid → camera rays → masked march → shading.  There is no
per-pixel parallel loop to manage (the reference's ``Array2D.Parallel.init``,
Array2D.fs:30-38) — parallelism is XLA's across the batch on one chip and the
device mesh across chips (``parallel/``).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from . import camera as cam
from .ops import shade, tonemap
from .ops.march import MarchConfig
from .scene.flatten import FlatScene, flatten
from .scene.nodes import Scene
from .types import Rays

Array = jax.Array


@dataclasses.dataclass(frozen=True, eq=True)
class RenderConfig:
    """Static render configuration (the reference's hardcoded literals in
    Program.fs:14-99, made explicit per SURVEY.md §5)."""

    width: int = 1024
    height: int = 1024
    epsilon: float = 0.01       # hit threshold (Program.fs:85)
    length: float = 30.0        # ray travel budget (Program.fs:93)
    gamma: float = 2.2          # tone-map gamma (Program.fs:99)
    march: MarchConfig = MarchConfig()


def render_rays(scene: FlatScene, rays: Rays,
                march_cfg: MarchConfig = MarchConfig()) -> Array:
    """Trace an arbitrary ray batch → linear RGB [..., 3]."""
    return shade.trace(scene, rays, march_cfg)


@partial(jax.jit, static_argnames=("cfg",))
def render(scene: FlatScene, camera: cam.Camera,
           cfg: RenderConfig = RenderConfig()) -> Array:
    """Render the full image → linear RGB float32 [H, W, 3] (row 0 = top)."""
    rays = cam.camera_rays(camera, cfg.width, cfg.height,
                           cfg.epsilon, cfg.length)
    return shade.trace(scene, rays, cfg.march)


@partial(jax.jit, static_argnames=("cfg",))
def render_image(scene: FlatScene, camera: cam.Camera, key: Array,
                 cfg: RenderConfig = RenderConfig()) -> Array:
    """Render + tone map → dithered uint8 [H, W, 3] (Image.fs:37-50)."""
    linear = render(scene, camera, cfg)
    return tonemap.tonemap(linear, key, cfg.gamma)


def render_scene(scene: Scene, camera: cam.Camera,
                 cfg: RenderConfig = RenderConfig()) -> Array:
    """Convenience: flatten a builder Scene and render linear RGB."""
    return render(flatten(scene), camera, cfg)
