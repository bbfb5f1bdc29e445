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
    # Rays per on-chip tile.  The march materializes a [tile, K] primitive
    # distance matrix per step; tiling keeps peak HBM bounded (a 1024² image
    # against 1000 primitives untiled would need ~4 GB per temporary).
    # 0 → no tiling (whole image in one batch).
    tile_rays: int = 65536


def render_rays(scene: FlatScene, rays: Rays,
                march_cfg: MarchConfig = MarchConfig()) -> Array:
    """Trace an arbitrary ray batch → linear RGB [..., 3]."""
    return shade.trace(scene, rays, march_cfg)


def _trace_tiled(scene: FlatScene, rays: Rays, march_cfg: MarchConfig,
                 tile_rays: int) -> Array:
    """Trace a flat ray batch in fixed-size tiles via ``lax.map`` so peak
    memory is bounded by [tile, K] regardless of image size.  Tiles play the
    role of the reference's per-row parallel chunks (Array2D.fs:30-38) —
    here they bound HBM instead of feeding a thread pool."""
    n = rays.origin.shape[0]
    if tile_rays <= 0 or n <= tile_rays:
        return shade.trace(scene, rays, march_cfg)
    pad = (-n) % tile_rays
    if pad:
        def pad_leaf(x):
            widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, widths)
        rays = jax.tree.map(pad_leaf, rays)
        # padded lanes: zero budget → inactive in the march
        rays = rays.replace(length=rays.length.at[n:].set(0.0))
    chunked = jax.tree.map(
        lambda x: x.reshape((-1, tile_rays) + x.shape[1:]), rays)
    # Remat each tile: without it the backward pass stacks every tile's
    # [tile, K] residuals (equivalent to the untiled memory footprint);
    # with it the backward recomputes per tile — classic compute-for-HBM
    # trade (jax.checkpoint).
    traced = jax.checkpoint(
        lambda s, r: shade.trace(s, r, march_cfg))
    out = jax.lax.map(lambda r: traced(scene, r), chunked)
    out = out.reshape((-1, 3))
    return out[:n] if pad else out


@partial(jax.jit, static_argnames=("cfg",))
def render(scene: FlatScene, camera: cam.Camera,
           cfg: RenderConfig = RenderConfig()) -> Array:
    """Render the full image → linear RGB float32 [H, W, 3] (row 0 = top)."""
    rays = cam.camera_rays(camera, cfg.width, cfg.height,
                           cfg.epsilon, cfg.length)
    flat_rays = jax.tree.map(
        lambda x: x.reshape((cfg.width * cfg.height,) + x.shape[2:]), rays)
    colors = _trace_tiled(scene, flat_rays, cfg.march, cfg.tile_rays)
    return colors.reshape(cfg.height, cfg.width, 3)


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
