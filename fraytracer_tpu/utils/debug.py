"""Debug and validation helpers (SURVEY.md §5).

The reference has no sanitizers; its safety comes from immutability
(Array.Parallel writes disjoint rows, Array2D.fs:30-38).  The JAX build is
pure-functional by construction; what remains worth checking is numeric
health (NaN/Inf from degenerate geometry) and scene well-formedness.
"""
from __future__ import annotations

import contextlib
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..scene.flatten import FlatScene


@contextlib.contextmanager
def nan_guard():
    """Enable jax debug-NaN checking for the scope (raises on first NaN
    produced by any jitted computation)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def validate_scene(scene: FlatScene) -> List[str]:
    """Well-formedness checks on a flattened scene; returns a list of
    problems (empty = valid).  Catches the classes of construction bug the
    reference could silently ship (e.g. its grid-size bug,
    SdfBoundary.fs:237-239): non-finite parameters, non-positive radii,
    degenerate axes, out-of-range material indices."""
    problems: List[str] = []

    for kind, _ in scene.kind_counts:
        p = np.asarray(scene.prim_params[kind])
        if not np.isfinite(p).all():
            problems.append(f"{kind}: non-finite parameters")
        if kind == "sphere" and (p[:, 3] <= 0).any():
            problems.append("sphere: non-positive radius")
        if kind == "capsule" and (p[:, 6] <= 0).any():
            problems.append("capsule: non-positive radius")
        if kind == "torus":
            if (p[:, 6] <= 0).any() or (p[:, 7] <= 0).any():
                problems.append("torus: non-positive radius")
            if (np.linalg.norm(p[:, 3:6], axis=1) < 1e-6).any():
                problems.append("torus: degenerate axis")
        if kind == "box" and (p[:, 3:6] <= 0).any():
            problems.append("box: non-positive half extent")
        if kind == "plane":
            if (np.linalg.norm(p[:, 0:3], axis=1) < 1e-6).any():
                problems.append("plane: degenerate normal")

    m = len(scene.mat_kind)
    for midx in scene.prim_material:
        if midx >= m:
            problems.append(f"primitive material index {midx} out of range")

    for name in ("mat_albedo", "mat_emission", "mat_reflectivity",
                 "mat_ior", "mat_tint", "light_vec", "light_color",
                 "background"):
        if not np.isfinite(np.asarray(getattr(scene, name))).all():
            problems.append(f"{name}: non-finite values")

    return problems
