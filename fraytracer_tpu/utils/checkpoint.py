"""Scene checkpoint/resume: save and load FlatScene parameter pytrees.

The reference rebuilds its scene from a fixed seed on every run
(Program.fs:14) and has no persistence (SURVEY.md §5); checkpointing
matters here because inverse rendering (BASELINE config 5) *optimizes*
scene parameters.  Format: a plain ``.npz`` holding every array leaf plus a
JSON-encoded static structure (plan, kinds, materials, lights) so a scene
round-trips exactly.  Orbax is unnecessary at this scale.
"""
from __future__ import annotations

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np

from ..scene.flatten import FlatScene, Plan

__all__ = ["save_scene", "load_scene"]


def _plan_to_obj(p: Plan):
    return {"op": p.op, "prim_slots": list(p.prim_slots),
            "children": [_plan_to_obj(c) for c in p.children], "k": p.k}


def _plan_from_obj(o) -> Plan:
    return Plan(o["op"], tuple(o["prim_slots"]),
                tuple(_plan_from_obj(c) for c in o["children"]), o["k"])


def save_scene(path: str, scene: FlatScene) -> None:
    """Write a FlatScene (arrays + static structure) to ``path`` (.npz)."""
    arrays = {}
    for kind, _ in scene.kind_counts:
        arrays[f"prim::{kind}"] = np.asarray(scene.prim_params[kind])
    for name in ("mat_albedo", "mat_emission", "mat_reflectivity",
                 "mat_ior", "mat_tint", "light_vec", "light_color",
                 "light_shadow_len", "background"):
        arrays[name] = np.asarray(getattr(scene, name))
    static = {
        "plan": _plan_to_obj(scene.plan),
        "kind_counts": list(map(list, scene.kind_counts)),
        "prim_material": list(scene.prim_material),
        "mat_kind": list(scene.mat_kind),
        "light_kind": list(scene.light_kind),
        "version": 1,
    }
    arrays["__static__"] = np.frombuffer(
        json.dumps(static).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load_scene(path: str) -> FlatScene:
    """Load a FlatScene written by :func:`save_scene`."""
    data = np.load(path)
    static = json.loads(bytes(data["__static__"]).decode())
    if static.get("version") != 1:
        raise ValueError(f"unsupported scene checkpoint version: "
                         f"{static.get('version')}")
    kind_counts = tuple((k, int(c)) for k, c in static["kind_counts"])
    return FlatScene(
        prim_params={k: jnp.asarray(data[f"prim::{k}"])
                     for k, _ in kind_counts},
        mat_albedo=jnp.asarray(data["mat_albedo"]),
        mat_emission=jnp.asarray(data["mat_emission"]),
        mat_reflectivity=jnp.asarray(data["mat_reflectivity"]),
        mat_ior=jnp.asarray(data["mat_ior"]),
        mat_tint=jnp.asarray(data["mat_tint"]),
        light_vec=jnp.asarray(data["light_vec"]),
        light_color=jnp.asarray(data["light_color"]),
        light_shadow_len=jnp.asarray(data["light_shadow_len"]),
        background=jnp.asarray(data["background"]),
        plan=_plan_from_obj(static["plan"]),
        kind_counts=kind_counts,
        prim_material=tuple(static["prim_material"]),
        mat_kind=tuple(static["mat_kind"]),
        light_kind=tuple(static["light_kind"]),
    )
