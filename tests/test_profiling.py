"""Profiling/observability tests (SURVEY.md §5)."""
import json

import jax

import fraytracer_tpu as ft
from fraytracer_tpu.ops.march import MarchConfig
from fraytracer_tpu.utils.profiling import march_stats, stopwatch


def test_march_stats_report():
    scene = ft.flatten(ft.Scene(root=ft.sphere((0, 0, 0), 1.0)))
    cam = ft.look_at((0, 0, -5), (0, 0, 0))
    rays = ft.camera_rays(cam, 16, 16, 0.01, 20.0)
    flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), rays)
    stats = march_stats(scene, flat, MarchConfig(max_steps=64), repeats=1)
    assert stats.n_rays == 256
    assert 0.0 < stats.hit_fraction < 1.0
    assert stats.steps_max <= 64
    assert stats.rays_per_sec > 0
    report = json.loads(stats.to_json())
    assert set(report) >= {"n_rays", "rays_per_sec", "steps_histogram"}
    assert sum(report["steps_histogram"].values()) == 256


def test_stopwatch_prints(capsys):
    with stopwatch("unit"):
        pass
    out = capsys.readouterr().out
    assert out.startswith("unit:") and "sec" in out
