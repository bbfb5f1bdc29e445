"""Observability: render statistics and profiler hooks.

The reference's entire observability story is one Stopwatch and two printfn
lines (Program.fs:87-96); SURVEY.md §5 calls for structured per-run reports:
rays/s, march-iteration statistics, and ``jax.profiler`` traces.
"""
from __future__ import annotations

import contextlib
import dataclasses
import json
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..scene.flatten import FlatScene
from ..types import MarchResult, Rays
from ..ops.march import MarchConfig, march


@dataclasses.dataclass
class RenderStats:
    """Structured per-render report (SURVEY.md §5 metrics)."""

    n_rays: int
    wall_s: float
    rays_per_sec: float
    hit_fraction: float
    steps_mean: float
    steps_max: int
    steps_histogram: dict  # bucket -> count

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))


def march_stats(scene: FlatScene, rays: Rays,
                cfg: MarchConfig = MarchConfig(),
                repeats: int = 3) -> RenderStats:
    """March a ray batch and report timing + iteration statistics.

    The march-step histogram is the key tuning signal for the fixed-trip
    masked march: a long tail means wasted lockstep iterations (SURVEY.md
    §7 hard part (b)).
    """
    f = jax.jit(lambda s, r: (lambda m: (m, jnp.sum(m.t)))(march(s, r, cfg)))
    m, ck = f(scene, rays)
    float(ck)  # sync

    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        m, ck = f(scene, rays)
        float(ck)
        best = min(best, time.perf_counter() - t0)

    steps = np.asarray(m.steps)
    hist_edges = [0, 8, 16, 32, 64, 128, 256, 1 << 30]
    hist = {}
    for lo, hi in zip(hist_edges[:-1], hist_edges[1:]):
        c = int(((steps >= lo) & (steps < hi)).sum())
        if c:
            hist[f"{lo}-{hi if hi < (1 << 30) else 'inf'}"] = c

    n = int(np.prod(m.hit.shape))
    return RenderStats(
        n_rays=n,
        wall_s=best,
        rays_per_sec=n / best,
        hit_fraction=float(np.asarray(m.hit).mean()),
        steps_mean=float(steps.mean()),
        steps_max=int(steps.max()),
        steps_histogram=hist,
    )


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """``jax.profiler`` trace context: view with TensorBoard/XProf.
    No-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def stopwatch(label: str = "render"):
    """The reference's Stopwatch (Program.fs:89-96), as a context manager."""
    t0 = time.perf_counter()
    yield
    print(f"{label}: {time.perf_counter() - t0:.2f} sec", flush=True)
