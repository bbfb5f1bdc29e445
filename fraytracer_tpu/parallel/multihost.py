"""Multi-host (multi-controller SPMD) entry points.

The reference is strictly single-process (SURVEY.md §2c); scaling beyond
one host is a new capability: ``jax.distributed.initialize`` + the same
``shard_map`` render/train code from :mod:`.mesh`, with the global mesh
spanning all hosts' devices.  Image rows shard across the global device
set; each host renders (and keeps) its local rows; only the final
assembled frame is gathered — and only when a host actually needs the full
image (BMP/PNG write), via ``process_allgather``.

On a single host these helpers degrade gracefully to the local device set,
so the same script runs everywhere (standard JAX multi-controller
practice; nothing in the reference to cite).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from .mesh import make_mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize the multi-controller runtime.  With no arguments, JAX
    auto-detects cluster environments (TPU pods); explicit arguments are for
    manual process launch.  Safe no-op when already initialized or when
    running single-process."""
    if jax.process_count() > 1:
        return  # already initialized
    try:
        if coordinator_address is None and num_processes is None:
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id)
    except (ValueError, RuntimeError):
        # single-process run (no cluster env): nothing to initialize
        pass


def global_mesh():
    """1-D mesh over every device of every host (ICI within a slice, DCN
    across hosts — XLA routes the collectives)."""
    return make_mesh(devices=jax.devices())


def gather_image_to_host(image) -> np.ndarray:
    """Assemble the full frame on every host (the one cross-host gather in
    the pipeline, used only for file output).  Uses
    ``jax.experimental.multihost_utils.process_allgather`` when running
    multi-process; identity on a single host."""
    if jax.process_count() == 1:
        return np.asarray(image)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(image, tiled=True))
