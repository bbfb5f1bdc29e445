"""DMA-speed block gather (TPU reordering primitive).

XLA lowers data-dependent reorders (gather/scatter/argsort-apply) of large
arrays near-serially on TPU — measured on v5e: permuting 1M rays costs
~120 ms at element granularity and ~85 ms even at 128-lane-row granularity,
versus ~4 ms of actual HBM traffic.  This module provides the TPU-native
alternative: a Pallas kernel whose *index map* reads a scalar-prefetched
block-index table, so the pipeline's own double-buffered DMAs fetch blocks
in permuted order at full HBM bandwidth.

Granularity is a whole VMEM block ((8, 128) float32 = 4 KB by default) —
the right unit for queue compaction and tile re-ordering, where the payload
is rows of a flat SoA buffer.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

BLOCK_SUB = 8            # sublanes per gathered block
BLOCK_LANE = 128         # lanes per gathered block
BLOCK = BLOCK_SUB * BLOCK_LANE


def _copy_kernel(idx_ref, in_ref, out_ref):
    del idx_ref  # consumed by the index map
    out_ref[:, :] = in_ref[:, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def block_gather(x: Array, block_idx: Array,
                 interpret: bool = False) -> Array:
    """``out[i] = x[block_idx[i]]`` over (8, 128) blocks.

    ``x [B, 8, 128]`` (any dtype with 4-byte elements), ``block_idx [Bo]``
    int32 → ``out [Bo, 8, 128]``.  Indices may repeat (broadcast) and the
    output block count may differ from the input's (compaction grows or
    shrinks the buffer).  The index table is scalar-prefetched; each grid
    step's input DMA reads block ``block_idx[i]`` directly, so the whole
    gather runs at HBM bandwidth instead of XLA's near-serial lowering.
    """
    bo = block_idx.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bo,),
        in_specs=[
            pl.BlockSpec((1, BLOCK_SUB, BLOCK_LANE),
                         lambda i, idx_ref: (idx_ref[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_SUB, BLOCK_LANE),
                               lambda i, idx_ref: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _copy_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bo, BLOCK_SUB, BLOCK_LANE),
                                       x.dtype),
        interpret=interpret,
    )(block_idx.astype(jnp.int32), x)


def flat_block_gather(x: Array, block_idx: Array, n_out_blocks: int,
                      interpret: bool = False) -> Array:
    """Block gather over a flat array's leading axis.

    ``x [N, ...]`` with ``N`` divisible by BLOCK → ``out [n_out_blocks ·
    BLOCK, ...]`` where out block ``i`` is x's block ``block_idx[i]``.
    Trailing dims are folded into the lane axis per 4-byte element; for
    [N] and [N, k] float32/int32 payloads this is exact."""
    n = x.shape[0]
    assert n % BLOCK == 0, (n, BLOCK)
    trail = 1
    for s in x.shape[1:]:
        trail *= s
    if trail == 1:
        xb = x.reshape(-1, BLOCK_SUB, BLOCK_LANE)
        out = block_gather(xb, block_idx, interpret=interpret)
        return out.reshape((n_out_blocks * BLOCK,) + x.shape[1:])
    # [N, k]: treat each of the k columns as its own [N] gather stacked on
    # the sublane axis — one kernel call per column keeps blocks aligned
    cols = [
        block_gather(x.reshape(n, trail)[:, j]
                     .reshape(-1, BLOCK_SUB, BLOCK_LANE),
                     block_idx, interpret=interpret)
        .reshape(n_out_blocks * BLOCK)
        for j in range(trail)
    ]
    out = jnp.stack(cols, axis=-1)
    return out.reshape((n_out_blocks * BLOCK,) + x.shape[1:])
