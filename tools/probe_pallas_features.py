#!/usr/bin/env python
"""Probe Mosaic support for the v2 march-kernel building blocks:
  (a) SMEM BlockSpec for a per-tile (M, P) candidate table + scalar reads
  (b) dynamic-bound fori_loop whose bounds come from vector reductions
  (c) scalar broadcast math on (8,128) vregs inside that loop
Run on TPU; prints PASS/FAIL per feature."""
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

G, M, P = 4, 128, 8


def probe(name, fn):
    try:
        fn()
        print(f"PASS {name}", flush=True)
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:200]}", flush=True)


def smem_block():
    def kernel(cand_ref, x_ref, o_ref):
        s = cand_ref[0, 3]          # scalar read from SMEM at static index
        o_ref[:, :] = x_ref[:, :] * s

    x = jnp.ones((G * 8, 128), jnp.float32)
    cand = jnp.arange(G * M * P, dtype=jnp.float32).reshape(G, M, P)
    out = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, M, P), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G * 8, 128), jnp.float32),
    )(cand.reshape(G, M, P), x)
    np.testing.assert_allclose(np.asarray(out[0, 0]), float(cand[0, 0, 3]))


def smem_block_2d():
    # 3D SMEM block failed? try (M, P) with leading grid dim folded.
    def kernel(cand_ref, x_ref, o_ref):
        s = cand_ref[3, 1]
        o_ref[:, :] = x_ref[:, :] * s

    x = jnp.ones((G * 8, 128), jnp.float32)
    cand = jnp.arange(G * M * P, dtype=jnp.float32).reshape(G * M, P)
    out = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((M, P), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G * 8, 128), jnp.float32),
    )(cand, x)
    np.testing.assert_allclose(np.asarray(out[0, 0]),
                               float(cand.reshape(G, M, P)[0, 3, 1]))


def dyn_fori_scalar_loop():
    # per-step: window bounds from vector reductions -> dynamic fori over
    # candidates with scalar SMEM loads, scalar-broadcast vreg math.
    def kernel(cand_ref, keys_ref, x_ref, o_ref):
        x = x_ref[:, :]                       # (8,128)
        t_hi = jnp.max(x)                     # scalar from vreg reduce
        keys = keys_ref[0, 0, :]              # (M,) VMEM vector
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)[0]
        rel = keys < t_hi
        w_lo = jnp.min(jnp.where(rel, idx, M))
        w_hi = jnp.max(jnp.where(rel, idx + 1, 0))

        def body(c, acc):
            s0 = cand_ref[c, 0]
            s1 = cand_ref[c, 1]
            return jnp.minimum(acc, jnp.abs(x - s0) + s1)

        acc = jax.lax.fori_loop(w_lo, w_hi, body,
                                jnp.full((8, 128), 1e30, jnp.float32))
        o_ref[:, :] = acc

    x = jnp.linspace(0, 1, G * 8 * 128, dtype=jnp.float32).reshape(G * 8, 128)
    cand = np.zeros((G * M, P), np.float32)
    cand[:, 0] = np.tile(np.linspace(0, 1, M), G)
    cand[:, 1] = 0.25
    keys = np.tile(np.linspace(0, 2, M, dtype=np.float32), (G, 1))
    out = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((M, P), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, M), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G * 8, 128), jnp.float32),
    )(jnp.asarray(cand), jnp.asarray(keys).reshape(G, 1, M), x)
    # brute-force oracle
    xo = np.asarray(x).reshape(G, 8, 128)
    co = cand.reshape(G, M, P)
    ko = keys
    ref = np.full((G, 8, 128), 1e30, np.float32)
    for g in range(G):
        t_hi = xo[g].max()
        rel = ko[g] < t_hi
        if rel.any():
            lo, hi = np.argmax(rel), M - np.argmax(rel[::-1])
            for c in range(lo, hi):
                ref[g] = np.minimum(ref[g],
                                    np.abs(xo[g] - co[g, c, 0]) + co[g, c, 1])
    np.testing.assert_allclose(np.asarray(out).reshape(G, 8, 128), ref,
                               rtol=1e-6)


def while_with_inner_fori():
    # the real shape: while_loop (march) whose body runs a dynamic fori.
    def kernel(cand_ref, x_ref, o_ref):
        x = x_ref[:, :]

        def cond(st):
            t, i = st
            return jnp.logical_and(jnp.max(t) < 10.0, i < 50)

        def body(st):
            t, i = st
            n = jnp.minimum(i + 1, 4)

            def inner(c, acc):
                return acc + cand_ref[c, 0] * 0.01
            d = jax.lax.fori_loop(0, n, inner,
                                  jnp.zeros((8, 128), jnp.float32))
            return t + d + 0.5, i + 1

        t, _ = jax.lax.while_loop(cond, body, (x, jnp.int32(0)))
        o_ref[:, :] = t

    x = jnp.zeros((G * 8, 128), jnp.float32)
    cand = jnp.ones((G * M, P), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((M, P), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G * 8, 128), jnp.float32),
    )(cand, x)
    assert float(out[0, 0]) > 9.9


if __name__ == "__main__":
    probe("smem_block_3d", smem_block)
    probe("smem_block_2d", smem_block_2d)
    probe("dyn_fori_scalar_loop", dyn_fori_scalar_loop)
    probe("while_with_inner_fori", while_with_inner_fori)
