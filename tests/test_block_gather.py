"""DMA-speed block gather (ops/pallas/gather.py): parity with numpy
indexing in interpret mode."""
import numpy as np
import jax.numpy as jnp

from fraytracer_tpu.ops.pallas.gather import (BLOCK, block_gather,
                                              flat_block_gather)


def test_block_gather_permutation():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(16, 8, 128)).astype(np.float32)
    idx = rng.permutation(16).astype(np.int32)
    out = np.asarray(block_gather(jnp.asarray(x), jnp.asarray(idx),
                                  interpret=True))
    np.testing.assert_array_equal(out, x[idx])


def test_block_gather_repeat_and_shrink():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(8, 8, 128)).astype(np.float32)
    idx = np.array([3, 3, 0, 7], np.int32)
    out = np.asarray(block_gather(jnp.asarray(x), jnp.asarray(idx),
                                  interpret=True))
    np.testing.assert_array_equal(out, x[idx])


def test_flat_block_gather_vec_payload():
    rng = np.random.default_rng(2)
    n = 4 * BLOCK
    x = rng.normal(size=(n, 3)).astype(np.float32)
    idx = np.array([2, 0, 1], np.int32)
    out = np.asarray(flat_block_gather(jnp.asarray(x), jnp.asarray(idx),
                                       3, interpret=True))
    want = x.reshape(4, BLOCK, 3)[idx].reshape(3 * BLOCK, 3)
    np.testing.assert_array_equal(out, want)


def test_flat_block_gather_int():
    rng = np.random.default_rng(3)
    n = 4 * BLOCK
    x = rng.integers(0, 1000, size=(n,)).astype(np.int32)
    idx = np.array([1, 3, 0, 2], np.int32)
    out = np.asarray(flat_block_gather(jnp.asarray(x), jnp.asarray(idx),
                                       4, interpret=True))
    np.testing.assert_array_equal(out, x.reshape(4, BLOCK)[idx].reshape(-1))
