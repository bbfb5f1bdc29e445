"""Real-TPU (Mosaic) kernel parity test — VERDICT r1 item 4.

The interpret-mode suite (tests/) validates kernel *semantics* on CPU;
this test validates the **compiled Mosaic path the benchmark actually
times** against the jnp while_loop march on the benchmark scene.  It
lives outside tests/ because tests/conftest.py pins the whole suite to
the CPU backend; run it in the bench environment with

    python -m pytest tools/test_tpu_parity.py -q

It skips itself unless the default JAX backend is a TPU.

Contracts asserted (cull on, fused surface on):

* omega=1.0: hit masks bit-equal to jnp; hit t within the epsilon shell;
  fused normals/materials equal to the dense jnp evaluation at the same
  points;
* omega=1.4 (the bench configuration): hit flips only on grazing rays
  (rare — the over-relaxed march may legally hop over epsilon-shell
  touches), bounded below 0.1%; surviving hits inside the shell.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs a real TPU (Mosaic)")


@pytest.fixture(scope="module")
def setup():
    import fraytracer_tpu as ft
    from fraytracer_tpu.render import _block_perm
    from fraytracer_tpu.scene.generators import torus_csg_scene

    scene = ft.flatten(torus_csg_scene(seed=19, n_tori=1000))
    cam = ft.look_at((0, 0, -10), (0, 0, 0), fov_degrees=60.0)
    rays = ft.camera_rays(cam, 256, 256, 0.01, 30.0)
    flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), rays)
    perm, _ = _block_perm(256, 256)
    flat = jax.tree.map(lambda x: x[perm], flat)
    return scene, flat


def test_mosaic_march_parity_omega1(setup):
    from fraytracer_tpu.ops.march import MarchConfig, march
    scene, flat = setup
    r_j = jax.jit(lambda s, r: march(
        s, r, MarchConfig(backend="jnp", max_steps=192)))(scene, flat)
    r_p = jax.jit(lambda s, r: march(
        s, r, MarchConfig(backend="pallas", max_steps=192)))(scene, flat)
    hits = np.asarray(r_j.hit)
    np.testing.assert_array_equal(hits, np.asarray(r_p.hit))
    dt = np.abs(np.asarray(r_p.t) - np.asarray(r_j.t))[hits]
    assert dt.max() < 3 * 0.01


def test_mosaic_fused_surface_parity(setup):
    from fraytracer_tpu.ops import sdf
    from fraytracer_tpu.ops.march import MarchConfig, march_surface
    scene, flat = setup
    cfg = MarchConfig(backend="pallas", max_steps=192)
    res, nrm, midx = jax.jit(
        lambda s, r: march_surface(s, r, cfg))(scene, flat)
    h = np.asarray(res.hit)
    assert h.mean() > 0.2
    pos = flat.at(res.t - flat.epsilon)
    n_ref = np.asarray(jax.jit(sdf.scene_normal)(scene, pos))
    m_ref, _ = jax.jit(sdf.material_at)(scene, pos)
    nd = np.abs(np.asarray(nrm) - n_ref)[h]
    assert nd.max() < 1e-3, f"normal maxdiff {nd.max():.2e}"
    mism = (np.asarray(midx)[h] != np.asarray(m_ref)[h]).mean()
    assert mism == 0.0, f"material mismatch {mism:.5f}"


def test_mosaic_relaxed_march_contract(setup):
    from fraytracer_tpu.ops.march import MarchConfig, march
    scene, flat = setup
    r_j = jax.jit(lambda s, r: march(
        s, r, MarchConfig(backend="jnp", max_steps=192)))(scene, flat)
    r_p = jax.jit(lambda s, r: march(
        s, r, MarchConfig(backend="pallas", max_steps=192,
                          relax_omega=1.4)))(scene, flat)
    hj, hp = np.asarray(r_j.hit), np.asarray(r_p.hit)
    flips = (hj != hp).mean()
    assert flips < 1e-3, f"{flips:.5f} hit flips at omega=1.4"
    both = hj & hp
    dt = np.abs(np.asarray(r_p.t) - np.asarray(r_j.t))[both]
    assert np.percentile(dt, 99) < 3 * 0.01


def test_mosaic_occlusion_parity(setup):
    """Any-hit occlusion kernel (shadow path) finds exactly the full
    march's hit set on the compiled Mosaic path, at the bench omega."""
    from fraytracer_tpu.ops.march import MarchConfig, march, march_occlusion
    scene, flat = setup
    cfg = MarchConfig(backend="pallas", max_steps=192, relax_omega=1.4)
    full = jax.jit(lambda s, r: march(s, r, cfg).hit)(scene, flat)
    occ = jax.jit(lambda s, r: march_occlusion(s, r, cfg))(scene, flat)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(occ))
