"""Culled point evaluation (ops/point_eval.py) vs the dense path: normals,
material argmin, and the implicit-diff VJP must match on the benchmark-style
torus CSG scene (where culling is active)."""
import numpy as np
import jax
import jax.numpy as jnp

import fraytracer_tpu as ft
from fraytracer_tpu.ops import point_eval, sdf, shade
from fraytracer_tpu.ops.march import MarchConfig, march
from fraytracer_tpu.scene.generators import torus_csg_scene
from tests.test_pallas_march import flat_camera_rays

CULLED = MarchConfig(backend="pallas_interpret", max_steps=128,
                     cull=True, cull_threshold=48, cull_m=64)
DENSE_NM = MarchConfig(backend="pallas_interpret", max_steps=128, cull=False)


def _hits(scene, rays, cfg):
    res = march(scene, rays, cfg)
    pos = rays.at(res.t - rays.epsilon)
    return res, pos


def test_culled_normal_material_match_dense():
    scene = ft.flatten(torus_csg_scene(seed=19, n_tori=64))
    rays = flat_camera_rays(48, 48)
    res, pos = _hits(scene, rays, CULLED)
    hit = np.asarray(res.hit)
    assert hit.any()

    out = point_eval.culled_surface_eval(scene, pos, res.hit,
                                         m=64, threshold=48)
    assert out is not None, "torus group should be cull-eligible"
    n_c, m_c, a_c = map(np.asarray, out)

    n_d = np.asarray(sdf.scene_normal(scene, pos))
    m_d, a_d = map(np.asarray, sdf.material_at(scene, pos))

    np.testing.assert_allclose(n_c[hit], n_d[hit], atol=1e-5)
    np.testing.assert_array_equal(m_c[hit], m_d[hit])
    np.testing.assert_allclose(a_c[hit], a_d[hit], atol=1e-6)


def test_culled_eval_none_without_big_groups():
    scene = ft.flatten(torus_csg_scene(seed=19, n_tori=8))
    rays = flat_camera_rays(8, 8)
    res, pos = _hits(scene, rays, DENSE_NM)
    assert point_eval.culled_surface_eval(scene, pos, res.hit,
                                          m=64, threshold=48) is None


def test_culled_surface_hit_matches_dense_trace():
    """Culled fast path vs dense path (both pallas_interpret march): the
    culled march's per-step axial windows cap some steps, so hit points
    drift within the epsilon shell — the contract is exact hit parity,
    t within the shell, and shading within O(epsilon·curvature)."""
    scene = ft.flatten(torus_csg_scene(seed=19, n_tori=64))
    rays = flat_camera_rays(32, 32)
    r_c = march(scene, rays, CULLED)
    r_d = march(scene, rays, DENSE_NM)
    hits = np.asarray(r_d.hit)
    np.testing.assert_array_equal(np.asarray(r_c.hit), hits)
    if hits.any():
        tdiff = np.abs(np.asarray(r_c.t) - np.asarray(r_d.t))[hits]
        assert tdiff.max() < 3 * 0.01  # within the epsilon shell

    img_c = np.asarray(shade.trace(scene, rays, CULLED))
    img_d = np.asarray(shade.trace(scene, rays, DENSE_NM))
    # epsilon-shell shading drift (hit points differ inside the shell
    # between the two sound trajectories): O(eps · shading Lipschitz)
    assert np.abs(img_c - img_d).max() < 3e-3
    # pixels whose hit points coincide must match tightly
    same = np.abs(np.asarray(r_c.t) - np.asarray(r_d.t)) < 1e-6
    exact = (~hits) | same
    np.testing.assert_allclose(img_c[exact], img_d[exact], atol=1e-5)


def test_certificate_catches_degenerate_tile():
    """Exactness certificate (point_eval docstring): a tile whose hit
    points span the scene so widely that the true nearest primitive of an
    outlier point is ranked out of the m-nearest-to-centroid candidate
    set must (a) fail the certificate and (b) still produce the exact
    dense result through the lax.cond fallback."""
    # 12 spheres along x with distinct materials; big union group
    prims = [ft.sphere((3.0 * i, 0, 0), 1.0,
                       material=ft.solid(i / 12.0, 0.2, 0.2))
             for i in range(12)]
    scene = ft.flatten(ft.Scene(root=ft.union(*prims)))

    # degenerate tile: most points near sphere 0, one outlier at sphere 11
    n = 64
    pos = np.tile(np.array([[0.0, 0.0, -1.2]], np.float32), (n, 1))
    pos += np.linspace(0, 0.1, n)[:, None].astype(np.float32)
    pos[-1] = [33.0, 0.0, -1.2]          # winner = sphere 11, far away
    hit = np.ones((n,), bool)
    built = point_eval.build_culled_eval(
        scene, jnp.asarray(pos), jnp.asarray(hit), m=2, threshold=4)
    assert built is not None
    *_rest, ok = built
    assert not bool(ok), "certificate must fail for the degenerate tile"

    out = point_eval.culled_surface_eval(
        scene, jnp.asarray(pos), jnp.asarray(hit), m=2, threshold=4)
    n_c, m_c, _a = map(np.asarray, out)
    n_d = np.asarray(sdf.scene_normal(scene, jnp.asarray(pos)))
    m_d, _ = map(np.asarray, sdf.material_at(scene, jnp.asarray(pos)))
    np.testing.assert_array_equal(m_c, m_d)   # incl. the outlier's mat 11
    np.testing.assert_allclose(n_c, n_d, atol=1e-5)

    # a well-behaved batch (same scene, points near one sphere) passes
    pos2 = np.tile(np.array([[0.0, 0.0, -1.2]], np.float32), (n, 1))
    built2 = point_eval.build_culled_eval(
        scene, jnp.asarray(pos2), jnp.asarray(hit), m=4, threshold=4)
    assert bool(built2[-1]), "coherent tile should pass the certificate"


def test_culled_vjp_matches_dense_gradients():
    """Two gradient contracts: (a) the culled implicit-diff backward equals
    the dense backward up to the epsilon-shell hit drift between the two
    (sound) marches — a few 1e-3 absolute on O(10) gradients; (b) on the
    *same* march, the fused-surface custom VJP equals the unfused
    (march → point_eval normal) chain to float precision."""
    import dataclasses
    scene = ft.flatten(torus_csg_scene(seed=19, n_tori=64))
    rays = flat_camera_rays(24, 24)

    def loss(s, cfg):
        return jnp.sum(shade.trace(s, rays, cfg))

    g_c = jax.grad(lambda s: loss(s, CULLED))(scene)
    g_d = jax.grad(lambda s: loss(s, DENSE_NM))(scene)
    for kind in ("torus", "sphere"):
        np.testing.assert_allclose(
            np.asarray(g_c.prim_params[kind]),
            np.asarray(g_d.prim_params[kind]), atol=8e-3,
            err_msg=f"grad mismatch (hit-drift envelope) for {kind}")

    g_nf = jax.grad(lambda s: loss(
        s, dataclasses.replace(CULLED, fuse_surface=False)))(scene)
    for kind in ("torus", "sphere"):
        # the fused path's winning-leaf backward evaluates one primitive
        # per ray; the unfused chain reduces over candidate matrices —
        # same math, different summation order → reassociation-level diff
        np.testing.assert_allclose(
            np.asarray(g_c.prim_params[kind]),
            np.asarray(g_nf.prim_params[kind]), atol=5e-5,
            err_msg=f"fused-VJP mismatch for {kind}")
