"""Fused Pallas TPU sphere-march kernel.

SURVEY.md §7 stage 3: the hot loop — (SDF eval over all primitives → CSG
combine → masked step) iterated until every ray in the tile converges —
fused into one kernel with all state resident in VMEM:

* ray tiles of R rays; each ray coordinate is a separate [R] vector
  (structure-of-arrays) so every elementwise op runs as clean [R, K]
  VPU tiles — no padded 3-vectors anywhere;
* primitive parameter matrices live in VMEM for the whole march (the
  benchmark scene's 1000 tori ≈ 32 KB);
* primitives are evaluated in chunks of ≤128 lanes; each CSG *group*
  (a plan node's primitive set) folds its chunk reduction into a running
  accumulator, so the full [R, K] distance matrix never materializes;
* the march loop is an in-kernel ``while_loop`` with a tile-level
  early-exit vote (``any(active)``), mirroring the reference's
  per-ray tail recursion (SdfForm.fs:93-104) in lockstep.

The kernel is generated per scene *structure* (plan + kind layout — static,
cached); parameters stay runtime arrays, so scene edits and gradients don't
recompile.
"""
from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...scene.flatten import FlatScene, Plan
from ...types import MarchResult, Rays
from ..march import MarchConfig, bound_skip_start

Array = jax.Array

RAY_SUB = 8        # ray sublanes per kernel instance
RAY_LANE = 128     # ray lanes
RAY_TILE = RAY_SUB * RAY_LANE   # rays per kernel instance (8 × 128 vreg)
PRIM_CHUNK = 128   # primitive lanes per inner-loop chunk
_BIG = 3.0e38


# ---------------------------------------------------------------------------
# SoA distance evaluation: params [Kc, P] + ray coords ([8,128,1] each)
# -> [8, 128, Kc].  Same math as ops.sdf (semantics cited there);
# reformulated so rays live on (sublane, lane) vregs and primitives on a
# trailing broadcast axis — reductions over the prim axis land back on
# clean (8,128) vregs (Mosaic-friendly while_loop carries).
# ---------------------------------------------------------------------------

def _col(params: Array, j: int) -> Array:
    return params[:, j].reshape(1, 1, -1)  # [1, 1, Kc]


def _d_sphere_soa(params, px, py, pz):
    dx = px - _col(params, 0)
    dy = py - _col(params, 1)
    dz = pz - _col(params, 2)
    return jnp.sqrt(dx * dx + dy * dy + dz * dz + 1e-20) - _col(params, 3)


def _d_capsule_soa(params, px, py, pz):
    ax, ay, az = _col(params, 0), _col(params, 1), _col(params, 2)
    bx, by, bz = _col(params, 3), _col(params, 4), _col(params, 5)
    r = _col(params, 6)
    bax, bay, baz = bx - ax, by - ay, bz - az
    pax, pay, paz = px - ax, py - ay, pz - az
    denom = jnp.maximum(bax * bax + bay * bay + baz * baz, 1e-20)
    h = jnp.clip((pax * bax + pay * bay + paz * baz) / denom, 0.0, 1.0)
    ex, ey, ez = pax - h * bax, pay - h * bay, paz - h * baz
    return jnp.sqrt(ex * ex + ey * ey + ez * ez + 1e-20) - r


def _d_torus_soa(params, px, py, pz):
    cx, cy, cz = _col(params, 0), _col(params, 1), _col(params, 2)
    nx, ny, nz = _col(params, 3), _col(params, 4), _col(params, 5)
    R, r = _col(params, 6), _col(params, 7)
    ninv = jax.lax.rsqrt(nx * nx + ny * ny + nz * nz + 1e-20)
    nx, ny, nz = nx * ninv, ny * ninv, nz * ninv
    qx, qy, qz = px - cx, py - cy, pz - cz
    h = qx * nx + qy * ny + qz * nz
    q2 = qx * qx + qy * qy + qz * qz
    radial = jnp.sqrt(jnp.maximum(q2 - h * h, 1e-20)) - R
    return jnp.sqrt(h * h + radial * radial + 1e-20) - r


def _d_box_soa(params, px, py, pz):
    cx, cy, cz = _col(params, 0), _col(params, 1), _col(params, 2)
    hx, hy, hz = _col(params, 3), _col(params, 4), _col(params, 5)
    r = _col(params, 6)
    qx = jnp.abs(px - cx) - hx
    qy = jnp.abs(py - cy) - hy
    qz = jnp.abs(pz - cz) - hz
    ox = jnp.maximum(qx, 0.0)
    oy = jnp.maximum(qy, 0.0)
    oz = jnp.maximum(qz, 0.0)
    outside = jnp.sqrt(ox * ox + oy * oy + oz * oz + 1e-20)
    inside = jnp.minimum(jnp.maximum(qx, jnp.maximum(qy, qz)), 0.0)
    return outside + inside - r


def _d_plane_soa(params, px, py, pz):
    return (px * _col(params, 0) + py * _col(params, 1)
            + pz * _col(params, 2) - _col(params, 3))


def _d_cone_soa(params, px, py, pz):
    ax, ay, az = _col(params, 0), _col(params, 1), _col(params, 2)
    bx, by, bz = _col(params, 3), _col(params, 4), _col(params, 5)
    ra, rb = _col(params, 6), _col(params, 7)
    rba = rb - ra
    bax, bay, baz = bx - ax, by - ay, bz - az
    baba = jnp.maximum(bax * bax + bay * bay + baz * baz, 1e-20)
    pax, pay, paz = px - ax, py - ay, pz - az
    papa = pax * pax + pay * pay + paz * paz
    paba = (pax * bax + pay * bay + paz * baz) / baba
    x = jnp.sqrt(jnp.maximum(papa - paba * paba * baba, 1e-20))
    cax = jnp.maximum(0.0, x - jnp.where(paba < 0.5, ra, rb))
    cay = jnp.abs(paba - 0.5) - 0.5
    k = rba * rba + baba
    f = jnp.clip((rba * (x - ra) + paba * baba) / k, 0.0, 1.0)
    cbx = x - ra - f * rba
    cby = paba - f
    s = jnp.where((cbx < 0.0) & (cay < 0.0), -1.0, 1.0)
    return s * jnp.sqrt(jnp.minimum(cax * cax + cay * cay * baba,
                                    cbx * cbx + cby * cby * baba) + 1e-20)


def _d_triangle_soa(params, px, py, pz):
    v = [_col(params, j) for j in range(10)]
    v1x, v1y, v1z, v2x, v2y, v2z, v3x, v3y, v3z, r = v
    e1x, e1y, e1z = v2x - v1x, v2y - v1y, v2z - v1z   # v21
    e2x, e2y, e2z = v3x - v2x, v3y - v2y, v3z - v2z   # v32
    e3x, e3y, e3z = v1x - v3x, v1y - v3y, v1z - v3z   # v13
    # nor = cross(v21, v13)
    nx = e1y * e3z - e1z * e3y
    ny = e1z * e3x - e1x * e3z
    nz = e1x * e3y - e1y * e3x

    p1x, p1y, p1z = px - v1x, py - v1y, pz - v1z
    p2x, p2y, p2z = px - v2x, py - v2y, pz - v2z
    p3x, p3y, p3z = px - v3x, py - v3y, pz - v3z

    def seg_d2(ex, ey, ez, qx, qy, qz):
        denom = jnp.maximum(ex * ex + ey * ey + ez * ez, 1e-20)
        h = jnp.clip((qx * ex + qy * ey + qz * ez) / denom, 0.0, 1.0)
        ux, uy, uz = qx - h * ex, qy - h * ey, qz - h * ez
        return ux * ux + uy * uy + uz * uz

    d2e = jnp.minimum(
        seg_d2(e1x, e1y, e1z, p1x, p1y, p1z),
        jnp.minimum(seg_d2(e2x, e2y, e2z, p2x, p2y, p2z),
                    seg_d2(e3x, e3y, e3z, p3x, p3y, p3z)))

    def half_sign(ex, ey, ez, qx, qy, qz):
        # sign(dot(cross(edge, nor), q))
        cx_ = ey * nz - ez * ny
        cy_ = ez * nx - ex * nz
        cz_ = ex * ny - ey * nx
        return jnp.sign(cx_ * qx + cy_ * qy + cz_ * qz)

    s = (half_sign(e1x, e1y, e1z, p1x, p1y, p1z)
         + half_sign(e2x, e2y, e2z, p2x, p2y, p2z)
         + half_sign(e3x, e3y, e3z, p3x, p3y, p3z))
    n2 = jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-20)
    h = nx * p1x + ny * p1y + nz * p1z
    d2f = h * h / n2
    return jnp.sqrt(jnp.where(s >= 2.0, d2f, d2e) + 1e-20) - r


_SOA_FNS = {
    "sphere": _d_sphere_soa, "capsule": _d_capsule_soa, "torus": _d_torus_soa,
    "triangle": _d_triangle_soa, "box": _d_box_soa, "cone": _d_cone_soa,
    "plane": _d_plane_soa,
}


# ---------------------------------------------------------------------------
# Plan → group-reduced form (static, per scene structure)
# ---------------------------------------------------------------------------

class _Group:
    """A plan node's primitive set with its reduction op.
    op ∈ {'min', 'max', 'sumexp'}; for 'sumexp', k is the smooth strength."""

    __slots__ = ("op", "slots", "k", "gid")

    def __init__(self, op, slots, k, gid):
        self.op, self.slots, self.k, self.gid = op, tuple(slots), k, gid


def _build_groups(plan: Plan):
    """Walk the plan; emit one _Group per node that reduces primitives and a
    nested eval tree referencing group ids.  Returns (groups, tree) where
    tree := ('g', gid) | (op, k, [tree...])."""
    groups: List[_Group] = []

    def visit(p: Plan):
        if p.op == "prim":
            g = _Group("min", p.prim_slots, 0.0, len(groups))
            groups.append(g)
            return ("g", g.gid)
        if p.op == "subtract":
            return ("subtract", 0.0, [visit(p.children[0]),
                                      visit(p.children[1])])
        kids = [visit(c) for c in p.children]
        if p.op in ("union", "intersect"):
            if p.prim_slots:
                op = "min" if p.op == "union" else "max"
                g = _Group(op, p.prim_slots, 0.0, len(groups))
                groups.append(g)
                kids.append(("g", g.gid))
            if len(kids) == 1:
                return kids[0]
            return (p.op, 0.0, kids)
        if p.op == "smooth_union":
            if p.prim_slots:
                g = _Group("sumexp", p.prim_slots, p.k, len(groups))
                groups.append(g)
                kids.append(("g", g.gid))
            return ("smooth_union", p.k, kids)
        raise ValueError(p.op)

    tree = visit(plan)
    return groups, tree


# ---------------------------------------------------------------------------
# Kernel builder
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _cull_pairs(kind_counts: Tuple[Tuple[str, int], ...], plan: Plan,
                threshold: int):
    """Static selection of (group, kind) pairs worth cone-culling: 'min'
    groups whose slots form a contiguous, group-uniform row range of one
    kind with ≥ threshold primitives.  Returns tuples
    (gid, kind, kind_index, row_lo, row_hi)."""
    groups, _tree = _build_groups(plan)
    kind_index = {k: i for i, (k, _) in enumerate(kind_counts)}
    offsets, off = {}, 0
    for k, c in kind_counts:
        offsets[k] = off
        off += c
    slot_gid = np.full(off, -1, np.int32)
    for g in groups:
        slot_gid[list(g.slots)] = g.gid

    pairs = []
    for g in groups:
        if g.op != "min":
            continue
        slots = np.sort(np.asarray(g.slots))
        for kind, cnt in kind_counts:
            lo = offsets[kind]
            in_kind = slots[(slots >= lo) & (slots < lo + cnt)]
            if len(in_kind) < threshold:
                continue
            r0, r1 = int(in_kind.min()) - lo, int(in_kind.max()) + 1 - lo
            # contiguity + uniformity: every row in range belongs to g
            if len(in_kind) != r1 - r0:
                continue
            if not (slot_gid[lo + r0:lo + r1] == g.gid).all():
                continue
            pairs.append((g.gid, kind, kind_index[kind], r0, r1))
    return tuple(pairs)


@functools.lru_cache(maxsize=32)
def _build_kernel(kind_counts: Tuple[Tuple[str, int], ...], plan: Plan,
                  max_steps: int, prim_chunk: int,
                  cull_pairs: Tuple = (), cull_m: int = 0,
                  omega: float = 1.0):
    """Build the pallas kernel fn for a scene structure.  Cached."""
    groups, tree = _build_groups(plan)

    # rows excluded from the dense chunk sweep (handled by culled passes)
    culled_rows = {}  # kind -> set of row ranges
    for (_gid, kind, _ki, r0, r1) in cull_pairs:
        culled_rows.setdefault(kind, []).append((r0, r1))

    def is_culled(kind, row):
        return any(lo <= row < hi for lo, hi in culled_rows.get(kind, []))

    # static chunk table: (kind, param_ref_index, row0, rows, global_slot0)
    chunks = []
    kind_index = {k: i for i, (k, _) in enumerate(kind_counts)}
    slot0 = 0
    for kind, cnt in kind_counts:
        r0 = 0
        while r0 < cnt:
            if is_culled(kind, r0):
                hi = next(h for lo, h in culled_rows[kind] if lo <= r0 < h)
                r0 = hi
                continue
            rows = min(prim_chunk, cnt - r0)
            # stop at a culled-range boundary
            for lo, _hi in culled_rows.get(kind, []):
                if r0 < lo < r0 + rows:
                    rows = lo - r0
            chunks.append((kind, kind_index[kind], r0, rows, slot0 + r0))
            r0 += rows
        slot0 += cnt

    n_kinds = len(kind_counts)

    # slot → owning group id (each primitive belongs to exactly one plan
    # node).  Passed to the kernel as an int32 input; per-chunk masks are
    # equality tests against the static gid.
    slot_gid = np.full(slot0, -1, np.int32)
    for g in groups:
        slot_gid[list(g.slots)] = g.gid
    # static per-group/chunk presence (prunes dead compares at trace time)
    group_in_chunk = [
        [bool((slot_gid[gs0:gs0 + rows] == g.gid).any())
         for (_k, _ki, _r0, rows, gs0) in chunks]
        for g in groups
    ]

    def scene_distance_lanes(param_refs, gid_ref, cull_refs, px, py, pz):
        """(8,128) ray coords → per-ray scene distance (8,128)."""
        shp = px.shape  # (8, 128)
        px3, py3, pz3 = px[..., None], py[..., None], pz[..., None]
        accs = []
        for g in groups:
            if g.op == "min":
                accs.append(jnp.full(shp, _BIG))
            elif g.op == "max":
                accs.append(jnp.full(shp, -_BIG))
            else:
                accs.append(jnp.zeros(shp))

        # culled passes: each big 'min' group reduces over its per-tile
        # candidate list; overflowed tiles (count > cull_m) fall back to a
        # full sweep of the group's row range via lax.cond.
        for pi, (gid, kind, ki, row_lo, row_hi) in enumerate(cull_pairs):
            cand_ref, count_ref = cull_refs[pi]
            count = count_ref[0, 0, 0]
            fn = _SOA_FNS[kind]

            def culled_pass(_, cand_ref=cand_ref, count=count, fn=fn):
                def chunk_eval(c0, pc):
                    rows_p = cand_ref[0, c0:c0 + pc, :]
                    d = fn(rows_p, px3, py3, pz3)
                    lane = (jax.lax.broadcasted_iota(
                        jnp.int32, (1, 1, pc), 2) + c0)
                    dm = jnp.where(lane < count, d, _BIG)
                    return jnp.min(dm, axis=-1)

                acc = chunk_eval(0, min(prim_chunk, cull_m))
                for c0 in range(prim_chunk, cull_m, prim_chunk):
                    pc = min(prim_chunk, cull_m - c0)
                    # dynamic skip: tiles with few candidates pay only the
                    # first chunk
                    acc = jnp.minimum(acc, jax.lax.cond(
                        count > c0,
                        lambda c0=c0, pc=pc: chunk_eval(c0, pc),
                        lambda: jnp.full(shp, _BIG)))
                return acc

            def full_pass(_, ki=ki, row_lo=row_lo, row_hi=row_hi, fn=fn):
                acc = jnp.full(shp, _BIG)
                for r0 in range(row_lo, row_hi, prim_chunk):
                    rc = min(prim_chunk, row_hi - r0)
                    rows_p = param_refs[ki][r0:r0 + rc, :]
                    d = fn(rows_p, px3, py3, pz3)
                    acc = jnp.minimum(acc, jnp.min(d, axis=-1))
                return acc

            gval = jax.lax.cond(count <= cull_m, culled_pass, full_pass, 0)
            accs[gid] = jnp.minimum(accs[gid], gval)

        for ci, (kind, ki, r0, rows, gs0) in enumerate(chunks):
            params = param_refs[ki][r0:r0 + rows, :]
            d = _SOA_FNS[kind](params, px3, py3, pz3)  # [8, 128, rows]
            gid_chunk = gid_ref[gs0:gs0 + rows].reshape(1, 1, rows)
            for gi, g in enumerate(groups):
                if not group_in_chunk[gi][ci]:
                    continue
                mask = gid_chunk == g.gid
                if g.op == "min":
                    dm = jnp.where(mask, d, _BIG)
                    accs[gi] = jnp.minimum(accs[gi], jnp.min(dm, axis=-1))
                elif g.op == "max":
                    dm = jnp.where(mask, d, -_BIG)
                    accs[gi] = jnp.maximum(accs[gi], jnp.max(dm, axis=-1))
                else:  # sumexp for smooth union
                    dm = jnp.where(mask, jnp.exp(-d / g.k), 0.0)
                    accs[gi] = accs[gi] + jnp.sum(dm, axis=-1)
        # resolve sumexp groups into distances
        gvals = []
        for g, a in zip(groups, accs):
            if g.op == "sumexp":
                gvals.append(-g.k * jnp.log(jnp.maximum(a, 1e-30)))
            else:
                gvals.append(a)

        def ev(t):
            if t[0] == "g":
                return gvals[t[1]]
            op, k, kids = t
            vals = [ev(x) for x in kids]
            if op == "subtract":
                return jnp.maximum(vals[0], -vals[1])
            if op == "union":
                out = vals[0]
                for v in vals[1:]:
                    out = jnp.minimum(out, v)
                return out
            if op == "intersect":
                out = vals[0]
                for v in vals[1:]:
                    out = jnp.maximum(out, v)
                return out
            if op == "smooth_union":
                # combine child distances in exp space
                s = jnp.zeros_like(vals[0])
                for v in vals:
                    s = s + jnp.exp(-v / k)
                return -k * jnp.log(jnp.maximum(s, 1e-30))
            raise ValueError(op)

        return ev(tree)

    n_pairs = len(cull_pairs)

    def kernel(*refs):
        (ox, oy, oz, dx, dy, dz, ln, ep) = refs[:8]
        param_refs = refs[8:8 + n_kinds]
        gid_ref = refs[8 + n_kinds]
        cull_flat = refs[9 + n_kinds:9 + n_kinds + 2 * n_pairs]
        cull_refs = [(cull_flat[2 * i], cull_flat[2 * i + 1])
                     for i in range(n_pairs)]
        t_out, hit_out, d_out, steps_out = refs[9 + n_kinds + 2 * n_pairs:]

        origin = (ox[:, :], oy[:, :], oz[:, :])       # (8, 128) each
        direc = (dx[:, :], dy[:, :], dz[:, :])
        length = ln[:, :]
        eps = ep[:, :]
        t0 = jnp.zeros_like(length)

        # active/hit are carried as float 0/1 masks — Mosaic cannot yield
        # vector<i1> from an scf.while region.
        relaxed = omega > 1.0

        def cond(state):
            active, i = state[1], state[-1]
            return jnp.logical_and(jnp.max(active) > 0.0, i < max_steps)

        def body(state):
            if relaxed:
                t, active, hit, d_out_prev, d_start, step_taken, i = state
            else:
                t, active, hit, d_out_prev, i = state
            px = origin[0] + t * direc[0]
            py = origin[1] + t * direc[1]
            pz = origin[2] + t * direc[2]
            d = scene_distance_lanes(param_refs, gid_ref, cull_refs,
                                     px, py, pz)
            if relaxed:
                # overstep: the omega-relaxed step left the union of the
                # two safety spheres → revert to the conservative landing
                # point and re-evaluate there next iteration
                over = active * jnp.where(step_taken > d_start + d,
                                          1.0, 0.0)
                ok = 1.0 - over
                is_hit = active * ok * jnp.where(d < eps, 1.0, 0.0)
                hit = jnp.maximum(hit, is_hit)
                # a relaxed step that would cross the budget could kill the
                # ray before the overstep fallback can revert it; fall back
                # to the conservative step there (sound: if even t+d crosses,
                # the conservative march dies at the same point)
                step_rel = omega * d
                step_new = jnp.where(t + step_rel >= length, d, step_rel)
                t_cons = t - step_taken + d_start
                adv = active * ok * (1.0 - is_hit) * step_new
                t_new = over * t_cons + ok * (t + adv)
                not_exhausted = jnp.where(t_new < length, 1.0, 0.0)
                active = active * jnp.maximum(
                    over, (1.0 - is_hit) * not_exhausted)
                keep = jnp.maximum(active * ok, is_hit)
                d_out_ = keep * d + (1.0 - keep) * d_out_prev
                d_start_n = over * d_start + ok * d
                step_taken_n = over * d_start + ok * adv
                return (t_new, active, hit, d_out_, d_start_n,
                        step_taken_n, i + 1)
            is_hit = active * jnp.where(d < eps, 1.0, 0.0)
            hit = jnp.maximum(hit, is_hit)
            step = active * (1.0 - is_hit) * d
            t_new = t + step
            not_exhausted = jnp.where(t_new < length, 1.0, 0.0)
            active = active * (1.0 - is_hit) * not_exhausted
            keep = jnp.maximum(active, is_hit)
            d_out_ = keep * d + (1.0 - keep) * d_out_prev
            return t_new, active, hit, d_out_, i + 1

        active0 = jnp.where(length > 0.0, 1.0, 0.0)
        if relaxed:
            init = (t0, active0, jnp.zeros_like(active0),
                    jnp.full(length.shape, _BIG),
                    jnp.full(length.shape, _BIG),   # d_start (no overstep)
                    jnp.zeros_like(length),          # step_taken
                    jnp.int32(0))
            t, _active, hit, d, _ds, _st, i = jax.lax.while_loop(
                cond, body, init)
        else:
            init = (t0, active0, jnp.zeros_like(active0),
                    jnp.full(length.shape, _BIG), jnp.int32(0))
            t, _active, hit, d, i = jax.lax.while_loop(cond, body, init)

        t_out[:, :] = t
        hit_out[:, :] = (hit > 0.0).astype(jnp.int32)
        d_out[:, :] = d
        steps_out[:, :] = jnp.full(length.shape, i, jnp.int32)

    return kernel, n_kinds, slot_gid


def _tile_cones(origin: Array, direction: Array, t_lo: Array, t_hi: Array,
                epsilon: Array, grid: int):
    """Per-ray-tile bounding cones: (apex [G,3], axis [G,3], cos_half [G],
    t_min [G], max_len [G], margin [G], any_active [G]).

    Built from the *pre-bound-skip* origins plus the march range
    ``[t_lo, t_hi]`` measured along each ray from that origin.  Computing
    the cone from the advanced origins would be wrong at the root-bound
    silhouette: tiles mixing hit and miss lanes would see origins spread
    across the whole bounding sphere, inflating ``margin`` until every
    primitive is a candidate.  Inactive lanes (t_hi<=t_lo: provable miss,
    padding) are masked out of every statistic."""
    o = origin.reshape(grid, RAY_TILE, 3)
    d = direction.reshape(grid, RAY_TILE, 3)
    lo = t_lo.reshape(grid, RAY_TILE)
    hi = t_hi.reshape(grid, RAY_TILE)
    ep = epsilon.reshape(grid, RAY_TILE)

    act = (hi > lo).astype(jnp.float32)                          # [G,T]
    n_act = jnp.sum(act, axis=1)
    any_active = n_act > 0.0
    safe_n = jnp.maximum(n_act, 1.0)

    apex = jnp.sum(o * act[..., None], axis=1) / safe_n[:, None]  # [G,3]
    rho2 = jnp.sum((o - apex[:, None, :]) ** 2, axis=-1)
    rho = jnp.sqrt(jnp.max(jnp.where(act > 0.0, rho2, 0.0), axis=1))
    axis = jnp.sum(d * act[..., None], axis=1)
    norm = jnp.linalg.norm(axis, axis=-1, keepdims=True)
    axis = jnp.where(norm > 1e-12, axis / jnp.maximum(norm, 1e-12),
                     jnp.array([0.0, 0.0, 1.0]))
    cosd = jnp.sum(d * axis[:, None, :], axis=-1)
    cos_half = jnp.clip(jnp.min(jnp.where(act > 0.0, cosd, 1.0), axis=1),
                        1e-3, 1.0)
    t_min = jnp.min(jnp.where(act > 0.0, lo, jnp.inf), axis=1)
    t_min = jnp.where(any_active, t_min, 0.0)
    max_len = jnp.max(jnp.where(act > 0.0, hi, 0.0), axis=1)
    margin = rho + 2.0 * jnp.max(ep * act, axis=1) + 1e-3
    return apex, axis, cos_half, t_min, max_len, margin, any_active


def _cone_candidates(bounds: Array, apex, axis, cos_half, t_min, max_len,
                     margin, any_active, m_slots: int):
    """Conservative cone-vs-bounding-sphere candidate masks.

    bounds [Kg,4]; returns (cand_idx [G, M] int32 rows ascending,
    count [G] int32).  A primitive is a candidate iff its (margin-inflated)
    bounding sphere can come within epsilon of ANY ray point of the tile —
    the same conservative role as the reference's per-cell lower-bound
    filter (SdfBoundary.fs:248-264).  ``t_min``/``max_len`` bound the
    march range along the cone axis (rays start at t>=t_min after the
    root-bound skip and die at max_len)."""
    c = bounds[None, :, 0:3]                     # [1,Kg,3]
    r = bounds[None, :, 3] + margin[:, None]     # [G,Kg]
    v = c - apex[:, None, :]
    a = jnp.sum(v * axis[:, None, :], axis=-1)   # [G,Kg]
    v2 = jnp.sum(v * v, axis=-1)
    p = jnp.sqrt(jnp.maximum(v2 - a * a, 0.0))
    sin_half = jnp.sqrt(jnp.maximum(1.0 - cos_half * cos_half, 0.0))
    cone_dist = cos_half[:, None] * p - sin_half[:, None] * a
    near = v2 <= r * r
    cand = (near | (cone_dist <= r)) \
        & (a >= (t_min * cos_half)[:, None] - r) \
        & (a - r <= max_len[:, None]) \
        & any_active[:, None]
    count = jnp.sum(cand.astype(jnp.int32), axis=-1)
    # stable sort: candidate rows first, ascending row order
    order = jnp.argsort(~cand, axis=-1, stable=True)
    return order[:, :m_slots].astype(jnp.int32), count


def pallas_march_raw(scene: FlatScene, rays: Rays,
                     cfg: MarchConfig, interpret: bool = False) -> MarchResult:
    """March ``rays`` (flat batch [N]) with the fused Pallas kernel.

    Handles root-bound skip on the host side (cheap, once per ray), pads N
    to the ray-tile size, and reassembles a MarchResult.  Non-differentiable
    (call through ops.march.march with backend='pallas' for gradients).
    """
    assert rays.origin.ndim == 2, "pallas_march_raw wants a flat ray batch"
    n = rays.origin.shape[0]

    t0 = jnp.zeros((n,), jnp.float32)
    miss0 = jnp.zeros((n,), bool)
    length = rays.length
    if cfg.bound_skip:
        t0, miss0, t_exit = bound_skip_start(scene, rays)
        # no hit can occur past the root-bound exit: clamp the budget
        # (directional shadow rays carry the reference's budget of 1000,
        # SdfLight.fs:14 — they stop as soon as they escape the scene)
        length = jnp.minimum(length, t_exit)

    origin = rays.origin + t0[:, None] * rays.direction
    length = jnp.where(miss0, 0.0, length - t0)

    pad = (-n) % RAY_TILE
    npad = n + pad

    def pad1(x, fill=0.0):
        x = jnp.pad(x, ((0, pad),), constant_values=fill)
        return x.reshape(npad // RAY_LANE, RAY_LANE)

    ox = pad1(origin[:, 0])
    oy = pad1(origin[:, 1])
    oz = pad1(origin[:, 2])
    dxx = pad1(rays.direction[:, 0])
    dyy = pad1(rays.direction[:, 1])
    dzz = pad1(rays.direction[:, 2], 1.0)
    ln = pad1(length, -1.0)       # padded lanes: inactive
    ep = pad1(rays.epsilon, 1.0)

    pairs = ()
    cull_m = 0
    if cfg.cull:
        pairs = _cull_pairs(scene.kind_counts, scene.plan,
                            cfg.cull_threshold)
    if pairs:
        cull_m = -(-cfg.cull_m // PRIM_CHUNK) * PRIM_CHUNK

    kernel, n_kinds, slot_gid = _build_kernel(
        scene.kind_counts, scene.plan, cfg.max_steps, PRIM_CHUNK,
        pairs, cull_m, cfg.relax_omega)
    grid = npad // RAY_TILE

    # per-tile candidate lists for each culled (group, kind) pair
    cull_inputs = []
    cull_specs = []
    if pairs:
        from .. import sdf as _sdf
        # cone from the ORIGINAL origins + march range [t0, t0+length]
        # (advanced origins would smear mixed hit/miss tiles across the
        # root bound — see _tile_cones)
        origin_p = jnp.pad(rays.origin, ((0, pad), (0, 0)))
        dir_p = jnp.pad(rays.direction, ((0, pad), (0, 0)))
        tlo_p = jnp.pad(t0, ((0, pad),))
        thi_p = jnp.pad(jnp.where(length > 0.0, t0 + length, t0),
                        ((0, pad),))
        eps_p = jnp.pad(rays.epsilon, ((0, pad),))
        cones = _tile_cones(origin_p, dir_p, tlo_p, thi_p, eps_p, grid)
        for (_gid, kind, _ki, row_lo, row_hi) in pairs:
            kparams = scene.prim_params[kind][row_lo:row_hi]
            kb = jax.lax.stop_gradient(
                _sdf._prim_bound_rows(kind, kparams))
            idx, count = _cone_candidates(kb, *cones, cull_m)
            gathered = kparams[idx]                       # [G, M, P]
            cull_inputs.append(gathered)
            # per-tile candidate count, lane-broadcast (SMEM (1,1) blocks
            # are not accepted by this Pallas version)
            cull_inputs.append(jnp.broadcast_to(
                count[:, None, None].astype(jnp.int32), (grid, 8, 128)))
            cull_specs.append(pl.BlockSpec(
                (1, cull_m, kparams.shape[1]), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM))
            cull_specs.append(pl.BlockSpec(
                (1, 8, 128), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM))

    ray_spec = pl.BlockSpec((RAY_SUB, RAY_LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    param_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)
                   for _ in range(n_kinds + 1)]  # +1 for the gid table

    rows = npad // RAY_LANE
    out_shape = [
        jax.ShapeDtypeStruct((rows, RAY_LANE), jnp.float32),   # t
        jax.ShapeDtypeStruct((rows, RAY_LANE), jnp.int32),     # hit
        jax.ShapeDtypeStruct((rows, RAY_LANE), jnp.float32),   # d
        jax.ShapeDtypeStruct((rows, RAY_LANE), jnp.int32),     # steps
    ]
    out_specs = [ray_spec, ray_spec, ray_spec, ray_spec]

    params = [scene.prim_params[k] for k, _ in scene.kind_counts]

    t_k, hit_k, d_k, steps_k = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[ray_spec] * 8 + param_specs + cull_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(ox, oy, oz, dxx, dyy, dzz, ln, ep, *params, jnp.asarray(slot_gid),
      *cull_inputs)

    t_k, hit_k = t_k.reshape(npad)[:n], hit_k.reshape(npad)[:n]
    d_k, steps_k = d_k.reshape(npad)[:n], steps_k.reshape(npad)[:n]
    t = t_k + t0
    hit = hit_k.astype(bool) & ~miss0
    return MarchResult(hit=hit, t=jnp.where(miss0, t0, t),
                       distance=d_k, steps=steps_k)
