"""Contact: narrowphase + compliant constraint solver.

Replaces MuJoCo's collision pipeline + constraint solver (the C engine's
mj_collision/mj_solve as driven through reference binding_utils.py MjSim.step,
with the physics options the reference bakes into every world:
impratio=20, elliptic cone, solref/solimp per geom —
models/assets/base.xml:4-5, gripper fingerpad solref "0.01 0.5").

TPU-first design:
  * The candidate pair list is STATIC (compiled per model); narrowphase runs
    on every pair every step and produces a fixed-size contact buffer with
    active masks — no dynamic shapes under jit.
  * The solver operates on the dual: A = J M^-1 J^T + R with MuJoCo's
    solref/solimp-derived reference acceleration, solved by a fixed number of
    unrolled projected block-Gauss-Seidel sweeps with friction-cone
    projection. Everything is small dense linear algebra that vmaps cleanly
    over thousands of scenarios.

Supported geom pairs (round 1): plane/sphere/capsule/box combinations used by
the manipulation stack (boxes on table tops, fingerpads on objects, spheres,
capsules). Mesh geoms do not collide (robot links use primitive-approximated
collision shells defined in their model cards).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from robosuite_tpu.models import spec as S
from robosuite_tpu.ops import linalg as fastla

# solver iteration counts (module-level so benchmarks/configs can tune them;
# 30 APGD iterations validated on stack/grasp/trajectory parity fixtures)
APGD_ITERS = 30
POWER_ITERS = 8

# max contact points contributed per candidate pair, by (type1, type2) with
# type1 <= type2 (mujoco geom type codes)
_PAIR_POINTS = {
    (S.PLANE, S.SPHERE): 1,
    (S.PLANE, S.CAPSULE): 2,
    (S.PLANE, S.CYLINDER): 3,
    (S.PLANE, S.BOX): 8,
    (S.SPHERE, S.SPHERE): 1,
    (S.SPHERE, S.CAPSULE): 1,
    (S.SPHERE, S.CYLINDER): 1,
    (S.SPHERE, S.BOX): 1,
    (S.CAPSULE, S.CAPSULE): 1,
    (S.CAPSULE, S.CYLINDER): 1,
    (S.CAPSULE, S.BOX): 2,
    (S.CYLINDER, S.CYLINDER): 1,
    (S.CYLINDER, S.BOX): 2,
    (S.BOX, S.BOX): 25,  # 16 two-way vertex tests + 9 SAT edge-cross rows
    # convex hulls (mesh geoms with hull cards, tools/extract_meshes.py)
    (S.PLANE, S.MESH): 4,
    (S.SPHERE, S.MESH): 1,
    (S.CAPSULE, S.MESH): 2,
    (S.CYLINDER, S.MESH): 2,
    (S.BOX, S.MESH): 12,
    (S.MESH, S.MESH): 8,
}


def pair_max_points(t1: int, t2: int) -> int:
    key = (min(t1, t2), max(t1, t2))
    return _PAIR_POINTS.get(key, 1)


# Per-pair manifold cap: candidate manifolds larger than this are reduced to
# the MANIFOLD_CAP deepest points inside narrowphase. Four points span a
# planar contact patch (a box resting flat has exactly its four face corners
# deepest), so the reduction preserves resting/grasp physics while giving the
# solver a STATIC per-pair row layout: rows never move between slots, so no
# global active-row compaction is needed — the one-hot compaction matmul was
# the dominant XLA cost between the Pallas kernels at MPC batch widths.
MANIFOLD_CAP = 4


def pair_points(t1: int, t2: int) -> int:
    """Points per pair AFTER manifold reduction (the solver's row count)."""
    return min(pair_max_points(t1, t2), MANIFOLD_CAP)


def model_pair_points(model, t1: int, t2: int) -> int:
    """Model-aware points per pair: Model.pair_points_cap (reduced-manifold
    planning models) tightens the global MANIFOLD_CAP."""
    cap = model.pair_points_cap
    n = pair_points(t1, t2)
    if cap is None:
        return n
    if cap < 1:
        raise ValueError(f"pair_points_cap must be >= 1 (got {cap})")
    return min(n, cap)


def contact_row_layout(model):
    """Static map candidate-pair index -> contact-buffer row indices.

    THE single source of truth for the narrowphase buffer's row order:
    rows are GROUP-major (pair groups sorted by (type1, type2), pairs in
    model order within a group), `pair_points` rows per pair. Consumers
    that index the buffer by pair (grasp checks, force observables) must
    use this — a naive pair-index-order mapping reads the wrong rows
    whenever the model has more than one pair-type group."""
    groups: dict = {}
    for k in range(model.npair):
        t1 = model.geom_type[model.pair_geom1[k]]
        t2 = model.geom_type[model.pair_geom2[k]]
        key = (int(min(t1, t2)), int(max(t1, t2)))
        groups.setdefault(key, []).append(int(k))
    rows = {}
    row = 0
    for key in sorted(groups):
        npts = model_pair_points(model, *key)
        for k in groups[key]:
            rows[k] = list(range(row, row + npts))
            row += npts
    return rows


# ---------------------------------------------------------------------------
# primitive narrowphase — each returns (dist (n,), pos (n,3), normal (n,3))
# normal points from geom1 into geom2; dist < 0 means penetrating.
# inactive slots get dist = +big.
# ---------------------------------------------------------------------------

_BIG = 1e4


def _plane_sphere(p1, R1, s1, p2, R2, s2):
    n = R1[:, 2]
    d = jnp.dot(p2 - p1, n) - s2[0]
    pos = p2 - n * (s2[0] + 0.5 * d)
    return d[None], pos[None], n[None]


def _plane_capsule(p1, R1, s1, p2, R2, s2):
    n = R1[:, 2]
    axis = R2[:, 2]
    ends = jnp.stack([p2 + axis * s2[1], p2 - axis * s2[1]])
    d = (ends - p1) @ n - s2[0]
    pos = ends - n[None, :] * (s2[0] + 0.5 * d[:, None])
    nrm = jnp.broadcast_to(n, (2, 3))
    return d, pos, nrm


def _plane_cylinder(p1, R1, s1, p2, R2, s2):
    n = R1[:, 2]
    axis = R2[:, 2]
    # rim direction: steepest descent of the cap edge onto the plane
    proj = n - axis * jnp.dot(axis, n)
    pn = jnp.linalg.norm(proj)
    rim = jnp.where(pn > 1e-8, -proj / jnp.maximum(pn, 1e-8), R2[:, 0])
    pts = jnp.stack(
        [
            p2 + axis * s2[1] + rim * s2[0],
            p2 - axis * s2[1] + rim * s2[0],
            p2 + axis * s2[1] - rim * s2[0] * 0.0,  # center of near cap (stability)
        ]
    )
    d = (pts - p1) @ n
    pos = pts - n[None, :] * 0.5 * d[:, None]
    nrm = jnp.broadcast_to(n, (3, 3))
    return d, pos, nrm


def _plane_box(p1, R1, s1, p2, R2, s2):
    # all 8 corners tested (no top-k selection: discontinuous contact-point
    # switching between steps injects torque jitter at rest)
    n = R1[:, 2]
    corners = jnp.array(
        [[sx, sy, sz] for sx in (-1.0, 1.0) for sy in (-1.0, 1.0) for sz in (-1.0, 1.0)],
    )
    pts = p2[None, :] + (corners * s2[None, :]) @ R2.T  # (8, 3)
    d = (pts - p1[None, :]) @ n  # (8,)
    pos = pts - n[None, :] * 0.5 * d[:, None]
    nrm = jnp.broadcast_to(n, (8, 3))
    return d, pos, nrm


def _sphere_sphere(p1, R1, s1, p2, R2, s2):
    dp = p2 - p1
    dist = jnp.linalg.norm(dp)
    n = dp / jnp.maximum(dist, 1e-9)
    d = dist - s1[0] - s2[0]
    pos = p1 + n * (s1[0] + 0.5 * d)
    return d[None], pos[None], n[None]


def _seg_closest(p, a_mid, a_axis, a_half):
    """Closest point on segment (a_mid, +-a_half along a_axis) to point p."""
    t = jnp.clip(jnp.dot(p - a_mid, a_axis), -a_half, a_half)
    return a_mid + t * a_axis


def _sphere_capsule(p1, R1, s1, p2, R2, s2):
    c = _seg_closest(p1, p2, R2[:, 2], s2[1])
    dp = c - p1
    dist = jnp.linalg.norm(dp)
    n = dp / jnp.maximum(dist, 1e-9)
    d = dist - s1[0] - s2[0]
    pos = p1 + n * (s1[0] + 0.5 * d)
    return d[None], pos[None], n[None]


def _capsule_capsule(p1, R1, s1, p2, R2, s2):
    # closest points between two segments (stable closed form)
    a0 = p1 - R1[:, 2] * s1[1]
    a1 = p1 + R1[:, 2] * s1[1]
    b0 = p2 - R2[:, 2] * s2[1]
    b1 = p2 + R2[:, 2] * s2[1]
    da = a1 - a0
    db = b1 - b0
    r = a0 - b0
    A = jnp.dot(da, da) + 1e-12
    B = jnp.dot(da, db)
    C = jnp.dot(db, db) + 1e-12
    D = jnp.dot(da, r)
    E = jnp.dot(db, r)
    den = A * C - B * B
    s = jnp.clip(jnp.where(den > 1e-12, (B * E - C * D) / jnp.maximum(den, 1e-12), 0.0), 0.0, 1.0)
    t = jnp.clip((B * s + E) / C, 0.0, 1.0)
    s = jnp.clip((B * t - D) / A, 0.0, 1.0)
    pa = a0 + da * s
    pb = b0 + db * t
    dp = pb - pa
    dist = jnp.linalg.norm(dp)
    n = dp / jnp.maximum(dist, 1e-9)
    d = dist - s1[0] - s2[0]
    pos = pa + n * (s1[0] + 0.5 * d)
    return d[None], pos[None], n[None]


def _point_box_dist(p_local, half):
    """Signed distance + outward normal (local frame) from box surface to a point.

    The inside-branch normal is a softmax blend over the three face depths
    instead of a hard argmax: at box edges the nearest-face choice flickers
    between steps and injects lateral impulse spikes (observed as boxes
    "squirting" sideways on impact).
    """
    q = jnp.abs(p_local) - half
    outside = jnp.maximum(q, 0.0)
    d_out = jnp.linalg.norm(outside)
    d_in = jnp.max(q)  # negative inside
    inside = d_out < 1e-9
    d = jnp.where(inside, d_in, d_out)
    # normal: outside -> gradient of distance; inside -> smooth blend of the
    # shallowest faces (temperature ~2mm)
    n_out = jnp.sign(p_local) * outside / jnp.maximum(d_out, 1e-9)
    w = jax.nn.softmax(q / 2e-3)
    n_in_raw = jnp.sign(p_local) * w
    n_in = n_in_raw / jnp.maximum(jnp.linalg.norm(n_in_raw), 1e-9)
    n = jnp.where(inside, n_in, n_out)
    return d, n


def _sphere_box(p1, R1, s1, p2, R2, s2):
    pl = R2.T @ (p1 - p2)
    d_surf, n_l = _point_box_dist(pl, s2)
    n_w = -(R2 @ n_l)  # from sphere into box
    d = d_surf - s1[0]
    pos = p1 + n_w * (s1[0] + 0.5 * d)
    return d[None], pos[None], n_w[None]


def _capsule_box(p1, R1, s1, p2, R2, s2):
    out_d, out_p, out_n = [], [], []
    for sign in (-1.0, 1.0):
        e = p1 + R1[:, 2] * (sign * s1[1])
        # closest point of segment endpoint region: clamp endpoint to box for a
        # two-point approximation of the capsule-box manifold
        pl = R2.T @ (e - p2)
        d_surf, n_l = _point_box_dist(pl, s2)
        n_w = -(R2 @ n_l)
        d = d_surf - s1[0]
        out_d.append(d)
        out_p.append(e + n_w * (s1[0] + 0.5 * d))
        out_n.append(n_w)
    return jnp.stack(out_d), jnp.stack(out_p), jnp.stack(out_n)


def _box_box_edge_candidates(p1, R1, s1, p2, R2, s2):
    """SAT edge-cross-axis contacts (MuJoCo mjc_BoxBox edge case): 9
    candidate rows, all masked to +BIG except when the GLOBAL separating
    axis (max separation over 6 face + 9 edge axes) is that edge pair's
    cross axis — two boxes meeting edge-to-edge have no vertex inside the
    other, so the vertex tests alone let them interpenetrate."""
    dp = p2 - p1
    s1 = s1[:3]
    s2 = s2[:3]

    # face-axis separations (both boxes)
    def face_sep(R, h, other_R, other_h):
        axes = R.T  # (3, 3) rows
        t = axes @ dp
        proj_self = h
        proj_other = jnp.abs(axes @ other_R) @ other_h
        return jnp.abs(t) - proj_self - proj_other  # (3,)

    sep_f = jnp.concatenate([face_sep(R1, s1, R2, s2), face_sep(R2, s2, R1, s1)])
    max_face = jnp.max(sep_f)

    a_axes = R1.T  # rows = box1 edge directions
    b_axes = R2.T
    ds, poss, ns = [], [], []
    sep_e = []
    cands = []
    for i in range(3):
        for j in range(3):
            a = a_axes[i]
            b = b_axes[j]
            axis = jnp.cross(a, b)
            nrm = jnp.linalg.norm(axis)
            valid = nrm > 1e-6
            axis = axis / jnp.maximum(nrm, 1e-6)
            sgn = jnp.where(jnp.dot(axis, dp) < 0.0, -1.0, 1.0)
            axis = axis * sgn  # from box1 toward box2
            proj1 = jnp.sum(s1 * jnp.abs(a_axes @ axis))
            proj2 = jnp.sum(s2 * jnp.abs(b_axes @ axis))
            sep = jnp.dot(axis, dp) - proj1 - proj2
            sep = jnp.where(valid, sep, -jnp.inf)
            sep_e.append(sep)
            # supporting edges: box1 furthest along +axis (free along i),
            # box2 furthest along -axis (free along j)
            o1 = jnp.zeros(3)
            o2 = jnp.zeros(3)
            for k in range(3):
                if k != i:
                    o1 = o1 + jnp.sign(jnp.dot(axis, a_axes[k])) * s1[k] * a_axes[k]
                if k != j:
                    o2 = o2 - jnp.sign(jnp.dot(axis, b_axes[k])) * s2[k] * b_axes[k]
            c1 = p1 + o1
            c2 = p2 + o2
            # closest points of the two (infinite) edge lines, clamped
            r = c2 - c1
            ab = jnp.dot(a, b)
            den = jnp.maximum(1.0 - ab * ab, 1e-9)
            t1 = jnp.clip((jnp.dot(a, r) - ab * jnp.dot(b, r)) / den, -s1[i], s1[i])
            t2 = jnp.clip((ab * jnp.dot(a, r) - jnp.dot(b, r)) / den, -s2[j], s2[j])
            q1 = c1 + t1 * a
            q2 = c2 + t2 * b
            cands.append((sep, 0.5 * (q1 + q2), axis, valid))

    best_e = jnp.max(jnp.stack(sep_e))
    for sep, pos, axis, valid in cands:
        # only the globally-best axis emits a contact, and only when an
        # edge axis beats every face axis
        emit = valid & (sep >= best_e - 1e-9) & (sep > max_face)
        ds.append(jnp.where(emit, sep, _BIG))
        poss.append(pos)
        ns.append(axis)
    return jnp.stack(ds), jnp.stack(poss), jnp.stack(ns)


def _box_box(p1, R1, s1, p2, R2, s2):
    """Two-way vertex-in-box tests (16 rows) + SAT edge-cross contacts
    (9 masked rows; see _box_box_edge_candidates). Narrowphase reduces the
    25 candidates to the MANIFOLD_CAP deepest."""
    corners = jnp.array(
        [[sx, sy, sz] for sx in (-1.0, 1.0) for sy in (-1.0, 1.0) for sz in (-1.0, 1.0)]
    )
    # corners of box1 vs box2
    pts1 = p1[None, :] + (corners * s1[None, :]) @ R1.T
    pl = (pts1 - p2[None, :]) @ R2  # local in box2
    d1, n1 = jax.vmap(_point_box_dist, in_axes=(0, None))(pl, s2)
    nw1 = -jnp.einsum("ij,nj->ni", R2, n1)  # from box1 into box2... (into box2 surface)
    pos1 = pts1 + nw1 * 0.5 * d1[:, None]
    # corners of box2 vs box1 (normal flips: from box1 toward box2)
    pts2 = p2[None, :] + (corners * s2[None, :]) @ R2.T
    pl2 = (pts2 - p1[None, :]) @ R1
    d2, n2 = jax.vmap(_point_box_dist, in_axes=(0, None))(pl2, s1)
    nw2 = jnp.einsum("ij,nj->ni", R1, n2)
    pos2 = pts2 + (-nw2) * 0.5 * d2[:, None]
    de, pe, ne = _box_box_edge_candidates(p1, R1, s1, p2, R2, s2)
    d = jnp.concatenate([d1, d2, de])
    pos = jnp.concatenate([pos1, pos2, pe])
    nrm = jnp.concatenate([nw1, nw2, ne])
    return d, pos, nrm


# ---------------------------------------------------------------------------
# convex-hull (mesh) narrowphase. Hull operand = (verts (V,3), face_normals
# (F,3), face_dists (F,)) in the geom frame (padded; model.mesh_*). The
# "maxplane" signed distance max_f(n_f·p - d_f) is exact for penetrating
# points (the resting/grasping regime) and a smooth conservative
# underestimate outside — the same trade _point_box_dist makes, with the
# same softmax normal blending to avoid face-flip impulse spikes.
# ---------------------------------------------------------------------------


def _point_hull_dist(p_local, fnorm, fdist):
    """Signed maxplane distance + blended outward normal (hull frame)."""
    s = fnorm @ p_local - fdist  # (F,), <= 0 inside
    d = jnp.max(s)
    w = jax.nn.softmax(s / 2e-3)
    n_raw = w @ fnorm
    n = n_raw / jnp.maximum(jnp.linalg.norm(n_raw), 1e-9)
    return d, n


def _plane_hull(p1, R1, s1, p2, R2, h2):
    verts, _, _ = h2
    n = R1[:, 2]
    vw = p2[None, :] + verts @ R2.T
    d = (vw - p1[None, :]) @ n
    _, idx = jax.lax.top_k(-d, 4)  # 4 deepest vertices
    d4 = d[idx]
    pos = vw[idx] - n[None, :] * 0.5 * d4[:, None]
    return d4, pos, jnp.broadcast_to(n, (4, 3))


def _sphere_hull(p1, R1, s1, p2, R2, h2):
    _, fn_, fd_ = h2
    pl = R2.T @ (p1 - p2)
    d_surf, n_l = _point_hull_dist(pl, fn_, fd_)
    n_w = -(R2 @ n_l)  # from sphere into hull
    d = d_surf - s1[0]
    pos = p1 + n_w * (s1[0] + 0.5 * d)
    return d[None], pos[None], n_w[None]


def _capsule_hull(p1, R1, s1, p2, R2, h2):
    _, fn_, fd_ = h2
    out_d, out_p, out_n = [], [], []
    for sign in (-1.0, 1.0):
        e = p1 + R1[:, 2] * (sign * s1[1])
        pl = R2.T @ (e - p2)
        d_surf, n_l = _point_hull_dist(pl, fn_, fd_)
        n_w = -(R2 @ n_l)
        d = d_surf - s1[0]
        out_d.append(d)
        out_p.append(e + n_w * (s1[0] + 0.5 * d))
        out_n.append(n_w)
    return jnp.stack(out_d), jnp.stack(out_p), jnp.stack(out_n)


def _box_hull(p1, R1, s1, p2, R2, h2):
    """Two-way vertex test: hull vertices vs box + box corners vs hull
    faces (the _box_box pattern with maxplane standing in for the second
    box's face set)."""
    verts, fn_, fd_ = h2
    # hull verts in box-local
    vw = p2[None, :] + verts @ R2.T
    vl = (vw - p1[None, :]) @ R1
    d1, n1 = jax.vmap(_point_box_dist, in_axes=(0, None))(vl, s1)
    nw1 = jnp.einsum("ij,nj->ni", R1, n1)  # from box into hull
    _, idx = jax.lax.top_k(-d1, 4)
    d1, nw1, vw1 = d1[idx], nw1[idx], vw[idx]
    pos1 = vw1 - nw1 * 0.5 * d1[:, None]
    # box corners vs hull faces
    corners = jnp.array(
        [[sx, sy, sz] for sx in (-1.0, 1.0) for sy in (-1.0, 1.0) for sz in (-1.0, 1.0)]
    )
    cw = p1[None, :] + (corners * s1[None, :]) @ R1.T
    cl = (cw - p2[None, :]) @ R2
    d2, n2 = jax.vmap(_point_hull_dist, in_axes=(0, None, None))(cl, fn_, fd_)
    nw2 = -jnp.einsum("ij,nj->ni", R2, n2)  # from box into hull
    pos2 = cw + nw2 * 0.5 * d2[:, None]
    return (
        jnp.concatenate([d1, d2]),
        jnp.concatenate([pos1, pos2]),
        jnp.concatenate([nw1, nw2]),
    )


def _hull_hull(p1, R1, h1, p2, R2, h2):
    """Vertices of each hull against the other's face planes (4 deepest
    per direction)."""
    verts1, fn1, fd1 = h1
    verts2, fn2, fd2 = h2

    def verts_vs(pv, Rv, verts, pf, Rf, fn_, fd_, sign):
        vw = pv[None, :] + verts @ Rv.T
        vl = (vw - pf[None, :]) @ Rf
        d, n = jax.vmap(_point_hull_dist, in_axes=(0, None, None))(vl, fn_, fd_)
        nw = sign * jnp.einsum("ij,nj->ni", Rf, n)
        _, idx = jax.lax.top_k(-d, 4)
        d, nw, vwk = d[idx], nw[idx], vw[idx]
        # contact midpoint: half the depth along the face hull's OUTWARD
        # normal (= -sign * nw), mirroring _box_box's two directions
        pos = vwk - sign * nw * 0.5 * d[:, None]
        return d, pos, nw

    # hull1's verts vs hull2's faces: outward normal of hull2 points toward
    # hull1 -> contact normal (from geom1 into geom2) is its negation
    d_a, p_a, n_a = verts_vs(p1, R1, verts1, p2, R2, fn2, fd2, -1.0)
    # hull2's verts vs hull1's faces: outward normal of hull1 IS the
    # from-1-into-2 direction
    d_b, p_b, n_b = verts_vs(p2, R2, verts2, p1, R1, fn1, fd1, 1.0)
    return (
        jnp.concatenate([d_a, d_b]),
        jnp.concatenate([p_a, p_b]),
        jnp.concatenate([n_a, n_b]),
    )


_DISPATCH = {
    (S.PLANE, S.SPHERE): _plane_sphere,
    (S.PLANE, S.CAPSULE): _plane_capsule,
    (S.PLANE, S.CYLINDER): _plane_cylinder,
    (S.PLANE, S.BOX): _plane_box,
    (S.SPHERE, S.SPHERE): _sphere_sphere,
    (S.SPHERE, S.CAPSULE): _sphere_capsule,
    (S.SPHERE, S.BOX): _sphere_box,
    (S.CAPSULE, S.CAPSULE): _capsule_capsule,
    (S.CAPSULE, S.BOX): _capsule_box,
    (S.BOX, S.BOX): _box_box,
    # cylinders approximated as capsules for non-plane pairs
    (S.SPHERE, S.CYLINDER): _sphere_capsule,
    (S.CAPSULE, S.CYLINDER): _capsule_capsule,
    (S.CYLINDER, S.CYLINDER): _capsule_capsule,
    (S.CYLINDER, S.BOX): _capsule_box,
    # convex hulls (mesh geoms with hull cards)
    (S.PLANE, S.MESH): _plane_hull,
    (S.SPHERE, S.MESH): _sphere_hull,
    (S.CAPSULE, S.MESH): _capsule_hull,
    (S.CYLINDER, S.MESH): _capsule_hull,
    (S.BOX, S.MESH): _box_hull,
    (S.MESH, S.MESH): _hull_hull,
}


def narrowphase(model, kin, pairs=None):
    """Run candidate pairs; return fixed-size contact buffer.

    `pairs`: optional static list of pair indices to restrict to — contact
    QUERIES (grasp checks, per-pair touch tests in rewards) only need their
    own pairs, and running the full buffer inside every reward evaluation
    dominated MPC planning rollouts. Row order within the subset stays
    group-major, so a subset's rows are ordered like the full buffer's
    restriction to those pairs.

    Returns dict with (ncon_max,) / (ncon_max,3)-shaped arrays:
      dist, pos, frame (3x3, rows normal/t1/t2), friction (3,), solref, solimp,
      geom1/geom2 body ids (static lists), include mask from dist threshold.
    """
    pair_filter = None if pairs is None else set(int(p) for p in pairs)
    # Group candidate pairs by (type1, type2) and run each group's kernel
    # ONCE, vmapped over the pair axis — one vectorized SAT for all box-box
    # pairs instead of npair unrolled copies of the graph. Grouping is
    # static (depends only on the compiled model), so this happens at trace
    # time; row order is group-major but all per-row metadata travels with
    # the rows.
    groups: dict = {}
    for k in range(model.npair):
        if pair_filter is not None and k not in pair_filter:
            continue
        g1, g2 = model.pair_geom1[k], model.pair_geom2[k]
        t1, t2 = model.geom_type[g1], model.geom_type[g2]
        flip = t1 > t2
        if flip:
            g1, g2 = g2, g1
            t1, t2 = t2, t1
        groups.setdefault((int(t1), int(t2)), []).append((int(g1), int(g2), int(k), flip))

    # lane-form group kernels (ops/pallas_substep.py _LANE_DISPATCH, the
    # megakernel's narrowphase formulas): the vmapped per-pair kernels put
    # the 3-vector dim minor, which TPU tiling pads to 128 lanes — ~40x
    # wasted bandwidth (measured 19.9 ms/substep for NutAssembly's 138
    # box-box pairs at B=512). Evaluating the SAME formulas on per-pair
    # component arrays makes every intermediate (..., P), which tiles
    # cleanly; mesh/hull groups keep the vmapped path.
    from robosuite_tpu.ops.pallas_substep import _LANE_DISPATCH

    dists, poss, nrms = [], [], []
    con_body1, con_body2, con_pair = [], [], []
    for (t1, t2), items in sorted(groups.items()):
        fn = _DISPATCH[(t1, t2)]
        g1s = np.array([it[0] for it in items])
        g2s = np.array([it[1] for it in items])

        def side_operand(gs, t):
            if t == S.MESH:
                mids = np.array([model.geom_meshid[g] for g in gs])
                return (model.mesh_verts[mids], model.mesh_fnorm[mids], model.mesh_fdist[mids])
            return jnp.asarray(model.geom_size)[gs]

        lane_fn = _LANE_DISPATCH.get((t1, t2)) if S.MESH not in (t1, t2) else None
        if lane_fn is not None:
            def lanes_of(gs):
                pos_c = tuple(kin.geom_xpos[gs, i] for i in range(3))
                mat_c = [[kin.geom_xmat[gs, i, j] for j in range(3)] for i in range(3)]
                sz = jnp.asarray(model.geom_size)[gs]
                sz_c = tuple(sz[:, i] for i in range(3))
                return pos_c, mat_c, sz_c

            p1c, R1c, s1c = lanes_of(g1s)
            p2c, R2c, s2c = lanes_of(g2s)
            rows = lane_fn(p1c, R1c, s1c, p2c, R2c, s2c)
            P = len(items)
            bc = lambda x: jnp.broadcast_to(jnp.asarray(x), rows[0][0].shape)  # noqa: E731
            d = jnp.stack([r[0] for r in rows], axis=-1)  # (P, ncand)
            p = jnp.stack(
                [jnp.stack([bc(c) for c in r[1]], axis=-1) for r in rows], axis=-2
            )  # (P, ncand, 3)
            n = jnp.stack(
                [jnp.stack([bc(c) for c in r[2]], axis=-1) for r in rows], axis=-2
            )
        else:
            d, p, n = jax.vmap(fn)(
                kin.geom_xpos[g1s], kin.geom_xmat[g1s], side_operand(g1s, t1),
                kin.geom_xpos[g2s], kin.geom_xmat[g2s], side_operand(g2s, t2),
            )  # d: (P, npts), p/n: (P, npts, 3)
        flip_sign = np.array([-1.0 if it[3] else 1.0 for it in items], dtype=np.float32)
        n = n * flip_sign[:, None, None]
        # manifold reduction: keep the (model-aware) cap's deepest points per
        # pair (see MANIFOLD_CAP note — static row layout, no compaction)
        cap_ = model_pair_points(model, t1, t2)
        if d.shape[1] > cap_:
            _, idx = jax.lax.top_k(-d, cap_)  # (P, CAP)
            d = jnp.take_along_axis(d, idx, axis=1)
            p = jnp.take_along_axis(p, idx[:, :, None], axis=1)
            n = jnp.take_along_axis(n, idx[:, :, None], axis=1)
        npts = d.shape[1]
        dists.append(d.reshape(-1))
        poss.append(p.reshape(-1, 3))
        nrms.append(n.reshape(-1, 3))
        for _, _, k, _ in items:
            b1 = model.geom_bodyid[model.pair_geom1[k]]
            b2 = model.geom_bodyid[model.pair_geom2[k]]
            con_body1 += [b1] * npts
            con_body2 += [b2] * npts
            con_pair += [k] * npts

    if not dists:
        return None

    dist = jnp.concatenate(dists)
    pos = jnp.concatenate(poss)
    normal = jnp.concatenate(nrms)
    pair_idx = np.asarray(con_pair, dtype=np.int32)  # static index

    # tangent frame via stable orthonormalization
    n = normal / jnp.maximum(jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-9)
    ref = jnp.where(jnp.abs(n[:, 0:1]) < 0.5, jnp.array([[1.0, 0, 0]]), jnp.array([[0.0, 1, 0]]))
    t1v = jnp.cross(n, ref)
    t1v = t1v / jnp.maximum(jnp.linalg.norm(t1v, axis=-1, keepdims=True), 1e-9)
    t2v = jnp.cross(n, t1v)

    return dict(
        dist=dist,
        pos=pos,
        normal=n,
        t1=t1v,
        t2=t2v,
        friction=model.pair_friction[pair_idx],
        solref=model.pair_solref[pair_idx],
        solimp=model.pair_solimp[pair_idx],
        margin=model.pair_margin[pair_idx],
        body1=tuple(con_body1),
        body2=tuple(con_body2),
    )


# ---------------------------------------------------------------------------
# constraint solver (dual PGS with friction cone)
# ---------------------------------------------------------------------------


def _impedance(solimp, x):
    """MuJoCo constraint impedance d(x) from solimp = (d0, dmax, width,
    midpoint, power); x is constraint violation distance (>= 0)."""
    d0, dmax, width, mid, pw = (solimp[..., i] for i in range(5))
    xw = jnp.clip(x / jnp.maximum(width, 1e-9), 0.0, 1.0)
    # mujoco sigmoid: two-sided power curve around midpoint
    a = 1.0 / jnp.maximum(mid, 1e-9) ** (pw - 1.0)
    b = 1.0 / jnp.maximum(1.0 - mid, 1e-9) ** (pw - 1.0)
    y_lo = a * xw ** pw
    y_hi = 1.0 - b * (1.0 - xw) ** pw
    y = jnp.where(xw < mid, y_lo, y_hi)
    return d0 + y * (dmax - d0)


def pair_min_dists(model, kin):
    """(npair,) min narrowphase distance per candidate pair (after manifold
    reduction) — the XLA analog of the fused substep kernel's pair-distance
    aux output; feeds KinData.pair_dist for compaction-free contact queries."""
    con = narrowphase(model, kin)
    layout = contact_row_layout(model)
    return jnp.stack([
        jnp.min(con["dist"][jnp.asarray(layout[k])]) for k in range(model.npair)
    ])


def contact_warmstart_dim(model):
    """Length of the solver's flat force vector for this model (static):
    3*K cone rows + bilateral equality rows."""
    nc_total = 0
    for k in range(model.npair):
        t1 = model.geom_type[model.pair_geom1[k]]
        t2 = model.geom_type[model.pair_geom2[k]]
        nc_total += model_pair_points(model, t1, t2)
    K = min(ROW_CAP, nc_total) if uses_row_compaction(model) else nc_total
    ne = 0
    if model.neq:
        from robosuite_tpu.physics.equality import equality_row_count

        ne = equality_row_count(model)
    return K * 3 + ne


def solver_inputs(model, kin, con, M, qvel, qfrc_smooth, dt, eq=None, damping=None):
    """Build the grouped-row cone-QP operands from the raw narrowphase buffer:
    active-row compaction, contact Jacobians, solref/solimp dynamics.

    Returns (M, JfT, aref, qfrc_smooth, qvel, damping, reg3, mu, active) —
    exactly the Pallas vel-solver's argument tuple — plus (ntot, nc, ne)
    static row counts. Split out of constrained_vel_update so profiling and
    fused-kernel callers can address the row-assembly stage separately."""
    if damping is None:
        damping = model.dof_damping
    return _solver_inputs_impl(model, kin, con, M, qvel, qfrc_smooth, dt, eq, damping)


def constrained_vel_update(model, kin, con, M, qvel, qfrc_smooth, dt, eq=None, damping=None):
    """Full constrained velocity update for one substep:
    qacc_smooth solve + cone QP + implicit-damping integration, returning
    (qvel_new (nv,), f (flat solver forces)).

    Implements the MuJoCo-style soft-constraint dual problem:
      A = J M^-1 J^T,  R = diag((1-d)/d * A_ii, friction rows / impratio)
      aref = -b * (J qvel) - k * dist          (per solref/solimp)
      solve (A + R) f = aref - a0 with f in the friction cone via APGD,
    then (M + dt diag(damping)) dv = qfrc_smooth + J^T f - damping qvel.

    On TPU under vmap the whole update runs as ONE Pallas kernel with all
    operands VMEM-resident across APGD iterations (ops/pallas_contact.py);
    the XLA fori_loop version re-streamed ~20 MB/iteration from HBM.

    `damping` (default model.dof_damping) lets the caller fold in extra
    state-dependent implicit damping (active joint-limit rows, engine.py).
    """
    if damping is None:
        damping = model.dof_damping

    def vel_from_qfrc_con(qfrc_con):
        Mh = M + dt * jnp.diag(damping)
        rhs = qfrc_smooth + qfrc_con - damping * qvel
        return qvel + dt * fastla.solve_spd(Mh, rhs)

    if con is None and eq is None:
        return vel_from_qfrc_con(0.0), jnp.zeros(0, dtype=qvel.dtype)
    if con is None:
        # equality-only system: solve bilateral rows directly
        J_eq, aref_eq = eq
        Lm = fastla.chol_factor(M)
        qacc_smooth = fastla.chol_solve(Lm, qfrc_smooth - damping * qvel)
        MinvJT = fastla.chol_solve(Lm, J_eq.T)
        A = J_eq @ MinvJT
        rhs = aref_eq - J_eq @ qacc_smooth
        reg = 0.05 * jnp.maximum(jnp.diagonal(A), 1e-8)
        f = fastla.solve_spd(A + jnp.diag(reg), rhs)
        return vel_from_qfrc_con(J_eq.T @ f), f

    args, (ntot, nc, ne) = _solver_inputs_impl(
        model, kin, con, M, qvel, qfrc_smooth, dt, eq, damping
    )
    from robosuite_tpu.ops.pallas_contact import make_vel_solver

    iters = model.solver_iters if model.solver_iters is not None else APGD_ITERS
    piters = model.solver_power_iters if model.solver_power_iters is not None else POWER_ITERS
    solver = make_vel_solver(model.nv, ntot, nc, ne, iters, piters, float(dt))
    return solver(*args)


ROW_CAP = 96            # compacted slot count for big worlds
# static-row limit: nv * 3R must fit the VMEM solver. The fused megakernel's
# peak is dominated by the unrolled row-build liveness (measured: Wipe at
# nv*3R = 9408 needs ~45 MB scoped VMEM), so the budget stays conservative;
# PickPlace/NutAssembly/TwoArm/Wipe compact and keep the two-kernel path.
ROW_VMEM_BUDGET = 8000


def uses_row_compaction(model) -> bool:
    """True when this model's static-row solver would not fit the VMEM
    kernel (nv * 3R > ROW_VMEM_BUDGET) and active rows therefore compact
    into ROW_CAP dynamic slots (big worlds: PickPlace/NutAssembly). The
    SAME predicate gates the fused substep megakernel (its row layout must
    match this module's solver rows exactly). Row-indexed f-vector
    consumers (eef wrench) are only valid when this is False."""
    n = 0
    for k in range(model.npair):
        t1 = model.geom_type[model.pair_geom1[k]]
        t2 = model.geom_type[model.pair_geom2[k]]
        n += model_pair_points(model, t1, t2)
    return model.nv * 3 * n > ROW_VMEM_BUDGET


def _solver_inputs_impl(model, kin, con, M, qvel, qfrc_smooth, dt, eq, damping):
    nc_total = con["dist"].shape[0]
    nv = model.nv

    # --- row layout ---------------------------------------------------------
    # narrowphase already reduced each pair's manifold to <= MANIFOLD_CAP
    # deepest points. Small worlds (nc_total <= ROW_CAP) use the candidate
    # buffer AS the solver row set: every row keeps a fixed (pair, point)
    # identity and inactive rows ride through masked — no compaction, which
    # at MPC widths dominated the substep and silently dropped contacts.
    # BIG worlds (PickPlace: 384 rows, NutAssembly: 680) cannot afford a
    # dense (3*nc_total)-row dual (the VMEM kernel would not fit and the
    # XLA path's matvecs balloon), so they keep the prefix-sum one-hot
    # compaction into ROW_CAP dynamic slots.
    if uses_row_compaction(model):
        K = min(ROW_CAP, nc_total)
        depth_score = -(con["dist"] - con["margin"])
        act_full = depth_score > 0.0
        slot = jnp.cumsum(act_full.astype(jnp.int32)) - 1
        slot = jnp.where(act_full, slot, K)  # inactive / overflow rows drop
        onehot = (slot[:, None] == jnp.arange(K, dtype=jnp.int32)[None, :]).astype(
            con["dist"].dtype
        )
        b1f = np.asarray(con["body1"], dtype=np.int32)
        b2f = np.asarray(con["body2"], dtype=np.int32)
        dmask_full = jnp.asarray(model.ancestor_mask[b2f] - model.ancestor_mask[b1f])
        fields = [
            ("dist", con["dist"][:, None]),
            ("margin", con["margin"][:, None]),
            ("pos", con["pos"]),
            ("normal", con["normal"]),
            ("friction", con["friction"]),
            ("solref", con["solref"]),
            ("solimp", con["solimp"]),
            ("t1", con["t1"]),
            ("t2", con["t2"]),
            ("dmask", dmask_full),
        ]
        cols = jnp.concatenate([v for _, v in fields], axis=-1)
        sel_cols = onehot.T @ cols  # (K, D) — the only pass over the full buffer
        out = {}
        i = 0
        for name, v in fields:
            out[name] = sel_cols[:, i : i + v.shape[-1]]
            i += v.shape[-1]
        dist = out["dist"][:, 0]
        margin = out["margin"][:, 0]
        pos = out["pos"]
        normal = out["normal"]
        friction = out["friction"]
        solref = out["solref"]
        solimp = out["solimp"]
        t1 = out["t1"]
        t2 = out["t2"]
        dmask = out["dmask"]
        nc = K
    else:
        dist = con["dist"]
        margin = con["margin"]
        pos = con["pos"]
        normal = con["normal"]
        friction = con["friction"]
        solref = con["solref"]
        solimp = con["solimp"]
        t1 = con["t1"]
        t2 = con["t2"]
        b1 = np.asarray(con["body1"], dtype=np.int32)
        b2 = np.asarray(con["body2"], dtype=np.int32)
        dmask = jnp.asarray(model.ancestor_mask[b2] - model.ancestor_mask[b1])  # (nc_total, nv)
        nc = nc_total
    # contact jacobians, batched: rows (normal, t1, t2), J (nc, 3, nv)
    jac_lin = kin.sdof_lin[None, :, :] + jnp.cross(
        kin.sdof_ang[None, :, :], pos[:, None, :]
    )  # (nc, nv, 3)
    frame = jnp.stack([normal, t1, t2], axis=1)  # (nc, 3, 3)
    J = jnp.einsum("cij,cvj,cv->civ", frame, jac_lin, dmask)  # (nc, 3, nv)

    # active contacts (include margin)
    pen = -(dist - margin)  # > 0 when violating
    active = (pen > 0.0).astype(qvel.dtype)

    # impedance + solref dynamics
    d = _impedance(solimp, pen)  # (nc,)
    d = jnp.clip(d, 1e-4, 1.0 - 1e-4)
    timeconst = jnp.maximum(solref[:, 0], 2.0 * dt)
    # clamp: empty compaction slots carry solref=0; without the floor the
    # stiffness k below becomes inf and inf*0 = NaN poisons the whole state
    dampratio = jnp.maximum(solref[:, 1], 1e-3)
    dmax = jnp.clip(solimp[:, 1], 1e-4, 1.0 - 1e-4)
    k = d / (dmax * dmax * timeconst * timeconst * dampratio * dampratio)
    b = 2.0 / (dmax * timeconst)

    vel = (J @ qvel).reshape(nc, 3)  # contact-frame velocity
    # aref = -b * rdot - k * r with r = signed distance (= -pen when violating);
    # friction rows carry the damping term only (MuJoCo semantics) so the
    # solver drives tangential slip velocity toward zero within the cone
    aref_n = -b * vel[:, 0] + k * pen

    # --- grouped-row cone QP, solved by the Pallas APGD kernel --------------
    # rows ordered [normals | t1 | t2 | equality] so the cone projection is
    # three contiguous block ops on TPU (ops/pallas_contact.py); the
    # regularizer base carries the per-row scaling ((1-d)/d, impratio on
    # friction rows, 0.05 on bilateral rows) with diag(A) applied in-solver.
    reg_base = (1.0 - d) / d
    Jf_rows = [J[:, 0, :], J[:, 1, :], J[:, 2, :]]
    aref_rows = [aref_n, -b * vel[:, 1], -b * vel[:, 2]]
    reg_rows = [reg_base, reg_base / model.impratio, reg_base / model.impratio]
    ne = 0
    if eq is not None:
        J_eq, aref_eq = eq
        ne = J_eq.shape[0]
        Jf_rows.append(J_eq)
        aref_rows.append(aref_eq)
        reg_rows.append(0.05 * jnp.ones(ne, dtype=qvel.dtype))

    Jf = jnp.concatenate(Jf_rows)             # (ntot, nv) grouped
    aref = jnp.concatenate(aref_rows)
    reg3 = jnp.concatenate(reg_rows)
    mu = friction[:, 0]
    ntot = nc * 3 + ne

    args = (M, Jf.T, aref, qfrc_smooth, qvel, damping, reg3, mu, active)
    return args, (ntot, nc, ne)
