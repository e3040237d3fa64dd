"""Fused substep megakernel: one Pallas kernel per physics substep.

The round-2 profile showed the batched substep was dominated not by compute
but by the XLA glue BETWEEN the two Pallas kernels (forward products,
contact APGD): lane-padded (…, 3)-minor narrowphase math, the contact-row
assembly, and the batch-major<->batch-minor transposes around each kernel
streamed hundreds of MB of HBM per substep at MPC widths. This kernel
computes the ENTIRE substep on-chip:

    FK + CRBA + RNEA  (ops/pallas_forward.forward_lane_body)
    -> OSC torque law per arm + gripper ctrl     (reference osc.py:403-495)
    -> actuator/passive/limit/friction smooth forces (engine.py analogs)
    -> narrowphase + per-pair manifold reduction (physics/contact.py analogs)
    -> grouped-row cone QP + implicit-damping velocity solve
       (ops/pallas_contact.constrained_vel_lanes)
    -> semi-implicit position integration        (engine._integrate_qpos)

I/O per substep is just (qpos, qvel, goals, DR leaves) in and
(qpos', qvel', f) out — a few hundred bytes per scenario instead of tens of
kilobytes, so the 25-substep policy loop and H=64 MPC planning rollouts run
at VPU compute speed instead of HBM streaming speed.

Controller goals arrive pre-resolved in the WORLD frame (the tick-rate
set_goal stays in XLA: osc.desired_world_pose); the kernel implements the
substep-rate torque law only. Dispatched through jax.custom_vmap /
custom_jvp exactly like the other kernels: unbatched or non-TPU calls run
the XLA composition (the correctness oracle), MPC linearization tangents
ride the XLA path.

Reference anchors: the fused loop replaces the reference's 25-iteration
Python/C hot loop (environments/base.py:494-505) and its per-substep
mj_step1/OSC/mj_step2 sequence (fixed_base_robot.py:121-177).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.custom_batching import custom_vmap

from robosuite_tpu.models import spec as S
from robosuite_tpu.ops.pallas_forward import (
    LANES,
    _add,
    _cross,
    _dot,
    _quat2mat,
    _quat_mul,
    _scale,
    _sub,
    forward_lane_body,
)

_BIG = 1e4


class UnsupportedFused(Exception):
    """World/controller combination the megakernel does not cover (caller
    falls back to the two-kernel + XLA-glue path)."""


# ---------------------------------------------------------------------------
# static specs
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ArmOSCSpec:
    """Static per-arm controller data baked into the kernel (indices +
    constants). kp/kd arrive as runtime inputs so variable-impedance modes
    work. ctrl_type selects the in-kernel law: "osc" (run_world analog) or
    "joint_pos" (tau = M (kp e - kd qdot) + bias, joint_pos.py:233-272)."""

    qv_idx: Tuple[int, ...]
    qp_idx: Tuple[int, ...]
    eef_site: int
    center_site: int
    actuator_ids: Tuple[int, ...]
    torque_lo: Tuple[float, ...]
    torque_hi: Tuple[float, ...]
    initial_joint: Tuple[float, ...]
    uncouple: bool
    ctrl_type: str = "osc"
    use_torque_compensation: bool = True


@dataclasses.dataclass(frozen=True)
class FusedSpec:
    arm: ArmOSCSpec
    grip_actuators: Tuple[int, ...]


def extract_spec(env, model) -> FusedSpec:
    """Validate env/model support and extract the static spec."""
    from robosuite_tpu.controllers.parts import osc as osc_mod
    from robosuite_tpu.robots.robot import FixedBaseRobot, MobileRobot

    # domain randomization passes models with TRACED leaves; only
    # mass/inertia/gravity/armature are runtime kernel inputs — anything
    # else traced means the kernel's baked constants would be wrong
    runtime_inputs = {"body_mass", "body_inertia", "gravity", "dof_armature"}
    for fname in dataclasses.fields(type(model)):
        if fname.name in runtime_inputs:
            continue
        leaf = getattr(model, fname.name)
        if isinstance(leaf, jax.core.Tracer):
            raise UnsupportedFused(f"traced model leaf {fname.name}")

    if model.ntendon:
        raise UnsupportedFused("tendons")
    if model.neq:
        raise UnsupportedFused("equality constraints")
    if len(env.robots) != 1:
        raise UnsupportedFused("multi-robot")
    robot = env.robots[0]
    if isinstance(robot, MobileRobot) or not isinstance(robot, FixedBaseRobot):
        raise UnsupportedFused("non-fixed-base robot")
    if getattr(robot, "_wbik_spec", None) is not None:
        raise UnsupportedFused("WBIK composite")
    if len(robot.arms) != 1:
        raise UnsupportedFused("multi-arm")
    from robosuite_tpu.controllers.parts import joint_pos as jp_mod

    arm = robot.arms[0]
    cfg = robot.arm_cfg[arm]
    if isinstance(cfg, osc_mod.OSCConfig):
        ctrl_type = "osc"
    elif isinstance(cfg, jp_mod.JointPosConfig):
        ctrl_type = "joint_pos"
    else:
        raise UnsupportedFused(f"arm controller {type(cfg).__name__}")
    pairs = _pair_meta(model)  # raises on unsupported pair types
    # VMEM budget: the kernel needs the STATIC row layout; worlds whose
    # solver compacts rows (contact.uses_row_compaction — same predicate)
    # need in-kernel pair compaction before they can fuse (future).
    from robosuite_tpu.physics import contact as _C

    if _C.uses_row_compaction(model):
        ntot = 3 * sum(p["npts"] for p in pairs)
        raise UnsupportedFused(f"solver too large for VMEM (nv*ntot={model.nv * ntot})")

    lo, hi = robot.torque_limits[arm]
    grip_acts: Tuple[int, ...] = ()
    if arm in robot.rm.grippers and robot.rm.grippers[arm].dof > 0:
        grip_acts = tuple(int(a) for a in robot.gripper_actuator_ids[arm])
    spec = FusedSpec(
        arm=ArmOSCSpec(
            qv_idx=tuple(int(i) for i in robot.arm_qvel_idx[arm]),
            qp_idx=tuple(int(i) for i in robot.arm_qpos_idx[arm]),
            eef_site=int(robot.eef_site_id[arm]),
            center_site=int(robot.center_site_id[arm]),
            actuator_ids=tuple(int(a) for a in robot.arm_actuator_ids[arm]),
            torque_lo=tuple(float(x) for x in np.asarray(lo)),
            torque_hi=tuple(float(x) for x in np.asarray(hi)),
            initial_joint=tuple(float(x) for x in np.asarray(robot.initial_joint[arm])),
            uncouple=bool(getattr(cfg, "uncouple_pos_ori", True)),
            ctrl_type=ctrl_type,
            use_torque_compensation=bool(getattr(cfg, "use_torque_compensation", True)),
        ),
        grip_actuators=grip_acts,
    )
    for a in range(model.nu):
        if model.actuator_kind[a] == "general":
            raise UnsupportedFused("general actuator")
        if model.actuator_tenid[a] >= 0:
            raise UnsupportedFused("tendon actuator")
    return spec


_SUPPORTED_PAIR_TYPES = {
    (S.PLANE, S.SPHERE), (S.PLANE, S.CAPSULE), (S.PLANE, S.CYLINDER),
    (S.PLANE, S.BOX), (S.SPHERE, S.SPHERE), (S.SPHERE, S.CAPSULE),
    (S.SPHERE, S.CYLINDER), (S.SPHERE, S.BOX), (S.CAPSULE, S.CAPSULE),
    (S.CAPSULE, S.CYLINDER), (S.CYLINDER, S.CYLINDER), (S.CAPSULE, S.BOX),
    (S.CYLINDER, S.BOX), (S.BOX, S.BOX),
}


def _pair_meta(model):
    """Static pair list in the narrowphase buffer's GROUP-major row order
    (must match contact.narrowphase + contact.contact_row_layout exactly)."""
    from robosuite_tpu.physics import contact as C

    groups: dict = {}
    for k in range(model.npair):
        g1, g2 = int(model.pair_geom1[k]), int(model.pair_geom2[k])
        t1, t2 = int(model.geom_type[g1]), int(model.geom_type[g2])
        flip = t1 > t2
        if flip:
            g1, g2 = g2, g1
            t1, t2 = t2, t1
        groups.setdefault((t1, t2), []).append((g1, g2, k, flip))

    pairs = []
    for key in sorted(groups):
        if key not in _SUPPORTED_PAIR_TYPES:
            raise UnsupportedFused(f"pair type {key}")
        for g1, g2, k, flip in groups[key]:
            pairs.append(dict(
                types=key, g1=g1, g2=g2, pair=k, flip=flip,
                npts=C.model_pair_points(model, *key),
                friction=float(np.asarray(model.pair_friction)[k, 0]),
                solref=tuple(float(x) for x in np.asarray(model.pair_solref)[k]),
                solimp=tuple(float(x) for x in np.asarray(model.pair_solimp)[k]),
                margin=float(np.asarray(model.pair_margin)[k]),
                body1=int(model.geom_bodyid[model.pair_geom1[k]]),
                body2=int(model.geom_bodyid[model.pair_geom2[k]]),
            ))
    return pairs


# ---------------------------------------------------------------------------
# lane narrowphase (mirrors physics/contact.py primitive formulas)
# ---------------------------------------------------------------------------


def _norm3(v, eps=1e-9):
    return jnp.sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2])


def _matcol(R, i):
    return (R[0][i], R[1][i], R[2][i])


def _matT_vec(R, v):
    """R^T @ v for 3x3 row-tuple R."""
    return (
        R[0][0] * v[0] + R[1][0] * v[1] + R[2][0] * v[2],
        R[0][1] * v[0] + R[1][1] * v[1] + R[2][1] * v[2],
        R[0][2] * v[0] + R[1][2] * v[1] + R[2][2] * v[2],
    )


def _mat_vec(R, v):
    return (
        R[0][0] * v[0] + R[0][1] * v[1] + R[0][2] * v[2],
        R[1][0] * v[0] + R[1][1] * v[1] + R[1][2] * v[2],
        R[2][0] * v[0] + R[2][1] * v[1] + R[2][2] * v[2],
    )


_CORNERS = [(sx, sy, sz) for sx in (-1.0, 1.0) for sy in (-1.0, 1.0) for sz in (-1.0, 1.0)]


def _point_box_lane(pl, half):
    """contact._point_box_dist on lanes. pl: 3-tuple lanes; half: 3 floats.
    Returns (d, n_local 3-tuple)."""
    q = [jnp.abs(pl[i]) - half[i] for i in range(3)]
    outside = [jnp.maximum(q[i], 0.0) for i in range(3)]
    d_out = _norm3(outside)
    d_in = jnp.maximum(jnp.maximum(q[0], q[1]), q[2])
    inside = d_out < 1e-9
    d = jnp.where(inside, d_in, d_out)
    n_out = [jnp.sign(pl[i]) * outside[i] / jnp.maximum(d_out, 1e-9) for i in range(3)]
    # softmax over the three face depths (temperature 2 mm), max-subtracted
    mx = jnp.maximum(jnp.maximum(q[0], q[1]), q[2])
    e = [jnp.exp((q[i] - mx) / 2e-3) for i in range(3)]
    se = e[0] + e[1] + e[2]
    w = [e[i] / se for i in range(3)]
    n_in_raw = [jnp.sign(pl[i]) * w[i] for i in range(3)]
    nn = jnp.maximum(_norm3(n_in_raw), 1e-9)
    n_in = [n_in_raw[i] / nn for i in range(3)]
    n = tuple(jnp.where(inside, n_in[i], n_out[i]) for i in range(3))
    return d, n


def _np_plane_sphere(p1, R1, s1, p2, R2, s2):
    n = _matcol(R1, 2)
    dp = _sub(p2, p1)
    d = _dot(dp, n) - s2[0]
    pos = _sub(p2, _scale(s2[0] + 0.5 * d, n))
    return [(d, pos, n)]

def _np_plane_capsule(p1, R1, s1, p2, R2, s2):
    n = _matcol(R1, 2)
    axis = _matcol(R2, 2)
    out = []
    for sgn in (1.0, -1.0):
        e = _add(p2, _scale(sgn * s2[1], axis))
        d = _dot(_sub(e, p1), n) - s2[0]
        pos = _sub(e, _scale(s2[0] + 0.5 * d, n))
        out.append((d, pos, n))
    return out

def _np_plane_cylinder(p1, R1, s1, p2, R2, s2):
    n = _matcol(R1, 2)
    axis = _matcol(R2, 2)
    an = _dot(axis, n)
    proj = _sub(n, _scale(an, axis))
    pn = _norm3(proj)
    good = pn > 1e-8
    inv = 1.0 / jnp.maximum(pn, 1e-8)
    rx = _matcol(R2, 0)
    rim = tuple(jnp.where(good, -proj[i] * inv, rx[i]) for i in range(3))
    pts = [
        _add(_add(p2, _scale(s2[1], axis)), _scale(s2[0], rim)),
        _add(_sub(p2, _scale(s2[1], axis)), _scale(s2[0], rim)),
        _add(p2, _scale(s2[1], axis)),
    ]
    out = []
    for pt in pts:
        d = _dot(_sub(pt, p1), n)
        pos = _sub(pt, _scale(0.5 * d, n))
        out.append((d, pos, n))
    return out

def _np_plane_box(p1, R1, s1, p2, R2, s2):
    n = _matcol(R1, 2)
    out = []
    for c in _CORNERS:
        off = (c[0] * s2[0], c[1] * s2[1], c[2] * s2[2])
        pt = _add(p2, _mat_vec(R2, off))
        d = _dot(_sub(pt, p1), n)
        pos = _sub(pt, _scale(0.5 * d, n))
        out.append((d, pos, n))
    return out

def _np_sphere_sphere(p1, R1, s1, p2, R2, s2):
    dp = _sub(p2, p1)
    dist = _norm3(dp)
    inv = 1.0 / jnp.maximum(dist, 1e-9)
    n = _scale(inv, dp)
    d = dist - s1[0] - s2[0]
    pos = _add(p1, _scale(s1[0] + 0.5 * d, n))
    return [(d, pos, n)]

def _np_sphere_capsule(p1, R1, s1, p2, R2, s2):
    axis = _matcol(R2, 2)
    t = jnp.clip(_dot(_sub(p1, p2), axis), -s2[1], s2[1])
    c = _add(p2, _scale(t, axis))
    dp = _sub(c, p1)
    dist = _norm3(dp)
    inv = 1.0 / jnp.maximum(dist, 1e-9)
    n = _scale(inv, dp)
    d = dist - s1[0] - s2[0]
    pos = _add(p1, _scale(s1[0] + 0.5 * d, n))
    return [(d, pos, n)]

def _np_capsule_capsule(p1, R1, s1, p2, R2, s2):
    a0 = _sub(p1, _scale(s1[1], _matcol(R1, 2)))
    a1 = _add(p1, _scale(s1[1], _matcol(R1, 2)))
    b0 = _sub(p2, _scale(s2[1], _matcol(R2, 2)))
    b1 = _add(p2, _scale(s2[1], _matcol(R2, 2)))
    da = _sub(a1, a0)
    db = _sub(b1, b0)
    r = _sub(a0, b0)
    A = _dot(da, da) + 1e-12
    B = _dot(da, db)
    Cc = _dot(db, db) + 1e-12
    D = _dot(da, r)
    E = _dot(db, r)
    den = A * Cc - B * B
    s = jnp.clip(jnp.where(den > 1e-12, (B * E - Cc * D) / jnp.maximum(den, 1e-12), 0.0), 0.0, 1.0)
    t = jnp.clip((B * s + E) / Cc, 0.0, 1.0)
    s = jnp.clip((B * t - D) / A, 0.0, 1.0)
    pa = _add(a0, _scale(s, da))
    pb = _add(b0, _scale(t, db))
    dp = _sub(pb, pa)
    dist = _norm3(dp)
    inv = 1.0 / jnp.maximum(dist, 1e-9)
    n = _scale(inv, dp)
    d = dist - s1[0] - s2[0]
    pos = _add(pa, _scale(s1[0] + 0.5 * d, n))
    return [(d, pos, n)]

def _np_sphere_box(p1, R1, s1, p2, R2, s2):
    pl = _matT_vec(R2, _sub(p1, p2))
    d_surf, n_l = _point_box_lane(pl, s2)
    n_w = tuple(-x for x in _mat_vec(R2, n_l))
    d = d_surf - s1[0]
    pos = _add(p1, _scale(s1[0] + 0.5 * d, n_w))
    return [(d, pos, n_w)]

def _np_capsule_box(p1, R1, s1, p2, R2, s2):
    out = []
    for sgn in (-1.0, 1.0):
        e = _add(p1, _scale(sgn * s1[1], _matcol(R1, 2)))
        pl = _matT_vec(R2, _sub(e, p2))
        d_surf, n_l = _point_box_lane(pl, s2)
        n_w = tuple(-x for x in _mat_vec(R2, n_l))
        d = d_surf - s1[0]
        pos = _add(e, _scale(s1[0] + 0.5 * d, n_w))
        out.append((d, pos, n_w))
    return out

def _np_box_box(p1, R1, s1, p2, R2, s2):
    out = []
    # corners of box1 vs box2
    for c in _CORNERS:
        off = (c[0] * s1[0], c[1] * s1[1], c[2] * s1[2])
        pt = _add(p1, _mat_vec(R1, off))
        pl = _matT_vec(R2, _sub(pt, p2))
        d, n_l = _point_box_lane(pl, s2)
        nw = tuple(-x for x in _mat_vec(R2, n_l))
        pos = _add(pt, _scale(0.5 * d, nw))
        out.append((d, pos, nw))
    # corners of box2 vs box1 (normal from box1 toward box2)
    for c in _CORNERS:
        off = (c[0] * s2[0], c[1] * s2[1], c[2] * s2[2])
        pt = _add(p2, _mat_vec(R2, off))
        pl = _matT_vec(R1, _sub(pt, p1))
        d, n_l = _point_box_lane(pl, s1)
        nw = _mat_vec(R1, n_l)
        pos = _add(pt, _scale(-0.5 * d, nw))
        out.append((d, pos, nw))
    out.extend(_np_box_box_edges(p1, R1, s1, p2, R2, s2))
    return out


def _np_box_box_edges(p1, R1, s1, p2, R2, s2):
    """Lane mirror of contact._box_box_edge_candidates: 9 SAT edge-cross
    rows, masked to +_BIG unless the global separating axis is that pair's
    cross axis (and it beats every face axis)."""
    dp = _sub(p2, p1)
    a_axes = [_matcol(R1, i) for i in range(3)]
    b_axes = [_matcol(R2, j) for j in range(3)]

    def face_seps(axes, h_self, other_axes, h_other):
        out = []
        for k in range(3):
            ax = axes[k]
            t = _dot(ax, dp)
            proj_o = sum(h_other[m] * jnp.abs(_dot(ax, other_axes[m])) for m in range(3))
            out.append(jnp.abs(t) - h_self[k] - proj_o)
        return out

    seps_f = face_seps(a_axes, s1, b_axes, s2) + face_seps(b_axes, s2, a_axes, s1)
    max_face = seps_f[0]
    for s in seps_f[1:]:
        max_face = jnp.maximum(max_face, s)

    cands = []
    seps_e = []
    for i in range(3):
        for j in range(3):
            a, b = a_axes[i], b_axes[j]
            axis = _cross(a, b)
            nrm = _norm3(axis)
            valid = nrm > 1e-6
            inv = 1.0 / jnp.maximum(nrm, 1e-6)
            axis = _scale(inv, axis)
            sgn = jnp.where(_dot(axis, dp) < 0.0, -1.0, 1.0)
            axis = _scale(sgn, axis)
            proj1 = sum(s1[k] * jnp.abs(_dot(axis, a_axes[k])) for k in range(3))
            proj2 = sum(s2[k] * jnp.abs(_dot(axis, b_axes[k])) for k in range(3))
            sep = _dot(axis, dp) - proj1 - proj2
            sep = jnp.where(valid, sep, -jnp.inf)
            seps_e.append(sep)
            o1 = (0.0, 0.0, 0.0)
            o2 = (0.0, 0.0, 0.0)
            for k in range(3):
                if k != i:
                    o1 = _add(o1, _scale(jnp.sign(_dot(axis, a_axes[k])) * s1[k], a_axes[k]))
                if k != j:
                    o2 = _sub(o2, _scale(jnp.sign(_dot(axis, b_axes[k])) * s2[k], b_axes[k]))
            c1 = _add(p1, o1)
            c2 = _add(p2, o2)
            r = _sub(c2, c1)
            ab = _dot(a, b)
            den = jnp.maximum(1.0 - ab * ab, 1e-9)
            t1 = jnp.clip((_dot(a, r) - ab * _dot(b, r)) / den, -s1[i], s1[i])
            t2 = jnp.clip((ab * _dot(a, r) - _dot(b, r)) / den, -s2[j], s2[j])
            q1 = _add(c1, _scale(t1, a))
            q2 = _add(c2, _scale(t2, b))
            cands.append((sep, _scale(0.5, _add(q1, q2)), axis, valid))

    best_e = seps_e[0]
    for s in seps_e[1:]:
        best_e = jnp.maximum(best_e, s)
    out = []
    for sep, pos, axis, valid in cands:
        emit = valid & (sep >= best_e - 1e-9) & (sep > max_face)
        out.append((jnp.where(emit, sep, _BIG), pos, axis))
    return out


_LANE_DISPATCH = {
    (S.PLANE, S.SPHERE): _np_plane_sphere,
    (S.PLANE, S.CAPSULE): _np_plane_capsule,
    (S.PLANE, S.CYLINDER): _np_plane_cylinder,
    (S.PLANE, S.BOX): _np_plane_box,
    (S.SPHERE, S.SPHERE): _np_sphere_sphere,
    (S.SPHERE, S.CAPSULE): _np_sphere_capsule,
    (S.SPHERE, S.BOX): _np_sphere_box,
    (S.CAPSULE, S.CAPSULE): _np_capsule_capsule,
    (S.CAPSULE, S.BOX): _np_capsule_box,
    (S.BOX, S.BOX): _np_box_box,
    (S.SPHERE, S.CYLINDER): _np_sphere_capsule,
    (S.CAPSULE, S.CYLINDER): _np_capsule_capsule,
    (S.CYLINDER, S.CYLINDER): _np_capsule_capsule,
    (S.CYLINDER, S.BOX): _np_capsule_box,
}


def _fk_pose_lane(model, q, one, zero):
    """Pose-only FK on lanes (the FK section of forward_lane_body without
    motion subspaces) — used for the POST-step aux outputs (site/body poses,
    per-pair distances) so planning rollouts need no separate forward-
    products call per planned step. Mirrors kinematics.fk."""
    from robosuite_tpu.ops.pallas_forward import _quat_rot

    nb = model.nbody
    body_pos = np.asarray(model.body_pos, dtype=np.float32)
    body_quat = np.asarray(model.body_quat, dtype=np.float32)
    jnt_pos = np.asarray(model.jnt_pos, dtype=np.float32)
    jnt_axis = np.asarray(model.jnt_axis, dtype=np.float32)
    qpos0 = np.asarray(model.qpos0, dtype=np.float32)

    def const3(arr):
        return (arr[0] * one, arr[1] * one, arr[2] * one)

    def const4(arr):
        return (arr[0] * one, arr[1] * one, arr[2] * one, arr[3] * one)

    xpos = [None] * nb
    xquat = [None] * nb
    xpos[0] = (zero, zero, zero)
    xquat[0] = (one, zero, zero, zero)
    for b in range(1, nb):
        p = model.body_parentid[b]
        pos = _add(xpos[p], _quat_rot(xquat[p], const3(body_pos[b])))
        quat = _quat_mul(xquat[p], const4(body_quat[b]))
        jadr, jnum = model.body_jntadr[b], model.body_jntnum[b]
        for kk in range(jnum):
            j = jadr + kk
            jt = model.jnt_type[j]
            qadr = model.jnt_qposadr[j]
            if jt == S.FREE:
                pos = (q[qadr], q[qadr + 1], q[qadr + 2])
                qw, qx, qy, qz = q[qadr + 3], q[qadr + 4], q[qadr + 5], q[qadr + 6]
                inv_n = jax.lax.rsqrt(qw * qw + qx * qx + qy * qy + qz * qz + 1e-12)
                quat = (qw * inv_n, qx * inv_n, qy * inv_n, qz * inv_n)
            elif jt == S.BALL:
                anchor = _add(pos, _quat_rot(quat, const3(jnt_pos[j])))
                qw, qx, qy, qz = q[qadr], q[qadr + 1], q[qadr + 2], q[qadr + 3]
                inv_n = jax.lax.rsqrt(qw * qw + qx * qx + qy * qy + qz * qz + 1e-12)
                quat = _quat_mul(quat, (qw * inv_n, qx * inv_n, qy * inv_n, qz * inv_n))
                pos = _sub(anchor, _quat_rot(quat, const3(jnt_pos[j])))
            elif jt == S.SLIDE:
                axis_w = _quat_rot(quat, const3(jnt_axis[j]))
                pos = _add(pos, _scale(q[qadr] - qpos0[qadr], axis_w))
            else:  # HINGE
                axis_w = _quat_rot(quat, const3(jnt_axis[j]))
                anchor = _add(pos, _quat_rot(quat, const3(jnt_pos[j])))
                half = 0.5 * (q[qadr] - qpos0[qadr])
                c, s = jnp.cos(half), jnp.sin(half)
                lq = (c, s * jnt_axis[j][0], s * jnt_axis[j][1], s * jnt_axis[j][2])
                quat = _quat_mul(quat, lq)
                pos = _sub(anchor, _quat_rot(quat, const3(jnt_pos[j])))
        xpos[b] = pos
        xquat[b] = quat
    return xpos, xquat


def _select_deepest(cands, k):
    """Tournament top-k by depth on lane tuples (matches lax.top_k(-d, k):
    deepest first, earliest index on ties)."""
    m = len(cands)
    if m <= k:
        return cands
    used = [None] * m  # lane mask: 1.0 once selected
    out = []
    for _ in range(k):
        best_d, best_pos, best_n, best_i = None, None, None, None
        for i, (d, pos, n) in enumerate(cands):
            d_eff = d if used[i] is None else d + used[i] * _BIG
            idx = jnp.full_like(d, float(i))
            if best_d is None:
                best_d, best_pos, best_n, best_i = d_eff, pos, n, idx
            else:
                take = d_eff < best_d
                best_d = jnp.where(take, d_eff, best_d)
                best_pos = tuple(jnp.where(take, pos[j], best_pos[j]) for j in range(3))
                best_n = tuple(jnp.where(take, n[j], best_n[j]) for j in range(3))
                best_i = jnp.where(take, idx, best_i)
        out.append((best_d, best_pos, best_n))
        for i in range(m):
            hit = (best_i == float(i)).astype(best_d.dtype)
            used[i] = hit if used[i] is None else jnp.maximum(used[i], hit)
    return out


# ---------------------------------------------------------------------------
# kernel generator
# ---------------------------------------------------------------------------


def _tree_static(model):
    anc = np.asarray(model.ancestor_mask)  # (nbody, nv)
    return anc


def _make_substep_kernel(model, spec: FusedSpec, solver_iters: int, power_iters: int,
                         emit_aux: bool = False):
    from robosuite_tpu.ops.pallas_contact import _chol_rows, _chol_solve_vec, constrained_vel_lanes
    from robosuite_tpu.physics import contact as C

    nq, nv, nb, nu = model.nq, model.nv, model.nbody, model.nu
    dt = float(model.timestep)
    pairs = _pair_meta(model)
    nrows = sum(p["npts"] for p in pairs)
    ntot = nrows * 3
    anc = _tree_static(model)
    arm = spec.arm
    na = len(arm.qv_idx)
    ng = len(spec.grip_actuators)
    impratio = float(model.impratio)

    geom_size = np.asarray(model.geom_size, dtype=np.float64)
    # smooth-force statics
    qadr1, dadr1, jids1 = [], [], []
    for j in range(model.njnt):
        if model.jnt_type[j] in (S.HINGE, S.SLIDE):
            qadr1.append(int(model.jnt_qposadr[j]))
            dadr1.append(int(model.jnt_dofadr[j]))
            jids1.append(j)
    jnt_stiff = np.asarray(model.jnt_stiffness, dtype=np.float64)
    qpos_spring = np.asarray(model.qpos_spring, dtype=np.float64)
    jnt_range = np.asarray(model.jnt_range, dtype=np.float64)
    jnt_limited = np.asarray(model.jnt_limited, dtype=np.float64)
    dof_fric = np.asarray(model.dof_frictionloss, dtype=np.float64)
    dof_damp = np.asarray(model.dof_damping, dtype=np.float64)
    act_gear = np.asarray(model.actuator_gear, dtype=np.float64)
    act_gain = np.asarray(model.actuator_gainprm, dtype=np.float64)
    act_ctrllim = np.asarray(model.actuator_ctrllimited)
    act_ctrlrange = np.asarray(model.actuator_ctrlrange, dtype=np.float64)
    act_forcelim = np.asarray(model.actuator_forcelimited)
    act_forcerange = np.asarray(model.actuator_forcerange, dtype=np.float64)
    act_kind = [model.actuator_kind[a] for a in range(nu)]
    act_jid = [int(model.actuator_jntid[a]) for a in range(nu)]
    act_dadr = [int(model.jnt_dofadr[j]) for j in act_jid]
    act_qadr = [int(model.jnt_qposadr[j]) for j in act_jid]

    # integration statics
    free_jnts = [j for j in range(model.njnt) if model.jnt_type[j] == S.FREE]
    ball_jnts = [j for j in range(model.njnt) if model.jnt_type[j] == S.BALL]

    # eef site ancestors (for J/vel); all dofs that move the site's body
    eef_body = int(model.site_bodyid[arm.eef_site])
    cen_body = int(model.site_bodyid[arm.center_site])
    eef_dofs = [d for d in range(nv) if anc[eef_body, d]]
    cen_dofs = [d for d in range(nv) if anc[cen_body, d]]

    nsite = model.nsite
    site_pos_c = np.asarray(model.site_pos, dtype=np.float32) if nsite else None
    site_quat_c = np.asarray(model.site_quat, dtype=np.float32) if nsite else None
    geom_pos_c = np.asarray(model.geom_pos, dtype=np.float32)
    geom_quat_c = np.asarray(model.geom_quat, dtype=np.float32)

    def kernel(qpos_ref, qvel_ref, mass_ref, inertia_ref, grav_ref, arma_ref,
               goal_ref, gains_ref, grip_ref,
               qpos_out, qvel_out, f_out, *aux_out):
        dtype = qpos_ref.dtype
        q = [qpos_ref[i] for i in range(nq)]
        qd = [qvel_ref[i] for i in range(nv)]
        mass = [mass_ref[b] for b in range(nb)]
        inertia = [(inertia_ref[b, 0], inertia_ref[b, 1], inertia_ref[b, 2])
                   for b in range(nb)]
        grav = (grav_ref[0], grav_ref[1], grav_ref[2])
        arma = [arma_ref[d] for d in range(nv)]

        fw = forward_lane_body(model, q, qd, mass, inertia, grav, arma, dtype)
        one, zero = fw.one, fw.zero

        def _finish(fw, q, qd, tau, grip_ref, qpos_out, qvel_out, f_out,
                    aux_out, dtype, one, zero):
            # full ctrl vector
            ctrl = [zero] * nu
            for i, a in enumerate(arm.actuator_ids):
                ctrl[a] = tau[i]
            for i, a in enumerate(spec.grip_actuators):
                ctrl[a] = grip_ref[i]

            # ---- smooth forces (engine._total_smooth_force, lane form) ---------
            qfrc = [zero] * nv
            for a in range(nu):
                c = ctrl[a]
                if act_ctrllim[a]:
                    c = jnp.clip(c, act_ctrlrange[a, 0], act_ctrlrange[a, 1])
                gear = act_gear[a]
                kind = act_kind[a]
                if kind == "motor":
                    force = c
                elif kind == "position":
                    force = act_gain[a] * (c - gear * q[act_qadr[a]])
                elif kind == "velocity":
                    force = act_gain[a] * (c - gear * qd[act_dadr[a]])
                else:
                    raise UnsupportedFused(f"actuator kind {kind}")
                if act_forcelim[a]:
                    force = jnp.clip(force, act_forcerange[a, 0], act_forcerange[a, 1])
                qfrc[act_dadr[a]] = qfrc[act_dadr[a]] + gear * force

            extra_damp = [zero] * nv
            for qa, da, j in zip(qadr1, dadr1, jids1):
                if jnt_stiff[j] != 0.0:
                    qfrc[da] = qfrc[da] - jnt_stiff[j] * (q[qa] - qpos_spring[qa])
                if jnt_limited[j]:
                    # joint_limit_forces: mass-scaled compliant law
                    tc, dr = 0.02, 1.0
                    m_eff = fw.M_rows[da][da]
                    d_imp, dmax = 0.9, 0.95
                    k_l = d_imp / (dmax * dmax * tc * tc * dr * dr) * m_eff
                    b_l = 2.0 / (dmax * tc) * m_eff
                    d_lo = jnt_range[j, 0] - q[qa]
                    d_hi = q[qa] - jnt_range[j, 1]
                    qfrc[da] = qfrc[da] + k_l * (jnp.maximum(d_lo, 0.0) - jnp.maximum(d_hi, 0.0))
                    lim_act = ((d_lo > 0) | (d_hi > 0)).astype(dtype)
                    extra_damp[da] = extra_damp[da] + lim_act * b_l
            for d in range(nv):
                if dof_fric[d] != 0.0:
                    qfrc[d] = qfrc[d] - dof_fric[d] * jnp.tanh(qd[d] / 0.005)
                qfrc[d] = qfrc[d] - fw.bias[d]

            damping = [dof_damp[d] + extra_damp[d] for d in range(nv)]

            # ---- narrowphase + rows (contact.py analogs) -----------------------
            rows = []     # per row: (pen, pos, n_unit, t1, t2, meta dict)
            for p in pairs:
                t1t, t2t = p["types"]
                fn = _LANE_DISPATCH[(t1t, t2t)]
                g1, g2 = p["g1"], p["g2"]
                p1, R1 = fw.geom_pose(g1)
                p2, R2 = fw.geom_pose(g2)
                s1 = tuple(float(x) for x in geom_size[g1])
                s2 = tuple(float(x) for x in geom_size[g2])
                cands = fn(p1, R1, s1, p2, R2, s2)
                if p["flip"]:
                    cands = [(d, pos, tuple(-x for x in n)) for d, pos, n in cands]
                cands = _select_deepest(cands, p["npts"])
                for d, pos, n in cands:
                    # normalize + tangent frame (contact.narrowphase tail)
                    nn = jnp.maximum(_norm3(n), 1e-9)
                    n_u = tuple(n[i] / nn for i in range(3))
                    use_ex = jnp.abs(n_u[0]) < 0.5
                    ref = (use_ex.astype(dtype), (~use_ex).astype(dtype), zero)
                    t1v = _cross(n_u, ref)
                    tn = jnp.maximum(_norm3(t1v), 1e-9)
                    t1v = tuple(t1v[i] / tn for i in range(3))
                    t2v = _cross(n_u, t1v)
                    rows.append((d, pos, n_u, t1v, t2v, p))

            # per-row impedance/J/aref
            def impedance(solimp, x):
                d0, dmax, width, mid, pw = solimp
                xw = jnp.clip(x / max(width, 1e-9), 0.0, 1.0)
                a = 1.0 / max(mid, 1e-9) ** (pw - 1.0)
                b = 1.0 / max(1.0 - mid, 1e-9) ** (pw - 1.0)
                y = jnp.where(xw < mid, a * xw ** pw, 1.0 - b * (1.0 - xw) ** pw)
                return d0 + y * (dmax - d0)

            Jn_rows, Jt1_rows, Jt2_rows = [], [], []
            aref_n_rows, aref_t1_rows, aref_t2_rows = [], [], []
            regn_rows, regt_rows, mu_rows, act_rows = [], [], [], []
            for (dist, pos, n_u, t1v, t2v, p) in rows:
                dofs = [(d_, float(anc[p["body2"], d_] - anc[p["body1"], d_]))
                        for d_ in range(nv)
                        if anc[p["body2"], d_] != anc[p["body1"], d_]]
                Jn = [zero] * nv
                Jt1 = [zero] * nv
                Jt2 = [zero] * nv
                vel_n, vel_t1, vel_t2 = zero, zero, zero
                for d_, sgn in dofs:
                    jl = _add(fw.sdof_lin[d_], _cross(fw.sdof_ang[d_], pos))
                    Jn[d_] = sgn * _dot(n_u, jl)
                    Jt1[d_] = sgn * _dot(t1v, jl)
                    Jt2[d_] = sgn * _dot(t2v, jl)
                    vel_n = vel_n + Jn[d_] * qd[d_]
                    vel_t1 = vel_t1 + Jt1[d_] * qd[d_]
                    vel_t2 = vel_t2 + Jt2[d_] * qd[d_]
                pen = -(dist - p["margin"])
                active = (pen > 0.0).astype(dtype)
                d_i = jnp.clip(impedance(p["solimp"], pen), 1e-4, 1.0 - 1e-4)
                tc = max(p["solref"][0], 2.0 * dt)
                dr = max(p["solref"][1], 1e-3)
                dmax = min(max(p["solimp"][1], 1e-4), 1.0 - 1e-4)
                k_ = d_i / (dmax * dmax * tc * tc * dr * dr)
                b_ = 2.0 / (dmax * tc)
                reg_base = (1.0 - d_i) / d_i
                Jn_rows.append(Jn)
                Jt1_rows.append(Jt1)
                Jt2_rows.append(Jt2)
                aref_n_rows.append(-b_ * vel_n + k_ * pen)
                aref_t1_rows.append(-b_ * vel_t1)
                aref_t2_rows.append(-b_ * vel_t2)
                regn_rows.append(reg_base)
                regt_rows.append(reg_base / impratio)
                mu_rows.append(p["friction"] * one)
                act_rows.append(active)

            # assemble grouped (ntot, LANES) arrays: [normals | t1 | t2]
            JfT = jnp.stack([
                jnp.stack([Jr[i] for Jr in Jn_rows + Jt1_rows + Jt2_rows])
                for i in range(nv)
            ])  # (nv, ntot, LANES)
            aref = jnp.stack(aref_n_rows + aref_t1_rows + aref_t2_rows)
            reg3 = jnp.stack(regn_rows + regt_rows + regt_rows)
            mu = jnp.stack(mu_rows)
            act = jnp.stack(act_rows)

            A_rows = fw.M_rows
            qvel_new, f = constrained_vel_lanes(
                nv, ntot, nrows, 0, solver_iters, power_iters, dt,
                A_rows, damping, qd, qfrc, JfT, aref, reg3, mu, act,
            )

            # ---- integrate qpos (engine._integrate_qpos, lane form) ------------
            q_out = list(q)
            for qa, da, j in zip(qadr1, dadr1, jids1):
                q_out[qa] = q_out[qa] + dt * qvel_new[da]
            for j in free_jnts:
                qa, da = int(model.jnt_qposadr[j]), int(model.jnt_dofadr[j])
                for i in range(3):
                    q_out[qa + i] = q_out[qa + i] + dt * qvel_new[da + i]
            for j in free_jnts + ball_jnts:
                is_free = model.jnt_type[j] == S.FREE
                qa = int(model.jnt_qposadr[j]) + (3 if is_free else 0)
                da = int(model.jnt_dofadr[j]) + (3 if is_free else 0)
                # quat_integrate_wxyz on lanes
                v = tuple(qvel_new[da + i] * dt for i in range(3))
                sq = v[0] * v[0] + v[1] * v[1] + v[2] * v[2]
                small = sq < 1e-12
                safe = jnp.where(small, 1.0, sq)
                ang = jnp.sqrt(safe)
                kk = jnp.where(small, 0.5 - sq / 48.0, jnp.sin(ang / 2.0) / ang)
                w_ = jnp.where(small, 1.0 - sq / 8.0, jnp.cos(ang / 2.0))
                dq = (w_, v[0] * kk, v[1] * kk, v[2] * kk)
                qq = (q_out[qa], q_out[qa + 1], q_out[qa + 2], q_out[qa + 3])
                o = _quat_mul(qq, dq)
                nrm = jnp.maximum(jnp.sqrt(o[0] ** 2 + o[1] ** 2 + o[2] ** 2 + o[3] ** 2), 1e-12)
                for i in range(4):
                    q_out[qa + i] = o[i] / nrm

            qpos_out[...] = jnp.stack(q_out)
            qvel_out[...] = jnp.stack(qvel_new)
            f_out[...] = f

            if emit_aux:
                # POST-step aux: pose-only FK on the integrated qpos, site/body
                # poses + per-pair min distances. Feeds the planning rollout's
                # next set_goals and this step's reward without a separate
                # forward-products kernel call. (The unused pos/normal math in
                # the reused narrowphase primitives is DCE'd at lowering.)
                sx_out, sm_out, bx_out, pd_out = aux_out
                xpos2, xquat2 = _fk_pose_lane(model, q_out, one, zero)
                xmat2 = {}

                def bmat(b):
                    if b not in xmat2:
                        xmat2[b] = _quat2mat(xquat2[b])
                    return xmat2[b]

                def c3(arr):
                    return (arr[0] * one, arr[1] * one, arr[2] * one)

                def c4(arr):
                    return (arr[0] * one, arr[1] * one, arr[2] * one, arr[3] * one)

                from robosuite_tpu.ops.pallas_forward import _quat_rot

                for s_i in range(nsite):
                    b = model.site_bodyid[s_i]
                    sp2 = _add(xpos2[b], _quat_rot(xquat2[b], c3(site_pos_c[s_i])))
                    sR2 = _quat2mat(_quat_mul(xquat2[b], c4(site_quat_c[s_i])))
                    for i in range(3):
                        sx_out[s_i * 3 + i] = sp2[i]
                        for jj in range(3):
                            sm_out[s_i * 9 + i * 3 + jj] = sR2[i][jj]
                for b in range(nb):
                    for i in range(3):
                        bx_out[b * 3 + i] = xpos2[b][i]
                for pi, p in enumerate(pairs):
                    g1, g2 = p["g1"], p["g2"]
                    b1g, b2g = model.geom_bodyid[g1], model.geom_bodyid[g2]
                    gp1 = _add(xpos2[b1g], _quat_rot(xquat2[b1g], c3(geom_pos_c[g1])))
                    gR1 = _quat2mat(_quat_mul(xquat2[b1g], c4(geom_quat_c[g1])))
                    gp2 = _add(xpos2[b2g], _quat_rot(xquat2[b2g], c3(geom_pos_c[g2])))
                    gR2 = _quat2mat(_quat_mul(xquat2[b2g], c4(geom_quat_c[g2])))
                    s1 = tuple(float(x) for x in geom_size[g1])
                    s2 = tuple(float(x) for x in geom_size[g2])
                    fn = _LANE_DISPATCH[p["types"]]
                    cands = fn(gp1, gR1, s1, gp2, gR2, s2)
                    dmin = cands[0][0]
                    for d_, _, _ in cands[1:]:
                        dmin = jnp.minimum(dmin, d_)
                    pd_out[pi] = dmin



        if arm.ctrl_type == "joint_pos":
            # ---- JOINT_POSITION law (reference joint_pos.py:233-272) -------
            goal_q = [goal_ref[i] for i in range(na)]
            kp_j = [gains_ref[i] for i in range(na)]
            kd_j = [gains_ref[na + i] for i in range(na)]
            des = [kp_j[i] * (goal_q[i] - q[arm.qp_idx[i]]) - kd_j[i] * qd[arm.qv_idx[i]]
                   for i in range(na)]
            tau = [None] * na
            Ma_jp = [[fw.M_rows[arm.qv_idx[i]][arm.qv_idx[j]] for j in range(na)]
                     for i in range(na)]
            for i in range(na):
                s = Ma_jp[i][0] * des[0]
                for j in range(1, na):
                    s = s + Ma_jp[i][j] * des[j]
                tau[i] = s + (fw.bias[arm.qv_idx[i]] if arm.use_torque_compensation else zero)
            for i in range(na):
                tau[i] = jnp.clip(tau[i], arm.torque_lo[i], arm.torque_hi[i])
            return _finish(fw, q, qd, tau, grip_ref, qpos_out, qvel_out, f_out,
                           aux_out, dtype, one, zero)

        # ---- OSC torque law (reference osc.py:437-495, lane form) ----------
        sp, sR = fw.site_pose(arm.eef_site)
        op, oR = fw.site_pose(arm.center_site)
        desired_pos = (goal_ref[0], goal_ref[1], goal_ref[2])
        desired_ori = tuple(tuple(goal_ref[3 + i * 3 + j] for j in range(3)) for i in range(3))
        kp6 = [gains_ref[i] for i in range(6)]
        kd6 = [gains_ref[6 + i] for i in range(6)]

        # orientation error: 0.5 * sum_i cross(current_col_i, desired_col_i)
        oe = (zero, zero, zero)
        for i in range(3):
            oe = _add(oe, _cross(_matcol(sR, i), _matcol(desired_ori, i)))
        oe = _scale(0.5, oe)
        pe = _sub(desired_pos, sp)

        # site jacobians over arm dofs; site velocity over ALL ancestors
        Jp = {}
        Jo = {}
        for d in arm.qv_idx:
            Jo[d] = fw.sdof_ang[d]
            Jp[d] = _add(fw.sdof_lin[d], _cross(fw.sdof_ang[d], sp))
        ref_vel_lin = (zero, zero, zero)
        ref_vel_ang = (zero, zero, zero)
        for d in eef_dofs:
            jl = _add(fw.sdof_lin[d], _cross(fw.sdof_ang[d], sp))
            ref_vel_lin = _add(ref_vel_lin, _scale(qd[d], jl))
            ref_vel_ang = _add(ref_vel_ang, _scale(qd[d], fw.sdof_ang[d]))
        org_vel_lin = (zero, zero, zero)
        org_vel_ang = (zero, zero, zero)
        for d in cen_dofs:
            jl = _add(fw.sdof_lin[d], _cross(fw.sdof_ang[d], op))
            org_vel_lin = _add(org_vel_lin, _scale(qd[d], jl))
            org_vel_ang = _add(org_vel_ang, _scale(qd[d], fw.sdof_ang[d]))

        vpe = _sub(org_vel_lin, ref_vel_lin)
        voe = _sub(org_vel_ang, ref_vel_ang)
        F = tuple(pe[i] * kp6[i] + vpe[i] * kd6[i] for i in range(3))
        Tq = tuple(oe[i] * kp6[3 + i] + voe[i] * kd6[3 + i] for i in range(3))

        # arm mass matrix inverse (unrolled Cholesky, fastla.inv_spd analog)
        Ma = [[fw.M_rows[arm.qv_idx[i]][arm.qv_idx[j]] for j in range(na)]
              for i in range(na)]
        La = _chol_rows(Ma, na)
        eye_cols = []
        for i in range(na):
            e = [one if j == i else zero for j in range(na)]
            eye_cols.append(_chol_solve_vec(La, e, na))
        Minv = [[eye_cols[j][i] for j in range(na)] for i in range(na)]  # (na, na)
        # one Newton refinement step on M^-1 (mirrors control_utils.
        # opspace_matrices): X' = X (2I - M X)
        MX = [[None] * na for _ in range(na)]
        for i in range(na):
            for j in range(na):
                s = Ma[i][0] * Minv[0][j]
                for k in range(1, na):
                    s = s + Ma[i][k] * Minv[k][j]
                MX[i][j] = (2.0 if i == j else 0.0) - s
        Minv = [[sum(Minv[i][k] * MX[k][j] for k in range(na)) for j in range(na)]
                for i in range(na)]

        # J rows as (na,) lists: rows 0-2 pos, 3-5 ori
        Jrows = []
        for i in range(3):
            Jrows.append([Jp[d][i] for d in arm.qv_idx])
        for i in range(3):
            Jrows.append([Jo[d][i] for d in arm.qv_idx])

        def mat_mul_rows(Ar, Br, n_i, n_k, n_j):
            """(n_i, n_k) @ (n_k, n_j) on lane rows."""
            out = [[zero] * n_j for _ in range(n_i)]
            for i in range(n_i):
                for j_ in range(n_j):
                    s = Ar[i][0] * Br[0][j_]
                    for k_ in range(1, n_k):
                        s = s + Ar[i][k_] * Br[k_][j_]
                    out[i][j_] = s
            return out

        JM = mat_mul_rows(Jrows, Minv, 6, na, na)            # J Minv
        JT = [[Jrows[j][i] for j in range(6)] for i in range(na)]
        Lfull_inv = mat_mul_rows(JM, JT, 6, na, 6)           # J Minv J^T (6x6)
        Lpos_inv = [[Lfull_inv[i][j] for j in range(3)] for i in range(3)]
        Lori_inv = [[Lfull_inv[3 + i][3 + j] for j in range(3)] for i in range(3)]

        def ridge(Ar, n):
            tr = Ar[0][0]
            for i in range(1, n):
                tr = tr + Ar[i][i]
            r = 1e-8 * tr / n + 1e-12
            return [[Ar[i][j] + (r if i == j else 0.0) for j in range(n)] for i in range(n)]

        def inv3_lane(Ar):
            a, b, c = Ar[0]
            d_, e, f_ = Ar[1]
            g, h, i_ = Ar[2]
            A11 = e * i_ - f_ * h
            A12 = c * h - b * i_
            A13 = b * f_ - c * e
            A21 = f_ * g - d_ * i_
            A22 = a * i_ - c * g
            A23 = c * d_ - a * f_
            A31 = d_ * h - e * g
            A32 = b * g - a * h
            A33 = a * e - b * d_
            det = a * A11 + b * A21 + c * A31
            inv_det = 1.0 / det
            return [[A11 * inv_det, A12 * inv_det, A13 * inv_det],
                    [A21 * inv_det, A22 * inv_det, A23 * inv_det],
                    [A31 * inv_det, A32 * inv_det, A33 * inv_det]]

        Lpos = inv3_lane(ridge(Lpos_inv, 3))
        Lori = inv3_lane(ridge(Lori_inv, 3))
        Lfr = ridge(Lfull_inv, 6)
        Lf_chol = _chol_rows(Lfr, 6)
        Lfull = [[None] * 6 for _ in range(6)]
        for i in range(6):
            e = [one if j == i else zero for j in range(6)]
            col = _chol_solve_vec(Lf_chol, e, 6)
            for j in range(6):
                Lfull[j][i] = col[j]

        if arm.uncouple:
            wr = [None] * 6
            for i in range(3):
                wr[i] = Lpos[i][0] * F[0] + Lpos[i][1] * F[1] + Lpos[i][2] * F[2]
                wr[3 + i] = Lori[i][0] * Tq[0] + Lori[i][1] * Tq[1] + Lori[i][2] * Tq[2]
        else:
            FT = [F[0], F[1], F[2], Tq[0], Tq[1], Tq[2]]
            wr = [None] * 6
            for i in range(6):
                s = Lfull[i][0] * FT[0]
                for j in range(1, 6):
                    s = s + Lfull[i][j] * FT[j]
                wr[i] = s

        tau = [None] * na
        for i in range(na):
            s = JT[i][0] * wr[0]
            for j in range(1, 6):
                s = s + JT[i][j] * wr[j]
            tau[i] = s + fw.bias[arm.qv_idx[i]]

        # nullspace torques (control_utils.py:7-40): N = I - Jbar J
        MJT = mat_mul_rows(Minv, JT, na, na, 6)
        Jbar = mat_mul_rows(MJT, Lfull, na, 6, 6)
        JbJ = mat_mul_rows(Jbar, Jrows, na, 6, na)
        kv = 2.0 * np.sqrt(10.0)
        pose_t = []
        for i in range(na):
            qdiff = [arm.initial_joint[j] * one - q[arm.qp_idx[j]] for j in range(na)]
            s = Ma[i][0] * (10.0 * qdiff[0] - kv * qd[arm.qv_idx[0]])
            for j in range(1, na):
                s = s + Ma[i][j] * (10.0 * qdiff[j] - kv * qd[arm.qv_idx[j]])
            pose_t.append(s)
        for i in range(na):
            # tau_i += sum_j N[j][i] * pose_t[j]  (N^T @ pose)
            s = -JbJ[0][i] * pose_t[0]
            for j in range(1, na):
                s = s - JbJ[j][i] * pose_t[j]
            tau[i] = tau[i] + pose_t[i] + s

        # clip to torque limits
        for i in range(na):
            tau[i] = jnp.clip(tau[i], arm.torque_lo[i], arm.torque_hi[i])

        return _finish(fw, q, qd, tau, grip_ref, qpos_out, qvel_out, f_out,
                       aux_out, dtype, one, zero)

    return kernel, ntot


# ---------------------------------------------------------------------------
# pallas dispatch + XLA fallback
# ---------------------------------------------------------------------------


def _pallas_substep(model, spec, solver_iters, power_iters, emit_aux=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nq, nv, nb, nsite, npair = model.nq, model.nv, model.nbody, model.nsite, model.npair
    ng = max(len(spec.grip_actuators), 1)
    kernel, ntot = _make_substep_kernel(model, spec, solver_iters, power_iters,
                                        emit_aux=emit_aux)

    def spec_(*dims):
        return pl.BlockSpec(dims + (LANES,), lambda i: (0,) * len(dims) + (i,),
                            memory_space=pltpu.VMEM)

    out_rows = [nq, nv, ntot]
    if emit_aux:
        out_rows += [max(nsite * 3, 1), max(nsite * 9, 1), nb * 3, max(npair, 1)]

    na = len(spec.arm.qv_idx)
    ga = 12 if spec.arm.ctrl_type == "osc" else na        # goal rows
    gk = 12 if spec.arm.ctrl_type == "osc" else 2 * na    # gains rows

    @jax.jit
    def run(qpos, qvel, mass, inertia, gravity, armature, goal, gains, grip):
        B = qpos.shape[0]
        Bp = ((B + LANES - 1) // LANES) * LANES
        pad = Bp - B

        def prep(x):
            x = jnp.moveaxis(x, 0, -1)
            if pad:
                x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
            return x

        args = tuple(prep(a) for a in (qpos, qvel, mass, inertia, gravity,
                                       armature, goal, gains, grip))
        outs = pl.pallas_call(
            kernel,
            grid=(Bp // LANES,),
            in_specs=[spec_(nq), spec_(nv), spec_(nb), spec_(nb, 3), spec_(3),
                      spec_(nv), spec_(ga), spec_(gk), spec_(ng)],
            out_specs=tuple(spec_(r) for r in out_rows),
            out_shape=tuple(
                jax.ShapeDtypeStruct((r, Bp), qpos.dtype) for r in out_rows
            ),
        )(*args)

        def unpack(x):
            return jnp.moveaxis(x, -1, 0)[:B]

        base = (unpack(outs[0]), unpack(outs[1]), unpack(outs[2]))
        if not emit_aux:
            return base
        B_ = qpos.shape[0]
        sx = unpack(outs[3]).reshape(B_, nsite, 3) if nsite else jnp.zeros((B_, 0, 3), qpos.dtype)
        sm = unpack(outs[4]).reshape(B_, nsite, 3, 3) if nsite else jnp.zeros((B_, 0, 3, 3), qpos.dtype)
        bx = unpack(outs[5]).reshape(B_, nb, 3)
        pd = unpack(outs[6])[:, :npair]
        return base + (sx, sm, bx, pd)

    return run


def make_fused_substep(env, model, robot=None, emit_aux=False):
    """Build the fused substep callable for (env, model):

        substep(qpos, qvel, mass, inertia, gravity, armature,
                goal, gains, grip_ctrl (ng,)) -> (qpos', qvel', f)

    goal/gains encode the arm controller's tick-rate targets:
      OSC:            goal (12,) = [desired_pos(3), desired_ori.flat(9)],
                      gains (12,) = [kp(6), kd(6)]
      JOINT_POSITION: goal (na,) = goal_qpos, gains (2na,) = [kp, kd]
    [emit_aux: ... -> (qpos', qvel', f, site_xpos', site_xmat', xpos',
                       pair_dist') — POST-step poses + per-pair min
     distances for planning rollouts that skip forward_products]

    Raises UnsupportedFused when the world/controller combination is not
    covered. custom_vmap: batched TPU calls run the megakernel; unbatched /
    non-TPU calls run the XLA composition of the exact same per-module
    functions (forward products, osc.run_world / joint_pos.run,
    engine.integrate)."""
    spec = extract_spec(env, model)
    robot = env.robots[0] if robot is None else robot
    arm_name = robot.arms[0]
    cfg = robot.arm_cfg[arm_name]
    arm = spec.arm
    na = len(arm.qv_idx)
    from robosuite_tpu.physics import contact as C

    solver_iters = model.solver_iters if model.solver_iters is not None else C.APGD_ITERS
    power_iters = model.solver_power_iters if model.solver_power_iters is not None else C.POWER_ITERS
    ng = max(len(spec.grip_actuators), 1)

    def _xla(qpos, qvel, mass, inertia, gravity, armature, goal, gains, grip):
        from robosuite_tpu.controllers.parts import joint_pos as jp_mod
        from robosuite_tpu.controllers.parts import osc as osc_mod
        from robosuite_tpu.physics import dynamics, engine, kinematics
        from robosuite_tpu.physics.state import State

        m = model.replace(body_mass=mass, body_inertia=inertia,
                          gravity=gravity, dof_armature=armature)
        st = State(qpos=qpos, qvel=qvel, time=jnp.asarray(0.0, dtype=qpos.dtype))
        kin = kinematics.fk(m, qpos)
        M = dynamics.crba(m, kin)
        bias = dynamics.rnea_bias(m, kin, qvel)
        view = robot.arm_view(kin, M, bias, qpos, qvel, arm_name)
        if arm.ctrl_type == "joint_pos":
            jp_state = jp_mod.JointPosState(goal_qpos=goal, kp=gains[:na], kd=gains[na:])
            tau = jp_mod.run(cfg, jp_state, view)
        else:
            tau = osc_mod.run_world(cfg, view, goal[:3], goal[3:].reshape(3, 3),
                                    gains[:6], gains[6:])
        lo = jnp.asarray(arm.torque_lo, dtype=qpos.dtype)
        hi = jnp.asarray(arm.torque_hi, dtype=qpos.dtype)
        tau = jnp.clip(tau, lo, hi)
        ctrl = jnp.zeros(m.nu, dtype=qpos.dtype)
        ctrl = ctrl.at[jnp.asarray(arm.actuator_ids)].set(tau)
        if spec.grip_actuators:
            ctrl = ctrl.at[jnp.asarray(spec.grip_actuators)].set(grip[: len(spec.grip_actuators)])
        new_state, f = engine.integrate(m, st, ctrl, kin, M, bias, warm=1)
        if not emit_aux:
            return new_state.qpos, new_state.qvel, f
        from robosuite_tpu.physics import contact as Cm

        kin2 = kinematics.fk(m, new_state.qpos)
        pd = Cm.pair_min_dists(m, kin2)
        return (new_state.qpos, new_state.qvel, f,
                kin2.site_xpos, kin2.site_xmat, kin2.xpos, pd)

    pallas_run_cache = []

    @custom_vmap
    def sub_inner(qpos, qvel, mass, inertia, gravity, armature, goal, gains, grip):
        return _xla(qpos, qvel, mass, inertia, gravity, armature, goal, gains, grip)

    @sub_inner.def_vmap
    def _sub_vmap(axis_size, in_batched, *args):
        def bc(x, b):
            return x if b else jnp.broadcast_to(x[None], (axis_size,) + x.shape)

        args = [bc(a, b) for a, b in zip(args, in_batched)]
        if jax.default_backend() == "tpu":
            if not pallas_run_cache:
                from robosuite_tpu.ops.vmap_flat import flat_batched

                pallas_run = _pallas_substep(model, spec, solver_iters, power_iters,
                                             emit_aux=emit_aux)

                def run_flat(qpos, qvel, mass, inertia, gravity, armature,
                             goal, gains, grip):
                    if grip.shape[-1] < ng:
                        grip = jnp.pad(grip, [(0, 0), (0, ng - grip.shape[-1])])
                    return pallas_run(qpos, qvel, mass, inertia, gravity,
                                      armature, goal, gains, grip)

                pallas_run_cache.append(flat_batched(run_flat))
            out = pallas_run_cache[0](*args)
        else:
            out = jax.vmap(_xla)(*args)
        return out, (True,) * len(out)

    @jax.custom_jvp
    def sub(qpos, qvel, mass, inertia, gravity, armature, goal, gains, grip):
        return sub_inner(qpos, qvel, mass, inertia, gravity, armature, goal, gains, grip)

    @sub.defjvp
    def _sub_jvp(primals, tangents):
        return jax.jvp(_xla, primals, tangents)

    return sub
