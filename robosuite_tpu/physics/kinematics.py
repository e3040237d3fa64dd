"""Forward kinematics and Jacobians.

Replaces MuJoCo's mj_kinematics / mj_jacSite as exposed through the
reference's binding layer (utils/binding_utils.py:826-867 get_site_jacp/jacr,
:581-1056 named accessors). Written single-world; batch via jax.vmap.

Design notes (TPU-first):
  * The kinematic tree is static -> the per-body loop unrolls at trace time.
  * Spatial vectors are world-frame, referenced at the world origin, with
    (angular, linear) ordering. The per-dof motion subspace `sdof` plays the
    role of MuJoCo's cdof; with origin referencing, Jacobians and velocities
    become single (nbody,nv)x(nv,6)-style matmuls that XLA maps to the MXU.
  * Conventions validated against MuJoCo: free-joint qpos is the world pose;
    free/ball angular qvel is body-local; rotation is about the body-frame
    origin (see tests/test_physics_parity.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from robosuite_tpu.models import spec as S
from robosuite_tpu.physics.state import KinData
from robosuite_tpu.utils import transforms as T


def fk(model, qpos) -> KinData:
    """Forward kinematics: body/geom/site poses + per-dof motion subspace."""
    nb = model.nbody
    xpos = [None] * nb
    xquat = [None] * nb
    xpos[0] = jnp.zeros(3, dtype=qpos.dtype)
    xquat[0] = jnp.array([1.0, 0.0, 0.0, 0.0], dtype=qpos.dtype)
    sdof_ang = [None] * model.nv
    sdof_lin = [None] * model.nv

    for b in range(1, nb):
        p = model.body_parentid[b]
        pos = xpos[p] + T.quat_rot_wxyz(xquat[p], model.body_pos[b])
        quat = T.quat_mul_wxyz(xquat[p], model.body_quat[b])

        jadr, jnum = model.body_jntadr[b], model.body_jntnum[b]
        for k in range(jnum):
            j = jadr + k
            jt = model.jnt_type[j]
            qadr = model.jnt_qposadr[j]
            dadr = model.jnt_dofadr[j]
            if jt == S.FREE:
                pos = qpos[qadr : qadr + 3]
                quat = T.unit_vector(qpos[qadr + 3 : qadr + 7])
                R = T.quat2mat_wxyz(quat)
                e = jnp.eye(3, dtype=qpos.dtype)
                for i in range(3):  # translation dofs, world axes
                    sdof_ang[dadr + i] = jnp.zeros(3, dtype=qpos.dtype)
                    sdof_lin[dadr + i] = e[i]
                for i in range(3):  # rotation dofs: body-local axes, about body origin
                    a = R[:, i]
                    sdof_ang[dadr + 3 + i] = a
                    sdof_lin[dadr + 3 + i] = jnp.cross(pos, a)
            elif jt == S.BALL:
                anchor = pos + T.quat_rot_wxyz(quat, model.jnt_pos[j])
                q_loc = T.unit_vector(qpos[qadr : qadr + 4])
                new_quat = T.quat_mul_wxyz(quat, q_loc)
                pos = anchor - T.quat_rot_wxyz(new_quat, model.jnt_pos[j])
                quat = new_quat
                R = T.quat2mat_wxyz(quat)
                for i in range(3):  # body-local axes after the joint rotation
                    a = R[:, i]
                    sdof_ang[dadr + i] = a
                    sdof_lin[dadr + i] = jnp.cross(anchor, a)
            elif jt == S.SLIDE:
                axis_w = T.quat_rot_wxyz(quat, model.jnt_axis[j])
                pos = pos + axis_w * (qpos[qadr] - model.qpos0[qadr])
                sdof_ang[dadr] = jnp.zeros(3, dtype=qpos.dtype)
                sdof_lin[dadr] = axis_w
            else:  # HINGE
                axis_w = T.quat_rot_wxyz(quat, model.jnt_axis[j])
                anchor = pos + T.quat_rot_wxyz(quat, model.jnt_pos[j])
                angle = qpos[qadr] - model.qpos0[qadr]
                half = 0.5 * angle
                q_loc = jnp.concatenate(
                    [jnp.cos(half)[None], jnp.sin(half) * model.jnt_axis[j]]
                )
                new_quat = T.quat_mul_wxyz(quat, q_loc)
                pos = anchor - T.quat_rot_wxyz(new_quat, model.jnt_pos[j])
                quat = new_quat
                sdof_ang[dadr] = axis_w
                sdof_lin[dadr] = jnp.cross(anchor, axis_w)

        # Materialization fence, once per body. The pose recursion is a
        # depth-(tree height) expression DAG of quaternion ops; XLA's loop
        # fusion re-expands producers per use inside a fusion (index-dependent
        # emission defeats its memoization), which turns that DAG into an
        # exponentially-sized expression tree — observed as ~18 s per FK call
        # for a mobile manipulator. Fencing each body's pose caps every
        # fusion's producer depth at one tree level.
        import jax

        xpos[b], xquat[b] = jax.lax.optimization_barrier((pos, quat))

    xpos = jnp.stack(xpos)
    xquat = jnp.stack(xquat)
    xmat = T.quat2mat_wxyz(xquat)

    xipos = xpos + jnp.einsum("bij,bj->bi", xmat, model.body_ipos)
    ximat = T.quat2mat_wxyz(T.quat_mul_wxyz(xquat, model.body_iquat))

    gb = np.asarray(model.geom_bodyid, dtype=np.int32)
    geom_xpos = xpos[gb] + jnp.einsum("gij,gj->gi", xmat[gb], model.geom_pos)
    geom_xmat = T.quat2mat_wxyz(T.quat_mul_wxyz(xquat[gb], model.geom_quat))

    if model.nsite:
        sb = np.asarray(model.site_bodyid, dtype=np.int32)
        site_xpos = xpos[sb] + jnp.einsum("sij,sj->si", xmat[sb], model.site_pos)
        site_xmat = T.quat2mat_wxyz(T.quat_mul_wxyz(xquat[sb], model.site_quat))
    else:
        site_xpos = jnp.zeros((0, 3), dtype=qpos.dtype)
        site_xmat = jnp.zeros((0, 3, 3), dtype=qpos.dtype)

    return KinData(
        xpos=xpos,
        xquat=xquat,
        xmat=xmat,
        xipos=xipos,
        ximat=ximat,
        sdof_ang=jnp.stack(sdof_ang) if model.nv else jnp.zeros((0, 3)),
        sdof_lin=jnp.stack(sdof_lin) if model.nv else jnp.zeros((0, 3)),
        geom_xpos=geom_xpos,
        geom_xmat=geom_xmat,
        site_xpos=site_xpos,
        site_xmat=site_xmat,
    )


def body_velocities(model, kin: KinData, qvel):
    """Spatial velocity of every body, world frame, origin-referenced.

    cvel[b] = sum over ancestor dofs of S_d * qvel_d — one masked matmul
    (ancestor_mask is compile-time constant).
    """
    sq_ang = kin.sdof_ang * qvel[:, None]
    sq_lin = kin.sdof_lin * qvel[:, None]
    vel_ang = model.ancestor_mask @ sq_ang  # (nbody, 3)
    vel_lin = model.ancestor_mask @ sq_lin
    return vel_ang, vel_lin


def point_jacobian(model, kin: KinData, bodyid: int, point):
    """Translational + rotational Jacobian of a world-frame point attached to
    body `bodyid` — MuJoCo mj_jac equivalent (reference binding_utils.py:826-853).

    Returns (jacp (3, nv), jacr (3, nv)).
    """
    mask = model.ancestor_mask[bodyid]  # (nv,)
    jacr = (kin.sdof_ang * mask[:, None]).T
    # point velocity = S_lin + S_ang x point
    jacp = ((kin.sdof_lin + jnp.cross(kin.sdof_ang, point[None, :])) * mask[:, None]).T
    return jacp, jacr


def site_jacobian(model, kin: KinData, siteid: int):
    """mj_jacSite equivalent."""
    return point_jacobian(model, kin, model.site_bodyid[siteid], kin.site_xpos[siteid])


def site_velocity(model, kin: KinData, qvel, siteid: int):
    """(linear, angular) world-frame velocity of a site — the analog of
    get_site_xvelp/xvelr (reference binding_utils.py:854-880)."""
    b = model.site_bodyid[siteid]
    mask = model.ancestor_mask[b]
    w = qvel * mask
    ang = kin.sdof_ang.T @ w
    lin = (kin.sdof_lin + jnp.cross(kin.sdof_ang, kin.site_xpos[siteid][None, :])).T @ w
    return lin, ang
