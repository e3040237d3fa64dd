"""Inverse-kinematics controller (IK_POSE).

Re-derivation of reference controllers/parts/arm/ik.py
(InverseKinematicsController) + utils/ik_utils.py: differential IK producing
joint-position targets tracked by the JOINT_POSITION law (the reference
subclasses JointPositionController the same way).

The solve follows compute_joint_positions (reference ik.py:209-302,
single-site delta branch) exactly:

    dpos  = clip_translation(action[:3], ik_pos_limit)         (ik.py:476-508)
    dquat = clip_rotation(axisangle2quat(action[3:6]), ik_ori_limit)
    twist = [Kpos * dpos; Kori * rotvec(dquat)] / integration_dt
    dq    = J^T (J J^T + damping^2 I)^-1 twist                 (DLS)
    dq   += (I - pinv(J) J) Kn (q0 - q)                        (nullspace)
    dq   *= min(1, max_angvel / max|dq|)                       (norm scale)
    q_des = q + dq * integration_dt

with the reference defaults: damping_pseudo_inv=0.05, Kpos=Kori=0.95,
integration_dt=0.1, Kn=[10,10,10,10,5,5,5], max_angvel=1 (the
velocity_limits[1] passed at ik.py:194). Per-joint nullspace weights
(nullspace_joint_weights in robot configs; ik_utils.py:11
get_nullspace_gains) override Kn when provided.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import struct

from robosuite_tpu.controllers.base import ArmView
from robosuite_tpu.controllers.parts import joint_pos as jp_mod
from robosuite_tpu.ops import linalg as fastla
from robosuite_tpu.utils import transforms as T

# reference ik.py:219 Kn default (7-dof arms)
_KN_DEFAULT = (10.0, 10.0, 10.0, 10.0, 5.0, 5.0, 5.0)


@dataclasses.dataclass(frozen=True)
class IKConfig:
    dim: int = 7
    ik_pos_limit: float = 0.02        # translation clip (parts/ik_pose.json)
    ik_ori_limit: float = 0.05        # rotation-angle clip (rad)
    ik_damping: float = 5e-2          # DLS lambda (damping_pseudo_inv)
    integration_dt: float = 0.1       # dq -> q_des integration (ik.py:227)
    Kpos: float = 0.95                # position twist gain (ik.py:216)
    Kori: float = 0.95                # orientation twist gain
    max_angvel: float = 1.0           # |dq| norm scale (velocity_limits[1])
    nullspace_gains: Optional[Tuple[float, ...]] = None
                                      # per-joint Kn; None -> reference
                                      # default [10,10,10,10,5,5,5] resized
    kp: Any = 50.0                    # inner joint-position tracking gains
    damping_ratio: Any = 1.0
    input_type: str = "delta"

    @property
    def control_dim(self) -> int:
        return 6

    def kn(self, n: int):
        if self.nullspace_gains is not None:
            return jnp.asarray(self.nullspace_gains[:n], dtype=jnp.float32)
        kn = (_KN_DEFAULT * ((n + 6) // 7))[:n]
        return jnp.asarray(kn, dtype=jnp.float32)

    def joint_cfg(self) -> jp_mod.JointPosConfig:
        return jp_mod.JointPosConfig(dim=self.dim, kp=self.kp, damping_ratio=self.damping_ratio, input_type="absolute")


@struct.dataclass
class IKState:
    joint: Any  # inner JointPosState


def init_state(cfg: IKConfig, view: ArmView) -> IKState:
    return IKState(joint=jp_mod.init_state(cfg.joint_cfg(), view))


def clip_ik_input(cfg: IKConfig, dpos, drot_aa):
    """Reference _clip_ik_input (ik.py:476-508): clip the translation to
    ik_pos_limit by norm, map the scaled-axis-angle rotation to a quaternion
    and clip its angle to ik_ori_limit. Returns (dpos, dquat xyzw)."""
    nrm = jnp.linalg.norm(dpos)
    dpos = jnp.where(nrm > cfg.ik_pos_limit,
                     dpos * (cfg.ik_pos_limit / (nrm + 1e-12)), dpos)
    q = T.axisangle2quat(drot_aa)  # xyzw
    # clip_rotation (transform_utils.py:741-781): angle = 2 acos(w) in
    # [0, 2pi] (no wrap), axis from the normalized vector part; when the
    # angle exceeds the limit, rebuild the quat at exactly the limit
    den = jnp.sqrt(jnp.maximum(1.0 - q[3] * q[3], 0.0))
    axis = q[:3] / jnp.maximum(den, 1e-12)
    ang = 2.0 * jnp.arccos(jnp.clip(q[3], -1.0, 1.0))
    half = 0.5 * cfg.ik_ori_limit
    q_lim = jnp.concatenate([axis * jnp.sin(half),
                             jnp.asarray([jnp.cos(half)], dtype=q.dtype)])
    q_clipped = jnp.where((den > 0.0) & (jnp.abs(ang) > cfg.ik_ori_limit),
                          q_lim, q)
    return dpos, q_clipped


def solve_q_des(cfg: IKConfig, J, q, q0, dpos, drot_mat):
    """Pure reference compute_joint_positions (ik.py:209-302, single-site
    delta branch): J (6, n) site Jacobian over the arm dofs, q/q0 current /
    initial joints, dpos clipped translation delta, drot_mat the relative
    rotation matrix. Returns q_des (n,)."""
    n = q.shape[0]
    dt = cfg.integration_dt
    # twist: mju_mat2Quat + mju_quat2Vel == rotation vector of drot
    w = T.quat2axisangle(T.mat2quat(drot_mat))
    twist = jnp.concatenate([cfg.Kpos * dpos / dt, cfg.Kori * w / dt])

    JJt = J @ J.T + (cfg.ik_damping ** 2) * jnp.eye(6, dtype=J.dtype)
    Ljj = fastla.chol_factor(JJt)
    dq = J.T @ fastla.chol_solve(Ljj, twist)

    # nullspace posture bias toward q0. The reference projects with the
    # EXACT pinv (ik.py:292 `eye - pinv(jac) @ jac`), not the damped
    # inverse — with Kn up to 10 the lambda^2-damped projector leaks ~5e-3
    # into q_des. pinv(J) = J^T (J J^T)^-1 at full row rank; the 1e-8
    # jitter only guards exact singularity.
    Kn = cfg.kn(n).astype(J.dtype)
    dq_posture = Kn * (q0 - q)
    Ln = fastla.chol_factor(J @ J.T + 1e-8 * jnp.eye(6, dtype=J.dtype))
    dq = dq + dq_posture - J.T @ fastla.chol_solve(Ln, J @ dq_posture)

    if cfg.max_angvel > 0:
        scale = jnp.minimum(1.0, cfg.max_angvel / (jnp.max(jnp.abs(dq)) + 1e-12))
        dq = dq * scale
    return q + dq * dt


def set_goal(cfg: IKConfig, state: IKState, view: ArmView, action) -> IKState:
    dpos, dquat = clip_ik_input(cfg, action[:3], action[3:6])
    q_des = solve_q_des(cfg, view.J_full, view.joint_pos, view.initial_joint,
                        dpos, T.quat2mat(dquat))
    joint = jp_mod.set_goal(cfg.joint_cfg(), state.joint, view, q_des)
    return IKState(joint=joint)


def run(cfg: IKConfig, state: IKState, view: ArmView):
    return jp_mod.run(cfg.joint_cfg(), state.joint, view)
