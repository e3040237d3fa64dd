"""Inverse-kinematics controller (IK_POSE).

Re-derivation of reference controllers/parts/arm/ik.py + utils/ik_utils.py
(:226 solve): damped least-squares differential IK with nullspace posture
bias, producing joint-position targets tracked by the JOINT_POSITION law
(the reference wraps a JointPositionController the same way).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax.numpy as jnp
from flax import struct

from robosuite_tpu.controllers.base import ArmView, nums2array
from robosuite_tpu.controllers.parts import joint_pos as jp_mod
from robosuite_tpu.ops import linalg as fastla
from robosuite_tpu.utils import transforms as T


@dataclasses.dataclass(frozen=True)
class IKConfig:
    dim: int = 7
    input_max: Any = 1.0
    input_min: Any = -1.0
    output_max: Any = (0.05, 0.05, 0.05, 0.5, 0.5, 0.5)
    output_min: Any = (-0.05, -0.05, -0.05, -0.5, -0.5, -0.5)
    ik_damping: float = 5e-2          # damped least squares lambda
    nullspace_gain: float = 0.3       # posture bias gain (ik_utils.py:11)
    max_dq: float = 4.0               # per-step joint delta clip (rad)
    kp: Any = 50.0                    # inner joint-position tracking gains
    damping_ratio: Any = 1.0
    input_type: str = "delta"

    @property
    def control_dim(self) -> int:
        return 6

    def joint_cfg(self) -> jp_mod.JointPosConfig:
        return jp_mod.JointPosConfig(dim=self.dim, kp=self.kp, damping_ratio=self.damping_ratio, input_type="absolute")


@struct.dataclass
class IKState:
    joint: Any  # inner JointPosState


def init_state(cfg: IKConfig, view: ArmView) -> IKState:
    return IKState(joint=jp_mod.init_state(cfg.joint_cfg(), view))


def _solve_dq(cfg: IKConfig, view: ArmView, dpos, drot_aa):
    """Damped least-squares IK step (reference ik_utils.py:226 solve)."""
    J = view.J_full  # (6, n)
    err = jnp.concatenate([dpos, drot_aa])
    n = J.shape[-1]
    JJt = J @ J.T + (cfg.ik_damping ** 2) * jnp.eye(6, dtype=J.dtype)
    Ljj = fastla.chol_factor(JJt)
    dq = J.T @ fastla.chol_solve(Ljj, err)
    # nullspace posture bias toward initial joints
    JpinvJ = J.T @ fastla.chol_solve(Ljj, J)
    N = jnp.eye(n, dtype=J.dtype) - JpinvJ
    dq = dq + cfg.nullspace_gain * (N @ (view.initial_joint - view.joint_pos))
    return jnp.clip(dq, -cfg.max_dq, cfg.max_dq)


def set_goal(cfg: IKConfig, state: IKState, view: ArmView, action) -> IKState:
    from robosuite_tpu.controllers import control_utils as C

    arrs = dict(
        input_max=jnp.asarray(nums2array(cfg.input_max, 6)),
        input_min=jnp.asarray(nums2array(cfg.input_min, 6)),
        output_max=jnp.asarray(nums2array(cfg.output_max, 6)),
        output_min=jnp.asarray(nums2array(cfg.output_min, 6)),
    )
    scaled = C.scale_action(action, arrs["input_min"], arrs["input_max"], arrs["output_min"], arrs["output_max"])
    dq = _solve_dq(cfg, view, scaled[:3], scaled[3:6])
    goal_qpos = view.joint_pos + dq
    joint = jp_mod.set_goal(cfg.joint_cfg(), state.joint, view, goal_qpos)
    return IKState(joint=joint)


def run(cfg: IKConfig, state: IKState, view: ArmView):
    return jp_mod.run(cfg.joint_cfg(), state.joint, view)
