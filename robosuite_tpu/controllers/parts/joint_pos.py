"""Joint position controller (JOINT_POSITION).

Re-derivation of reference controllers/parts/generic/joint_pos.py:195-272:
tau = M (kp e - kd qdot) + qfrc_bias, with fixed/variable/variable_kp
impedance modes and delta/absolute inputs.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import struct

from robosuite_tpu.controllers import control_utils as C
from robosuite_tpu.controllers.base import ArmView, nums2array


@dataclasses.dataclass(frozen=True)
class JointPosConfig:
    dim: int = 7
    input_max: Any = 1.0
    input_min: Any = -1.0
    output_max: Any = 0.05
    output_min: Any = -0.05
    kp: Any = 50.0
    damping_ratio: Any = 1.0
    impedance_mode: str = "fixed"
    kp_limits: Tuple[float, float] = (0.0, 300.0)
    damping_ratio_limits: Tuple[float, float] = (0.0, 100.0)
    input_type: str = "delta"
    use_torque_compensation: bool = True
    # raw position servo: tau = kp e - kd qdot (+ bias), WITHOUT the
    # mass-matrix shaping — the law a model's <position kp kv> actuator
    # class specifies (e.g. Spot's leg servos, spot robot.xml kp=500
    # kv=40). Inertia-shaped PD is far too soft for gravity-loaded support
    # joints: effective stiffness M_jj*kp ~ 30 Nm/rad at kp=1000 for a
    # knee, under a ~25 Nm body-weight moment.
    raw_pd: bool = False
    kd: Optional[Any] = None  # raw_pd: explicit kv (None -> 2 sqrt(kp) dr)

    @property
    def control_dim(self) -> int:
        d = self.dim
        if self.impedance_mode == "variable":
            d += 2 * self.dim
        elif self.impedance_mode == "variable_kp":
            d += self.dim
        return d

    def arrays(self):
        d = self.dim
        return dict(
            input_max=jnp.asarray(nums2array(self.input_max, d)),
            input_min=jnp.asarray(nums2array(self.input_min, d)),
            output_max=jnp.asarray(nums2array(self.output_max, d)),
            output_min=jnp.asarray(nums2array(self.output_min, d)),
            kp_min=jnp.asarray(nums2array(self.kp_limits[0], d)),
            kp_max=jnp.asarray(nums2array(self.kp_limits[1], d)),
            dr_min=jnp.asarray(nums2array(self.damping_ratio_limits[0], d)),
            dr_max=jnp.asarray(nums2array(self.damping_ratio_limits[1], d)),
        )


@struct.dataclass
class JointPosState:
    goal_qpos: Any
    kp: Any
    kd: Any


def init_state(cfg: JointPosConfig, view: ArmView) -> JointPosState:
    kp = jnp.asarray(nums2array(cfg.kp, cfg.dim))
    if cfg.kd is not None:
        kd = jnp.asarray(nums2array(cfg.kd, cfg.dim))
    else:
        kd = 2.0 * jnp.sqrt(kp) * jnp.asarray(nums2array(cfg.damping_ratio, cfg.dim))
    return JointPosState(goal_qpos=view.joint_pos, kp=kp, kd=kd)


def set_goal(cfg: JointPosConfig, state: JointPosState, view: ArmView, action) -> JointPosState:
    arrs = cfg.arrays()
    kp, kd = state.kp, state.kd
    n = cfg.dim
    if cfg.input_type == "delta":
        if cfg.impedance_mode == "variable":
            damping_ratio, kp_in, delta = action[:n], action[n : 2 * n], action[2 * n :]
            kp = jnp.clip(kp_in, arrs["kp_min"], arrs["kp_max"])
            kd = 2.0 * jnp.sqrt(kp) * jnp.clip(damping_ratio, arrs["dr_min"], arrs["dr_max"])
        elif cfg.impedance_mode == "variable_kp":
            kp_in, delta = action[:n], action[n:]
            kp = jnp.clip(kp_in, arrs["kp_min"], arrs["kp_max"])
            kd = 2.0 * jnp.sqrt(kp)
        else:
            delta = action
        scaled_delta = C.scale_action(
            delta, arrs["input_min"], arrs["input_max"], arrs["output_min"], arrs["output_max"]
        )
        goal = view.joint_pos + scaled_delta
    else:
        goal = action
    return JointPosState(goal_qpos=goal, kp=kp, kd=kd)


def run(cfg: JointPosConfig, state: JointPosState, view: ArmView):
    position_error = state.goal_qpos - view.joint_pos
    desired_torque = position_error * state.kp - view.joint_vel * state.kd
    if cfg.raw_pd:
        if cfg.use_torque_compensation:
            return desired_torque + view.torque_compensation
        return desired_torque
    if cfg.use_torque_compensation:
        return view.mass_matrix @ desired_torque + view.torque_compensation
    return desired_torque
