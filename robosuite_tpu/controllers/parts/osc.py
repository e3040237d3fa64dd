"""Operational Space Controller (OSC_POSE / OSC_POSITION).

Torque-exact re-derivation of reference controllers/parts/arm/osc.py:
  * set_goal semantics (osc.py:225-283): action scaling, delta/absolute,
    base/world reference frames, variable-impedance action parsing
  * run_controller law (osc.py:403-495):
      F = kp .* e_pos + kd .* (v_base - v_ref)
      tau = J^T (Lambda F) + qfrc_bias + nullspace torques
  * defaults kp=150, damping_ratio=1, output_max (0.05 m, 0.5 rad)
    (osc.py:122-128, config/default/composite/basic.json)

Functional: config is static, goal state is an explicit pytree, both clocks
(policy-rate set_goal, substep-rate run) are pure functions of (cfg, state,
ArmView).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import struct

from robosuite_tpu.controllers import control_utils as C
from robosuite_tpu.controllers.base import ArmView, nums2array
from robosuite_tpu.utils import transforms as T

IMPEDANCE_MODES = ("fixed", "variable", "variable_kp")


@dataclasses.dataclass(frozen=True)
class OSCConfig:
    control_ori: bool = True
    input_max: Any = 1.0
    input_min: Any = -1.0
    output_max: Any = (0.05, 0.05, 0.05, 0.5, 0.5, 0.5)
    output_min: Any = (-0.05, -0.05, -0.05, -0.5, -0.5, -0.5)
    kp: Any = 150.0
    damping_ratio: Any = 1.0
    impedance_mode: str = "fixed"
    kp_limits: Tuple[float, float] = (0.0, 300.0)
    damping_ratio_limits: Tuple[float, float] = (0.0, 100.0)
    policy_freq: int = 20
    input_type: str = "delta"
    input_ref_frame: str = "base"
    uncouple_pos_ori: bool = True
    # goal interpolation (reference utils/traj_utils.py:25-141 wired via
    # controller_factory.py:118-133): "linear" ramps the goal from the
    # previous goal over the first ramp_ratio fraction of the control period
    interpolation: Optional[str] = None   # None | "linear"
    ramp_ratio: float = 0.2
    controller_freq: float = 500.0

    @property
    def interp_steps(self) -> int:
        """Substeps over which the goal ramps (traj_utils.py:63-66)."""
        import math

        return max(int(math.ceil(self.ramp_ratio * self.controller_freq / self.policy_freq)), 1)

    @property
    def base_dim(self) -> int:
        return 6 if self.control_ori else 3

    @property
    def control_dim(self) -> int:
        d = self.base_dim
        if self.impedance_mode == "variable":
            d += 12
        elif self.impedance_mode == "variable_kp":
            d += 6
        return d

    def arrays(self):
        d = self.base_dim
        return dict(
            input_max=jnp.asarray(nums2array(self.input_max, d)),
            input_min=jnp.asarray(nums2array(self.input_min, d)),
            output_max=jnp.asarray(nums2array(self.output_max, d)),
            output_min=jnp.asarray(nums2array(self.output_min, d)),
            kp=jnp.asarray(nums2array(self.kp, 6)),
            kp_min=jnp.asarray(nums2array(self.kp_limits[0], 6)),
            kp_max=jnp.asarray(nums2array(self.kp_limits[1], 6)),
            dr_min=jnp.asarray(nums2array(self.damping_ratio_limits[0], 6)),
            dr_max=jnp.asarray(nums2array(self.damping_ratio_limits[1], 6)),
        )


@struct.dataclass
class OSCState:
    goal_pos: Any   # (3,) in controller ref frame
    goal_ori: Any   # (3,3) in controller ref frame
    kp: Any         # (6,)
    kd: Any         # (6,)
    # interpolation start pose: the previous goal, captured at set_goal time
    # (traj_utils.py:101-117); equal to goal when interpolation is off
    start_pos: Any = None
    start_ori: Any = None


def _world_to_origin_frame(view: ArmView, vec):
    """reference osc.py:284-298: world point -> base frame."""
    return view.origin_ori.T @ (vec - view.origin_pos)


def _eef_pose_in_origin(view: ArmView):
    """reference osc.py:300-304 goal_origin_to_eef_pose."""
    pos = view.origin_ori.T @ (view.ref_pos - view.origin_pos)
    ori = view.origin_ori.T @ view.ref_ori_mat
    return pos, ori


def init_state(cfg: OSCConfig, view: ArmView) -> OSCState:
    """Goal defaults to the current pose in the controller frame
    (osc.py:306-350 compute_goal_pos/ori with goal None)."""
    arrs = cfg.arrays()
    kp = arrs["kp"]
    kd = 2.0 * jnp.sqrt(kp) * jnp.asarray(nums2array(cfg.damping_ratio, 6))
    if cfg.input_ref_frame == "base":
        pos, ori = _eef_pose_in_origin(view)
    else:
        pos, ori = view.ref_pos, view.ref_ori_mat
    return OSCState(goal_pos=pos, goal_ori=ori, kp=kp, kd=kd, start_pos=pos, start_ori=ori)


def set_goal(cfg: OSCConfig, state: OSCState, view: ArmView, action, goal_update_mode: str = "achieved",
             wrt_origin=None) -> OSCState:
    """reference osc.py:225-283 + compute_goal_pos/ori (:306-404).

    goal_update_mode: "achieved" updates relative to current eef pose,
    "desired" relative to the previous goal (composite_controller.py:258-276
    HybridMobileBase switches between them). When the switch is RUNTIME data
    (the hybrid composite's trailing base-mode action dim), pass `wrt_origin`
    as a traced boolean instead: True selects the "desired" behavior.
    """
    arrs = cfg.arrays()
    kp, kd = state.kp, state.kd
    d = cfg.base_dim

    if cfg.impedance_mode == "variable":
        damping_ratio, kp_in, goal_update = action[:6], action[6:12], action[12:]
        kp = jnp.clip(kp_in, arrs["kp_min"], arrs["kp_max"])
        kd = 2.0 * jnp.sqrt(kp) * jnp.clip(damping_ratio, arrs["dr_min"], arrs["dr_max"])
    elif cfg.impedance_mode == "variable_kp":
        kp_in, goal_update = action[:6], action[6:]
        kp = jnp.clip(kp_in, arrs["kp_min"], arrs["kp_max"])
        kd = 2.0 * jnp.sqrt(kp)
    else:
        goal_update = action

    if cfg.input_type == "delta":
        scaled_delta = C.scale_action(
            goal_update[:d], arrs["input_min"], arrs["input_max"], arrs["output_min"], arrs["output_max"]
        )
        pos_delta = scaled_delta[0:3]
        ori_delta = scaled_delta[3:6] if cfg.control_ori else jnp.zeros(3)

        # current achieved pose in controller frame
        if cfg.input_ref_frame == "base":
            cur_pos, cur_ori = _eef_pose_in_origin(view)
        else:
            cur_pos, cur_ori = view.ref_pos, view.ref_ori_mat
        if wrt_origin is not None:
            base_pos = jnp.where(wrt_origin, state.goal_pos, cur_pos)
            base_ori = jnp.where(wrt_origin, state.goal_ori, cur_ori)
        else:
            base_pos = cur_pos if goal_update_mode == "achieved" else state.goal_pos
            base_ori = cur_ori if goal_update_mode == "achieved" else state.goal_ori
        goal_pos = base_pos + pos_delta
        rot_err = T.quat2mat(T.axisangle2quat(ori_delta))
        goal_ori = rot_err @ base_ori
    else:  # absolute
        goal_pos = goal_update[0:3]
        if cfg.control_ori:
            goal_ori = T.quat2mat(T.axisangle2quat(goal_update[3:6]))
        else:
            if cfg.input_ref_frame == "base":
                _, goal_ori = _eef_pose_in_origin(view)
            else:
                goal_ori = view.ref_ori_mat

    return OSCState(
        goal_pos=goal_pos, goal_ori=goal_ori, kp=kp, kd=kd,
        start_pos=state.goal_pos, start_ori=state.goal_ori,
    )


def _interpolated_goal(cfg: OSCConfig, state: OSCState, substep):
    """Linear-in-position, slerp-in-orientation goal ramp at substep index
    `substep` of the current control period (traj_utils.py:119-141)."""
    frac = jnp.minimum((substep + 1.0) / cfg.interp_steps, 1.0)
    pos = state.start_pos + (state.goal_pos - state.start_pos) * frac
    q0 = T.mat2quat(state.start_ori)
    q1 = T.mat2quat(state.goal_ori)
    ori = T.quat2mat(T.quat_slerp(q0, q1, frac))
    return pos, ori


def desired_world_pose(cfg: OSCConfig, state: OSCState, origin_pos, origin_ori, substep=None):
    """The goal-resolution head of run(): (desired_pos, desired_ori) in the
    WORLD frame, given the controller-frame origin pose. Split out so the
    fused-substep path (ops/pallas_substep.py) can resolve goals at tick
    rate in XLA and hand the kernel a world-frame target."""
    if cfg.interpolation == "linear" and substep is not None and state.start_pos is not None:
        goal_pos, goal_ori = _interpolated_goal(cfg, state, substep)
    else:
        goal_pos, goal_ori = state.goal_pos, state.goal_ori
    if cfg.input_ref_frame == "base":
        return origin_pos + origin_ori @ goal_pos, origin_ori @ goal_ori
    return goal_pos, goal_ori


def run_world(cfg: OSCConfig, view: ArmView, desired_pos, desired_ori, kp, kd):
    """The torque law tail of run(): OSC torques for a WORLD-frame desired
    pose (reference osc.py:437-495). Shared verbatim by run() and the
    fused-substep XLA fallback."""
    ori_error = T.orientation_error(desired_ori, view.ref_ori_mat)
    position_error = desired_pos - view.ref_pos
    vel_pos_error = -(view.ref_pos_vel - view.origin_pos_vel)
    vel_ori_error = -(view.ref_ori_vel - view.origin_ori_vel)

    desired_force = position_error * kp[0:3] + vel_pos_error * kd[0:3]
    desired_torque = ori_error * kp[3:6] + vel_ori_error * kd[3:6]

    J_full = view.J_full
    lambda_full, lambda_pos, lambda_ori, nullspace_matrix = C.opspace_matrices(
        view.mass_matrix, J_full, view.J_pos, view.J_ori
    )

    if cfg.uncouple_pos_ori:
        decoupled_wrench = jnp.concatenate([lambda_pos @ desired_force, lambda_ori @ desired_torque])
    else:
        decoupled_wrench = lambda_full @ jnp.concatenate([desired_force, desired_torque])

    torques = J_full.T @ decoupled_wrench + view.torque_compensation
    torques = torques + C.nullspace_torques(
        view.mass_matrix, nullspace_matrix, view.initial_joint, view.joint_pos, view.joint_vel
    )
    return torques


def run(cfg: OSCConfig, state: OSCState, view: ArmView, substep=None):
    """reference osc.py:403-495 run_controller — returns joint torques.

    `substep`: index within the control period; drives the goal
    interpolator when cfg.interpolation == "linear" (the substep counter IS
    the reference interpolator's step state, reset by every set_goal)."""
    desired_pos, desired_ori = desired_world_pose(
        cfg, state, view.origin_pos, view.origin_ori, substep
    )
    return run_world(cfg, view, desired_pos, desired_ori, state.kp, state.kd)
