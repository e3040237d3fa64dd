"""Runtime robot: index resolution + the two-clock control flow.

Re-derivation of the reference robot layer (robots/robot.py:22-1067,
fixed_base_robot.py:121-177) in functional form:

  * At construction (host side, once per compiled model) all name -> index
    resolution happens: arm qpos/qvel slices, actuator ids, eef/center site
    ids, torque limits — the analog of setup_references (robot.py:302-332).
  * set_goals(...) runs at policy rate (reference composite set_goal,
    fixed_base_robot.py:145-148), run_controllers(...) at substep rate;
    both are pure functions of (physics state, controller state).

Controller state (OSC goals + gripper ramp) is an explicit pytree
(RobotCtrlState) so the whole env step jits and scans.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

from robosuite_tpu.controllers.base import ArmView
from robosuite_tpu.controllers.parts import gripper as grip_mod
from robosuite_tpu.controllers.parts import ik as ik_mod
from robosuite_tpu.controllers.parts import joint_pos as jp_mod
from robosuite_tpu.controllers.parts import joint_tor as jt_mod
from robosuite_tpu.controllers.parts import joint_vel as jv_mod
from robosuite_tpu.controllers.parts import osc as osc_mod
from robosuite_tpu.physics import dynamics, kinematics

# config class -> controller module (init_state/set_goal/run)
_CTRL_DISPATCH = {
    osc_mod.OSCConfig: osc_mod,
    jp_mod.JointPosConfig: jp_mod,
    ik_mod.IKConfig: ik_mod,
}


@struct.dataclass
class RobotCtrlState:
    """Per-robot controller state: arm goal states + gripper ramp."""

    arm: Dict[str, Any]          # arm name -> OSCState / JointPosState
    gripper_action: Dict[str, Any]  # arm name -> ramped action in [-1, 1]


class FixedBaseRobot:
    """Host-side robot handle over a compiled model.

    Args:
        model: compiled Model containing this robot
        robot_model: the ManipulatorModel used to build it
        controller_config: dict arm -> part-controller config dataclass
            (default: OSC_POSE with reference defaults)
    """

    def __init__(self, model, robot_model, controller_config: Optional[dict] = None):
        self.model = model
        self.rm = robot_model
        self.arms = list(robot_model.arms)

        # --- index resolution (reference robot.py:302-332) -------------------
        self.arm_joint_ids = {}
        self.arm_qpos_idx = {}
        self.arm_qvel_idx = {}
        self.arm_actuator_ids = {}
        self.gripper_joint_qpos_idx = {}
        self.gripper_joint_qvel_idx = {}
        self.gripper_actuator_ids = {}
        self.eef_site_id = {}
        self.center_site_id = {}

        for arm in self.arms:
            jnames = robot_model.arm_joint_names[arm]
            jids = [model.jnt_name2id(n) for n in jnames]
            self.arm_joint_ids[arm] = jids
            self.arm_qpos_idx[arm] = np.array([model.jnt_qposadr[j] for j in jids])
            self.arm_qvel_idx[arm] = np.array([model.jnt_dofadr[j] for j in jids])
            self.arm_actuator_ids[arm] = np.array(
                [model.actuator_name2id(n) for n in robot_model.arm_actuator_names[arm]]
            )
            grip = robot_model.grippers.get(arm)
            if grip is not None:
                gj = [model.jnt_name2id(n) for n in grip.joint_names]
                self.gripper_joint_qpos_idx[arm] = np.array([model.jnt_qposadr[j] for j in gj])
                self.gripper_joint_qvel_idx[arm] = np.array([model.jnt_dofadr[j] for j in gj])
                self.gripper_actuator_ids[arm] = np.array(
                    [model.actuator_name2id(n) for n in grip.actuator_names]
                )
                self.eef_site_id[arm] = model.site_name2id(grip.important_sites["grip_site"])
            else:
                self.gripper_joint_qpos_idx[arm] = np.zeros(0, dtype=int)
                self.gripper_joint_qvel_idx[arm] = np.zeros(0, dtype=int)
                self.gripper_actuator_ids[arm] = np.zeros(0, dtype=int)
                self.eef_site_id[arm] = model.site_name2id(robot_model.eef_name[arm])  # fallback
            self.center_site_id[arm] = model.site_name2id(robot_model.center_site_name(arm))

        # torque limits from actuator ctrlrange (reference robot.py:562-575)
        self.torque_limits = {
            arm: (
                np.asarray(model.actuator_ctrlrange)[self.arm_actuator_ids[arm], 0],
                np.asarray(model.actuator_ctrlrange)[self.arm_actuator_ids[arm], 1],
            )
            for arm in self.arms
        }

        # --- controllers ------------------------------------------------------
        if controller_config is None or isinstance(controller_config, (str, dict)) and not (
            isinstance(controller_config, dict) and all(hasattr(v, "control_dim") for v in controller_config.values())
        ):
            from robosuite_tpu.controllers.factory import load_composite_controller_config

            controller_config = load_composite_controller_config(
                controller_config, robot=type(robot_model).__name__
            )
            controller_config = {arm: controller_config[arm] for arm in self.arms}
        self.arm_cfg = controller_config
        self.grip_cfg = {
            arm: grip_mod.GripConfig(dim=len(self.gripper_actuator_ids[arm]))
            for arm in self.arms
        }
        # nullspace target: robot init qpos (reference controller init)
        iq = np.asarray(robot_model.init_qpos, dtype=np.float32)
        n_per = len(iq) // len(self.arms)
        self.initial_joint = {
            arm: jnp.asarray(iq[i * n_per : (i + 1) * n_per]) for i, arm in enumerate(self.arms)
        }

    def _ctrl_mod(self, cfg):
        for klass, mod in _CTRL_DISPATCH.items():
            if isinstance(cfg, klass):
                return mod
        if isinstance(cfg, jv_mod.JointVelConfig):
            return jv_mod
        if isinstance(cfg, jt_mod.JointTorConfig):
            return jt_mod
        raise TypeError(f"no controller module for config {type(cfg)}")

    # -- action vector layout (reference composite_controller.py:86-95) -------
    @property
    def action_dim(self) -> int:
        d = 0
        for arm in self.arms:
            d += self.arm_cfg[arm].control_dim
            d += self.rm.grippers[arm].dof if arm in self.rm.grippers else 0
        return d

    def split_action(self, action):
        """-> dict arm -> (arm_action, gripper_action)."""
        out = {}
        i = 0
        for arm in self.arms:
            cd = self.arm_cfg[arm].control_dim
            arm_a = action[..., i : i + cd]
            i += cd
            gd = self.rm.grippers[arm].dof if arm in self.rm.grippers else 0
            grip_a = action[..., i : i + gd]
            i += gd
            out[arm] = (arm_a, grip_a)
        return out

    # -- views -----------------------------------------------------------------
    def arm_view(self, kin, M, bias, qpos, qvel, arm: str) -> ArmView:
        """Build the per-substep controller view (reference
        controller.py:199-232 update())."""
        qp_i = self.arm_qpos_idx[arm]
        qv_i = self.arm_qvel_idx[arm]
        eef = self.eef_site_id[arm]
        cen = self.center_site_id[arm]
        jacp, jacr = kinematics.site_jacobian(self.model, kin, eef)
        lin, ang = kinematics.site_velocity(self.model, kin, qvel, eef)
        olin, oang = kinematics.site_velocity(self.model, kin, qvel, cen)
        return ArmView(
            joint_pos=qpos[qp_i],
            joint_vel=qvel[qv_i],
            ref_pos=kin.site_xpos[eef],
            ref_ori_mat=kin.site_xmat[eef],
            ref_pos_vel=lin,
            ref_ori_vel=ang,
            J_pos=jacp[:, qv_i],
            J_ori=jacr[:, qv_i],
            mass_matrix=M[jnp.ix_(qv_i, qv_i)],
            torque_compensation=bias[qv_i],
            initial_joint=self.initial_joint[arm],
            origin_pos=kin.site_xpos[cen],
            origin_ori=kin.site_xmat[cen],
            origin_pos_vel=olin,
            origin_ori_vel=oang,
        )

    # -- two-clock control -----------------------------------------------------
    def init_ctrl_state(self, kin, M, bias, qpos, qvel) -> RobotCtrlState:
        arm_states = {}
        grip_actions = {}
        for arm in self.arms:
            view = self.arm_view(kin, M, bias, qpos, qvel, arm)
            cfg = self.arm_cfg[arm]
            mod = self._ctrl_mod(cfg)
            if mod in (jt_mod,):
                arm_states[arm] = mod.init_state(cfg)
            elif mod is jv_mod:
                arm_states[arm] = mod.init_state(cfg, view)
            else:
                arm_states[arm] = mod.init_state(cfg, view)
            n_act = len(self.gripper_actuator_ids[arm])
            grip_actions[arm] = jnp.zeros(max(n_act, 1))
        return RobotCtrlState(arm=arm_states, gripper_action=grip_actions)

    def set_goals(self, kin, M, bias, qpos, qvel, ctrl_state: RobotCtrlState, action) -> RobotCtrlState:
        """Policy-rate goal update (reference composite set_goal path)."""
        split = self.split_action(action)
        new_arm = {}
        new_grip = {}
        for arm in self.arms:
            arm_a, grip_a = split[arm]
            view = self.arm_view(kin, M, bias, qpos, qvel, arm)
            cfg = self.arm_cfg[arm]
            mod = self._ctrl_mod(cfg)
            if mod is jt_mod:
                lo, hi = self.torque_limits[arm]
                new_arm[arm] = mod.set_goal(cfg, ctrl_state.arm[arm], arm_a, jnp.asarray(lo), jnp.asarray(hi))
            else:
                new_arm[arm] = mod.set_goal(cfg, ctrl_state.arm[arm], view, arm_a)
            if arm in self.rm.grippers and self.rm.grippers[arm].dof > 0:
                # reference gripper format_action ramp (panda_gripper.py:42-55)
                grip = self.rm.grippers[arm]
                direction = jnp.asarray(grip.format_action_direction(), dtype=qpos.dtype)
                cur = ctrl_state.gripper_action[arm]
                if cur.shape[0] != direction.shape[0]:
                    cur = jnp.zeros_like(direction)
                new = jnp.clip(cur + direction * grip.speed * jnp.sign(grip_a[..., 0]), -1.0, 1.0)
                new_grip[arm] = new
            else:
                new_grip[arm] = ctrl_state.gripper_action[arm]
        return RobotCtrlState(arm=new_arm, gripper_action=new_grip)

    def run_controllers(self, kin, M, bias, qpos, qvel, ctrl_state: RobotCtrlState, ctrl):
        """Substep-rate torque computation; writes into the full (nu,) ctrl
        vector (reference fixed_base_robot.py:149-153)."""
        for arm in self.arms:
            view = self.arm_view(kin, M, bias, qpos, qvel, arm)
            cfg = self.arm_cfg[arm]
            mod = self._ctrl_mod(cfg)
            if mod is jv_mod:
                lo, hi = self.torque_limits[arm]
                tau, _ = mod.run(cfg, ctrl_state.arm[arm], view, jnp.asarray(lo), jnp.asarray(hi))
            else:
                tau = mod.run(cfg, ctrl_state.arm[arm], view)
            lo, hi = self.torque_limits[arm]
            tau = jnp.clip(tau, jnp.asarray(lo, dtype=tau.dtype), jnp.asarray(hi, dtype=tau.dtype))
            ctrl = ctrl.at[self.arm_actuator_ids[arm]].set(tau)
            if arm in self.rm.grippers and self.rm.grippers[arm].dof > 0:
                gcfg = self.grip_cfg[arm]
                aid = self.gripper_actuator_ids[arm]
                amin = jnp.asarray(np.asarray(self.model.actuator_ctrlrange)[aid, 0])
                amax = jnp.asarray(np.asarray(self.model.actuator_ctrlrange)[aid, 1])
                gst = grip_mod.set_goal(gcfg, grip_mod.GripState(goal_qvel=ctrl_state.gripper_action[arm]), ctrl_state.gripper_action[arm])
                gctrl = grip_mod.run(gcfg, gst, amin, amax)
                ctrl = ctrl.at[aid].set(gctrl)
        return ctrl
