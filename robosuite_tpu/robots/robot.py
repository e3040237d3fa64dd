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
from robosuite_tpu.controllers.parts import mobile_base as mb_mod
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
        # WHOLE_BODY_IK composite (reference composite_controller.py:514-589):
        # task-space targets for every end effector are solved JOINTLY into
        # qpos targets over torso+arms (controllers/composite/wbik.py); the
        # per-part controllers below then run JOINT_POSITION tracking.
        self._wbik_spec = None
        # third-party composite controllers (reference
        # @register_composite_controller, composite_controller.py:15-27):
        # a registered goal transform maps task targets -> qpos goals, then
        # per-arm JOINT_POSITION parts track them (the WBIK integration
        # pattern below)
        self._custom_composite = None
        # resolve name/path/per-robot-default JSON FIRST so the composite
        # `type` (WHOLE_BODY_IK, HYBRID_MOBILE_BASE, ...) in shipped robot
        # defaults (controllers/config/robots/default_*.json) is visible to
        # the checks below (reference search order step 3,
        # composite_controller_factory.py:89-100)
        if controller_config is None or isinstance(controller_config, str):
            from robosuite_tpu.controllers.factory import resolve_controller_json

            resolved = resolve_controller_json(
                controller_config, robot=type(robot_model).__name__
            )
            if resolved is not None:
                controller_config = resolved
        # WHOLE_BODY_MINK_IK: the reference's mink(QP)-based whole-body IK
        # (mink_controller.py). The TPU analog is the same posture-weighted
        # damped-least-squares solve as WHOLE_BODY_IK — map its posture
        # weights onto the nullspace weights and run the WBIK path.
        self._composite_type = (
            controller_config.get("type")
            if isinstance(controller_config, dict) else None
        )
        # raw resolved composite config (MobileRobot reads part entries —
        # torso/head/base/legs gains — from its body_parts)
        self._composite_json = (
            controller_config
            if isinstance(controller_config, dict) and "body_parts" in controller_config
            else None
        )
        if isinstance(controller_config, dict) and controller_config.get("type") == "WHOLE_BODY_MINK_IK":
            controller_config = dict(controller_config)
            controller_config["type"] = "WHOLE_BODY_IK"
            sc = dict(controller_config.get("composite_controller_specific_configs", {}))
            if "ik_posture_weights" in sc and "nullspace_joint_weights" not in sc:
                sc["nullspace_joint_weights"] = sc["ik_posture_weights"]
            controller_config["composite_controller_specific_configs"] = sc
        if isinstance(controller_config, dict) and controller_config.get("type"):
            from robosuite_tpu.controllers.composite.composite_controller import (
                THIRD_PARTY_COMPOSITE_CONTROLLERS,
            )

            entry = THIRD_PARTY_COMPOSITE_CONTROLLERS.get(controller_config["type"])
            if entry is not None:
                self._custom_composite = (
                    entry,
                    dict(controller_config.get("composite_controller_specific_configs", {})),
                )
                from robosuite_tpu.controllers.factory import arm_controller_config

                controller_config = {
                    arm: arm_controller_config(
                        "JOINT_POSITION", dim=len(self.arm_joint_ids[arm]),
                        kp=1000.0, input_type="absolute",
                    )
                    for arm in self.arms
                }
        if isinstance(controller_config, dict) and controller_config.get("type") == "WHOLE_BODY_IK":
            self._wbik_spec = dict(
                controller_config.get("composite_controller_specific_configs", {})
            )
            if "body_parts" not in controller_config:
                from robosuite_tpu.controllers.factory import arm_controller_config

                controller_config = {
                    arm: arm_controller_config(
                        "JOINT_POSITION", dim=len(self.arm_joint_ids[arm]),
                        kp=1000.0, input_type="absolute",
                    )
                    for arm in self.arms
                }
        if controller_config is None or isinstance(controller_config, (str, dict)) and not (
            isinstance(controller_config, dict) and all(hasattr(v, "control_dim") for v in controller_config.values())
        ):
            from robosuite_tpu.controllers.factory import load_composite_controller_config

            controller_config = load_composite_controller_config(
                controller_config, robot=type(robot_model).__name__, arms=self.arms
            )
            controller_config = {arm: controller_config[arm] for arm in self.arms}
        self.arm_cfg = controller_config
        self.grip_cfg = {
            arm: grip_mod.GripConfig(dim=len(self.gripper_actuator_ids[arm]))
            for arm in self.arms
        }
        # nullspace target: robot init qpos (reference controller init).
        # init_qpos covers ALL card joints in card order (torso+head+arms for
        # mobile manipulators); pick each arm's entries by position.
        iq = np.asarray(robot_model.init_qpos, dtype=np.float32)
        card = robot_model.card_joint_names
        self.initial_joint = {}
        for arm in self.arms:
            jnames = robot_model.arm_joint_names[arm]
            if len(iq) == len(card):
                sel = [card.index(n) for n in jnames]
                self.initial_joint[arm] = jnp.asarray(iq[sel])
            else:  # legacy even split (all-arm cards)
                n_per = len(iq) // len(self.arms)
                i = self.arms.index(arm)
                self.initial_joint[arm] = jnp.asarray(iq[i * n_per : (i + 1) * n_per])

        # qpos addresses of the card joints, card order — where init_qpos
        # lands at reset (reference robot.py:234-300 _ref_joint_pos_indexes)
        card_jids = [model.jnt_name2id(n) for n in card]
        self.init_qpos_idx = np.array([model.jnt_qposadr[j] for j in card_jids], dtype=int)

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
    def _arm_cmd_dim(self, arm) -> int:
        """Per-arm action width: task-space target width for whole-body
        composites (built-in WBIK = 6; third-party = its arm_action_dim),
        the part controller's control_dim otherwise."""
        if self._custom_composite is not None:
            return self._custom_composite[0].arm_action_dim
        if self._wbik_spec is not None:
            return 6
        return self.arm_cfg[arm].control_dim

    @property
    def action_dim(self) -> int:
        d = 0
        for arm in self.arms:
            d += self._arm_cmd_dim(arm)
            d += self.rm.grippers[arm].dof if arm in self.rm.grippers else 0
        return d

    def action_split_indexes(self):
        """part name -> (start, end), reference composite layout: arm parts
        first (model order), then grippers last (composite_controller.py:86-95;
        verified against the live reference: Baxter = right, left,
        right_gripper, left_gripper). Under WHOLE_BODY_IK each arm slot is a
        6-dim task-space target (ik_utils.py action_split_indexes)."""
        out = {}
        i = 0
        for arm in self.arms:
            cd = self._arm_cmd_dim(arm)
            out[arm] = (i, i + cd)
            i += cd
        for arm in self.arms:
            gd = self.rm.grippers[arm].dof if arm in self.rm.grippers else 0
            out[f"{arm}_gripper"] = (i, i + gd)
            i += gd
        return out

    @property
    def action_limits(self):
        """Per-dim action bounds (reference controller control_limits,
        osc.py:190-211): variable-impedance dims carry their damping/kp
        ranges; everything else is [-1, 1]."""
        low = -np.ones(self.action_dim, dtype=np.float32)
        high = np.ones(self.action_dim, dtype=np.float32)
        idx = self.action_split_indexes()
        if self._wbik_spec is not None:
            # task-space pose targets (reference IKSolver control_limits are
            # unbounded, ik_utils.py:77): allow full axis-angle / reach range
            for arm in self.arms:
                s, e = idx[arm]
                low[s:e] = -3.2
                high[s:e] = 3.2
            return low, high
        for arm in self.arms:
            cfg = self.arm_cfg[arm]
            if isinstance(cfg, osc_mod.OSCConfig) and cfg.impedance_mode != "fixed":
                s, _ = idx[arm]
                if cfg.impedance_mode == "variable":
                    low[s : s + 6] = cfg.damping_ratio_limits[0]
                    high[s : s + 6] = cfg.damping_ratio_limits[1]
                    low[s + 6 : s + 12] = cfg.kp_limits[0]
                    high[s + 6 : s + 12] = cfg.kp_limits[1]
                else:  # variable_kp
                    low[s : s + 6] = cfg.kp_limits[0]
                    high[s : s + 6] = cfg.kp_limits[1]
        return low, high

    def split_action(self, action):
        """-> dict arm -> (arm_action, gripper_action)."""
        idx = self.action_split_indexes()
        out = {}
        for arm in self.arms:
            s, e = idx[arm]
            gs, ge = idx[f"{arm}_gripper"]
            out[arm] = (action[..., s:e], action[..., gs:ge])
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

    # -- WHOLE_BODY_IK (reference composite_controller.py:514-589) -------------
    def _wbik_build(self):
        """Resolve the whole-body IK problem structure once (host-side at
        trace time): selected dofs = torso part (mobile robots) + all arms,
        nullspace weights by joint name, torso clamp mask."""
        if hasattr(self, "_wbik"):
            return self._wbik
        from robosuite_tpu.controllers.composite import wbik as wbik_mod

        spec = self._wbik_spec
        model = self.model
        qpos_idx, qvel_idx, slices, torso_mask = [], [], {}, []
        n = 0

        def add_part(name, qp, qv, is_torso):
            nonlocal n
            qpos_idx.extend(qp)
            qvel_idx.extend(qv)
            slices[name] = slice(n, n + len(qp))
            torso_mask.extend([1.0 if is_torso else 0.0] * len(qp))
            n += len(qp)

        if "torso" in getattr(self, "part_cfg", {}):
            add_part("torso", list(self.part_qpos_idx["torso"]), list(self.part_qvel_idx["torso"]), True)
        for arm in self.arms:
            add_part(arm, list(self.arm_qpos_idx[arm]), list(self.arm_qvel_idx[arm]), False)

        # nullspace weights by (suffix-matched) joint name, default 1.0
        # (reference ik_utils.py get_nullspace_gains + default_gr1.json)
        weights = spec.get("nullspace_joint_weights", {})
        gains = []
        for dof in qvel_idx:
            jname = model.jnt_names[model.dof_jntid[dof]]
            w = weights.get(jname)
            if w is None:
                for k, v in weights.items():
                    if jname.endswith(k) or k.endswith(jname):
                        w = v
                        break
            gains.append(float(w) if w is not None else 1.0)

        cfg = wbik_mod.WBIKConfig(
            damping=float(spec.get("ik_pseudo_inverse_damping", 5e-2)),
            integration_dt=float(spec.get("ik_integration_dt", 0.1)),
            max_dq=float(spec.get("ik_max_dq", spec.get("max_dq", 4.0))),
            max_dq_torso=float(spec.get("ik_max_dq_torso", 0.2)),
            nullspace_gains=tuple(gains),
            torso_mask=tuple(torso_mask),
            input_type=spec.get("ik_input_type", "absolute"),
        )
        self._wbik = dict(
            cfg=cfg,
            qpos_idx=np.asarray(qpos_idx, dtype=int),
            qvel_idx=np.asarray(qvel_idx, dtype=int),
            slices=slices,
            q0=jnp.asarray(np.asarray(model.qpos0)[np.asarray(qpos_idx, dtype=int)]),
        )
        return self._wbik

    def _set_goals_wbik(self, kin, M, bias, qpos, qvel, ctrl_state: RobotCtrlState, action) -> RobotCtrlState:
        """WHOLE_BODY_IK policy-rate update: per-eef 6-dim targets -> one
        differential-IK solve over torso+arms -> JOINT_POSITION goals."""
        from robosuite_tpu.controllers.composite import wbik as wbik_mod
        from robosuite_tpu.physics import kinematics
        from robosuite_tpu.utils import transforms as T

        w = self._wbik_build()
        idx = self.action_split_indexes()

        tpos, tmat, spos, smat, Js = [], [], [], [], []
        for arm in self.arms:
            s, e = idx[arm]
            a = action[..., s:e]
            view = self.arm_view(kin, M, bias, qpos, qvel, arm)
            R_a = T.quat2mat(T.axisangle2quat(a[3:6]))
            if w["cfg"].input_type == "absolute":
                # targets expressed in the robot base frame
                # (default_gr1.json ik_input_ref_frame "base")
                p = view.origin_pos + view.origin_ori @ a[:3]
                R = view.origin_ori @ R_a
            else:  # delta about the current eef pose
                p = view.ref_pos + a[:3]
                R = R_a @ view.ref_ori_mat
            tpos.append(p)
            tmat.append(R)
            spos.append(view.ref_pos)
            smat.append(view.ref_ori_mat)
            jacp, jacr = kinematics.site_jacobian(self.model, kin, self.eef_site_id[arm])
            Js.append(jnp.concatenate([jacp[:, w["qvel_idx"]], jacr[:, w["qvel_idx"]]]))

        q = qpos[w["qpos_idx"]]
        q_des = wbik_mod.wbik_solve(
            w["cfg"], jnp.concatenate(Js), q, w["q0"],
            jnp.stack(spos), jnp.stack(smat), jnp.stack(tpos), jnp.stack(tmat),
        )

        new = dict(ctrl_state.arm)
        new_grip = dict(ctrl_state.gripper_action)
        for name, sl in w["slices"].items():
            prev = ctrl_state.arm[name]
            new[name] = jp_mod.JointPosState(goal_qpos=q_des[sl], kp=prev.kp, kd=prev.kd)
        for arm in self.arms:
            gs, ge = idx[f"{arm}_gripper"]
            if arm in self.rm.grippers and self.rm.grippers[arm].dof > 0:
                new_grip[arm] = self._gripper_goal(
                    arm, ctrl_state.gripper_action[arm], action[..., gs:ge], qpos.dtype
                )
        return RobotCtrlState(arm=new, gripper_action=new_grip)

    def _set_goals_custom(self, kin, M, bias, qpos, qvel, ctrl_state: RobotCtrlState, action) -> RobotCtrlState:
        """Third-party composite policy-rate update: the registered goal
        transform maps per-arm task targets to joint-position goals, tracked
        by the JOINT_POSITION part controllers (reference third-party
        controller integration, examples/third_party_controller/
        mink_controller.py + composite_controller.py:15-27)."""
        entry, cfg = self._custom_composite
        idx = self.action_split_indexes()
        targets = {arm: action[..., slice(*idx[arm])] for arm in self.arms}
        goals = entry.goal_fn(self, kin, qpos, qvel, targets, cfg)

        new = dict(ctrl_state.arm)
        new_grip = dict(ctrl_state.gripper_action)
        for name, q_des in goals.items():
            prev = ctrl_state.arm[name]
            new[name] = jp_mod.JointPosState(goal_qpos=q_des, kp=prev.kp, kd=prev.kd)
        for arm in self.arms:
            gs, ge = idx[f"{arm}_gripper"]
            if arm in self.rm.grippers and self.rm.grippers[arm].dof > 0:
                new_grip[arm] = self._gripper_goal(
                    arm, ctrl_state.gripper_action[arm], action[..., gs:ge], qpos.dtype
                )
        return RobotCtrlState(arm=new, gripper_action=new_grip)

    def set_goals(self, kin, M, bias, qpos, qvel, ctrl_state: RobotCtrlState, action) -> RobotCtrlState:
        """Policy-rate goal update (reference composite set_goal path)."""
        if self._custom_composite is not None:
            return self._set_goals_custom(kin, M, bias, qpos, qvel, ctrl_state, action)
        if self._wbik_spec is not None:
            return self._set_goals_wbik(kin, M, bias, qpos, qvel, ctrl_state, action)
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
                new_grip[arm] = self._gripper_goal(arm, ctrl_state.gripper_action[arm], grip_a, qpos.dtype)
            else:
                new_grip[arm] = ctrl_state.gripper_action[arm]
        return RobotCtrlState(arm=new_arm, gripper_action=new_grip)

    def _gripper_goal(self, arm, cur, grip_a, dtype):
        """Per-actuator gripper command in [-1, 1]. Binary grippers ramp
        (reference panda_gripper.py:42-55); dexterous hands map the dof-length
        action directly onto actuators (inspire_hands.py:22-28); dexterous
        *ramped* grippers ramp each actuator from its own action element
        (jaco_three_finger_gripper.py:82-108)."""
        grip = self.rm.grippers[arm]
        idx = grip.format_action_indices()
        if idx is not None:
            return jnp.clip(jnp.asarray(grip_a, dtype=dtype)[..., jnp.asarray(idx)], -1.0, 1.0)
        direction = jnp.asarray(grip.format_action_direction(), dtype=dtype)
        if cur.shape[0] != direction.shape[0]:
            cur = jnp.zeros_like(direction)
        if grip.ramp_elementwise:
            new = jnp.clip(cur + direction * grip.speed * jnp.sign(grip_a), -1.0, 1.0)
        else:
            new = jnp.clip(cur + direction * grip.speed * jnp.sign(grip_a[..., 0]), -1.0, 1.0)
        fixed = grip.format_action_fixed()
        if fixed is not None:
            fixed = np.asarray(fixed)
            mask = jnp.asarray(~np.isnan(fixed))
            new = jnp.where(mask, jnp.asarray(np.nan_to_num(fixed), dtype=dtype), new)
        return new

    def run_controllers(self, kin, M, bias, qpos, qvel, ctrl_state: RobotCtrlState, ctrl, substep=None):
        """Substep-rate torque computation; writes into the full (nu,) ctrl
        vector (reference fixed_base_robot.py:149-153).

        `substep`: index within the control period, consumed by goal-
        interpolating controllers (OSC with interpolation="linear")."""
        for arm in self.arms:
            view = self.arm_view(kin, M, bias, qpos, qvel, arm)
            cfg = self.arm_cfg[arm]
            mod = self._ctrl_mod(cfg)
            if mod is jv_mod:
                lo, hi = self.torque_limits[arm]
                tau, _ = mod.run(cfg, ctrl_state.arm[arm], view, jnp.asarray(lo), jnp.asarray(hi))
            elif mod is osc_mod:
                tau = mod.run(cfg, ctrl_state.arm[arm], view, substep=substep)
            else:
                tau = mod.run(cfg, ctrl_state.arm[arm], view)
            lo, hi = self.torque_limits[arm]
            tau = jnp.clip(tau, jnp.asarray(lo, dtype=tau.dtype), jnp.asarray(hi, dtype=tau.dtype))
            ctrl = ctrl.at[self.arm_actuator_ids[arm]].set(tau)
            gctrl = self.gripper_ctrl(arm, ctrl_state)
            if gctrl is not None:
                ctrl = ctrl.at[self.gripper_actuator_ids[arm]].set(gctrl)
        return ctrl

    def check_q_limits(self, qpos, tolerance=0.1):
        """True when any arm joint is within `tolerance` of its range
        (reference robots/robot.py:509-523)."""
        hits = []
        for arm in self.arms:
            qp_i = self.arm_qpos_idx[arm]
            jids = [int(self.model.dof_jntid[d]) for d in self.arm_qvel_idx[arm]]
            lo = np.asarray(self.model.jnt_range)[jids, 0]
            hi = np.asarray(self.model.jnt_range)[jids, 1]
            limited = (lo != hi)
            q = qpos[jnp.asarray(qp_i)]
            near = ((q <= jnp.asarray(lo) + tolerance) | (q >= jnp.asarray(hi) - tolerance))
            hits.append(jnp.any(near & jnp.asarray(limited)))
        return jnp.any(jnp.stack(hits)) if hits else jnp.asarray(False)

    def gripper_ctrl(self, arm, ctrl_state: RobotCtrlState):
        """Actuator-space gripper ctrl values for the current tick's gripper
        action state, or None when the arm has no actuated gripper. Constant
        across substeps — shared by run_controllers and the fused-substep
        path (envs/base.py), which hands it to the kernel as an input."""
        if arm not in self.rm.grippers or self.rm.grippers[arm].dof == 0:
            return None
        gcfg = self.grip_cfg[arm]
        aid = self.gripper_actuator_ids[arm]
        amin = jnp.asarray(np.asarray(self.model.actuator_ctrlrange)[aid, 0])
        amax = jnp.asarray(np.asarray(self.model.actuator_ctrlrange)[aid, 1])
        gst = grip_mod.set_goal(
            gcfg, grip_mod.GripState(goal_qvel=ctrl_state.gripper_action[arm]),
            ctrl_state.gripper_action[arm],
        )
        return grip_mod.run(gcfg, gst, amin, amax)


class MobileRobot(FixedBaseRobot):
    """Wheeled/legged robot runtime (reference robots/mobile_robot.py:13-464,
    wheeled_robot.py, legged_robot.py): adds torso / head / base parts on top
    of the arm+gripper stack.

    Action layout (verified against the live reference composite split,
    composite_controller.py:86-95): arms, torso, head, base, grippers
    [, base-mode flag when the composite is HYBRID_MOBILE_BASE
    (composite_controller.py:234-291)].
    """

    def __init__(self, model, robot_model, controller_config=None):
        super().__init__(model, robot_model, controller_config)
        rm = robot_model

        self.part_qpos_idx: Dict[str, Any] = {}
        self.part_qvel_idx: Dict[str, Any] = {}
        self.part_actuator_ids: Dict[str, Any] = {}
        part_joints = {
            "torso": rm.torso_joints,
            "head": rm.head_joints,
            "base": rm.base_joints,
            "legs": rm.legs_joints,
        }
        # actuator lookup by transmission joint id
        act_by_jnt = {int(j): i for i, j in enumerate(model.actuator_jntid)}
        for part, names in part_joints.items():
            jids = [model.jnt_name2id(n) for n in names]
            self.part_qpos_idx[part] = np.array([model.jnt_qposadr[j] for j in jids], dtype=int)
            self.part_qvel_idx[part] = np.array([model.jnt_dofadr[j] for j in jids], dtype=int)
            self.part_actuator_ids[part] = np.array(
                [act_by_jnt[j] for j in jids if j in act_by_jnt], dtype=int
            )

        self.base_center_site = model.site_name2id(rm.base.center_site)

        kp = getattr(rm, "part_controller_kp", {})
        # part entries from the resolved composite JSON (robot-default
        # config files, controllers/config/robots/) override the built-in
        # gains — the reference's per-part config path
        # (mobile_robot.py _load_torso/head/leg_controller)
        bp = (self._composite_json or {}).get("body_parts", {})
        self.part_cfg = {}
        # torso/head/legs default to JOINT_POSITION kp=1000 (basic.json)
        for part in ("torso", "head", "legs"):
            if len(self.part_qpos_idx[part]):
                entry = bp.get(part) if isinstance(bp.get(part), dict) else {}
                # legs default to DELTA input (the reference JOINT_POSITION
                # default; legged_robot.py leg stack) so a zero action HOLDS
                # the standing posture; torso/head keep the absolute-goal
                # convention the shipped configs specify explicitly
                default_it = "delta" if part == "legs" else "absolute"
                self.part_cfg[part] = jp_mod.JointPosConfig(
                    dim=len(self.part_qpos_idx[part]),
                    kp=float(entry.get("kp", kp.get(part, 1000.0))),
                    input_type=entry.get("input_type", default_it),
                    output_max=float(entry.get("output_max", 0.5)),
                    output_min=float(entry.get("output_min", -0.5)),
                )
        if len(self.part_qpos_idx["base"]):
            self.part_cfg["base"] = mb_mod.MobileBaseJointVelConfig(dim=len(self.part_qpos_idx["base"]))

        # HYBRID_MOBILE_BASE appends a trailing base-mode action dim; the
        # composite type comes from the resolved controller config when one
        # was given, else the robot model's default
        ctype = self._composite_type or getattr(rm, "composite_type", "BASIC")
        self.hybrid = ctype == "HYBRID_MOBILE_BASE"

    # -- views ------------------------------------------------------------------
    def _part_view(self, kin, M, bias, qpos, qvel, part: str):
        qp_i = self.part_qpos_idx[part]
        qv_i = self.part_qvel_idx[part]
        z3 = jnp.zeros(3)
        e3 = jnp.eye(3)
        return ArmView(
            joint_pos=qpos[qp_i], joint_vel=qvel[qv_i],
            ref_pos=z3, ref_ori_mat=e3, ref_pos_vel=z3, ref_ori_vel=z3,
            J_pos=jnp.zeros((3, len(qv_i))), J_ori=jnp.zeros((3, len(qv_i))),
            mass_matrix=M[jnp.ix_(qv_i, qv_i)], torque_compensation=bias[qv_i],
            initial_joint=jnp.zeros(len(qp_i)), origin_pos=z3, origin_ori=e3,
            origin_pos_vel=z3, origin_ori_vel=z3,
        )

    def _base_yaw(self, kin):
        R = kin.site_xmat[self.base_center_site]
        return jnp.arctan2(R[1, 0], R[0, 0])

    # -- action layout ------------------------------------------------------------
    @property
    def action_dim(self) -> int:
        d = super().action_dim
        if self._wbik_spec is not None:
            # WBIK actuates torso/head/base parts through the IK solve —
            # only eef targets + grippers appear in the action vector
            return d
        for part in ("torso", "head", "base", "legs"):
            if part in self.part_cfg:
                d += self.part_cfg[part].control_dim
        if self.hybrid:
            d += 1
        return d

    def action_split_indexes(self):
        if self._wbik_spec is not None:
            return super().action_split_indexes()
        out = {}
        i = 0
        for arm in self.arms:
            cd = self.arm_cfg[arm].control_dim
            out[arm] = (i, i + cd)
            i += cd
        for part in ("torso", "head", "base", "legs"):
            if part in self.part_cfg:
                cd = self.part_cfg[part].control_dim
                out[part] = (i, i + cd)
                i += cd
        for arm in self.arms:
            gd = self.rm.grippers[arm].dof if arm in self.rm.grippers else 0
            out[f"{arm}_gripper"] = (i, i + gd)
            i += gd
        if self.hybrid:
            out["base_mode"] = (i, i + 1)
        return out

    # -- two-clock control ---------------------------------------------------------
    def init_ctrl_state(self, kin, M, bias, qpos, qvel) -> RobotCtrlState:
        st = super().init_ctrl_state(kin, M, bias, qpos, qvel)
        parts = dict(st.arm)
        for part in ("torso", "head", "legs"):
            if part in self.part_cfg:
                view = self._part_view(kin, M, bias, qpos, qvel, part)
                parts[part] = jp_mod.init_state(self.part_cfg[part], view)
        if "base" in self.part_cfg:
            parts["base"] = mb_mod.init_state(self.part_cfg["base"], self._base_yaw(kin))
        return RobotCtrlState(arm=parts, gripper_action=st.gripper_action)

    def set_goals(self, kin, M, bias, qpos, qvel, ctrl_state: RobotCtrlState, action) -> RobotCtrlState:
        if self._custom_composite is not None:
            return self._set_goals_custom(kin, M, bias, qpos, qvel, ctrl_state, action)
        if self._wbik_spec is not None:
            return self._set_goals_wbik(kin, M, bias, qpos, qvel, ctrl_state, action)
        idx = self.action_split_indexes()
        new = dict(ctrl_state.arm)
        new_grip = dict(ctrl_state.gripper_action)
        mode = action[..., -1] if self.hybrid else None
        for arm in self.arms:
            s, e = idx[arm]
            view = self.arm_view(kin, M, bias, qpos, qvel, arm)
            cfg = self.arm_cfg[arm]
            mod = self._ctrl_mod(cfg)
            if mod is osc_mod and self.hybrid:
                # base moving (mode > 0) -> track w.r.t. the desired previous
                # goal; else w.r.t. the achieved pose (composite_controller.py:255-266)
                new[arm] = osc_mod.set_goal(cfg, ctrl_state.arm[arm], view, action[..., s:e], wrt_origin=mode > 0)
            elif mod is jt_mod:
                lo, hi = self.torque_limits[arm]
                new[arm] = mod.set_goal(cfg, ctrl_state.arm[arm], action[..., s:e], jnp.asarray(lo), jnp.asarray(hi))
            else:
                new[arm] = mod.set_goal(cfg, ctrl_state.arm[arm], view, action[..., s:e])
            gs, ge = idx[f"{arm}_gripper"]
            grip_a = action[..., gs:ge]
            if arm in self.rm.grippers and self.rm.grippers[arm].dof > 0:
                new_grip[arm] = self._gripper_goal(arm, ctrl_state.gripper_action[arm], grip_a, qpos.dtype)
        for part in ("torso", "head", "legs"):
            if part in self.part_cfg:
                s, e = idx[part]
                view = self._part_view(kin, M, bias, qpos, qvel, part)
                new[part] = jp_mod.set_goal(self.part_cfg[part], ctrl_state.arm[part], view, action[..., s:e])
        if "base" in self.part_cfg:
            s, e = idx["base"]
            new["base"] = mb_mod.set_goal(
                self.part_cfg["base"], ctrl_state.arm["base"], action[..., s:e], self._base_yaw(kin)
            )
        return RobotCtrlState(arm=new, gripper_action=new_grip)

    def run_controllers(self, kin, M, bias, qpos, qvel, ctrl_state: RobotCtrlState, ctrl, substep=None):
        ctrl = super().run_controllers(kin, M, bias, qpos, qvel, ctrl_state, ctrl, substep=substep)
        rng = np.asarray(self.model.actuator_ctrlrange)
        for part in ("torso", "head", "legs"):
            if part in self.part_cfg:
                view = self._part_view(kin, M, bias, qpos, qvel, part)
                tau = jp_mod.run(self.part_cfg[part], ctrl_state.arm[part], view)
                aid = self.part_actuator_ids[part]
                tau = jnp.clip(tau, jnp.asarray(rng[aid, 0], dtype=tau.dtype), jnp.asarray(rng[aid, 1], dtype=tau.dtype))
                ctrl = ctrl.at[aid].set(tau)
        if "base" in self.part_cfg:
            aid = self.part_actuator_ids["base"]
            v = mb_mod.run(
                self.part_cfg["base"], ctrl_state.arm["base"],
                jnp.asarray(rng[aid, 0]), jnp.asarray(rng[aid, 1]),
            )
            ctrl = ctrl.at[aid].set(v)
        return ctrl


class LeggedRobot(MobileRobot):
    """Legged robot runtime (reference robots/legged_robot.py:17-253):
    MobileRobot plus leg-specific control composition.

    Specializations mirroring the reference:
      * legs run a dedicated JOINT_POSITION stack with immediate goal
        application (legged_robot.py:46-60 forces ramp_ratio=1.0 — no goal
        interpolation) and gains from the robot's composite config
        (body_parts["legs"], task-3 config files);
      * leg init posture comes from the leg-base model's init_qpos at reset
        (legged_robot.py:120-135; applied in envs/base._initial_qpos);
      * is_legs_actuated / num_leg_joints gate the leg stack
        (legged_robot.py:248-253) — GR1FixedLowerBody has leg joints frozen
        out of the model, so the stack degrades to MobileRobot behavior.

    Deliberate deviation: delta leg commands anchor to the STANDING POSTURE
    (base.init_qpos), not the current joints. The reference re-anchors the
    goal at the current position every policy step (joint_pos.py:224-226),
    so a zero command lets gravity ratchet the stance down tick by tick —
    the robot slowly collapses. Anchoring at the posture makes zero-action
    standing a fixed point while deltas still command relative motion;
    configure the legs part with input_type "absolute" to get raw
    joint-position goals instead.
    """

    def __init__(self, model, robot_model, controller_config=None):
        super().__init__(model, robot_model, controller_config)
        import dataclasses as _dc

        self._legs_anchor = None
        self._legs_delta_arrays = None
        cfg = self.part_cfg.get("legs")
        liq = self.legs_init_qpos
        # leg bases that declare raw servo gains (Spot's <position kp kv>
        # actuator class) drive the legs with that servo instead of the
        # inertia-shaped PD — the stiffness the model stands with
        servo = getattr(self.rm.base, "leg_servo", None)
        if cfg is not None and servo is not None:
            cfg = _dc.replace(cfg, raw_pd=True, kp=float(servo[0]), kd=float(servo[1]))
            self.part_cfg["legs"] = cfg
        if cfg is not None and cfg.input_type == "delta" and liq is not None:
            self._legs_anchor = jnp.asarray(liq)
            from robosuite_tpu.controllers.base import nums2array

            self._legs_delta_arrays = (
                jnp.asarray(nums2array(cfg.input_min, cfg.dim)),
                jnp.asarray(nums2array(cfg.input_max, cfg.dim)),
                jnp.asarray(nums2array(cfg.output_min, cfg.dim)),
                jnp.asarray(nums2array(cfg.output_max, cfg.dim)),
            )
            # the part controller sees posture-anchored absolute goals
            self.part_cfg["legs"] = _dc.replace(cfg, input_type="absolute")

    def set_goals(self, kin, M, bias, qpos, qvel, ctrl_state: RobotCtrlState, action) -> RobotCtrlState:
        # under WBIK / custom composites the action carries eef targets only
        # (no legs slice) — the parts stack holds the legs internally
        idx = self.action_split_indexes()
        if self._legs_anchor is not None and "legs" in idx:
            from robosuite_tpu.controllers import control_utils as C

            s, e = idx["legs"]
            imin, imax, omin, omax = self._legs_delta_arrays
            scaled = C.scale_action(action[..., s:e], imin, imax, omin, omax)
            action = action.at[..., s:e].set(self._legs_anchor + scaled)
        return super().set_goals(kin, M, bias, qpos, qvel, ctrl_state, action)

    @property
    def is_legs_actuated(self) -> bool:
        return len(self.part_actuator_ids["legs"]) > 0

    @property
    def num_leg_joints(self) -> int:
        return len(self.part_qpos_idx["legs"])

    @property
    def legs_init_qpos(self):
        """The standing posture for the leg joints: the leg base's
        init_qpos (Spot), else the reset posture of robot-card legs (GR1),
        else None (floating/de-legged variants)."""
        base = self.rm.base
        if base is not None and getattr(base, "leg_joints", None):
            liq = np.asarray(base.init_qpos, dtype=np.float32)
            if len(liq):
                return liq[: self.num_leg_joints]
        if self.num_leg_joints:
            iq = np.asarray(self.rm.init_qpos, dtype=np.float32)
            pos = {int(a): i for i, a in enumerate(self.init_qpos_idx)}
            q0 = np.asarray(self.model.qpos0)
            vals = [
                iq[pos[int(a)]]
                if len(iq) == len(self.init_qpos_idx) and int(a) in pos
                else float(q0[int(a)])
                for a in self.part_qpos_idx["legs"]
            ]
            return np.asarray(vals, dtype=np.float32)
        return None
