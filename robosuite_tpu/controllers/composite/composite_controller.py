"""Composite controller: the explicit action-splitting layer.

Re-derivation of reference controllers/composite/composite_controller.py
(BASIC, :30-231): a composite controller owns the per-part controllers of
one robot and splits the flat action vector into per-part slices
(setup_action_split_idx :86-95), fanning out set_goal at policy rate and
run_controller at substep rate.

In the TPU stack the runtime robot layer (robosuite_tpu.robots.FixedBaseRobot)
embodies this flow; this module provides the explicit spec object users can
inspect/construct — the analog of REGISTERED_COMPOSITE_CONTROLLERS_DICT —
plus the action-split bookkeeping as data.

WHOLE_BODY_IK (reference :514-589) is the true joint solve over
torso+arms: robosuite_tpu.controllers.composite.wbik implements the damped
least-squares differential IK with nullspace posture weights; the runtime
robot layer dispatches to it when controller_config["type"] ==
"WHOLE_BODY_IK" (robots/robot.py _set_goals_wbik). The per-arm IK_POSE
reduction remains available for fixed-base arms via make_composite.

HYBRID_MOBILE_BASE (reference :234-291) appends a trailing base-mode switch
dim to the action vector; at runtime (robosuite_tpu.robots.MobileRobot) the
flag toggles the arm OSC goal frame between achieved (base parked) and
desired/origin-referenced (base moving), matching reference :255-266.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Tuple

from robosuite_tpu.controllers.factory import arm_controller_config

REGISTERED_COMPOSITE_CONTROLLERS = ("BASIC", "HYBRID_MOBILE_BASE", "WHOLE_BODY_IK")

# -- third-party composite controllers --------------------------------------
# The reference exposes @register_composite_controller so external packages
# can plug a custom whole-body controller (composite_controller.py:15-27;
# examples/third_party_controller/mink_controller.py registers
# WHOLE_BODY_MINK_IK). The TPU analog: a registered GOAL TRANSFORM — a pure
# jittable function run at policy rate that maps per-arm task-space targets
# to joint-position goals; the runtime part controllers then track them at
# substep rate (exactly how the built-in WHOLE_BODY_IK integrates,
# robots/robot.py _set_goals_wbik).


@dataclasses.dataclass(frozen=True)
class ThirdPartyComposite:
    """A registered third-party composite controller.

    goal_fn(robot, kin, qpos, qvel, targets, cfg) -> {part_name: goal_qpos}
      robot:   the runtime robot (arm_qpos_idx / arm_view / eef_site_id ...)
      kin:     KinData at the policy tick
      targets: {arm: (arm_action_dim,) action slice}
      cfg:     the user's composite_controller_specific_configs dict
    Returned joint-position goals are tracked by per-arm JOINT_POSITION
    part controllers (kp from the part config)."""

    name: str
    goal_fn: Callable
    arm_action_dim: int = 6


THIRD_PARTY_COMPOSITE_CONTROLLERS: Dict[str, ThirdPartyComposite] = {}


def register_composite_controller(name: str, arm_action_dim: int = 6):
    """Decorator registering a third-party composite goal transform under
    `name` (usable as controller_configs={"type": name, ...}). Reference
    analog: @register_composite_controller, composite_controller.py:15-27."""

    def deco(fn):
        THIRD_PARTY_COMPOSITE_CONTROLLERS[name] = ThirdPartyComposite(
            name=name, goal_fn=fn, arm_action_dim=arm_action_dim
        )
        return fn

    return deco


@dataclasses.dataclass(frozen=True)
class CompositeControllerSpec:
    """Static description of a robot's composite controller."""

    type: str                          # BASIC | HYBRID_MOBILE_BASE | WHOLE_BODY_IK
    arm_configs: Dict[str, object]     # arm name -> part-controller config
    gripper_dims: Dict[str, int]       # arm name -> gripper dof
    part_dims: Dict[str, int] = dataclasses.field(default_factory=dict)
    # non-arm part name (torso/head/base/legs) -> control dim, in the
    # reference's composite ordering (mobile_robot.py:42-187)

    @property
    def action_split(self) -> List[Tuple[str, str, int]]:
        """[(part_name, kind, width)] in action-vector order
        (reference composite_controller.py:86-95): arms, mobile parts,
        grippers [, trailing base_mode for HYBRID_MOBILE_BASE :234-246]."""
        out = []
        for arm, cfg in self.arm_configs.items():
            out.append((arm, "arm", cfg.control_dim))
        for part in ("torso", "head", "base", "legs"):
            if self.part_dims.get(part, 0) > 0:
                out.append((part, "mobile", self.part_dims[part]))
        for arm in self.arm_configs:
            if self.gripper_dims.get(arm, 0) > 0:
                out.append((f"{arm}_gripper", "gripper", self.gripper_dims[arm]))
        if self.type == "HYBRID_MOBILE_BASE":
            out.append(("base_mode", "mode", 1))
        return out

    @property
    def action_dim(self) -> int:
        return sum(w for _, _, w in self.action_split)


def make_composite(ctype: str = "BASIC", arms=("right",), gripper_dims=None,
                   arm_type="OSC_POSE", part_dims=None, **overrides):
    """Build a CompositeControllerSpec (the composite_controller_factory
    analog, reference composite_controller_factory.py:73-140).
    WHOLE_BODY_IK resolves to per-arm IK_POSE; HYBRID_MOBILE_BASE keeps the
    arm type and adds the trailing base-mode dim."""
    assert ctype in REGISTERED_COMPOSITE_CONTROLLERS, ctype
    part_type = "IK_POSE" if ctype == "WHOLE_BODY_IK" else arm_type
    arm_configs = {arm: arm_controller_config(part_type, **overrides) for arm in arms}
    gd = gripper_dims or {arm: 1 for arm in arms}
    return CompositeControllerSpec(
        type=ctype, arm_configs=arm_configs, gripper_dims=gd,
        part_dims=dict(part_dims or {}),
    )
