"""Robot models: spec factories + metadata for the built-in manipulators.

Re-derivation of the reference robot model layer
(models/robots/robot_model.py, manipulators/*.py). Each robot is a thin
class over its committed model card plus the reference's published metadata
(init_qpos, default gripper/base, placement offsets).

Registration mirrors reference @register_robot (robot_model.py:12-54) /
register_robot_class (robots/__init__.py:44-51).
"""

from __future__ import annotations

import copy
from typing import Dict, List, Optional

import numpy as np

from robosuite_tpu.models import spec as S
from robosuite_tpu.models.cards import load_card, spec_from_card

REGISTERED_ROBOTS: Dict[str, type] = {}


def register_robot(cls):
    REGISTERED_ROBOTS[cls.__name__] = cls
    return cls


def create_robot(name: str, **kwargs):
    assert name in REGISTERED_ROBOTS, f"unknown robot {name}; known: {sorted(REGISTERED_ROBOTS)}"
    return REGISTERED_ROBOTS[name](**kwargs)


class ManipulatorModel:
    """A manipulator spec factory (reference manipulator_model.py:1-376).

    Composes card subtree + base (mount) + grippers with the reference's
    prefixing scheme: robot{idn}_ / gripper{idn}_{arm}_ / fixed_mount{idn}_.
    """

    card_name: str = None
    arms: List[str] = ["right"]

    def __init__(self, idn=0):
        self.idn = idn
        self.card = load_card(self.card_name)
        self.grippers: Dict[str, "object"] = {}
        self.base = None
        self._base_xpos = np.zeros(3)
        self._root: Optional[S.BodySpec] = None
        self._actuators: List[S.ActuatorSpec] = []
        self._build()

    # -- metadata (overridden per robot) -------------------------------------
    @property
    def naming_prefix(self):
        return f"robot{self.idn}_"

    @property
    def default_base(self):
        return "RethinkMount"

    @property
    def default_gripper(self) -> Dict[str, str]:
        raise NotImplementedError

    @property
    def init_qpos(self) -> np.ndarray:
        raise NotImplementedError

    @property
    def base_xpos_offset(self) -> dict:
        return {
            "bins": (-0.5, -0.1, 0),
            "empty": (-0.6, 0, 0),
            "table": lambda table_length: (-0.16 - table_length / 2, 0, 0),
        }

    @property
    def top_offset(self):
        return np.array((0, 0, 1.0))

    @property
    def horizontal_radius(self):
        return 0.5

    @property
    def arm_type(self):
        return "single"

    @property
    def _eef_name(self) -> Dict[str, str]:
        """unprefixed eef body per arm (reference manipulator_model.py:176)."""
        return {"right": "right_hand"} if self.arm_type == "single" else {"right": "right_hand", "left": "left_hand"}

    @property
    def eef_name(self) -> Dict[str, str]:
        return {arm: self.naming_prefix + n for arm, n in self._eef_name.items()}

    @property
    def root_body(self) -> str:
        return self.naming_prefix + "base"

    @property
    def base_offset(self):
        return np.zeros(3)

    @property
    def bottom_offset(self):
        if self.base is not None:
            return (self.base.bottom_offset - self.base.top_offset) + self.base_offset
        return self.base_offset

    # -- construction ---------------------------------------------------------
    def _build(self):
        ms = spec_from_card(self.card_name)
        assert len(ms.worldbody.children) == 1, "robot card must have one root body"
        self._root = ms.worldbody.children[0]
        # reference robot_model.py:74-79: default joint attribs where the
        # model card leaves them unset (0.0)
        i = 0
        for b in self._root.walk():
            for j in b.joints:
                if j.frictionloss == 0.0:
                    j.frictionloss = 0.1
                if j.damping == 0.0:
                    j.damping = 0.1
                if j.armature == 0.0:
                    j.armature = 5.0 / (i + 1)
                i += 1
        self._root.apply_prefix(self.naming_prefix)
        self._actuators = [
            S.ActuatorSpec(
                name=self.naming_prefix + a.name, joint=self.naming_prefix + a.joint, kind=a.kind,
                gear=a.gear, ctrlrange=a.ctrlrange, forcerange=a.forcerange, kp=a.kp, kv=a.kv,
            )
            for a in ms.actuators
        ]

    def add_base(self, base):
        """Mount under the robot root (reference robot_model.py:130-170)."""
        assert self.base is None, "base already added"
        sub = base.root_subtree()
        # reference robot_model.py:159-162: the mount root's pos is OVERWRITTEN
        sub.pos = self.base_offset - base.top_offset
        self._root.children.append(sub)
        self._actuators.extend(base.actuators())
        self.base = base

    def add_gripper(self, gripper, arm: str):
        eef_body = self._root.find_body(self.eef_name[arm])
        assert eef_body is not None, f"eef body {self.eef_name[arm]} not found"
        sub = gripper.root_subtree()
        eef_body.children.append(sub)
        self._actuators.extend(gripper.actuators())
        if not hasattr(self, "_equalities"):
            self._equalities = []
        self._equalities.extend(gripper.equalities())
        self.grippers[arm] = gripper

    def set_base_xpos(self, xpos):
        """reference robot_model.py:89-99."""
        self._root.pos = np.asarray(xpos) - self.bottom_offset

    def set_base_ori(self, rot_euler):
        from robosuite_tpu.models.spec import _quat

        import math

        # reference robot_model.py:101-107: euler xyz -> quat
        ax, ay, az = rot_euler

        def q_axis(angle, axis):
            h = angle / 2.0
            v = [0.0, 0.0, 0.0]
            v[axis] = math.sin(h)
            return np.array([math.cos(h), *v])

        def qmul(a, b):
            w0, x0, y0, z0 = a
            w1, x1, y1, z1 = b
            return np.array(
                [
                    w0 * w1 - x0 * x1 - y0 * y1 - z0 * z1,
                    w0 * x1 + x0 * w1 + y0 * z1 - z0 * y1,
                    w0 * y1 - x0 * z1 + y0 * w1 + z0 * x1,
                    w0 * z1 + x0 * y1 - y0 * x1 + z0 * w1,
                ]
            )

        self._root.quat = qmul(qmul(q_axis(az, 2), q_axis(ay, 1)), q_axis(ax, 0))

    # -- exports --------------------------------------------------------------
    def root_subtree(self) -> S.BodySpec:
        return self._root

    def actuators(self) -> List[S.ActuatorSpec]:
        return list(self._actuators)

    def equalities(self) -> List[S.EqualitySpec]:
        return list(getattr(self, "_equalities", []))

    @property
    def arm_joint_names(self) -> Dict[str, List[str]]:
        """Prefixed arm joint names per arm, card order."""
        all_joints = []

        def walk(bd):
            for j in bd.get("joints", []):
                all_joints.append(j["name"])
            for c in bd.get("children", []):
                walk(c)

        for bd in self.card["bodies"]:
            walk(bd)
        if self.arm_type == "single":
            return {"right": [self.naming_prefix + j for j in all_joints]}
        # bimanual: reference splits by name convention (right_/left_)
        return {
            "right": [self.naming_prefix + j for j in all_joints if "right" in j],
            "left": [self.naming_prefix + j for j in all_joints if "left" in j],
        }

    @property
    def arm_actuator_names(self) -> Dict[str, List[str]]:
        arm_jnts = self.arm_joint_names
        out = {}
        for arm, jnames in arm_jnts.items():
            out[arm] = [a.name for a in self._actuators if a.joint in jnames]
        return out

    def center_site_name(self, arm: str) -> str:
        """The base-frame reference site for part controllers
        (reference osc.py:457 f"{prefix}{part}_center")."""
        return f"{self.naming_prefix}{arm}_center"


@register_robot
class Panda(ManipulatorModel):
    """reference models/robots/manipulators/panda_robot.py:7-57 (+ joint
    damping override (0.1 x4, 0.01 x3) applied in the card by robot.py)."""

    card_name = "panda"
    arms = ["right"]

    def _build(self):
        super()._build()
        # reference panda_robot.py:21: set_joint_attribute damping
        damping = [0.1, 0.1, 0.1, 0.1, 0.1, 0.01, 0.01]
        i = 0
        for b in self._root.walk():
            for j in b.joints:
                if i < 7:
                    j.damping = damping[i]
                    i += 1

    @property
    def default_gripper(self):
        return {"right": "PandaGripper"}

    @property
    def init_qpos(self):
        return np.array([0, np.pi / 16.0, 0.00, -np.pi / 2.0 - np.pi / 3.0, 0.00, np.pi - 0.2, np.pi / 4])


@register_robot
class Sawyer(ManipulatorModel):
    """reference sawyer_robot.py."""

    card_name = "sawyer"

    @property
    def default_gripper(self):
        return {"right": "RethinkGripper"}

    @property
    def init_qpos(self):
        return np.array([0, -1.18, 0.00, 2.18, 0.00, 0.57, -1.57])


@register_robot
class UR5e(ManipulatorModel):
    """reference ur5e_robot.py."""

    card_name = "ur5e"

    @property
    def default_gripper(self):
        return {"right": "Robotiq85Gripper"}

    @property
    def init_qpos(self):
        return np.array([-0.470, -1.735, 2.480, -2.275, -1.590, -1.991])


@register_robot
class IIWA(ManipulatorModel):
    """reference iiwa_robot.py."""

    card_name = "iiwa"

    @property
    def default_gripper(self):
        return {"right": "Robotiq140Gripper"}

    @property
    def init_qpos(self):
        return np.array([0.000, 0.650, 0.000, -1.890, 0.000, 0.600, 0.000])


@register_robot
class Jaco(ManipulatorModel):
    """reference jaco_robot.py."""

    card_name = "jaco"

    @property
    def default_gripper(self):
        return {"right": "JacoThreeFingerGripper"}

    @property
    def init_qpos(self):
        return np.array([3.192, 3.680, -0.000, 1.170, 0.050, 3.760, 3.142])


@register_robot
class Kinova3(ManipulatorModel):
    """reference kinova3_robot.py."""

    card_name = "kinova3"

    @property
    def default_gripper(self):
        return {"right": "Robotiq85Gripper"}

    @property
    def init_qpos(self):
        return np.array([0.000, 0.650, 0.000, 1.890, 0.000, 0.600, -np.pi / 2])


@register_robot
class Baxter(ManipulatorModel):
    """reference baxter_robot.py (bimanual)."""

    card_name = "baxter"
    arms = ["right", "left"]

    @property
    def default_base(self):
        return "RethinkMinimalMount"

    @property
    def default_gripper(self):
        return {"right": "RethinkGripper", "left": "RethinkGripper"}

    @property
    def init_qpos(self):
        return np.array(
            [0.403, -0.636, 0.114, 1.432, 0.735, 1.205, -0.269, -0.403, -0.636, -0.114, 1.432, -0.735, 1.205, 0.269]
        )

    @property
    def base_xpos_offset(self):
        return {
            "bins": (-0.5, -0.1, 0),
            "empty": (-0.29, 0, 0),
            "table": lambda table_length: (-0.26 - table_length / 2, 0, 0),
        }

    @property
    def arm_type(self):
        return "bimanual"


@register_robot
class XArm7(ManipulatorModel):
    """reference xarm7_robot.py."""

    card_name = "xarm7"

    @property
    def default_gripper(self):
        return {"right": "XArm7Gripper"}

    @property
    def init_qpos(self):
        return np.array([0.0, 0.0, 0.0, 0.39 * np.pi, 0.0, 0.39 * np.pi, 0.0])
