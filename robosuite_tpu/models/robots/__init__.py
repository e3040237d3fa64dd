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

    # "fixed" -> FixedBaseRobot, "wheeled"/"legged" -> MobileRobot runtime
    # (reference robots/__init__.py:15-34 ROBOT_CLASS_MAPPING)
    robot_kind = "fixed"

    @property
    def card_joint_names(self) -> List[str]:
        """ALL prefixed robot-card joints in card order — the reference's
        _ref_joint_indexes (robot.py:302-332): torso + head + arms for
        mobile manipulators, just the arms for fixed-base ones. init_qpos
        covers exactly these joints."""
        out = []
        removed = getattr(self, "_removed_joints", ())

        def walk(bd):
            for j in bd.get("joints", []):
                if j.get("type") != "free" and j["name"] not in removed:
                    out.append(j["name"])
            for c in bd.get("children", []):
                walk(c)

        for bd in self.card["bodies"]:
            walk(bd)
        return [self.naming_prefix + j for j in out]

    @property
    def base_joints(self) -> List[str]:
        """Planar base joints (from the mobile base card)."""
        return self.base.base_joints if self.base is not None else []

    @property
    def torso_joints(self) -> List[str]:
        card_torso = [j for j in self.card_joint_names if "torso" in j]
        base_torso = self.base.torso_joints if self.base is not None else []
        return card_torso + base_torso

    @property
    def head_joints(self) -> List[str]:
        return [j for j in self.card_joint_names if "head" in j]

    @property
    def legs_joints(self) -> List[str]:
        """Actuated leg joints: robot card legs + legged-base legs (reference
        manipulator_model.py:97-105 'leg' classification + legged base)."""
        card_legs = [j for j in self.card_joint_names if "leg" in j]
        base_legs = self.base.leg_joints if self.base is not None else []
        return card_legs + base_legs

    @property
    def init_torso_qpos(self):
        return None

    # -- spec surgery (reference legged_manipulator_model.py:22-63) -----------
    def _remove_joint_actuation(self, part_name: str):
        """Remove joints whose name contains `part_name` (and their
        actuators); the links become rigid decorations."""
        removed = set()
        for b in self._root.walk():
            keep = []
            for j in b.joints:
                if part_name in j.name:
                    removed.add(j.name)
                else:
                    keep.append(j)
            b.joints = keep
        self._actuators = [
            a for a in self._actuators if part_name not in a.name and a.joint not in removed
        ]
        if not hasattr(self, "_removed_joints"):
            self._removed_joints = set()
        pre = self.naming_prefix
        self._removed_joints |= {n[len(pre):] if n.startswith(pre) else n for n in removed}

    def _remove_free_joint(self):
        for b in self._root.walk():
            b.joints = [j for j in b.joints if j.type != "free"]

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
        """Dispatch on base type (reference robot_model.py:130-143)."""
        assert self.base is None, "base already added"
        if base.mount:
            self.add_mount(base)
        else:
            self.add_mobile_base(base)

    def add_mount(self, base):
        """Mount under the robot root (reference robot_model.py:145-170)."""
        sub = base.root_subtree()
        # reference robot_model.py:159-162: the mount root's pos is OVERWRITTEN
        sub.pos = self.base_offset - base.top_offset
        self._root.children.append(sub)
        self._actuators.extend(base.actuators())
        self.base = base

    def add_mobile_base(self, base):
        """Mobile/legged base: the robot rides ON the base (reference
        robot_model.py:171-237 add_mobile_base / add_leg_base): the robot
        root keeps its name, the base subtree is appended under it, and the
        robot's original content moves into a 'manipulator_mount' body
        attached to the base's '<prefix>support' body."""
        from robosuite_tpu.models import spec as S

        sub = base.root_subtree()
        sub.pos = self.base_offset - base.top_offset

        root = self._root
        mount = S.BodySpec(self.naming_prefix + "manipulator_mount")
        mount.joints = [j for j in root.joints if j.type != "free"]
        mount.geoms, mount.sites, mount.cameras, mount.children = (
            root.geoms, root.sites, root.cameras, root.children,
        )
        mount.inertial = None  # base carries its own inertial (robot_model.py:212-216)
        root.joints, root.geoms, root.sites, root.cameras, root.children = [], [], [], [], []
        root.children.append(sub)

        support = sub.find_body(base.naming_prefix + "support")
        assert support is not None, f"{base.naming_prefix}support body not in base card"
        support.children.append(mount)

        self._actuators.extend(base.actuators())
        self.base = base

    # custom gripper mounting pose overrides (reference robot.py:198-212:
    # replaces the gripper root body's pos/quat; quat is wxyz)
    @property
    def gripper_mount_pos_offset(self) -> Dict[str, Any]:
        return {}

    @property
    def gripper_mount_quat_offset(self) -> Dict[str, Any]:
        return {}

    def add_gripper(self, gripper, arm: str):
        eef_body = self._root.find_body(self.eef_name[arm])
        assert eef_body is not None, f"eef body {self.eef_name[arm]} not found"
        sub = gripper.root_subtree()
        pos_off = self.gripper_mount_pos_offset.get(arm)
        quat_off = self.gripper_mount_quat_offset.get(arm)
        if pos_off is not None:
            sub.pos = np.asarray(pos_off, dtype=float)
        if quat_off is not None:
            sub.quat = np.asarray(quat_off, dtype=float)
        eef_body.children.append(sub)
        self._actuators.extend(gripper.actuators())
        if not hasattr(self, "_equalities"):
            self._equalities = []
        self._equalities.extend(gripper.equalities())
        if not hasattr(self, "_tendons"):
            self._tendons = []
        self._tendons.extend(gripper.tendons())
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

    def tendons(self) -> List[S.TendonSpec]:
        return list(getattr(self, "_tendons", []))

    @property
    def arm_joint_names(self) -> Dict[str, List[str]]:
        """Prefixed arm joint names per arm, card order.

        Mirrors the reference: joints classified torso/mobile/head/leg by
        substring (manipulator_model.py:97-114 update_joints), the remainder
        are arm joints; bimanual robots split that flat list in half, right
        first (fixed_base_robot.py:91-93, robot.py:1051-1057)."""
        all_joints = []

        def walk(bd):
            for j in bd.get("joints", []):
                if j.get("type") != "free":
                    all_joints.append(j["name"])
            for c in bd.get("children", []):
                walk(c)

        for bd in self.card["bodies"]:
            walk(bd)
        arms_flat = [
            j for j in all_joints
            if not any(tag in j for tag in ("torso", "mobile", "head", "leg"))
        ]
        if self.arm_type == "single":
            return {"right": [self.naming_prefix + j for j in arms_flat]}
        half = len(arms_flat) // 2
        return {
            "right": [self.naming_prefix + j for j in arms_flat[:half]],
            "left": [self.naming_prefix + j for j in arms_flat[half:]],
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


@register_robot
class PandaDexRH(Panda):
    """reference compositional.py:79-90: Panda with an Inspire dexterous
    right hand, remounted with a wrist quat offset."""

    @property
    def default_gripper(self):
        return {"right": "InspireRightHand"}

    @property
    def gripper_mount_pos_offset(self):
        return {"right": [0.0, 0.0, 0.0]}

    @property
    def gripper_mount_quat_offset(self):
        return {"right": [-0.5, 0.5, 0.5, -0.5]}


@register_robot
class PandaDexLH(Panda):
    """reference compositional.py:93-104."""

    @property
    def default_gripper(self):
        return {"right": "InspireLeftHand"}

    @property
    def gripper_mount_pos_offset(self):
        return {"right": [0.0, 0.0, 0.0]}

    @property
    def gripper_mount_quat_offset(self):
        return {"right": [0.5, -0.5, 0.5, -0.5]}


@register_robot
class SpotArm(ManipulatorModel):
    """reference spot_arm.py (fixed-base Spot arm on RethinkMount)."""

    card_name = "spot_arm"

    def _build(self):
        super()._build()
        # reference spot_arm.py:21: joint damping override
        damping = [0.1, 0.1, 0.1, 0.1, 0.1, 0.01]
        i = 0
        for b in self._root.walk():
            for j in b.joints:
                if i < len(damping):
                    j.damping = damping[i]
                    i += 1

    @property
    def default_base(self):
        return "RethinkMount"

    @property
    def default_gripper(self):
        return {"right": "BDGripper"}

    @property
    def init_qpos(self):
        return np.array([0.0, -1.2, 1.85, 0.0, 0.862, 0.0])

    @property
    def base_xpos_offset(self):
        return {
            "bins": (-0.5, -0.1, 0),
            "empty": (-0.6, 0, 0),
            "table": lambda table_length: (-0.16 - 0.9 - table_length / 2, 0.0, 0.0),
        }

    @property
    def top_offset(self):
        return np.array((0, 0, 1.0))


@register_robot
class SpotWithArm(SpotArm):
    """reference compositional.py:31-52: Spot arm riding the full legged Spot
    body (free root joint + 12 actuated legs)."""

    robot_kind = "legged"

    @property
    def default_base(self):
        return "Spot"

    @property
    def init_qpos(self):
        return np.array([0.0, -2, 1.26, -0.335, 0.862, 0.0])

    @property
    def base_xpos_offset(self):
        return {
            "bins": (-1.05, -0.1, -0.22),
            "empty": (-1.1, 0, -0.22),
            "table": lambda table_length: (-0.5 - table_length / 2, 0.0, -0.22),
        }


@register_robot
class GR1(ManipulatorModel):
    """reference gr1_robot.py:7-101: Fourier GR1 humanoid — bimanual, 3-dof
    torso + 3-dof head + 2x7 arms + 2x6 actuated legs on a free root joint;
    default dexterous Fourier hands."""

    card_name = "gr1"
    arms = ["right", "left"]
    robot_kind = "legged"

    @property
    def arm_type(self):
        return "bimanual"

    @property
    def _eef_name(self):
        return {"right": "right_eef", "left": "left_eef"}

    @property
    def default_base(self):
        return "NoActuationBase"

    @property
    def default_gripper(self):
        return {"right": "FourierRightHand", "left": "FourierLeftHand"}

    @property
    def init_qpos(self):
        # card order: torso(3) head(3) right arm(7) left arm(7) legs(12)
        q = np.zeros(32)
        q[6:13] = [0.0, -0.1, 0.0, -1.57, 0.0, 0.0, 0.0]
        q[13:20] = [0.0, 0.1, 0.0, -1.57, 0.0, 0.0, 0.0]
        return q

    @property
    def base_xpos_offset(self):
        return {
            "bins": (-0.30, -0.1, 0.95),
            "empty": (-0.29, 0, 0.95),
            "table": lambda table_length: (-0.15 - table_length / 2, 0, 0.95),
        }

    @property
    def top_offset(self):
        return np.array((0, 0, 1.0))

    @property
    def horizontal_radius(self):
        return 0.5


@register_robot
class GR1FixedLowerBody(GR1):
    """reference gr1_robot.py:104-130: legs de-actuated, free joint removed."""

    def __init__(self, idn=0):
        super().__init__(idn=idn)
        self._remove_joint_actuation("leg")
        self._remove_free_joint()

    @property
    def init_qpos(self):
        q = np.zeros(20)
        q[6:13] = [0.0, -0.1, 0.0, -1.57, 0.0, 0.0, 0.0]
        q[13:20] = [0.0, 0.1, 0.0, -1.57, 0.0, 0.0, 0.0]
        return q


@register_robot
class GR1FloatingBody(GR1):
    """reference gr1_robot.py:133-166: de-legged GR1 on a FloatingLeggedBase
    (planar mobile joints); HYBRID_MOBILE_BASE composite."""

    composite_type = "HYBRID_MOBILE_BASE"

    def __init__(self, idn=0):
        super().__init__(idn=idn)
        self._remove_joint_actuation("leg")
        self._remove_free_joint()

    @property
    def default_base(self):
        return "FloatingLeggedBase"

    @property
    def init_qpos(self):
        q = np.zeros(20)
        q[6:13] = [0.0, -0.1, 0.0, -1.57, 0.0, 0.0, 0.0]
        q[13:20] = [0.0, 0.1, 0.0, -1.57, 0.0, 0.0, 0.0]
        return q

    @property
    def base_xpos_offset(self):
        return {
            "bins": (-0.30, -0.1, 0.97),
            "empty": (-0.29, 0, 0.97),
            "table": lambda table_length: (-0.15 - table_length / 2, 0, 0.97),
        }


@register_robot
class GR1ArmsOnly(GR1):
    """reference gr1_robot.py:169-195: arms only — legs/head/torso
    de-actuated, free joint removed."""

    def __init__(self, idn=0):
        super().__init__(idn=idn)
        self._remove_joint_actuation("leg")
        self._remove_joint_actuation("head")
        self._remove_joint_actuation("torso")
        self._remove_free_joint()

    @property
    def init_qpos(self):
        q = np.zeros(14)
        q[0:7] = [0.0, -0.1, 0.0, -1.57, 0.0, 0.0, 0.0]
        q[7:14] = [0.0, 0.1, 0.0, -1.57, 0.0, 0.0, 0.0]
        return q


@register_robot
class PandaOmron(Panda):
    """reference compositional.py:6-28: Panda arm riding an OmronMobileBase."""

    robot_kind = "wheeled"
    # reference controllers/config/robots/default_pandaomron.json: HYBRID
    composite_type = "HYBRID_MOBILE_BASE"
    part_controller_kp = {"torso": 2000.0, "head": 1000.0}

    @property
    def default_base(self):
        return "OmronMobileBase"

    @property
    def init_qpos(self):
        return np.array([0, np.pi / 16.0 - 0.2, 0.00, -np.pi / 2.0 - np.pi / 3.0, 0.00, np.pi - 0.4, np.pi / 4])

    @property
    def init_torso_qpos(self):
        return np.array([0.2])

    @property
    def base_xpos_offset(self):
        return {
            "bins": (-0.6, -0.1, 0),
            "empty": (-0.6, 0, 0),
            "table": lambda table_length: (-0.16 - table_length / 2, 0, 0),
        }


@register_robot
class SpotWithArmFloating(SpotArm):
    """reference compositional.py:53-74: Spot arm on the floating (de-legged)
    Spot body with planar mobile joints."""

    robot_kind = "legged"

    @property
    def default_base(self):
        return "SpotFloating"

    @property
    def init_qpos(self):
        return np.array([0.0, -2, 1.26, -0.335, 0.862, 0.0])

    @property
    def base_xpos_offset(self):
        return {
            "bins": (-0.7, -0.1, 0.0),
            "empty": (-0.6, 0, 0.0),
            "table": lambda table_length: (-0.5 - table_length / 2, 0.0, 0.0),
        }


@register_robot
class Tiago(ManipulatorModel):
    """reference tiago_robot.py: bimanual wheeled mobile manipulator; the
    card carries torso_lift + 2 head joints + 2x6 arm joints; planar base
    joints come from the NullMobileBase card."""

    card_name = "tiago"
    arms = ["right", "left"]
    robot_kind = "wheeled"

    @property
    def arm_type(self):
        return "bimanual"

    @property
    def _eef_name(self):
        return {"right": "right_hand", "left": "left_hand"}

    @property
    def default_base(self):
        return "NullMobileBase"

    @property
    def default_gripper(self):
        return {"right": "Robotiq85Gripper", "left": "Robotiq85Gripper"}

    @property
    def init_qpos(self):
        # card joint order: torso_lift, head_1, head_2, right arm x6, left arm x6
        return np.array([0.1, 0, 0, 0, -0.9, 1.45, 1.7, -1.5, 0.5, 0, -0.9, 1.45, 1.7, -1.5, 0.5])

    @property
    def base_xpos_offset(self):
        return {
            "bins": (-0.5, -0.1, 0),
            "empty": (-0.29, 0, 0),
            "table": lambda table_length: (-0.20 - table_length / 2, 0, 0),
        }
