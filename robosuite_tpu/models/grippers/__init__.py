"""Gripper models (reference models/grippers/*.py + gripper_factory.py).

Each gripper wraps its model card with the reference's metadata: dof,
speed, init_qpos, important sites (grip_site for the OSC reference frame)
and fingerpad geoms (grasp checks). format_action's open/close ramp state
(reference panda_gripper.py:42-55) lives in the robot layer's explicit
gripper state, not here.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from robosuite_tpu.models import spec as S
from robosuite_tpu.models.cards import load_card, spec_from_card

REGISTERED_GRIPPERS: Dict[str, type] = {}


def register_gripper(cls):
    REGISTERED_GRIPPERS[cls.__name__] = cls
    return cls


def gripper_factory(name: str, idn=0, arm="right"):
    """reference gripper_factory.py."""
    if name is None:
        name = "NullGripper"
    assert name in REGISTERED_GRIPPERS, f"unknown gripper {name}; known: {sorted(REGISTERED_GRIPPERS)}"
    return REGISTERED_GRIPPERS[name](idn=idn, arm=arm)


class GripperModel:
    card_name: str = None
    dof: int = 1
    speed: float = 0.2

    def __init__(self, idn=0, arm="right"):
        self.idn = idn
        self.arm = arm
        self._root = None
        self._actuators: List[S.ActuatorSpec] = []
        if self.card_name is not None:
            ms = spec_from_card(self.card_name)
            assert len(ms.worldbody.children) == 1
            self._root = ms.worldbody.children[0]
            self._root.apply_prefix(self.naming_prefix)
            p = self.naming_prefix
            self._actuators = [
                S.ActuatorSpec(
                    name=p + a.name, joint=p + a.joint if a.joint else None, kind=a.kind,
                    gear=a.gear, ctrlrange=a.ctrlrange, forcerange=a.forcerange, kp=a.kp, kv=a.kv,
                    tendon=p + a.tendon if a.tendon else None,
                    gainprm=a.gainprm, biasprm=a.biasprm,
                )
                for a in ms.actuators
            ]
            import dataclasses as _dc

            self._equalities = [
                _dc.replace(
                    e,
                    body1=p + e.body1 if e.body1 else None,
                    body2=p + e.body2 if e.body2 else None,
                    joint1=p + e.joint1 if e.joint1 else None,
                    joint2=p + e.joint2 if e.joint2 else None,
                    tendon1=p + e.tendon1 if e.tendon1 else None,
                    tendon2=p + e.tendon2 if e.tendon2 else None,
                )
                for e in ms.equalities
            ]
            self._tendons = [
                _dc.replace(t, name=p + t.name, joints=[p + j for j in t.joints])
                for t in ms.tendons
            ]

    @property
    def naming_prefix(self):
        return f"gripper{self.idn}_{self.arm}_"

    @property
    def init_qpos(self):
        return np.zeros(0)

    @property
    def _important_sites(self):
        return {"grip_site": "grip_site", "grip_cylinder": "grip_site_cylinder", "ee": "ft_frame",
                "ee_x": "ee_x", "ee_y": "ee_y", "ee_z": "ee_z"}

    @property
    def important_sites(self):
        return {k: self.naming_prefix + v for k, v in self._important_sites.items()}

    @property
    def _important_geoms(self) -> Dict[str, List[str]]:
        return {}

    @property
    def important_geoms(self):
        return {k: [self.naming_prefix + g for g in v] for k, v in self._important_geoms.items()}

    @property
    def joint_names(self) -> List[str]:
        out = []
        if self._root is not None:
            for b in self._root.walk():
                out.extend(j.name for j in b.joints)
        return out

    @property
    def actuator_names(self) -> List[str]:
        return [a.name for a in self._actuators]

    def root_subtree(self):
        return self._root

    def actuators(self):
        return list(self._actuators)

    def equalities(self):
        return list(getattr(self, "_equalities", []))

    def tendons(self):
        return list(getattr(self, "_tendons", []))

    def format_action_direction(self):
        """Per-actuator sign applied to the ramped open/close command
        (reference format_action's np.array([-1, 1]) pattern)."""
        return np.ones(len(self._actuators))

    def format_action_indices(self):
        """For dexterous hands: per-actuator index into the dof-length action
        (reference inspire_hands.py:22-28 `action[indices]` direct mapping).
        None -> binary ramped gripper (dof-1 open/close)."""
        return None

    # Dexterous ramped variants (reference *DexterousGripper classes,
    # jaco_three_finger_gripper.py:82-108, robotiq_three_finger_gripper.py:88-114):
    # each action element ramps its own actuator (sign taken per element
    # instead of on the scalar open/close command).
    ramp_elementwise = False

    def format_action_fixed(self):
        """Per-actuator pinned command, NaN = free. Reference
        robotiq_three_finger_gripper.py:78 pins the scissor joint to -1 in the
        1-dof variant. None -> nothing pinned."""
        return None


@register_gripper
class PandaGripper(GripperModel):
    """reference panda_gripper.py: dof=1, speed=0.2, ramped binary action."""

    card_name = "panda_gripper"
    dof = 1
    speed = 0.2

    @property
    def init_qpos(self):
        return np.array([0.020833, -0.020833])

    @property
    def _important_geoms(self):
        return {
            "left_finger": ["finger1_collision", "finger1_pad_collision"],
            "right_finger": ["finger2_collision", "finger2_pad_collision"],
            "left_fingerpad": ["finger1_pad_collision"],
            "right_fingerpad": ["finger2_pad_collision"],
        }

    def format_action_direction(self):
        return np.array([-1.0, 1.0])


@register_gripper
class RethinkGripper(GripperModel):
    """reference rethink_gripper.py."""

    card_name = "rethink_gripper"
    dof = 1
    speed = 0.2

    @property
    def init_qpos(self):
        return np.array([0.020833, -0.020833])

    @property
    def _important_geoms(self):
        return {
            "left_finger": ["l_finger_g0", "l_finger_g1", "l_fingertip_g0", "l_fingerpad_g0"],
            "right_finger": ["r_finger_g0", "r_finger_g1", "r_fingertip_g0", "r_fingerpad_g0"],
            "left_fingerpad": ["l_fingerpad_g0"],
            "right_fingerpad": ["r_fingerpad_g0"],
        }

    def format_action_direction(self):
        return np.array([1.0, -1.0])


@register_gripper
class Robotiq85Gripper(GripperModel):
    """reference robotiq_85_gripper.py."""

    card_name = "robotiq_gripper_85"
    dof = 1
    speed = 0.01

    @property
    def init_qpos(self):
        return np.array([-0.026, -0.267, -0.200, -0.026, -0.267, -0.200])

    @property
    def _important_geoms(self):
        return {
            "left_finger": ["left_outer_finger_collision", "left_inner_finger_collision", "left_fingertip_collision", "left_fingerpad_collision"],
            "right_finger": ["right_outer_finger_collision", "right_inner_finger_collision", "right_fingertip_collision", "right_fingerpad_collision"],
            "left_fingerpad": ["left_fingerpad_collision"],
            "right_fingerpad": ["right_fingerpad_collision"],
        }


@register_gripper
class Robotiq140Gripper(GripperModel):
    """reference robotiq_140_gripper.py."""

    card_name = "robotiq_gripper_140"
    dof = 1
    speed = 0.2

    @property
    def init_qpos(self):
        return np.array([0.012, 0.065, 0.065, -0.012, 0.065, 0.065])

    @property
    def _important_geoms(self):
        return {
            "left_finger": ["left_outer_finger_collision", "left_inner_finger_collision", "left_fingertip_collision", "left_fingerpad_collision"],
            "right_finger": ["right_outer_finger_collision", "right_inner_finger_collision", "right_fingertip_collision", "right_fingerpad_collision"],
            "left_fingerpad": ["left_fingerpad_collision"],
            "right_fingerpad": ["right_fingerpad_collision"],
        }


@register_gripper
class JacoThreeFingerGripper(GripperModel):
    """reference jaco_three_finger_gripper.py."""

    card_name = "jaco_three_finger_gripper"
    dof = 1
    speed = 0.01

    @property
    def init_qpos(self):
        return np.array([0.5, 0, 0.5, 0, 0.5, 0])

    @property
    def _important_geoms(self):
        return {
            "left_finger": ["index_proximal_collision", "index_distal_collision", "index_tip_collision",
                            "pinky_proximal_collision", "pinky_distal_collision", "pinky_tip_collision",
                            "index_pad_collision", "pinky_pad_collision"],
            "right_finger": ["thumb_proximal_collision", "thumb_distal_collision", "thumb_tip_collision", "thumb_pad_collision"],
            "left_fingerpad": ["index_pad_collision", "pinky_pad_collision"],
            "right_fingerpad": ["thumb_pad_collision"],
        }


@register_gripper
class WipingGripper(GripperModel):
    """reference wiping_gripper.py: no actuation, wiping plate."""

    card_name = "wiping_gripper"
    dof = 0
    speed = 0.0

    @property
    def _important_sites(self):
        return {"grip_site": "grip_site", "grip_cylinder": "grip_site_cylinder", "ee": "ft_frame"}


@register_gripper
class NullGripper(GripperModel):
    """reference null_gripper.py: no gripper."""

    card_name = "null_gripper"
    dof = 0
    speed = 0.0

    @property
    def _important_sites(self):
        return {"grip_site": "grip_site", "grip_cylinder": "grip_site_cylinder", "ee": "ft_frame"}


@register_gripper
class XArm7Gripper(GripperModel):
    """reference xarm7_gripper.py: the real tendon+equality-driven linkage —
    ONE <general biastype="affine"> servo on the "split" fixed tendon
    (0.5*left_driver + 0.5*right_driver), connect equalities closing the
    four-bar fingers (xarm7_gripper.xml). +1 = close (ctrl ramps 0..255,
    pulling the tendon toward its 0.85 closure length)."""

    card_name = "xarm7_gripper"
    dof = 1
    speed = 0.2

    @property
    def init_qpos(self):
        return np.array([0.02, 0.0, 0.0, -0.02, 0.0, 0.0])

    @property
    def _important_geoms(self):
        return {
            "left_finger": ["finger1_collision", "finger1_pad_collision"],
            "right_finger": ["finger2_collision", "finger2_pad_collision"],
            "left_fingerpad": ["finger1_pad_collision"],
            "right_fingerpad": ["finger2_pad_collision"],
        }

    def format_action_direction(self):
        return np.array([1.0])


@register_gripper
class RobotiqThreeFingerGripper(GripperModel):
    """reference robotiq_three_finger_gripper.py (S-model): 1-dof ramp over
    the three finger actuators, scissor pinned closed
    (robotiq_three_finger_gripper.py:64-84)."""

    card_name = "robotiq_three_finger_gripper"
    dof = 1
    speed = 0.01

    def format_action_fixed(self):
        # actuator order finger_1, finger_2, middle_finger, finger_scissor;
        # reference pins the scissor to -1 (robotiq_three_finger_gripper.py:78)
        return np.array([np.nan, np.nan, np.nan, -1.0])


@register_gripper
class RobotiqThreeFingerDexterousGripper(RobotiqThreeFingerGripper):
    """reference robotiq_three_finger_gripper.py:88-114: all three fingers
    plus the scissor actuated independently (dof=4, per-element ramp)."""

    dof = 4
    ramp_elementwise = True

    def format_action_fixed(self):
        return None


@register_gripper
class JacoThreeFingerDexterousGripper(JacoThreeFingerGripper):
    """reference jaco_three_finger_gripper.py:82-108: each of the three
    fingers actuated independently (dof=3, per-element ramp)."""

    dof = 3
    ramp_elementwise = True


@register_gripper
class SuctionGripper(GripperModel):
    """reference suction gripper model (suction cup; adhesion dynamics not
    yet modeled — geometry + mounting only)."""

    card_name = "suction_gripper"
    dof = 0
    speed = 0.0

    @property
    def _important_sites(self):
        return {"grip_site": "grip_site", "grip_cylinder": "grip_site_cylinder", "ee": "ft_frame"}


@register_gripper
class BDGripper(GripperModel):
    """reference bd_gripper.py (Boston Dynamics gripper)."""

    card_name = "bd_gripper"
    dof = 1
    speed = 0.2

    @property
    def init_qpos(self):
        return np.array([-1.57])

    @property
    def _important_geoms(self):
        # reference bd_gripper.py:31-36
        return {
            "left_finger": ["left_hinge_coll", "left_finger_coll", "left_tooth_coll"],
            "right_finger": ["right_hinge_coll", "right_finger_coll", "right_tooth_coll"],
            "left_fingerpad": ["left_finger_coll"],
            "right_fingerpad": ["right_finger_coll"],
        }


def _hand_geoms(prefix):
    """thumb opposes the four fingers (reference inspire_hands.py:127-160,
    fourier_hands.py:49-81: thumb geoms double as left_finger(+pad),
    finger geoms as right_finger(+pad))."""
    if prefix in ("l", "r"):  # inspire naming
        thumb = [f"{prefix}_thumb_proximal_col", f"{prefix}_thumb_proximal_2_col",
                 f"{prefix}_thumb_middle_col", f"{prefix}_thumb_distal_col"]
        fingers = [f"{prefix}_{f}_{seg}_col" for f in ("index", "middle", "ring", "pinky")
                   for seg in ("proximal", "distal")]
    else:  # fourier naming ("L"/"R")
        thumb = [f"{prefix}_thumb_proximal_base_link_col", f"{prefix}_thumb_proximal_link_col",
                 f"{prefix}_thumb_distal_link_col"]
        fingers = [f"{prefix}_{f}_{seg}_link_col" for f in ("index", "middle", "ring", "pinky")
                   for seg in ("proximal", "intermediate")]
    return {"left_finger": thumb, "right_finger": fingers,
            "left_fingerpad": thumb, "right_fingerpad": fingers}


@register_gripper
class InspireLeftHand(GripperModel):
    """reference inspire_hands.py:10-85: 6-dof dexterous hand; the 6-dim
    action maps directly onto 12 position actuators via index expansion
    (inspire_hands.py:22-28) — no binary ramp."""

    card_name = "inspire_left_hand"
    dof = 6
    speed = 0.15

    def __init__(self, idn=0, arm="left"):
        super().__init__(idn=idn, arm=arm)

    def format_action_indices(self):
        # actuator order: pinky(d,p), ring(d,p), middle(d,p), index(d,p),
        # thumb(distal, middle, proximal_2, proximal_1)
        return np.array([0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 4, 5])

    @property
    def init_qpos(self):
        return np.zeros(12)

    @property
    def _important_geoms(self):
        return _hand_geoms("l")


@register_gripper
class InspireRightHand(InspireLeftHand):
    card_name = "inspire_right_hand"

    def __init__(self, idn=0, arm="right"):
        super(InspireLeftHand, self).__init__(idn=idn, arm=arm)

    @property
    def _important_geoms(self):
        return _hand_geoms("r")


@register_gripper
class FourierLeftHand(GripperModel):
    """reference fourier_hands.py:10-82: 6-dof hand, 11 actuators
    (thumb has yaw + 2 coupled pitch dofs)."""

    card_name = "fourier_left_hand"
    dof = 6
    speed = 0.15

    def __init__(self, idn=0, arm="left"):
        super().__init__(idn=idn, arm=arm)

    def format_action_indices(self):
        return np.array([0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5])

    @property
    def init_qpos(self):
        return np.zeros(11)

    @property
    def _important_geoms(self):
        return _hand_geoms("L")


@register_gripper
class FourierRightHand(FourierLeftHand):
    card_name = "fourier_right_hand"

    def __init__(self, idn=0, arm="right"):
        super(FourierLeftHand, self).__init__(idn=idn, arm=arm)

    @property
    def _important_geoms(self):
        return _hand_geoms("R")
