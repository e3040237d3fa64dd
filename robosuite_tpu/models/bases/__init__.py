"""Robot bases: mounts (fixed) and mobile bases.

Reference models/bases/*.py; round 1 ships the fixed mounts used by the
manipulation envs (RethinkMount, RethinkMinimalMount, NullMount) plus the
OmronMobileBase card for the mobile stack.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from robosuite_tpu.models import spec as S
from robosuite_tpu.models.cards import spec_from_card

REGISTERED_BASES: Dict[str, type] = {}


def register_base(cls):
    REGISTERED_BASES[cls.__name__] = cls
    return cls


def robot_base_factory(name: str, idn=0):
    """reference bases/robot_base_factory.py."""
    if name is None:
        name = "NullMount"
    assert name in REGISTERED_BASES, f"unknown base {name}; known: {sorted(REGISTERED_BASES)}"
    return REGISTERED_BASES[name](idn=idn)


class RobotBaseModel:
    card_name: str = None
    mount: bool = True   # False -> mobile/legged: robot is mounted ON the base

    def __init__(self, idn=0):
        self.idn = idn
        self._root = None
        self._actuators: List[S.ActuatorSpec] = []
        if self.card_name is not None:
            ms = spec_from_card(self.card_name)
            assert len(ms.worldbody.children) == 1
            self._root = ms.worldbody.children[0]
            self._customize_spec(ms)
            self._root.apply_prefix(self.naming_prefix)
            self._actuators = [
                S.ActuatorSpec(
                    name=self.naming_prefix + a.name, joint=self.naming_prefix + a.joint, kind=a.kind,
                    gear=a.gear, ctrlrange=a.ctrlrange, forcerange=a.forcerange, kp=a.kp, kv=a.kv,
                )
                for a in ms.actuators
            ]

    def _customize_spec(self, ms):
        """Hook for subclasses to edit the card spec before prefixing."""

    @property
    def naming_prefix(self):
        # reference: mount_model.py:10 "fixed_mount{}_", mobile_base_model.py:10
        # "mobilebase{}_", leg_base_model.py:23 "leg{}_"
        return f"fixed_mount{self.idn}_" if self.mount else f"mobilebase{self.idn}_"

    # -- mobile-base metadata (empty for mounts) ------------------------------
    @property
    def base_joints(self) -> List[str]:
        """Prefixed planar joints driven by the base controller
        (mobile_robot.py:81 robot_model.base_joints)."""
        if self.mount or self._root is None:
            return []
        want = ("joint_mobile_forward", "joint_mobile_side", "joint_mobile_yaw")
        found = {j.name: j.name for b in self._root.walk() for j in b.joints}
        return [self.naming_prefix + w for w in want if self.naming_prefix + w in found]

    @property
    def torso_joints(self) -> List[str]:
        if self.mount or self._root is None:
            return []
        # after mounting, the robot subtree hangs under this root — only count
        # joints that belong to the base itself (prefix match)
        return [
            j.name
            for b in self._root.walk()
            for j in b.joints
            if "torso" in j.name and j.name.startswith(self.naming_prefix)
        ]

    @property
    def leg_joints(self) -> List[str]:
        """Actuated leg joints contributed by the base (legged bases only)."""
        return []

    @property
    def center_site(self) -> str:
        """Base reference site used by the mobile controller
        (mobile_base_controller.py:89-94)."""
        return self.naming_prefix + "center"

    @property
    def init_qpos(self):
        return np.array([])

    @property
    def top_offset(self):
        return np.array((0.0, 0.0, 0.0))

    @property
    def bottom_offset(self):
        return np.array((0.0, 0.0, 0.0))

    @property
    def horizontal_radius(self):
        return 0.0

    def root_subtree(self):
        return self._root

    def actuators(self):
        return list(self._actuators)


@register_base
class RethinkMount(RobotBaseModel):
    """reference bases/rethink_mount.py: top_offset (0,0,-0.01); the card's
    root body sits at z=-0.922 so bottom_offset = (0,0,-0.922)."""

    card_name = "rethink_mount"

    @property
    def top_offset(self):
        return np.array((0.0, 0.0, -0.01))

    @property
    def bottom_offset(self):
        return np.array((0.0, 0.0, -0.922))

    @property
    def horizontal_radius(self):
        return 0.25


@register_base
class RethinkMinimalMount(RobotBaseModel):
    """reference bases/rethink_minimal_mount.py."""

    card_name = "rethink_minimal_mount"

    @property
    def top_offset(self):
        return np.array((0.0, 0.0, -0.01))

    @property
    def bottom_offset(self):
        return np.array((0.0, 0.0, -0.9))

    @property
    def horizontal_radius(self):
        return 0.25


@register_base
class NullMount(RobotBaseModel):
    """reference bases/null_mount.py."""

    card_name = "null_mount"


@register_base
class OmronMobileBase(RobotBaseModel):
    """reference bases/omron_mobile_base.py (mobile)."""

    card_name = "omron_mobile_base"
    mount = False

    @property
    def top_offset(self):
        return np.array((0.0, 0.0, 0.0))

    @property
    def bottom_offset(self):
        return np.array((0.0, 0.0, -0.892))

    @property
    def horizontal_radius(self):
        return 0.4


@register_base
class NullMobileBase(RobotBaseModel):
    """reference bases/null_mobile_base.py."""

    card_name = "null_mobile_base"
    mount = False


@register_base
class FloatingLeggedBase(RobotBaseModel):
    """reference bases/floating_legged_base.py: a bare support body carrying
    the planar mobile joints + velocity actuators."""

    card_name = "floating_legged_base"
    mount = False


@register_base
class NoActuationBase(RobotBaseModel):
    """reference bases/no_actuation_base.py: dummy mobile base (no joints,
    no actuators) for self-supporting robots like GR1."""

    card_name = "no_actuation_base"
    mount = False

    @property
    def top_offset(self):
        return np.array((0.0, 0.0, 0.0))

    @property
    def horizontal_radius(self):
        return 0.0


@register_base
class Spot(RobotBaseModel):
    """reference bases/spot_base.py:7-28 Spot: the full legged Spot body —
    free root joint + 12 actuated leg joints. Prefix 'leg{idn}_'
    (leg_base_model.py:23)."""

    card_name = "spot"
    mount = False

    @property
    def naming_prefix(self):
        return f"leg{self.idn}_"

    @property
    def leg_joints(self) -> List[str]:
        if self._root is None:
            return []
        return [
            j.name
            for b in self._root.walk()
            for j in b.joints
            if j.type != "free" and "leg" in j.name and j.name.startswith(self.naming_prefix)
        ]

    @property
    def init_qpos(self):
        # reference spot_base.py:26-28: (hx, hy, kn) x (fr, fl, hr, hl)
        return np.array([0.0, 0.9, -1.8] * 4)

    # raw leg position-servo gains (reference spot robot.xml default class
    # "spot": <position kp="500" kv="40">) — the stiffness the model was
    # designed to stand with; LeggedRobot drives the legs with this servo
    leg_servo = (500.0, 40.0)

    @property
    def top_offset(self):
        return np.array((0.0, 0.0, 0.0))

    @property
    def bottom_offset(self):
        # standing-pose FK at init_qpos (hy=0.9, kn=-1.8): the foot-sphere
        # centers sit 0.684 below the placement origin (0.648 + the 0.036
        # foot radius, measured via kinematics.fk at reset) — without this
        # the robot spawns with its feet underground and collapses instead
        # of standing
        return np.array((0.0, 0.0, -0.684))

    @property
    def horizontal_radius(self):
        return 0.1


@register_base
class SpotFloating(RobotBaseModel):
    """reference bases/spot_base.py:31-56 SpotFloating: the Spot body with
    leg actuation and the free joint removed, planar mobile joints added
    (leg_base_model.py:26-51,52-135). Prefix 'leg{idn}_' (leg_base_model.py:23)."""

    card_name = "spot"
    mount = False

    @property
    def naming_prefix(self):
        return f"leg{self.idn}_"

    def _customize_spec(self, ms):
        root = self._root
        # remove free joint + leg joints; legs become rigid decorations
        for b in root.walk():
            b.joints = [j for j in b.joints if j.type != "free" and "leg" not in j.name]
        ms.actuators = [a for a in ms.actuators if "leg" not in a.name]
        # planar mobile joints on the root (leg_base_model.py:56-88; note the
        # reference's swapped axes: forward=+y, side=+x in Spot's body frame)
        root.joints.insert(
            0,
            S.JointSpec("joint_mobile_forward", type="slide", axis=(0, 1, 0), frictionloss=250.0),
        )
        root.joints.insert(
            1, S.JointSpec("joint_mobile_side", type="slide", axis=(1, 0, 0), frictionloss=250.0)
        )
        root.joints.insert(
            2, S.JointSpec("joint_mobile_yaw", type="hinge", axis=(0, 0, 1), frictionloss=250.0)
        )
        for nm, rng, kv in (
            ("mobile_forward", 1.0, 1000.0),
            ("mobile_side", 1.0, 1000.0),
            ("mobile_yaw", 1.5, 1500.0),
        ):
            ms.actuators.append(
                S.ActuatorSpec(
                    name=f"actuator_{nm}",
                    joint=f"joint_{nm}",
                    kind="velocity",
                    ctrlrange=(-rng, rng),
                    forcerange=(-600.0, 600.0),
                    kv=kv,
                )
            )

    @property
    def top_offset(self):
        return np.array((0.0, 0.0, 0.0))

    @property
    def horizontal_radius(self):
        return 0.1
