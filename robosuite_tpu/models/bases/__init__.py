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
    mount: bool = True

    def __init__(self, idn=0):
        self.idn = idn
        self._root = None
        self._actuators: List[S.ActuatorSpec] = []
        if self.card_name is not None:
            ms = spec_from_card(self.card_name)
            assert len(ms.worldbody.children) == 1
            self._root = ms.worldbody.children[0]
            self._root.apply_prefix(self.naming_prefix)
            self._actuators = [
                S.ActuatorSpec(
                    name=self.naming_prefix + a.name, joint=self.naming_prefix + a.joint, kind=a.kind,
                    gear=a.gear, ctrlrange=a.ctrlrange, forcerange=a.forcerange, kp=a.kp, kv=a.kv,
                )
                for a in ms.actuators
            ]

    @property
    def naming_prefix(self):
        return f"fixed_mount{self.idn}_" if self.mount else f"mobile_base{self.idn}_"

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
