"""Card-backed objects (reference models/objects/xml_objects.py).

Each wraps a committed model card extracted from the reference's
primitive-geometry object MJCF (door, nuts, plate-with-hole). Mesh-based
objects (milk/bread/cereal/can/bottle/lemon) are primitive-approximated in
primitive_substitutes.py until mesh collision lands.
"""

from __future__ import annotations

import copy
from typing import List, Optional

import numpy as np

from robosuite_tpu.models import spec as S
from robosuite_tpu.models.cards import load_card, spec_from_card
from robosuite_tpu.models.objects import MujocoObject


class CardObject(MujocoObject):
    """MujocoXMLObject analog: object built from a committed card
    (reference objects.py:332-520)."""

    card_name: str = None

    def __init__(self, name, joints="default", obj_type="all", duplicate_collision_geoms=True):
        super().__init__(name, joints=joints, obj_type=obj_type, duplicate_collision_geoms=duplicate_collision_geoms)

    def _build(self) -> S.BodySpec:
        ms = spec_from_card(self.card_name)
        children = ms.worldbody.children
        assert len(children) == 1, f"object card {self.card_name} must have one root"
        root = copy.deepcopy(children[0])
        root.name = "main"  # renamed then prefixed below
        root.apply_prefix(self.naming_prefix)
        # add requested joints on the root (reference MujocoXMLObject joints)
        for i, j in enumerate(self.joints):
            jd = dict(j)
            jd.setdefault("type", "free")
            root.joints.insert(i, S.JointSpec(name=f"{self.naming_prefix}joint{i}", **jd))
        root.add_site(S.SiteSpec(self.default_site, size=(0.002,), rgba=(1, 0, 0, 0)))
        return root

    def body_name(self, unprefixed: str) -> str:
        return self.naming_prefix + unprefixed

    @property
    def contact_geoms(self) -> List[str]:
        return [g.name for b in self.get_obj().walk() for g in b.geoms if g.contype or g.conaffinity]


class DoorObject(CardObject):
    """reference xml_objects.py:236-290: door with frame + handle; lock=True
    adds the latch handle joint."""

    def __init__(self, name, friction=None, damping=None, lock=False):
        self.lock = lock
        self.card_name = "door_lock" if lock else "door"
        super().__init__(name, joints=None)
        self._friction = friction
        self._damping = damping

    def _build(self):
        root = super()._build()
        # find hinge joint and apply overrides (reference :268-290)
        for b in root.walk():
            for j in b.joints:
                if j.name.endswith("hinge"):
                    if self._friction is not None:
                        j.frictionloss = float(self._friction)
                    if self._damping is not None:
                        j.damping = float(self._damping)
        return root

    @property
    def door_body(self):
        return self.naming_prefix + "door"

    @property
    def frame_body(self):
        return self.naming_prefix + "frame"

    @property
    def latch_body(self):
        return self.naming_prefix + "latch"

    @property
    def hinge_joint(self):
        return self.naming_prefix + "hinge"

    @property
    def latch_joint(self):
        return self.naming_prefix + "latch_joint"

    @property
    def important_sites(self):
        return {"handle": self.naming_prefix + "handle"}

    @property
    def joint_names(self):
        # articulated joints live inside the card, not added free joints
        names = []
        for b in self.get_obj().walk():
            names.extend(j.name for j in b.joints)
        return names

    @property
    def bottom_offset(self):
        return np.array([0, 0, -0.3])

    @property
    def top_offset(self):
        return np.array([0, 0, 0.3])

    @property
    def horizontal_radius(self):
        return 0.3


class SquareNutObject(CardObject):
    """reference xml_objects.py SquareNutObject (NutAssembly)."""

    card_name = "square_nut"

    @property
    def important_sites(self):
        return {"handle": self.naming_prefix + "handle_site"}

    @property
    def bottom_offset(self):
        return np.array([0, 0, -0.01])

    @property
    def top_offset(self):
        return np.array([0, 0, 0.01])

    @property
    def horizontal_radius(self):
        return 0.06


class RoundNutObject(CardObject):
    """reference xml_objects.py RoundNutObject (NutAssembly)."""

    card_name = "round_nut"

    @property
    def important_sites(self):
        return {"handle": self.naming_prefix + "handle_site"}

    @property
    def bottom_offset(self):
        return np.array([0, 0, -0.01])

    @property
    def top_offset(self):
        return np.array([0, 0, 0.01])

    @property
    def horizontal_radius(self):
        return 0.06


class PlateWithHoleObject(CardObject):
    """reference xml_objects.py PlateWithHoleObject (TwoArmPegInHole)."""

    card_name = "plate_with_hole"

    def __init__(self, name):
        super().__init__(name, joints=None)

    @property
    def bottom_offset(self):
        return np.array([0, 0, -0.02])

    @property
    def top_offset(self):
        return np.array([0, 0, 0.02])

    @property
    def horizontal_radius(self):
        return 0.12
