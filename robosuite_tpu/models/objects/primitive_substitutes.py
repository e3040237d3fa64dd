"""Primitive stand-ins for the reference's mesh-based pick-place objects.

The reference's Milk/Bread/Cereal/Can/Bottle/Lemon objects use convex mesh
collision (models/assets/objects/*.xml). Until mesh narrowphase lands, these
primitives match each object's recorded extents (bottom/top/horizontal-radius
sites in the reference XMLs) and approximate mass, so task semantics
(grasp widths, bin fits, lift heights) carry over.
"""

from __future__ import annotations

import numpy as np

from robosuite_tpu.models.objects import BoxObject, CapsuleObject, CylinderObject


class MilkObject(BoxObject):
    """milk.xml: carton, z extent [-0.085, 0.075], r~0.035."""

    def __init__(self, name="milk"):
        super().__init__(name=name, size=[0.035, 0.035, 0.08], density=300.0, rgba=[0.9, 0.9, 0.9, 1])


class BreadObject(BoxObject):
    """bread.xml: loaf, z extent [-0.045, 0.03], r~0.042."""

    def __init__(self, name="bread"):
        super().__init__(name=name, size=[0.042, 0.03, 0.0375], density=200.0, rgba=[0.8, 0.6, 0.3, 1])


class CerealObject(BoxObject):
    """cereal.xml: box, z extent [-0.10, 0.03], r~0.05."""

    def __init__(self, name="cereal"):
        super().__init__(name=name, size=[0.04, 0.03, 0.065], density=150.0, rgba=[0.8, 0.2, 0.1, 1])


class CanObject(CylinderObject):
    """can.xml: cylinder, z extent [-0.06, 0.04], r~0.035."""

    def __init__(self, name="can"):
        super().__init__(name=name, size=[0.033, 0.05], density=300.0, rgba=[0.9, 0.1, 0.1, 1])


class BottleObject(CylinderObject):
    """bottle.xml approximation."""

    def __init__(self, name="bottle"):
        super().__init__(name=name, size=[0.03, 0.08], density=300.0, rgba=[0.6, 0.8, 0.6, 1])


class LemonObject(CapsuleObject):
    """lemon.xml approximation."""

    def __init__(self, name="lemon"):
        super().__init__(name=name, size=[0.025, 0.015], density=400.0, rgba=[0.9, 0.9, 0.2, 1])
