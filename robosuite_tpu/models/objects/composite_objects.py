"""Composite task objects built from primitives.

Re-derivations of the reference's procedural composites
(models/objects/composite/*.py) used by the TwoArm envs: PotWithHandles,
Hammer. Geometry parameterization follows the reference defaults.
"""

from __future__ import annotations

import numpy as np

from robosuite_tpu.models import spec as S
from robosuite_tpu.models.objects import MujocoObject


class PotWithHandlesObject(MujocoObject):
    """reference objects/composite/pot_with_handles.py: open box body + two
    U-shaped handles on +y / -y sides, sites pot_center + handle0/handle1."""

    def __init__(
        self,
        name,
        body_half_size=(0.07, 0.07, 0.07),
        handle_radius=0.01,
        handle_length=0.09,
        handle_width=0.09,
        handle_friction=1.0,
        density=1000,
        thickness=0.01,
    ):
        super().__init__(name, joints="default")
        self.body_half_size = np.array(body_half_size)
        self.thickness = thickness
        self.handle_radius = handle_radius
        self.handle_length = handle_length
        self.handle_width = handle_width
        self.handle_friction = handle_friction
        self.density = density

    def _build(self):
        b = self._make_root()
        hx, hy, hz = self.body_half_size
        t = self.thickness / 2
        fr = (1.0, 0.005, 0.0001)
        # base + 4 walls (open-top box)
        b.add_geom(S.GeomSpec(f"{self.naming_prefix}base", type="box", size=(hx, hy, t), pos=(0, 0, -hz + t), density=self.density, friction=fr))
        walls = [
            ("wall_y0", (hx, t, hz), (0, -hy + t, 0)),
            ("wall_y1", (hx, t, hz), (0, hy - t, 0)),
            ("wall_x0", (t, hy, hz), (-hx + t, 0, 0)),
            ("wall_x1", (t, hy, hz), (hx - t, 0, 0)),
        ]
        for nm, sz, pos in walls:
            b.add_geom(S.GeomSpec(f"{self.naming_prefix}{nm}", type="box", size=sz, pos=pos, density=self.density, friction=fr))
        # handles: U-shape of 3 bars on each y side at the pot top
        handle_z = hz - self.handle_radius
        hfr = (self.handle_friction, 0.005, 0.0001)
        for side_i, side in enumerate((1.0, -1.0)):
            cy = side * (hy + self.handle_length)
            pre = f"{self.naming_prefix}handle{side_i}"
            # crossbar
            b.add_geom(S.GeomSpec(f"{pre}_c", type="box",
                                  size=(self.handle_width / 2, self.handle_radius, self.handle_radius),
                                  pos=(0, cy, handle_z), density=self.density, friction=hfr))
            # two struts connecting crossbar to the pot rim
            for sx in (-1.0, 1.0):
                b.add_geom(S.GeomSpec(f"{pre}_{'m' if sx < 0 else 'p'}", type="box",
                                      size=(self.handle_radius, self.handle_length / 2, self.handle_radius),
                                      pos=(sx * self.handle_width / 2, side * (hy + self.handle_length / 2), handle_z),
                                      density=self.density, friction=hfr))
            b.add_site(S.SiteSpec(f"{pre}_site", pos=(0, cy, handle_z), size=(0.005,), rgba=(1, 0, 0, 0)))
        b.add_site(S.SiteSpec(f"{self.naming_prefix}center", pos=(0, 0, 0), size=(0.005,), rgba=(0, 0, 1, 0)))
        return b

    @property
    def handle_geoms(self):
        return {
            0: [f"{self.naming_prefix}handle0_c", f"{self.naming_prefix}handle0_m", f"{self.naming_prefix}handle0_p"],
            1: [f"{self.naming_prefix}handle1_c", f"{self.naming_prefix}handle1_m", f"{self.naming_prefix}handle1_p"],
        }

    @property
    def important_sites(self):
        return {
            "handle0": f"{self.naming_prefix}handle0_site",
            "handle1": f"{self.naming_prefix}handle1_site",
            "center": f"{self.naming_prefix}center",
        }

    @property
    def handle_distance(self):
        return 2.0 * (self.body_half_size[1] + self.handle_length)

    @property
    def bottom_offset(self):
        return np.array([0, 0, -self.body_half_size[2]])

    @property
    def top_offset(self):
        return np.array([0, 0, self.body_half_size[2]])

    @property
    def horizontal_radius(self):
        return float(np.sqrt(self.body_half_size[0] ** 2 + (self.body_half_size[1] + self.handle_length) ** 2))


class HammerObject(MujocoObject):
    """reference objects/composite/hammer.py: handle (cylinder) + head (box)
    + claw/face. Simplified to handle + head + face primitives with the
    reference's default proportions."""

    def __init__(self, name, handle_radius=0.015, handle_length=0.24, head_density_ratio=2.0, density=1000):
        super().__init__(name, joints="default")
        self.handle_radius = handle_radius
        self.handle_length = handle_length
        self.head_half = np.array((0.03, 0.09, 0.03))
        self.density = density
        self.head_density_ratio = head_density_ratio

    def _build(self):
        b = self._make_root()
        fr = (1.0, 0.005, 0.0001)
        b.add_geom(S.GeomSpec(f"{self.naming_prefix}handle", type="cylinder",
                              size=(self.handle_radius, self.handle_length / 2),
                              quat=(0.7071068, 0.7071068, 0, 0),  # along y
                              density=self.density, friction=fr))
        b.add_geom(S.GeomSpec(f"{self.naming_prefix}head", type="box", size=self.head_half,
                              pos=(0, self.handle_length / 2 + self.head_half[1] * 0.3, 0),
                              quat=(0.7071068, 0, 0, 0.7071068),
                              density=self.density * self.head_density_ratio, friction=fr))
        b.add_site(S.SiteSpec(f"{self.naming_prefix}handle_site", pos=(0, 0, 0), size=(0.005,), rgba=(1, 0, 0, 0)))
        return b

    @property
    def handle_geoms(self):
        return [f"{self.naming_prefix}handle"]

    @property
    def important_sites(self):
        return {"handle": f"{self.naming_prefix}handle_site"}

    @property
    def bottom_offset(self):
        return np.array([0, 0, -self.head_half[0]])

    @property
    def top_offset(self):
        return np.array([0, 0, self.head_half[0]])

    @property
    def horizontal_radius(self):
        return self.handle_length / 2 + 0.12
