"""Task objects: procedural primitives + composite builders.

Reference models/objects/{objects.py, generated_objects.py, primitive/*}.
Naming follows the reference exactly: body "<name>_main", geoms "<name>_g0"
(+ "_g0_vis" visual duplicates), free joint "<name>_joint0", site
"<name>_default_site" (reference objects.py:117-247, fixture XML).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from robosuite_tpu.models import spec as S


class MujocoObject:
    """Base object: a spec subtree factory with robosuite's object contract
    (root body, bottom/top offsets, horizontal radius)."""

    def __init__(self, name: str, joints="default", obj_type="all", duplicate_collision_geoms=True):
        self.name = name
        self.joints = [dict(type="free")] if joints == "default" else (joints or [])
        self.obj_type = obj_type
        self.duplicate_collision_geoms = duplicate_collision_geoms
        self._root: Optional[S.BodySpec] = None

    @property
    def naming_prefix(self):
        return f"{self.name}_"

    @property
    def root_body(self):
        return self.naming_prefix + "main"

    @property
    def joint_names(self) -> List[str]:
        return [f"{self.naming_prefix}joint{i}" for i in range(len(self.joints))]

    @property
    def default_site(self):
        return self.naming_prefix + "default_site"

    def get_obj(self) -> S.BodySpec:
        if self._root is None:
            self._root = self._build()
        return self._root

    def _build(self) -> S.BodySpec:
        raise NotImplementedError

    def _make_root(self) -> S.BodySpec:
        b = S.BodySpec(self.root_body)
        for i, j in enumerate(self.joints):
            jd = dict(j)
            jd.setdefault("type", "free")
            b.add_joint(S.JointSpec(name=f"{self.naming_prefix}joint{i}", **jd))
        b.add_site(S.SiteSpec(self.default_site, size=(0.002,), rgba=(1, 0, 0, 0)))
        return b

    # robosuite object geometry contract (objects.py:155-190)
    @property
    def bottom_offset(self):
        raise NotImplementedError

    @property
    def top_offset(self):
        raise NotImplementedError

    @property
    def horizontal_radius(self):
        raise NotImplementedError

    @property
    def contact_geoms(self) -> List[str]:
        return [g.name for b in self.get_obj().walk() for g in b.geoms if g.contype or g.conaffinity]


class PrimitiveObject(MujocoObject):
    """reference generated_objects.py:603-760."""

    gtype = None
    n_size = 3

    def __init__(
        self,
        name,
        size=None,
        rgba=(1, 0, 0, 1),
        density=1000.0,
        friction=None,
        solref=(0.02, 1.0),
        solimp=(0.9, 0.95, 0.001, 0.5, 2.0),
        material=None,
        joints="default",
        obj_type="all",
        duplicate_collision_geoms=True,
        size_min=None,
        size_max=None,
        rng=None,
    ):
        super().__init__(name, joints=joints, obj_type=obj_type, duplicate_collision_geoms=duplicate_collision_geoms)
        if size is None:
            if size_min is not None and size_max is not None:
                rng = rng or np.random.default_rng()
                size = rng.uniform(np.asarray(size_min, dtype=np.float64), np.asarray(size_max, dtype=np.float64))
            else:
                size = [0.05, 0.05, 0.05][: self.n_size]
        self.size = np.asarray(size, dtype=np.float64).reshape(-1)[: self.n_size]
        self.rgba = rgba
        self.density = density
        self.friction = friction if friction is not None else (1.0, 0.005, 0.0001)
        self.solref = solref
        self.solimp = solimp
        self.material = material

    def _build(self):
        b = self._make_root()
        if self.obj_type in ("all", "collision"):
            b.add_geom(
                S.GeomSpec(
                    f"{self.naming_prefix}g0", type=self.gtype, size=self.size, density=self.density,
                    friction=self.friction, solref=self.solref, solimp=self.solimp, group=0, rgba=self.rgba,
                )
            )
        if self.obj_type in ("all", "visual") and self.duplicate_collision_geoms:
            b.add_geom(
                S.GeomSpec(
                    f"{self.naming_prefix}g0_vis", type=self.gtype, size=self.size, mass=0.0,
                    contype=0, conaffinity=0, group=1, rgba=self.rgba,
                )
            )
        return b


class BoxObject(PrimitiveObject):
    """reference objects/primitive/box.py."""

    gtype = "box"
    n_size = 3

    @property
    def bottom_offset(self):
        return np.array([0, 0, -self.size[2]])

    @property
    def top_offset(self):
        return np.array([0, 0, self.size[2]])

    @property
    def horizontal_radius(self):
        return float(np.linalg.norm(self.size[0:2], 2))


class CylinderObject(PrimitiveObject):
    """reference objects/primitive/cylinder.py (size = (r, half_length))."""

    gtype = "cylinder"
    n_size = 2

    @property
    def bottom_offset(self):
        return np.array([0, 0, -self.size[1]])

    @property
    def top_offset(self):
        return np.array([0, 0, self.size[1]])

    @property
    def horizontal_radius(self):
        return float(self.size[0])


class BallObject(PrimitiveObject):
    """reference objects/primitive/ball.py (size = (r,))."""

    gtype = "sphere"
    n_size = 1

    @property
    def bottom_offset(self):
        return np.array([0, 0, -self.size[0]])

    @property
    def top_offset(self):
        return np.array([0, 0, self.size[0]])

    @property
    def horizontal_radius(self):
        return float(self.size[0])


class CapsuleObject(PrimitiveObject):
    """reference objects/primitive/capsule.py (size = (r, half_length))."""

    gtype = "capsule"
    n_size = 2

    @property
    def bottom_offset(self):
        return np.array([0, 0, -self.size[0] - self.size[1]])

    @property
    def top_offset(self):
        return np.array([0, 0, self.size[0] + self.size[1]])

    @property
    def horizontal_radius(self):
        return float(self.size[0])


class CompositeBodyObject(MujocoObject):
    """Object composed of multiple child BODIES, each a MujocoObject (or a
    raw BodySpec builder), welded under one root at given offsets with
    optional extra joints per child — the generic machinery of reference
    generated_objects.py:19-292 (used there for Transport groups and
    articulated composites).

    Args:
        name: object name.
        objects: list of MujocoObject instances (their root bodies are
            re-parented under this object's root; their own free joints are
            dropped — this object's `joints` governs the whole assembly).
        object_locations: (n, 3) child body offsets.
        object_quats: optional (n, 4) wxyz child orientations.
        body_joints: optional dict child-index -> list of S.JointSpec to
            attach to that child (e.g. a hinge for an articulated part).
    """

    def __init__(self, name, objects, object_locations, object_quats=None,
                 body_joints=None, joints="default"):
        super().__init__(name, joints=joints)
        self._children = list(objects)
        self._locs = [np.asarray(p, dtype=np.float64) for p in object_locations]
        self._quats = object_quats or [(1, 0, 0, 0)] * len(self._children)
        self._body_joints = body_joints or {}

    def _build(self):
        root = self._make_root()
        for i, (child, pos, quat) in enumerate(zip(self._children, self._locs, self._quats)):
            body = child.get_obj() if isinstance(child, MujocoObject) else child()
            body.pos = tuple(pos)
            body.quat = tuple(quat)
            # the assembly moves as one object: child free joints drop
            body.joints = [j for j in body.joints if j.type != "free"]
            for j in self._body_joints.get(i, []):
                body.joints.append(j)
            root.children.append(body)
        return root

    @property
    def bottom_offset(self):
        los = []
        for child, pos in zip(self._children, self._locs):
            off = child.bottom_offset if isinstance(child, MujocoObject) else np.zeros(3)
            los.append(pos[2] + off[2])
        return np.array([0, 0, min(los) if los else 0.0])

    @property
    def top_offset(self):
        his = []
        for child, pos in zip(self._children, self._locs):
            off = child.top_offset if isinstance(child, MujocoObject) else np.zeros(3)
            his.append(pos[2] + off[2])
        return np.array([0, 0, max(his) if his else 0.0])


class CompositeBoxObject(MujocoObject):
    """Multi-geom single-body object (reference CompositeObject,
    generated_objects.py:293-600; despite the name it accepts any primitive
    geom type via geom_types — boxes are just the common case for the
    PotWithHandles/Hammer/bins re-derivations below)."""

    def __init__(self, name, geom_sizes, geom_locations, geom_quats=None, geom_names=None,
                 geom_types=None, density=1000.0, friction=(1, 0.005, 0.0001), rgba=(0.7, 0.7, 0.7, 1),
                 joints="default", total_size=None):
        super().__init__(name, joints=joints)
        self.geom_sizes = [np.asarray(s, dtype=np.float64) for s in geom_sizes]
        self.geom_locations = [np.asarray(p, dtype=np.float64) for p in geom_locations]
        self.geom_quats = geom_quats or [(1, 0, 0, 0)] * len(geom_sizes)
        self.geom_names_in = geom_names or [f"g{i}" for i in range(len(geom_sizes))]
        self.geom_types = geom_types or ["box"] * len(geom_sizes)
        self.density = density
        self.friction = friction
        self.rgba = rgba
        self._total_size = np.asarray(total_size) if total_size is not None else None

    def _build(self):
        b = self._make_root()
        for i, (sz, pos, quat, nm, gt) in enumerate(
            zip(self.geom_sizes, self.geom_locations, self.geom_quats, self.geom_names_in, self.geom_types)
        ):
            b.add_geom(
                S.GeomSpec(
                    f"{self.naming_prefix}{nm}", type=gt, size=sz, pos=pos, quat=quat,
                    density=self.density, friction=self.friction, group=0, rgba=self.rgba,
                )
            )
        return b

    @property
    def bottom_offset(self):
        # s[-1] is the half-height for boxes (3-vec) and cylinders (r, h)
        lo = min(p[2] - s[-1] for p, s in zip(self.geom_locations, self.geom_sizes))
        return np.array([0, 0, lo])

    @property
    def top_offset(self):
        hi = max(p[2] + s[-1] for p, s in zip(self.geom_locations, self.geom_sizes))
        return np.array([0, 0, hi])

    @property
    def horizontal_radius(self):
        if self._total_size is not None:
            return float(np.linalg.norm(self._total_size[:2]))
        return max(float(np.linalg.norm(p[:2]) + np.max(s[:2])) for p, s in zip(self.geom_locations, self.geom_sizes))


# reference naming: generated_objects.py CompositeObject == multi-geom
# single body; CompositeBodyObject == multi-body assembly
CompositeObject = CompositeBoxObject


# reusable composite library (reference models/objects/composite/*.py,
# composite_body/*.py) — importable from robosuite_tpu.models.objects
from robosuite_tpu.models.objects.composite_objects import (  # noqa: E402,F401
    BinObject,
    ConeObject,
    HammerObject,
    HingedBoxObject,
    HollowCylinderObject,
    HookFrame,
    LidObject,
    PotWithHandlesObject,
    RatchetingWrench,
    StandWithMount,
)
