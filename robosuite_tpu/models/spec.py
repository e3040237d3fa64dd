"""Model specification: the mutable builder layer.

TPU-native replacement for the reference's MJCF/ElementTree modeling API
(/root/reference/robosuite/models/base.py:19-264 and utils/mjcf_utils.py).
Instead of merging XML trees and letting the MuJoCo C compiler produce a
model, we build a Python specification tree (bodies / joints / geoms / sites /
actuators) and compile it ourselves into a frozen array pytree
(robosuite_tpu.models.model.Model) consumed by the JAX physics core.

Composition semantics mirror the reference: robot + gripper + base + arena +
objects are merged with name prefixes (reference models/base.py:83-123,
robot_model.py:130-300), but as tree grafting instead of XML surgery.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

# Joint type codes (MuJoCo enum order)
FREE, BALL, SLIDE, HINGE = 0, 1, 2, 3
JOINT_TYPES = {"free": FREE, "ball": BALL, "slide": SLIDE, "hinge": HINGE}
JOINT_NQ = {FREE: 7, BALL: 4, SLIDE: 1, HINGE: 1}
JOINT_NV = {FREE: 6, BALL: 3, SLIDE: 1, HINGE: 1}

# Geom type codes (MuJoCo enum order)
PLANE, HFIELD, SPHERE, CAPSULE, ELLIPSOID, CYLINDER, BOX, MESH = range(8)
GEOM_TYPES = {
    "plane": PLANE,
    "hfield": HFIELD,
    "sphere": SPHERE,
    "capsule": CAPSULE,
    "ellipsoid": ELLIPSOID,
    "cylinder": CYLINDER,
    "box": BOX,
    "mesh": MESH,
}


def _arr(x, n, default=None):
    if x is None:
        x = default
    a = np.asarray(x, dtype=np.float64).reshape(-1)
    if a.shape[0] == 1 and n > 1:
        a = np.repeat(a, n)
    assert a.shape[0] == n, f"expected length {n}, got {a.shape}"
    return a


def _quat(q):
    q = _arr(q, 4, default=(1.0, 0.0, 0.0, 0.0))
    n = np.linalg.norm(q)
    return q / (n if n > 0 else 1.0)


@dataclass
class JointSpec:
    """One joint. Mirrors MJCF <joint> attributes the reference stack uses."""

    name: str
    type: str = "hinge"
    pos: Sequence[float] = (0.0, 0.0, 0.0)
    axis: Sequence[float] = (0.0, 0.0, 1.0)
    range: Optional[Sequence[float]] = None
    limited: Optional[bool] = None
    damping: float = 0.0
    armature: float = 0.0
    frictionloss: float = 0.0
    stiffness: float = 0.0
    springref: float = 0.0
    ref: float = 0.0

    def __post_init__(self):
        assert self.type in JOINT_TYPES, self.type
        self.pos = _arr(self.pos, 3)
        axis = _arr(self.axis, 3)
        n = np.linalg.norm(axis)
        self.axis = axis / (n if n > 0 else 1.0)
        if self.limited is None:
            self.limited = self.range is not None
        if self.range is not None:
            self.range = _arr(self.range, 2)

    @property
    def nq(self):
        return JOINT_NQ[JOINT_TYPES[self.type]]

    @property
    def nv(self):
        return JOINT_NV[JOINT_TYPES[self.type]]


@dataclass
class GeomSpec:
    """One geom. size semantics follow MJCF per geom type."""

    name: str
    type: str = "sphere"
    size: Sequence[float] = (0.01, 0.0, 0.0)
    pos: Sequence[float] = (0.0, 0.0, 0.0)
    quat: Sequence[float] = (1.0, 0.0, 0.0, 0.0)
    friction: Sequence[float] = (1.0, 0.005, 0.0001)
    solref: Sequence[float] = (0.02, 1.0)
    solimp: Sequence[float] = (0.9, 0.95, 0.001, 0.5, 2.0)
    contype: int = 1
    conaffinity: int = 1
    condim: int = 3
    group: int = 0
    priority: int = 0
    mass: Optional[float] = None
    density: float = 1000.0
    margin: float = 0.0
    rgba: Sequence[float] = (0.5, 0.5, 0.5, 1.0)
    mesh: Optional[str] = None  # mesh asset name, informational in round 1

    # fromto convenience (capsules/cylinders); if set, overrides pos/quat
    fromto: Optional[Sequence[float]] = None

    def __post_init__(self):
        assert self.type in GEOM_TYPES, self.type
        sz = np.zeros(3)
        s = np.asarray(self.size, dtype=np.float64).reshape(-1)
        sz[: s.shape[0]] = s
        self.size = sz
        if self.fromto is not None:
            ft = _arr(self.fromto, 6)
            a, b = ft[:3], ft[3:]
            mid = 0.5 * (a + b)
            d = b - a
            L = np.linalg.norm(d)
            self.pos = mid
            self.quat = _z_align_quat(d / max(L, 1e-12))
            self.size = np.array([self.size[0], 0.5 * L, 0.0])
        else:
            self.pos = _arr(self.pos, 3)
            self.quat = _quat(self.quat)
        self.friction = _arr(self.friction, 3, default=(1.0, 0.005, 0.0001))
        self.solref = _arr(self.solref, 2, default=(0.02, 1.0))
        self.solimp = _arr(self.solimp, 5, default=(0.9, 0.95, 0.001, 0.5, 2.0))
        self.rgba = _arr(self.rgba, 4, default=(0.5, 0.5, 0.5, 1.0))


def _z_align_quat(z):
    """Quaternion (wxyz) rotating +z onto unit vector z."""
    z0 = np.array([0.0, 0.0, 1.0])
    c = float(np.dot(z0, z))
    if c > 1 - 1e-12:
        return np.array([1.0, 0.0, 0.0, 0.0])
    if c < -1 + 1e-12:
        return np.array([0.0, 1.0, 0.0, 0.0])
    axis = np.cross(z0, z)
    axis = axis / np.linalg.norm(axis)
    half = 0.5 * np.arccos(np.clip(c, -1, 1))
    return np.array([np.cos(half), *(np.sin(half) * axis)])


@dataclass
class SiteSpec:
    name: str
    pos: Sequence[float] = (0.0, 0.0, 0.0)
    quat: Sequence[float] = (1.0, 0.0, 0.0, 0.0)
    size: Sequence[float] = (0.005, 0.0, 0.0)
    type: str = "sphere"
    group: int = 0
    rgba: Sequence[float] = (0.5, 0.5, 0.5, 1.0)

    def __post_init__(self):
        self.pos = _arr(self.pos, 3)
        self.quat = _quat(self.quat)
        sz = np.zeros(3)
        s = np.asarray(self.size, dtype=np.float64).reshape(-1)
        sz[: s.shape[0]] = s
        self.size = sz
        self.rgba = _arr(self.rgba, 4)


@dataclass
class CameraSpec:
    name: str
    pos: Sequence[float] = (0.0, 0.0, 0.0)
    quat: Sequence[float] = (1.0, 0.0, 0.0, 0.0)
    fovy: float = 45.0
    mode: str = "fixed"

    def __post_init__(self):
        self.pos = _arr(self.pos, 3)
        self.quat = _quat(self.quat)


@dataclass
class LightSpec:
    """A scene light (MJCF <light>, reference arenas e.g.
    assets/arenas/table_arena.xml:41). Drives the raycast renderer's
    shading (renderers/raycast.py) and the USD export (utils/usd/)."""

    name: str = ""
    pos: Sequence[float] = (0.0, 0.0, 1.5)
    dir: Sequence[float] = (0.0, 0.0, -1.0)
    directional: bool = False
    diffuse: Sequence[float] = (0.7, 0.7, 0.7)
    specular: Sequence[float] = (0.3, 0.3, 0.3)
    ambient: Sequence[float] = (0.0, 0.0, 0.0)
    castshadow: bool = True
    active: bool = True

    def __post_init__(self):
        self.pos = _arr(self.pos, 3)
        d = _arr(self.dir, 3)
        n = float(np.linalg.norm(d))
        self.dir = d / n if n > 1e-12 else np.array([0.0, 0.0, -1.0])
        self.diffuse = _arr(self.diffuse, 3)
        self.specular = _arr(self.specular, 3)
        self.ambient = _arr(self.ambient, 3)


@dataclass
class InertialSpec:
    """Explicit body inertia. diaginertia in the inertial frame given by
    pos/quat; fullinertia is (ixx, iyy, izz, ixy, ixz, iyz) like MJCF."""

    mass: float
    pos: Sequence[float] = (0.0, 0.0, 0.0)
    quat: Sequence[float] = (1.0, 0.0, 0.0, 0.0)
    diaginertia: Optional[Sequence[float]] = None
    fullinertia: Optional[Sequence[float]] = None

    def __post_init__(self):
        self.pos = _arr(self.pos, 3)
        self.quat = _quat(self.quat)
        if self.diaginertia is not None:
            self.diaginertia = _arr(self.diaginertia, 3)
        if self.fullinertia is not None:
            self.fullinertia = _arr(self.fullinertia, 6)


@dataclass
class BodySpec:
    """A body in the kinematic tree."""

    name: str
    pos: Sequence[float] = (0.0, 0.0, 0.0)
    quat: Sequence[float] = (1.0, 0.0, 0.0, 0.0)
    inertial: Optional[InertialSpec] = None
    joints: List[JointSpec] = field(default_factory=list)
    geoms: List[GeomSpec] = field(default_factory=list)
    sites: List[SiteSpec] = field(default_factory=list)
    cameras: List[CameraSpec] = field(default_factory=list)
    lights: List[LightSpec] = field(default_factory=list)
    children: List["BodySpec"] = field(default_factory=list)

    def __post_init__(self):
        self.pos = _arr(self.pos, 3)
        self.quat = _quat(self.quat)

    # -- construction helpers ------------------------------------------------
    def add_body(self, body: "BodySpec") -> "BodySpec":
        self.children.append(body)
        return body

    def add_joint(self, joint: JointSpec) -> JointSpec:
        self.joints.append(joint)
        return joint

    def add_geom(self, geom: GeomSpec) -> GeomSpec:
        self.geoms.append(geom)
        return geom

    def add_site(self, site: SiteSpec) -> SiteSpec:
        self.sites.append(site)
        return site

    def add_camera(self, cam: CameraSpec) -> CameraSpec:
        self.cameras.append(cam)
        return cam

    def add_light(self, light: LightSpec) -> LightSpec:
        self.lights.append(light)
        return light

    # -- traversal -----------------------------------------------------------
    def walk(self):
        """Depth-first traversal yielding every body below (and including) self."""
        yield self
        for c in self.children:
            yield from c.walk()

    def find_body(self, name: str) -> Optional["BodySpec"]:
        for b in self.walk():
            if b.name == name:
                return b
        return None

    def apply_prefix(self, prefix: str, exclude=()):
        """Prefix every named element in the subtree (reference
        models/base.py:274 correct_naming / mjcf_utils.py:536 add_prefix)."""
        for b in self.walk():
            if b.name not in exclude:
                b.name = prefix + b.name
            for j in b.joints:
                j.name = prefix + j.name
            for g in b.geoms:
                g.name = prefix + g.name
            for s in b.sites:
                s.name = prefix + s.name
            for c in b.cameras:
                c.name = prefix + c.name
            for lt in b.lights:
                if lt.name:
                    lt.name = prefix + lt.name
        return self


@dataclass
class TendonSpec:
    """Fixed tendon: length = sum(coef_i * qpos_i) over scalar joints.

    Mirrors MJCF <tendon><fixed> as used by the reference's coupled
    grippers (robotiq_gripper_85/140/s, jaco_three_finger, xarm7:
    /root/reference/robosuite/models/assets/grippers/*.xml). Spatial
    tendons (site-routed) are not used by any reference asset.
    """

    name: str
    joints: Sequence[str] = ()
    coefs: Sequence[float] = ()
    range: Optional[Sequence[float]] = None
    limited: Optional[bool] = None
    stiffness: float = 0.0
    springlength: Optional[float] = None  # None -> rest length at qpos0
    frictionloss: float = 0.0
    damping: float = 0.0

    def __post_init__(self):
        assert len(self.joints) == len(self.coefs)
        self.joints = list(self.joints)
        self.coefs = [float(c) for c in self.coefs]
        if self.limited is None:
            self.limited = self.range is not None
        if self.range is not None:
            self.range = _arr(self.range, 2)


@dataclass
class ActuatorSpec:
    """Actuator: motor / position / velocity / general, with joint or
    fixed-tendon transmission.

    Covers the actuator types used across the reference's robots and
    grippers (<motor>, <position kp=...>, <velocity kv=...>, and the
    xarm7 gripper's <general biastype="affine" tendon="split">).
    `general` force law: gainprm*ctrl + biasprm[0] + biasprm[1]*length +
    biasprm[2]*velocity (MuJoCo fixed-gain + affine bias).
    """

    name: str
    joint: Optional[str] = None
    kind: str = "motor"  # motor | position | velocity | general
    gear: float = 1.0
    ctrlrange: Optional[Sequence[float]] = None
    forcerange: Optional[Sequence[float]] = None
    kp: float = 1.0
    kv: float = 0.0
    tendon: Optional[str] = None
    gainprm: float = 1.0                       # general only
    biasprm: Sequence[float] = (0.0, 0.0, 0.0)  # general only

    def __post_init__(self):
        assert self.kind in ("motor", "position", "velocity", "general"), self.kind
        assert (self.joint is None) != (self.tendon is None), (
            f"actuator {self.name}: exactly one of joint/tendon required"
        )
        if self.ctrlrange is not None:
            self.ctrlrange = _arr(self.ctrlrange, 2)
        if self.forcerange is not None:
            self.forcerange = _arr(self.forcerange, 2)
        self.biasprm = _arr(self.biasprm, 3, default=(0.0, 0.0, 0.0))


@dataclass
class OptionSpec:
    """World-level physics options (reference models/assets/base.xml:3-5)."""

    timestep: float = 0.002
    gravity: Sequence[float] = (0.0, 0.0, -9.81)
    impratio: float = 20.0
    density: float = 1.2
    viscosity: float = 0.00002
    integrator: str = "semi_implicit"

    def __post_init__(self):
        self.gravity = _arr(self.gravity, 3)


@dataclass
class ExcludeSpec:
    """Contact exclusion pair (MJCF <contact><exclude>)."""

    body1: str
    body2: str


@dataclass
class EqualitySpec:
    """Equality constraint (MJCF <equality>): connect | joint | weld | tendon.

    connect: holds a point (anchor, body1-frame) coincident across bodies.
    joint: couples joint1 to polycoef(joint2).
    tendon: couples tendon1's length to polycoef(tendon2's length); with no
    tendon2, pins tendon1's length to polycoef[0] (the coupled-gripper
    pattern, e.g. robotiq_gripper_s.xml <equality><tendon .../>).
    """

    kind: str                      # connect | joint | weld | tendon
    body1: Optional[str] = None
    body2: Optional[str] = None
    joint1: Optional[str] = None
    joint2: Optional[str] = None
    tendon1: Optional[str] = None
    tendon2: Optional[str] = None
    anchor: Sequence[float] = (0.0, 0.0, 0.0)
    polycoef: Sequence[float] = (0.0, 1.0, 0.0, 0.0, 0.0)
    solref: Sequence[float] = (0.02, 1.0)

    def __post_init__(self):
        assert self.kind in ("connect", "joint", "weld", "tendon"), self.kind
        self.anchor = _arr(self.anchor, 3)
        self.polycoef = _arr(self.polycoef, 5)
        self.solref = _arr(self.solref, 2)


class ModelSpec:
    """Root of a model specification: worldbody tree + actuators + options.

    The merge-with-prefix composition replaces the reference's XML merging
    (models/base.py:83-123). `compile()` lives in models/model.py.
    """

    def __init__(self, name: str = "model", option: Optional[OptionSpec] = None):
        self.name = name
        self.option = option or OptionSpec()
        self.worldbody = BodySpec(name="world")
        self.actuators: List[ActuatorSpec] = []
        self.excludes: List[ExcludeSpec] = []
        self.equalities: List[EqualitySpec] = []
        self.tendons: List[TendonSpec] = []
        # convex-hull collision data for mesh geoms, keyed by mesh name:
        # {"verts": (V,3), "face_normals": (F,3), "face_dists": (F,),
        #  "volume": float, "com": (3,), "inertia": (3,3)} (see
        #  tools/extract_meshes.py). A mesh geom with no hull entry is
        #  visual-only (robot link shells stay primitive).
        self.meshes: Dict[str, dict] = {}

    # -- composition ---------------------------------------------------------
    def add_actuator(self, act: ActuatorSpec) -> ActuatorSpec:
        self.actuators.append(act)
        return act

    def merge(self, other: "ModelSpec", prefix: str = "", parent: Optional[str] = None):
        """Graft `other`'s worldbody children under `parent` (default: our
        worldbody), applying `prefix` to all names; append its actuators.

        Mirrors reference MujocoXML.merge (models/base.py:83-123).
        """
        attach_to = self.worldbody if parent is None else self.worldbody.find_body(parent)
        assert attach_to is not None, f"merge: parent body {parent!r} not found"
        for child in other.worldbody.children:
            if prefix:
                child.apply_prefix(prefix)
            attach_to.children.append(child)
        for act in other.actuators:
            if prefix:
                act = dataclasses.replace(
                    act,
                    name=prefix + act.name,
                    joint=prefix + act.joint if act.joint else None,
                    tendon=prefix + act.tendon if act.tendon else None,
                )
            self.actuators.append(act)
        for ten in other.tendons:
            if prefix:
                ten = dataclasses.replace(
                    ten, name=prefix + ten.name, joints=[prefix + j for j in ten.joints]
                )
            self.tendons.append(ten)
        self.meshes.update(other.meshes)
        for ex in other.excludes:
            if prefix:
                ex = ExcludeSpec(prefix + ex.body1, prefix + ex.body2)
            self.excludes.append(ex)
        for eq in other.equalities:
            if prefix:
                eq = dataclasses.replace(
                    eq,
                    body1=prefix + eq.body1 if eq.body1 else None,
                    body2=prefix + eq.body2 if eq.body2 else None,
                    joint1=prefix + eq.joint1 if eq.joint1 else None,
                    joint2=prefix + eq.joint2 if eq.joint2 else None,
                    tendon1=prefix + eq.tendon1 if eq.tendon1 else None,
                    tendon2=prefix + eq.tendon2 if eq.tendon2 else None,
                )
            self.equalities.append(eq)
        return self

    def attach(self, parent_body: str, subtree: BodySpec, prefix: str = ""):
        """Attach a body subtree under a named body (used for gripper/base
        mounting — reference manipulator_model.py:64 add_gripper)."""
        p = self.worldbody.find_body(parent_body)
        assert p is not None, f"attach: body {parent_body!r} not found"
        if prefix:
            subtree.apply_prefix(prefix)
        p.children.append(subtree)
        return self

    # -- queries -------------------------------------------------------------
    def bodies(self) -> List[BodySpec]:
        return list(self.worldbody.walk())

    def find_body(self, name: str) -> Optional[BodySpec]:
        return self.worldbody.find_body(name)

    def joint_names(self) -> List[str]:
        return [j.name for b in self.bodies() for j in b.joints]

    def compile(self, dtype=np.float32, device=True):
        """Compile to a frozen Model pytree.

        device=True transfers the numeric leaves to the default device with
        ONE jax.device_put (no per-op compiles — critical on the axon TPU
        backend where each eager op round-trips a remote-compile tunnel;
        also avoids XLA constant-folding the whole model as literals, which
        inflates CPU compile times ~10x).
        """
        from robosuite_tpu.models.model import compile_spec

        model = compile_spec(self, dtype=dtype)
        if device:
            import jax

            model = jax.device_put(model)
        return model
