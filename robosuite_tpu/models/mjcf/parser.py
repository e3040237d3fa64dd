"""MJCF importer: XML -> ModelSpec.

Standalone MJCF front-end (no mujoco dependency) covering the subset the
reference's model zoo uses (robots/grippers/arenas/objects MJCF under
models/assets/): nested <default> classes, body trees, joints, primitive +
mesh geoms, sites, cameras, inertials, motor/position/velocity actuators,
contact excludes. Mesh *assets* are recorded by name only — collision uses
primitive shells (meshes don't collide in round 1).

Used by tools/extract_robot.py to produce the committed model cards, and
available to users for importing their own MJCF robots
(the analog of reference scripts/check_custom_robot_model.py).
"""

from __future__ import annotations

import math
import os
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional

import numpy as np

from robosuite_tpu.models import spec as S


def _parse_floats(s, n=None):
    v = np.array([float(x) for x in s.replace(",", " ").split()])
    if n is not None and v.shape[0] != n:
        raise ValueError(f"expected {n} floats, got {s!r}")
    return v


def _euler2quat(euler, seq="xyz", degrees=False):
    if degrees:
        euler = np.radians(euler)
    q = np.array([1.0, 0.0, 0.0, 0.0])
    axes = {"x": np.array([1.0, 0, 0]), "y": np.array([0, 1.0, 0]), "z": np.array([0, 0, 1.0])}
    for ax_name, angle in zip(seq, euler):
        half = angle / 2.0
        qa = np.concatenate([[math.cos(half)], math.sin(half) * axes[ax_name]])
        q = _quat_mul(q, qa)  # extrinsic xyz: post-multiply in moving frame order
    return q


def _quat_mul(u, v):
    w0, x0, y0, z0 = u
    w1, x1, y1, z1 = v
    return np.array(
        [
            w0 * w1 - x0 * x1 - y0 * y1 - z0 * z1,
            w0 * x1 + x0 * w1 + y0 * z1 - z0 * y1,
            w0 * y1 - x0 * z1 + y0 * w1 + z0 * x1,
            w0 * z1 + x0 * y1 - y0 * x1 + z0 * w1,
        ]
    )


def _mat2quat(m):
    tr = np.trace(m)
    if tr > 0:
        s = math.sqrt(tr + 1.0) * 2
        q = np.array([0.25 * s, (m[2, 1] - m[1, 2]) / s, (m[0, 2] - m[2, 0]) / s, (m[1, 0] - m[0, 1]) / s])
    else:
        i = int(np.argmax(np.diag(m)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = math.sqrt(max(m[i, i] - m[j, j] - m[k, k] + 1.0, 1e-12)) * 2
        q = np.zeros(4)
        q[0] = (m[k, j] - m[j, k]) / s
        q[1 + i] = 0.25 * s
        q[1 + j] = (m[j, i] + m[i, j]) / s
        q[1 + k] = (m[k, i] + m[i, k]) / s
    return q / np.linalg.norm(q)


class _Compiler:
    def __init__(self):
        self.degrees = True  # MJCF default angle="degree"
        self.eulerseq = "xyz"


def _orientation(el, comp: _Compiler):
    """Resolve MJCF orientation attributes to a wxyz quaternion."""
    if "quat" in el.attrib:
        q = _parse_floats(el.get("quat"), 4)
        return q / np.linalg.norm(q)
    if "euler" in el.attrib:
        return _euler2quat(_parse_floats(el.get("euler"), 3), comp.eulerseq, comp.degrees)
    if "axisangle" in el.attrib:
        aa = _parse_floats(el.get("axisangle"))
        axis, angle = aa[:3], aa[3]
        if comp.degrees:
            angle = math.radians(angle)
        axis = axis / np.linalg.norm(axis)
        return np.concatenate([[math.cos(angle / 2)], math.sin(angle / 2) * axis])
    if "xyaxes" in el.attrib:
        xy = _parse_floats(el.get("xyaxes"), 6)
        x = xy[:3] / np.linalg.norm(xy[:3])
        y = xy[3:] - x * np.dot(x, xy[3:])
        y = y / np.linalg.norm(y)
        z = np.cross(x, y)
        return _mat2quat(np.stack([x, y, z], axis=1))
    if "zaxis" in el.attrib:
        return S._z_align_quat(_parse_floats(el.get("zaxis"), 3) / np.linalg.norm(_parse_floats(el.get("zaxis"), 3)))
    return np.array([1.0, 0.0, 0.0, 0.0])


class _Defaults:
    """Nested default classes: class name -> {tag -> {attr -> value}}."""

    def __init__(self):
        self.classes: Dict[str, Dict[str, Dict[str, str]]] = {"main": {}}

    def resolve(self, tag: str, el: ET.Element, cls: Optional[str]):
        merged: Dict[str, str] = {}
        chain = ["main"]
        if cls and cls != "main":
            chain.append(cls)
        for c in chain:
            merged.update(self.classes.get(c, {}).get(tag, {}))
        merged.update(el.attrib)
        return merged


def _parse_defaults(root: ET.Element) -> _Defaults:
    d = _Defaults()

    def walk(el, name, inherited):
        cur = {tag: dict(attrs) for tag, attrs in inherited.items()}
        for child in el:
            if child.tag == "default":
                continue
            cur.setdefault(child.tag, {}).update(child.attrib)
        d.classes[name] = cur
        for child in el:
            if child.tag == "default":
                walk(child, child.get("class", "main"), cur)

    for el in root.findall("default"):
        walk(el, el.get("class", "main"), {})
    return d


def parse_mjcf(path_or_string, name: Optional[str] = None) -> S.ModelSpec:
    _counter = {"n": 0}

    def _auto(prefix):
        _counter["n"] += 1
        return f"{prefix}{_counter['n']}"

    if os.path.exists(str(path_or_string)):
        tree = ET.parse(path_or_string)
        root = tree.getroot()
    else:
        root = ET.fromstring(path_or_string)

    comp = _Compiler()
    comp_el = root.find("compiler")
    if comp_el is not None:
        comp.degrees = comp_el.get("angle", "degree") == "degree"
        comp.eulerseq = comp_el.get("eulerseq", "xyz")

    defaults = _parse_defaults(root)

    opt = S.OptionSpec()
    opt_el = root.find("option")
    if opt_el is not None:
        if "timestep" in opt_el.attrib:
            opt.timestep = float(opt_el.get("timestep"))
        if "gravity" in opt_el.attrib:
            opt.gravity = _parse_floats(opt_el.get("gravity"), 3)
        if "impratio" in opt_el.attrib:
            opt.impratio = float(opt_el.get("impratio"))
        if "density" in opt_el.attrib:
            opt.density = float(opt_el.get("density"))
        if "viscosity" in opt_el.attrib:
            opt.viscosity = float(opt_el.get("viscosity"))

    ms = S.ModelSpec(root.get("model", name or "mjcf"), opt)

    def attr(a, el_attrs, default=None):
        return el_attrs.get(a, default)

    def parse_light(el, cls=None):
        # MuJoCo <light> pos default is "0 0 0"; attrs go through the
        # defaults-class chain like geoms (a <default><light/></default>
        # block applies to lights of that class)
        a = defaults.resolve("light", el, cls if cls is not None else el.get("class"))
        return S.LightSpec(
            name=a.get("name", ""),
            pos=_parse_floats(a.get("pos", "0 0 0"), 3),
            dir=_parse_floats(a.get("dir", "0 0 -1"), 3),
            directional=a.get("directional", "false") == "true",
            diffuse=_parse_floats(a.get("diffuse", "0.7 0.7 0.7"), 3),
            specular=_parse_floats(a.get("specular", "0.3 0.3 0.3"), 3),
            ambient=_parse_floats(a.get("ambient", "0 0 0"), 3),
            castshadow=a.get("castshadow", "true") == "true",
            active=a.get("active", "true") == "true",
        )

    def parse_geom(el, cls) -> S.GeomSpec:
        a = defaults.resolve("geom", el, cls)
        gtype = a.get("type", "sphere")
        kw = dict(
            name=a.get("name") or _auto("geom"),
            type=gtype if gtype in S.GEOM_TYPES else "sphere",
        )
        if "size" in a:
            kw["size"] = _parse_floats(a["size"])
        if "pos" in a:
            kw["pos"] = _parse_floats(a["pos"], 3)
        kw["quat"] = _orientation(ET.Element("x", {k: v for k, v in a.items() if k in ("quat", "euler", "axisangle", "xyaxes", "zaxis")}), comp)
        if "fromto" in a:
            kw["fromto"] = _parse_floats(a["fromto"], 6)
        for f, n in (("friction", None), ("solref", 2), ("solimp", None), ("rgba", 4)):
            if f in a:
                v = _parse_floats(a[f])
                if f == "friction":
                    fr = np.array([1.0, 0.005, 0.0001])
                    fr[: v.shape[0]] = v
                    v = fr
                if f == "solimp":
                    si = np.array([0.9, 0.95, 0.001, 0.5, 2.0])
                    si[: v.shape[0]] = v
                    v = si
                kw[f] = v
        for f in ("contype", "conaffinity", "condim", "group", "priority"):
            if f in a:
                kw[f] = int(a[f])
        if "mass" in a:
            kw["mass"] = float(a["mass"])
        if "density" in a:
            kw["density"] = float(a["density"])
        if "margin" in a:
            kw["margin"] = float(a["margin"])
        if "mesh" in a:
            kw["mesh"] = a["mesh"]
            kw["type"] = "mesh"
        return S.GeomSpec(**kw)

    def parse_joint(el, cls) -> S.JointSpec:
        a = defaults.resolve("joint", el, cls)
        kw = dict(name=a.get("name") or _auto("joint"), type=a.get("type", "hinge"))
        if "pos" in a:
            kw["pos"] = _parse_floats(a["pos"], 3)
        if "axis" in a:
            kw["axis"] = _parse_floats(a["axis"], 3)
        if "range" in a and a.get("limited", "true" if "range" in a else "false") != "false":
            rng = _parse_floats(a["range"], 2)
            if comp.degrees and kw["type"] in ("hinge", "ball"):
                rng = np.radians(rng)
            kw["range"] = rng
        for f in ("damping", "armature", "frictionloss", "stiffness", "springref", "ref"):
            if f in a:
                val = float(a[f])
                if comp.degrees and f in ("springref", "ref") and kw["type"] == "hinge":
                    val = math.radians(val)
                kw[f] = val
        return S.JointSpec(**kw)

    def parse_site(el, cls) -> S.SiteSpec:
        a = defaults.resolve("site", el, cls)
        kw = dict(name=a.get("name") or _auto("site"))
        if "pos" in a:
            kw["pos"] = _parse_floats(a["pos"], 3)
        kw["quat"] = _orientation(ET.Element("x", {k: v for k, v in a.items() if k in ("quat", "euler", "axisangle", "xyaxes", "zaxis")}), comp)
        if "size" in a:
            kw["size"] = _parse_floats(a["size"])
        if "type" in a:
            kw["type"] = a["type"]
        if "group" in a:
            kw["group"] = int(a["group"])
        if "rgba" in a:
            kw["rgba"] = _parse_floats(a["rgba"], 4)
        return S.SiteSpec(**kw)

    def parse_body(el, parent: S.BodySpec, childclass: Optional[str]):
        cls = el.get("childclass", childclass)
        b = S.BodySpec(
            name=el.get("name") or _auto("body"),
            pos=_parse_floats(el.get("pos", "0 0 0"), 3),
            quat=_orientation(el, comp),
        )
        parent.children.append(b)
        for child in el:
            if child.tag == "inertial":
                kw = dict(mass=float(child.get("mass")))
                if "pos" in child.attrib:
                    kw["pos"] = _parse_floats(child.get("pos"), 3)
                kw["quat"] = _orientation(child, comp)
                if "diaginertia" in child.attrib:
                    kw["diaginertia"] = _parse_floats(child.get("diaginertia"), 3)
                if "fullinertia" in child.attrib:
                    kw["fullinertia"] = _parse_floats(child.get("fullinertia"), 6)
                    kw.pop("quat", None)
                b.inertial = S.InertialSpec(**kw)
            elif child.tag == "joint":
                b.joints.append(parse_joint(child, child.get("class", cls)))
            elif child.tag == "freejoint":
                b.joints.append(S.JointSpec(name=child.get("name", b.name + "_free"), type="free"))
            elif child.tag == "geom":
                b.geoms.append(parse_geom(child, child.get("class", cls)))
            elif child.tag == "site":
                b.sites.append(parse_site(child, child.get("class", cls)))
            elif child.tag == "camera":
                b.cameras.append(
                    S.CameraSpec(
                        name=child.get("name") or _auto("cam"),
                        pos=_parse_floats(child.get("pos", "0 0 0"), 3),
                        quat=_orientation(child, comp),
                        fovy=float(child.get("fovy", "45")),
                        mode=child.get("mode", "fixed"),
                    )
                )
            elif child.tag == "light":
                b.lights.append(parse_light(child, child.get("class", cls)))
            elif child.tag == "body":
                parse_body(child, b, cls)

    wb = root.find("worldbody")
    if wb is not None:
        for child in wb:
            if child.tag == "body":
                parse_body(child, ms.worldbody, None)
            elif child.tag == "geom":
                ms.worldbody.geoms.append(parse_geom(child, child.get("class")))
            elif child.tag == "site":
                ms.worldbody.sites.append(parse_site(child, child.get("class")))
            elif child.tag == "camera":
                ms.worldbody.cameras.append(
                    S.CameraSpec(
                        name=child.get("name") or _auto("cam"),
                        pos=_parse_floats(child.get("pos", "0 0 0"), 3),
                        quat=_orientation(child, comp),
                        fovy=float(child.get("fovy", "45")),
                        mode=child.get("mode", "fixed"),
                    )
                )
            elif child.tag == "light":
                ms.worldbody.lights.append(parse_light(child))

    ten_el = root.find("tendon")
    if ten_el is not None:
        for t_el in ten_el.findall("fixed"):
            a = defaults.resolve("tendon", t_el, t_el.get("class"))
            joints_coefs = [
                (j.get("joint"), float(j.get("coef", "1"))) for j in t_el.findall("joint")
            ]
            kw = dict(
                name=a.get("name") or _auto("tendon"),
                joints=[jc[0] for jc in joints_coefs],
                coefs=[jc[1] for jc in joints_coefs],
            )
            if "range" in a and a.get("limited", "true") != "false":
                kw["range"] = _parse_floats(a["range"], 2)
            for f in ("stiffness", "springlength", "frictionloss", "damping"):
                if f in a:
                    kw[f] = float(_parse_floats(a[f])[0])
            ms.tendons.append(S.TendonSpec(**kw))

    act_el = root.find("actuator")
    if act_el is not None:
        for a_el in act_el:
            a = defaults.resolve(a_el.tag, a_el, a_el.get("class"))
            if a_el.tag not in ("motor", "position", "velocity", "general"):
                continue
            kind = a_el.tag
            kw = dict(
                name=a.get("name") or _auto("act"),
                joint=a.get("joint"),
                tendon=a.get("tendon"),
                kind=kind,
            )
            if "gear" in a:
                kw["gear"] = float(_parse_floats(a["gear"])[0])
            if "ctrlrange" in a and a.get("ctrllimited", "true") != "false":
                kw["ctrlrange"] = _parse_floats(a["ctrlrange"], 2)
            if "forcerange" in a and a.get("forcelimited", "true") != "false":
                kw["forcerange"] = _parse_floats(a["forcerange"], 2)
            if "kp" in a:
                kw["kp"] = float(a["kp"])
            if "kv" in a:
                kw["kv"] = float(a["kv"])
            if kind == "general":
                # fixed gain + (affine) bias; MuJoCo defaults gain=1, bias=0
                kw["gainprm"] = float(_parse_floats(a["gainprm"])[0]) if "gainprm" in a else 1.0
                if a.get("biastype", "none") == "affine" and "biasprm" in a:
                    bp = _parse_floats(a["biasprm"])
                    kw["biasprm"] = np.pad(bp, (0, 3))[:3]
            ms.actuators.append(S.ActuatorSpec(**kw))

    con_el = root.find("contact")
    if con_el is not None:
        for ex in con_el.findall("exclude"):
            ms.excludes.append(S.ExcludeSpec(ex.get("body1"), ex.get("body2")))

    eq_el = root.find("equality")
    if eq_el is not None:
        for e in eq_el:
            if e.tag == "connect":
                ms.equalities.append(
                    S.EqualitySpec(
                        kind="connect", body1=e.get("body1"), body2=e.get("body2"),
                        anchor=_parse_floats(e.get("anchor", "0 0 0"), 3),
                        solref=_parse_floats(e.get("solref", "0.02 1"), 2),
                    )
                )
            elif e.tag == "joint":
                ms.equalities.append(
                    S.EqualitySpec(
                        kind="joint", joint1=e.get("joint1"), joint2=e.get("joint2"),
                        polycoef=np.pad(_parse_floats(e.get("polycoef", "0 1 0 0 0")), (0, 5))[:5],
                        solref=_parse_floats(e.get("solref", "0.02 1"), 2),
                    )
                )
            elif e.tag == "tendon":
                ms.equalities.append(
                    S.EqualitySpec(
                        kind="tendon", tendon1=e.get("tendon1"), tendon2=e.get("tendon2"),
                        polycoef=np.pad(_parse_floats(e.get("polycoef", "0 1 0 0 0")), (0, 5))[:5],
                        solref=_parse_floats(e.get("solref", "0.02 1"), 2),
                    )
                )
            elif e.tag == "weld":
                ms.equalities.append(
                    S.EqualitySpec(
                        kind="weld", body1=e.get("body1"), body2=e.get("body2"),
                        solref=_parse_floats(e.get("solref", "0.02 1"), 2),
                    )
                )

    return ms
