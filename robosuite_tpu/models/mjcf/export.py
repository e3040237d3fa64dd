"""ModelSpec -> MJCF XML export.

Used (a) as a user-facing interchange feature and (b) as the test bridge:
parity tests export the same spec to MuJoCo and compare physics quantities
field-for-field (the cross-engine analog of the reference's in-engine
playback test, tests/test_environments/test_action_playback.py:17-71).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from robosuite_tpu.models import spec as S


def _fmt(a):
    import numpy as np

    return " ".join(f"{float(x):.17g}" for x in np.asarray(a).reshape(-1))


def export_xml(ms: S.ModelSpec, exclude_visual=False) -> str:
    root = ET.Element("mujoco", model=ms.name)
    ET.SubElement(root, "compiler", angle="radian", inertiagrouprange="0 0", autolimits="true")
    opt = ms.option
    ET.SubElement(
        root,
        "option",
        timestep=f"{opt.timestep:.17g}",
        gravity=_fmt(opt.gravity),
        impratio=f"{opt.impratio:.17g}",
        density=f"{opt.density:.17g}",
        viscosity=f"{opt.viscosity:.17g}",
        cone="elliptic",
    )

    wb = ET.SubElement(root, "worldbody")
    used_meshes: set = set()

    def emit_body(parent_el, body: S.BodySpec, is_world=False):
        if is_world:
            el = parent_el
        else:
            el = ET.SubElement(parent_el, "body", name=body.name, pos=_fmt(body.pos), quat=_fmt(body.quat))
            if body.inertial is not None:
                it = body.inertial
                attrs = {"pos": _fmt(it.pos), "mass": f"{it.mass:.17g}"}
                if it.fullinertia is not None:
                    attrs["fullinertia"] = _fmt(it.fullinertia)
                else:
                    attrs["quat"] = _fmt(it.quat)
                    attrs["diaginertia"] = _fmt(
                        it.diaginertia if it.diaginertia is not None else [0, 0, 0]
                    )
                ET.SubElement(el, "inertial", **attrs)
            for j in body.joints:
                attrs = {
                    "name": j.name,
                    "type": j.type,
                    "damping": f"{j.damping:.17g}",
                    "armature": f"{j.armature:.17g}",
                    "frictionloss": f"{j.frictionloss:.17g}",
                    "stiffness": f"{j.stiffness:.17g}",
                }
                if j.type != "free":
                    attrs["pos"] = _fmt(j.pos)
                    attrs["axis"] = _fmt(j.axis)
                    attrs["springref"] = f"{j.springref:.17g}"
                    if j.type in ("hinge", "slide"):
                        attrs["ref"] = f"{j.ref:.17g}"
                if j.range is not None:
                    attrs["range"] = _fmt(j.range)
                    attrs["limited"] = "true"
                else:
                    attrs["limited"] = "false"
                ET.SubElement(el, "joint", **attrs)
        for g in body.geoms:
            if exclude_visual and g.contype == 0 and g.conaffinity == 0:
                continue
            attrs = {
                "name": g.name,
                "type": g.type,
                "pos": _fmt(g.pos),
                "quat": _fmt(g.quat),
                "friction": _fmt(g.friction),
                "solref": _fmt(g.solref),
                "solimp": _fmt(g.solimp),
                "contype": str(g.contype),
                "conaffinity": str(g.conaffinity),
                "condim": str(g.condim),
                "group": str(g.group),
                "priority": str(g.priority),
                "rgba": _fmt(g.rgba),
                "margin": f"{g.margin:.17g}",
            }
            sz = g.size
            ngeom_size = {"plane": 3, "sphere": 1, "capsule": 2, "cylinder": 2, "box": 3, "ellipsoid": 3}
            n = ngeom_size.get(g.type, 3)
            if g.type == "mesh":
                if g.mesh not in ms.meshes:
                    continue  # visual-only mesh shell: skip in physics export
                attrs["mesh"] = g.mesh
                used_meshes.add(g.mesh)
            elif g.type == "plane":
                attrs["size"] = _fmt([max(sz[0], 1.0), max(sz[1], 1.0), max(sz[2], 0.1)])
            else:
                attrs["size"] = _fmt(sz[:n])
            if g.mass is not None:
                attrs["mass"] = f"{g.mass:.17g}"
            else:
                attrs["density"] = f"{g.density:.17g}"
            ET.SubElement(el, "geom", **attrs)
        for s in body.sites:
            ET.SubElement(
                el,
                "site",
                name=s.name,
                pos=_fmt(s.pos),
                quat=_fmt(s.quat),
                size=_fmt([x if x > 0 else 0.001 for x in s.size[: {"sphere": 1, "cylinder": 2, "box": 3}.get(s.type, 1)]]),
                type=s.type,
                group=str(s.group),
                rgba=_fmt(s.rgba),
            )
        for c in body.cameras:
            ET.SubElement(el, "camera", name=c.name, pos=_fmt(c.pos), quat=_fmt(c.quat), fovy=f"{c.fovy:.17g}", mode=c.mode)
        for lt in body.lights:
            attrs = dict(
                pos=_fmt(lt.pos), dir=_fmt(lt.dir),
                directional="true" if lt.directional else "false",
                diffuse=_fmt(lt.diffuse), specular=_fmt(lt.specular),
                ambient=_fmt(lt.ambient),
                castshadow="true" if lt.castshadow else "false",
                active="true" if lt.active else "false",
            )
            if lt.name:
                attrs["name"] = lt.name
            ET.SubElement(el, "light", **attrs)
        for child in body.children:
            emit_body(el, child)

    emit_body(wb, ms.worldbody, is_world=True)

    if used_meshes:
        asset_el = ET.SubElement(root, "asset")
        for mname in sorted(used_meshes):
            verts = ms.meshes[mname]["verts"]
            ET.SubElement(
                asset_el, "mesh", name=mname,
                vertex=" ".join(f"{float(v):.9g}" for row in verts for v in row),
            )

    if ms.tendons:
        ten_el = ET.SubElement(root, "tendon")
        for t in ms.tendons:
            attrs = {"name": t.name}
            if t.range is not None:
                attrs["range"] = _fmt(t.range)
                attrs["limited"] = "true"
            if t.stiffness:
                attrs["stiffness"] = f"{t.stiffness:.17g}"
            if t.springlength is not None:
                attrs["springlength"] = f"{t.springlength:.17g}"
            if t.frictionloss:
                attrs["frictionloss"] = f"{t.frictionloss:.17g}"
            if t.damping:
                attrs["damping"] = f"{t.damping:.17g}"
            f_el = ET.SubElement(ten_el, "fixed", **attrs)
            for jname, coef in zip(t.joints, t.coefs):
                ET.SubElement(f_el, "joint", joint=jname, coef=f"{coef:.17g}")

    if ms.actuators:
        act_el = ET.SubElement(root, "actuator")
        for a in ms.actuators:
            attrs = {"name": a.name, "gear": f"{a.gear:.17g}"}
            if a.joint is not None:
                attrs["joint"] = a.joint
            else:
                attrs["tendon"] = a.tendon
            if a.ctrlrange is not None:
                attrs["ctrlrange"] = _fmt(a.ctrlrange)
                attrs["ctrllimited"] = "true"
            if a.forcerange is not None:
                attrs["forcerange"] = _fmt(a.forcerange)
                attrs["forcelimited"] = "true"
            if a.kind == "motor":
                ET.SubElement(act_el, "motor", **attrs)
            elif a.kind == "position":
                attrs["kp"] = f"{a.kp:.17g}"
                ET.SubElement(act_el, "position", **attrs)
            elif a.kind == "general":
                attrs["gainprm"] = f"{a.gainprm:.17g}"
                import numpy as _np

                if _np.any(_np.asarray(a.biasprm) != 0):
                    attrs["biastype"] = "affine"
                    attrs["biasprm"] = _fmt(a.biasprm)
                ET.SubElement(act_el, "general", **attrs)
            else:
                attrs["kv"] = f"{a.kv:.17g}"
                ET.SubElement(act_el, "velocity", **attrs)

    if ms.excludes:
        con_el = ET.SubElement(root, "contact")
        for ex in ms.excludes:
            ET.SubElement(con_el, "exclude", body1=ex.body1, body2=ex.body2)

    if ms.equalities:
        eq_el = ET.SubElement(root, "equality")
        for e in ms.equalities:
            if e.kind == "connect":
                ET.SubElement(eq_el, "connect", body1=e.body1, body2=e.body2,
                              anchor=_fmt(e.anchor), solref=_fmt(e.solref))
            elif e.kind == "weld":
                ET.SubElement(eq_el, "weld", body1=e.body1, body2=e.body2,
                              solref=_fmt(e.solref))
            elif e.kind == "tendon":
                attrs = {"tendon1": e.tendon1, "polycoef": _fmt(e.polycoef),
                         "solref": _fmt(e.solref)}
                if e.tendon2:
                    attrs["tendon2"] = e.tendon2
                ET.SubElement(eq_el, "tendon", **attrs)
            else:
                attrs = {"joint1": e.joint1, "polycoef": _fmt(e.polycoef),
                         "solref": _fmt(e.solref)}
                if e.joint2:
                    attrs["joint2"] = e.joint2
                ET.SubElement(eq_el, "joint", **attrs)

    return ET.tostring(root, encoding="unicode")
