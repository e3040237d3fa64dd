"""Extract robot/gripper/object model cards from reference MJCF assets.

Parses the reference's MJCF model files (physical constants: kinematics,
inertials, actuator ranges — public robot specifications) through
robosuite_tpu's own MJCF importer and emits JSON "model cards" under
robosuite_tpu/models/cards/. The cards are the committed source of truth for
the built-in robot models; this tool is only rerun when upgrading to a new
reference asset version.

Usage: python tools/extract_robot.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from robosuite_tpu.models import spec as S  # noqa: E402
from robosuite_tpu.models.mjcf.parser import parse_mjcf  # noqa: E402

REF_ASSETS = "/root/reference/robosuite/models/assets"
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "robosuite_tpu", "models", "cards")


def _clean(x):
    if isinstance(x, np.ndarray):
        return [round(float(v), 10) for v in x.reshape(-1)]
    if isinstance(x, (np.floating, float)):
        return round(float(x), 10)
    if isinstance(x, (np.integer, int)):
        return int(x)
    return x


def body_to_dict(b: S.BodySpec):
    d = {"name": b.name, "pos": _clean(b.pos), "quat": _clean(b.quat)}
    if b.inertial is not None:
        it = {"mass": _clean(b.inertial.mass), "pos": _clean(b.inertial.pos), "quat": _clean(b.inertial.quat)}
        if b.inertial.diaginertia is not None:
            it["diaginertia"] = _clean(b.inertial.diaginertia)
        if b.inertial.fullinertia is not None:
            it["fullinertia"] = _clean(b.inertial.fullinertia)
        d["inertial"] = it
    if b.joints:
        d["joints"] = [
            {
                "name": j.name, "type": j.type, "pos": _clean(j.pos), "axis": _clean(j.axis),
                "range": _clean(j.range) if j.range is not None else None,
                "damping": _clean(j.damping), "armature": _clean(j.armature),
                "frictionloss": _clean(j.frictionloss), "stiffness": _clean(j.stiffness),
                "ref": _clean(j.ref), "springref": _clean(j.springref),
            }
            for j in b.joints
        ]
    if b.geoms:
        d["geoms"] = [
            {
                "name": g.name, "type": g.type, "size": _clean(g.size), "pos": _clean(g.pos),
                "quat": _clean(g.quat), "friction": _clean(g.friction), "solref": _clean(g.solref),
                "solimp": _clean(g.solimp), "contype": g.contype, "conaffinity": g.conaffinity,
                "condim": g.condim, "group": g.group, "mass": _clean(g.mass) if g.mass is not None else None,
                "density": _clean(g.density), "mesh": g.mesh, "rgba": _clean(g.rgba),
            }
            for g in b.geoms
        ]
    if b.sites:
        d["sites"] = [
            {"name": s.name, "pos": _clean(s.pos), "quat": _clean(s.quat), "size": _clean(s.size),
             "type": s.type, "group": s.group, "rgba": _clean(s.rgba)}
            for s in b.sites
        ]
    if b.cameras:
        d["cameras"] = [
            {"name": c.name, "pos": _clean(c.pos), "quat": _clean(c.quat), "fovy": _clean(c.fovy), "mode": c.mode}
            for c in b.cameras
        ]
    if b.children:
        d["children"] = [body_to_dict(c) for c in b.children]
    return d


def spec_to_card(ms: S.ModelSpec):
    return {
        "name": ms.name,
        "bodies": [body_to_dict(b) for b in ms.worldbody.children],
        "world_geoms": [g.name for g in ms.worldbody.geoms],
        "actuators": [
            {
                "name": a.name, "joint": a.joint, "kind": a.kind, "gear": _clean(a.gear),
                "ctrlrange": _clean(a.ctrlrange) if a.ctrlrange is not None else None,
                "forcerange": _clean(a.forcerange) if a.forcerange is not None else None,
                "kp": _clean(a.kp), "kv": _clean(a.kv),
                "tendon": a.tendon, "gainprm": _clean(a.gainprm), "biasprm": _clean(a.biasprm),
            }
            for a in ms.actuators
        ],
        "excludes": [[e.body1, e.body2] for e in ms.excludes],
        "equalities": [
            {"kind": e.kind, "body1": e.body1, "body2": e.body2, "joint1": e.joint1,
             "joint2": e.joint2, "tendon1": e.tendon1, "tendon2": e.tendon2,
             "anchor": _clean(e.anchor), "polycoef": _clean(e.polycoef),
             "solref": _clean(e.solref)}
            for e in ms.equalities
        ],
        "tendons": [
            {"name": t.name, "joints": list(t.joints), "coefs": _clean(np.asarray(t.coefs)),
             "range": _clean(t.range) if t.range is not None else None,
             "limited": bool(t.limited), "stiffness": _clean(t.stiffness),
             "springlength": _clean(t.springlength) if t.springlength is not None else None,
             "frictionloss": _clean(t.frictionloss), "damping": _clean(t.damping)}
            for t in ms.tendons
        ],
    }


ROBOTS = {
    "panda": "robots/panda/robot.xml",
    "sawyer": "robots/sawyer/robot.xml",
    "ur5e": "robots/ur5e/robot.xml",
    "iiwa": "robots/iiwa/robot.xml",
    "jaco": "robots/jaco/robot.xml",
    "kinova3": "robots/kinova3/robot.xml",
    "baxter": "robots/baxter/robot.xml",
    "xarm7": "robots/xarm7/robot.xml",
    "gr1": "robots/gr1/robot.xml",
    "tiago": "robots/tiago/robot.xml",
    "spot": "robots/spot/robot.xml",
    "spot_arm": "robots/spot_arm/robot.xml",
}

GRIPPERS = {
    "panda_gripper": "grippers/panda_gripper.xml",
    "rethink_gripper": "grippers/rethink_gripper.xml",
    "robotiq_gripper_85": "grippers/robotiq_gripper_85.xml",
    "robotiq_gripper_140": "grippers/robotiq_gripper_140.xml",
    "wiping_gripper": "grippers/wiping_gripper.xml",
    "jaco_three_finger_gripper": "grippers/jaco_three_finger_gripper.xml",
    "robotiq_three_finger_gripper": "grippers/robotiq_gripper_s.xml",
    "null_gripper": "grippers/null_gripper.xml",
    "xarm7_gripper": "grippers/xarm7_gripper.xml",
    "suction_gripper": "grippers/suction_gripper.xml",
    "bd_gripper": "grippers/bd_gripper.xml",
    "inspire_left_hand": "grippers/inspire_left_hand.xml",
    "inspire_right_hand": "grippers/inspire_right_hand.xml",
    "fourier_left_hand": "grippers/fourier_left_hand.xml",
    "fourier_right_hand": "grippers/fourier_right_hand.xml",
}

OBJECTS = {
    "door": "objects/door.xml",
    "door_lock": "objects/door_lock.xml",
    "plate_with_hole": "objects/plate-with-hole.xml",
    "square_nut": "objects/square-nut.xml",
    "round_nut": "objects/round-nut.xml",
}

BASES = {
    "rethink_mount": "bases/rethink_mount.xml",
    "rethink_minimal_mount": "bases/rethink_minimal_mount.xml",
    "null_mount": "bases/null_mount.xml",
    "omron_mobile_base": "bases/omron_mobile_base.xml",
    "null_mobile_base": "bases/null_mobile_base.xml",
    "null_base": "bases/null_base.xml",
    "floating_legged_base": "bases/floating_legged_base.xml",
    "no_actuation_base": "bases/no_actuation_base.xml",
}


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    done, skipped = [], []
    for group, table in (("robots", ROBOTS), ("grippers", GRIPPERS), ("bases", BASES), ("objects", OBJECTS)):
        for name, rel in table.items():
            path = os.path.join(REF_ASSETS, rel)
            if not os.path.exists(path):
                skipped.append((name, "missing file"))
                continue
            try:
                # robosuite merges every asset under base.xml's
                # <compiler angle="radian"/> (models/assets/base.xml:3), so a
                # file with no compiler tag of its own is radians in the
                # merged world even though standalone MJCF would default to
                # degrees. Inject the tag to match the merge semantics.
                with open(path) as f:
                    xml = f.read()
                if "<compiler" not in xml:
                    xml = xml.replace("<mujoco", "<mujoco", 1)
                    idx = xml.index(">", xml.index("<mujoco")) + 1
                    xml = xml[:idx] + '<compiler angle="radian"/>' + xml[idx:]
                ms = parse_mjcf(xml, name=name)
                card = spec_to_card(ms)
                card["kind"] = group
                out = os.path.join(OUT_DIR, f"{name}.json")
                with open(out, "w") as f:
                    json.dump(card, f, indent=1)
                done.append(name)
            except Exception as e:  # noqa: BLE001
                skipped.append((name, repr(e)))
    print("extracted:", done)
    for name, why in skipped:
        print("SKIPPED", name, why)


if __name__ == "__main__":
    main()
