"""Model cards: committed numeric model data (kinematics, inertials,
actuators) for the built-in robots/grippers/bases, extracted once from the
reference MJCF assets by tools/extract_robot.py.

The card -> spec builder here is the replacement for loading MJCF XML at
runtime (reference models/base.py:19-66): built-in models never touch disk
beyond these JSON files.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Dict, List, Optional

from robosuite_tpu.models import spec as S

_CARD_DIR = os.path.dirname(__file__)


@functools.lru_cache(maxsize=None)
def load_card(name: str) -> dict:
    path = os.path.join(_CARD_DIR, f"{name}.json")
    with open(path) as f:
        return json.load(f)


def body_from_dict(d: dict) -> S.BodySpec:
    b = S.BodySpec(name=d["name"], pos=d.get("pos", (0, 0, 0)), quat=d.get("quat", (1, 0, 0, 0)))
    it = d.get("inertial")
    if it is not None:
        b.inertial = S.InertialSpec(
            mass=it["mass"],
            pos=it.get("pos", (0, 0, 0)),
            quat=it.get("quat", (1, 0, 0, 0)),
            diaginertia=it.get("diaginertia"),
            fullinertia=it.get("fullinertia"),
        )
    for j in d.get("joints", []):
        b.joints.append(
            S.JointSpec(
                name=j["name"], type=j["type"], pos=j["pos"], axis=j["axis"],
                range=j.get("range"), damping=j.get("damping", 0.0),
                armature=j.get("armature", 0.0), frictionloss=j.get("frictionloss", 0.0),
                stiffness=j.get("stiffness", 0.0),
                ref=j.get("ref", 0.0), springref=j.get("springref", 0.0),
            )
        )
    for g in d.get("geoms", []):
        b.geoms.append(
            S.GeomSpec(
                name=g["name"], type=g["type"], size=g["size"], pos=g["pos"], quat=g["quat"],
                friction=g["friction"], solref=g["solref"], solimp=g["solimp"],
                contype=g["contype"], conaffinity=g["conaffinity"], condim=g["condim"],
                group=g["group"], mass=g.get("mass"), density=g.get("density", 1000.0),
                mesh=g.get("mesh"), rgba=g.get("rgba", (0.5, 0.5, 0.5, 1)),
            )
        )
    for s in d.get("sites", []):
        b.sites.append(
            S.SiteSpec(
                name=s["name"], pos=s["pos"], quat=s["quat"], size=s["size"],
                type=s.get("type", "sphere"), group=s.get("group", 0), rgba=s.get("rgba", (0.5, 0.5, 0.5, 1)),
            )
        )
    for c in d.get("cameras", []):
        b.cameras.append(S.CameraSpec(name=c["name"], pos=c["pos"], quat=c["quat"], fovy=c["fovy"], mode=c["mode"]))
    for child in d.get("children", []):
        b.children.append(body_from_dict(child))
    return b


def spec_from_card(name: str) -> S.ModelSpec:
    """Build a ModelSpec whose worldbody children mirror the card."""
    card = load_card(name)
    ms = S.ModelSpec(card["name"])
    for bd in card["bodies"]:
        ms.worldbody.children.append(body_from_dict(bd))
    for a in card.get("actuators", []):
        ms.actuators.append(
            S.ActuatorSpec(
                name=a["name"], joint=a["joint"], kind=a["kind"], gear=a.get("gear", 1.0),
                ctrlrange=a.get("ctrlrange"), forcerange=a.get("forcerange"),
                kp=a.get("kp", 1.0), kv=a.get("kv", 0.0),
                tendon=a.get("tendon"), gainprm=a.get("gainprm", 1.0),
                biasprm=a.get("biasprm", (0.0, 0.0, 0.0)),
            )
        )
    for e in card.get("excludes", []):
        ms.excludes.append(S.ExcludeSpec(e[0], e[1]))
    for e in card.get("equalities", []):
        ms.equalities.append(
            S.EqualitySpec(
                kind=e["kind"], body1=e.get("body1"), body2=e.get("body2"),
                joint1=e.get("joint1"), joint2=e.get("joint2"),
                tendon1=e.get("tendon1"), tendon2=e.get("tendon2"),
                anchor=e.get("anchor", (0, 0, 0)), polycoef=e.get("polycoef", (0, 1, 0, 0, 0)),
                solref=e.get("solref", (0.02, 1.0)),
            )
        )
    for t in card.get("tendons", []):
        ms.tendons.append(
            S.TendonSpec(
                name=t["name"], joints=t["joints"], coefs=t["coefs"],
                range=t.get("range"), limited=t.get("limited"),
                stiffness=t.get("stiffness", 0.0), springlength=t.get("springlength"),
                frictionloss=t.get("frictionloss", 0.0), damping=t.get("damping", 0.0),
            )
        )
    return ms
