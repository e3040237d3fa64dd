"""Backfill missing body inertials in model cards from compiled reference MJCF.

Cards extracted from reference XMLs that rely on MuJoCo's mesh-derived
inertia (no explicit <inertial> blocks — e.g. the inspire/fourier dexterous
hands, bd_gripper, spot) compile to zero-mass bodies in our pipeline, which
makes the dynamics singular. This tool compiles the reference asset XML with
the real mujoco binding and writes each body's computed
(mass, ipos, iquat, diaginertia) into the card JSON.

Missing *visual* mesh files are dropped from the XML before compiling —
robosuite worlds set inertiagrouprange="0 0" (reference base.xml:3), so
group>0 geoms never contribute inertia; the hand XMLs compile standalone
where group-1 geoms WOULD contribute, so we pin inertiagrouprange="0 0" to
match the in-world behavior.

Usage: python tools/backfill_inertials.py card1 [card2 ...]
       python tools/backfill_inertials.py --all   # every card with a known XML
"""

from __future__ import annotations

import json
import os
import sys
import xml.etree.ElementTree as ET

import mujoco
import numpy as np

REF_ASSETS = "/root/reference/robosuite/models/assets"
CARDS = os.path.join(os.path.dirname(__file__), "..", "robosuite_tpu", "models", "cards")

# card name -> reference XML (relative to REF_ASSETS)
CARD_XML = {
    "inspire_right_hand": "grippers/inspire_right_hand.xml",
    "inspire_left_hand": "grippers/inspire_left_hand.xml",
    "fourier_right_hand": "grippers/fourier_right_hand.xml",
    "fourier_left_hand": "grippers/fourier_left_hand.xml",
    "bd_gripper": "grippers/bd_gripper.xml",
    "spot": "bases/spot.xml",
    "spot_arm": "robots/spot/robot.xml",
    "gr1": "robots/gr1/robot.xml",
    "tiago": "robots/tiago/robot.xml",
    "xarm7_gripper": "grippers/xarm7_gripper.xml",
}


def compile_ref(xml_rel):
    path = os.path.join(REF_ASSETS, xml_rel)
    tree = ET.parse(path)
    root = tree.getroot()
    base = os.path.dirname(path)
    # meshdir handling
    compiler = root.find("compiler")
    meshdir = compiler.get("meshdir", ".") if compiler is not None else "."
    # drop missing meshes + geoms referencing them
    dropped = set()
    for asset in root.iter("asset"):
        for m in list(asset.findall("mesh")):
            f = m.get("file")
            full = os.path.join(base, meshdir, f) if f else None
            if f and not os.path.exists(full) and not os.path.exists(f):
                dropped.add(m.get("name") or os.path.splitext(os.path.basename(f))[0])
                asset.remove(m)
    if dropped:
        for body in root.iter("body"):
            for g in list(body.findall("geom")):
                if g.get("mesh") in dropped:
                    body.remove(g)
    # pin inertia semantics to the in-world robosuite setting
    if compiler is None:
        compiler = ET.SubElement(root, "compiler")
    # robosuite merges assets under base.xml's angle="radian"
    # (models/assets/base.xml:3); match that here so euler-specified geom
    # orientations land where they do in the merged world
    compiler.set("angle", "radian")
    compiler.set("inertiagrouprange", "0 0")
    compiler.set("meshdir", os.path.abspath(os.path.join(base, meshdir)))
    compiler.set("boundmass", "0")
    compiler.set("boundinertia", "0")
    xml_str = ET.tostring(root, encoding="unicode")
    return mujoco.MjModel.from_xml_string(xml_str)


def backfill(card_name):
    xml_rel = CARD_XML[card_name]
    model = compile_ref(xml_rel)
    by_name = {}
    for i in range(model.nbody):
        nm = mujoco.mj_id2name(model, mujoco.mjtObj.mjOBJ_BODY, i)
        if nm:
            by_name[nm] = i
    card_path = os.path.join(CARDS, card_name + ".json")
    card = json.load(open(card_path))
    n_filled = 0

    def walk(b):
        nonlocal n_filled
        if b.get("inertial") is None and b.get("name") in by_name:
            i = by_name[b["name"]]
            mass = float(model.body_mass[i])
            if mass > 0:
                b["inertial"] = {
                    "mass": round(mass, 10),
                    "pos": [round(float(v), 10) for v in model.body_ipos[i]],
                    "quat": [round(float(v), 10) for v in model.body_iquat[i]],
                    "diaginertia": [round(float(v), 12) for v in model.body_inertia[i]],
                }
                n_filled += 1
        for ch in b.get("children", []):
            walk(ch)

    for b in card["bodies"]:
        walk(b)
    json.dump(card, open(card_path, "w"), indent=1)
    print(f"{card_name}: backfilled {n_filled} bodies from {xml_rel}")


if __name__ == "__main__":
    args = sys.argv[1:]
    names = list(CARD_XML) if args == ["--all"] else args
    for n in names:
        try:
            backfill(n)
        except Exception as e:
            print(f"{n}: FAILED ({type(e).__name__}: {e})")
