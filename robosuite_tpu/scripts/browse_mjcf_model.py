"""Browse a compiled model's kinematic tree from the terminal.

Re-derivation of reference scripts/browse_mjcf_model.py (an interactive
mujoco-viewer scene browser): headless-first, it prints the body tree with
joints/geoms/sites per body and optionally renders a named camera to a PNG
via the raycast renderer.

Usage:
    python -m robosuite_tpu.scripts.browse_mjcf_model --env Lift --robots Panda
    python -m robosuite_tpu.scripts.browse_mjcf_model --mjcf world.xml --render cam out.png
"""

from __future__ import annotations

import argparse


def print_tree(model):
    children = {}
    for b in range(model.nbody):
        children.setdefault(model.body_parentid[b], []).append(b)
    joints_of = {}
    for j in range(model.njnt):
        joints_of.setdefault(model.jnt_bodyid[j], []).append(j)
    geoms_of = {}
    for g in range(model.ngeom):
        geoms_of.setdefault(model.geom_bodyid[g], []).append(g)
    sites_of = {}
    for s in range(model.nsite):
        sites_of.setdefault(model.site_bodyid[s], []).append(s)

    jt_names = {0: "free", 1: "ball", 2: "slide", 3: "hinge"}

    def walk(b, depth):
        pad = "  " * depth
        print(f"{pad}{model.body_names[b]}")
        for j in joints_of.get(b, []):
            print(f"{pad}  [joint] {model.jnt_names[j]} ({jt_names.get(model.jnt_type[j], '?')})")
        for g in geoms_of.get(b, []):
            print(f"{pad}  [geom]  {model.geom_names[g]}")
        for s in sites_of.get(b, []):
            print(f"{pad}  [site]  {model.site_names[s]}")
        for c in children.get(b, []):
            if c != b:
                walk(c, depth + 1)

    walk(0, 0)
    print(f"\ncameras: {', '.join(model.cam_names) or '(none)'}")
    print(f"actuators: {', '.join(model.actuator_names) or '(none)'}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mjcf", help="MJCF file to browse")
    p.add_argument("--env", help="or: registered env name")
    p.add_argument("--robots", default="Panda")
    p.add_argument("--render", nargs=2, metavar=("CAMERA", "OUT_PNG"),
                   help="render a camera view of qpos0 to a PNG")
    args = p.parse_args(argv)

    if args.mjcf:
        from robosuite_tpu.models.mjcf.parser import parse_mjcf

        with open(args.mjcf) as f:
            model = parse_mjcf(f.read()).compile()
    else:
        import robosuite_tpu

        env = robosuite_tpu.make(args.env or "Lift", robots=args.robots)
        model = env.model

    print_tree(model)

    if args.render:
        cam, out = args.render
        import numpy as np

        from robosuite_tpu.physics import kinematics
        from robosuite_tpu.renderers.raycast import render_camera

        kin = kinematics.fk(model, model.qpos0)
        rgb, _ = render_camera(model, kin, cam, 256, 256)
        img = (np.clip(np.asarray(rgb), 0, 1) * 255).astype(np.uint8)
        try:
            from PIL import Image

            Image.fromarray(img).save(out)
        except ImportError:
            np.save(out + ".npy", img)
            out += ".npy"
        print(f"rendered {cam} -> {out}")


if __name__ == "__main__":
    main()
