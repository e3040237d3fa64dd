"""Interactively tune a camera pose from the terminal.

Re-derivation of reference scripts/tune_camera.py (keyboard-driven camera
positioning in an OpenCV window): headless version drives CameraMover with
w/a/s/d/r/f translation and arrow-key-style rotation commands read from
stdin, re-rendering a PNG (or ASCII preview) after each move and printing
the MJCF-ready pos/quat line on exit.

Usage:
    python -m robosuite_tpu.scripts.tune_camera --env Lift --robots Panda \
        --camera agentview [--out /tmp/view.png]
Commands: w/s +-x  a/d +-y  r/f +-z  q/e yaw  t/g pitch  p print  x exit
"""

from __future__ import annotations

import argparse

import numpy as np

STEP = 0.05
ANGLE = 5.0


def ascii_preview(rgb, width=64):
    """Terminal luminance preview (stands in for the cv2 window)."""
    lum = rgb.mean(axis=-1)
    h = max(1, int(lum.shape[0] * width / lum.shape[1] / 2))
    ys = np.linspace(0, lum.shape[0] - 1, h).astype(int)
    xs = np.linspace(0, lum.shape[1] - 1, width).astype(int)
    chars = " .:-=+*#%@"
    for y in ys:
        print("".join(chars[int(v * (len(chars) - 1))] for v in np.clip(lum[y, xs], 0, 1)))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="Lift")
    p.add_argument("--robots", default="Panda")
    p.add_argument("--camera", default="agentview")
    p.add_argument("--out", default=None, help="write PNG after each move")
    p.add_argument("--size", type=int, default=128)
    args = p.parse_args(argv)

    import jax

    import robosuite_tpu
    from robosuite_tpu.renderers.raycast import RaycastRenderer
    from robosuite_tpu.utils.camera_utils import CameraMover

    env = robosuite_tpu.make(args.env, robots=args.robots)
    state, _ = env.reset(jax.random.PRNGKey(0))
    mover = CameraMover(env, camera=args.camera)
    renderer = RaycastRenderer(env, args.camera, args.size, args.size)

    def show():
        pos, quat = mover.get_camera_pose()
        rgb, _ = renderer.render(state, cam_pos=pos, cam_quat=quat)
        if args.out:
            img = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
            try:
                from PIL import Image

                Image.fromarray(img).save(args.out)
                print(f"-> {args.out}")
            except ImportError:
                np.save(args.out + ".npy", img)
        else:
            ascii_preview(rgb)
        print(f'pos="{pos[0]:.3f} {pos[1]:.3f} {pos[2]:.3f}" '
              f'quat="{quat[0]:.4f} {quat[1]:.4f} {quat[2]:.4f} {quat[3]:.4f}"')

    moves = {
        "w": ((1, 0, 0), STEP), "s": ((1, 0, 0), -STEP),
        "a": ((0, 1, 0), STEP), "d": ((0, 1, 0), -STEP),
        "r": ((0, 0, 1), STEP), "f": ((0, 0, 1), -STEP),
    }
    rots = {"q": ((0, 0, 1), ANGLE), "e": ((0, 0, 1), -ANGLE),
            "t": ((0, 1, 0), ANGLE), "g": ((0, 1, 0), -ANGLE)}

    show()
    print("commands: w/s a/d r/f translate, q/e t/g rotate, p print, x exit")
    while True:
        try:
            cmd = input("> ").strip().lower()
        except EOFError:
            break
        if cmd == "x":
            break
        if cmd == "p":
            show()
            continue
        if cmd in moves:
            d, s = moves[cmd]
            mover.move_camera(d, s)
        elif cmd in rots:
            axis, ang = rots[cmd]
            pos, _ = mover.get_camera_pose()
            mover.rotate_camera(point=pos, axis=axis, angle=ang)
        else:
            continue
        show()

    pos, quat = mover.get_camera_pose()
    print(f'final: <camera name="{args.camera}" pos="{pos[0]:.3f} {pos[1]:.3f} {pos[2]:.3f}" '
          f'quat="{quat[0]:.4f} {quat[1]:.4f} {quat[2]:.4f} {quat[3]:.4f}"/>')


if __name__ == "__main__":
    main()
