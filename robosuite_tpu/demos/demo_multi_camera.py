"""Render the same Lift state from every arena camera
(reference demos/demo_multi_camera.py).

Usage: python -m robosuite_tpu.demos.demo_multi_camera [outdir]
"""

import os
import sys

import jax
import numpy as np

import robosuite_tpu
from robosuite_tpu.renderers import RaycastRenderer


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lift_cameras"
    os.makedirs(outdir, exist_ok=True)
    env = robosuite_tpu.make("Lift", robots="Panda", cube_size=[0.021, 0.021, 0.021])
    state, _ = env.reset(jax.random.PRNGKey(0))
    for cam in ("frontview", "birdview", "agentview", "sideview"):
        r = RaycastRenderer(env, cam, height=120, width=160)
        rgb, depth = r.render(state)
        img = (np.clip(np.asarray(rgb), 0, 1) * 255).astype(np.uint8)
        path = os.path.join(outdir, f"{cam}.ppm")
        with open(path, "wb") as f:
            f.write(b"P6\n%d %d\n255\n" % (img.shape[1], img.shape[0]))
            f.write(img.tobytes())
        print(f"{cam:10s} -> {path} (depth {float(np.asarray(depth).max()):.2f} m max)")


if __name__ == "__main__":
    main()
