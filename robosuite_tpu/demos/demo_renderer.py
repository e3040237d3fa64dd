"""Render a camera observation of the Lift scene and save it as PPM
(no image libraries needed).

Usage: python -m robosuite_tpu.demos.demo_renderer [out.ppm]
"""

import sys

import jax
import numpy as np

import robosuite_tpu
from robosuite_tpu.renderers import RaycastRenderer


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lift_agentview.ppm"
    env = robosuite_tpu.make("Lift", robots="Panda", cube_size=[0.021, 0.021, 0.021])
    state, _ = env.reset(jax.random.PRNGKey(0))
    r = RaycastRenderer(env, "agentview", height=240, width=320)
    rgb, depth = r.render(state)
    img = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
    with open(out, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (img.shape[1], img.shape[0]))
        f.write(img.tobytes())
    print(f"wrote {out} ({img.shape[1]}x{img.shape[0]}), depth range "
          f"[{depth[depth > 0].min():.2f}, {depth.max():.2f}] m")


if __name__ == "__main__":
    main()
