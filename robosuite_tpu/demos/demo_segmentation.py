"""Render instance/class segmentation maps of the Lift scene with the
in-graph raycast renderer (reference demos/demo_segmentation.py, which uses
MuJoCo's segmentation render mode).

Usage: python -m robosuite_tpu.demos.demo_segmentation [out.ppm]
"""

import sys

import jax
import numpy as np

import robosuite_tpu
from robosuite_tpu.physics import engine
from robosuite_tpu.renderers.raycast import render_segmentation


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lift_segmentation.ppm"
    env = robosuite_tpu.make("Lift", robots="Panda", cube_size=[0.021, 0.021, 0.021])
    state, _ = env.reset(jax.random.PRNGKey(0))
    kin, _, _ = engine.forward_products(env.model, state.physics)
    seg = np.asarray(render_segmentation(env.model, kin, "agentview", height=120, width=160))
    ids = np.unique(seg)
    print(f"segmentation {seg.shape}, {len(ids)} distinct geom ids: {ids[:16]}")
    # false-color for inspection
    rng = np.random.default_rng(0)
    palette = rng.integers(0, 255, size=(int(seg.max()) + 2, 3), dtype=np.uint8)
    img = palette[seg + 1]
    with open(out, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (img.shape[1], img.shape[0]))
        f.write(img.tobytes())
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
