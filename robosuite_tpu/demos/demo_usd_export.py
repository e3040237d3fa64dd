"""Export a Lift rollout to a time-sampled USD stage for rendering in
Omniverse/Blender/usdview (reference demos/demo_usd_export.py).

Usage: python -m robosuite_tpu.demos.demo_usd_export [out.usda] [n_frames]
"""

import sys

import jax
import numpy as np

import robosuite_tpu
from robosuite_tpu.physics import engine
from robosuite_tpu.utils.usd.exporter import USDExporter


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lift_rollout.usda"
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    env = robosuite_tpu.make("Lift", robots="Panda", cube_size=[0.021, 0.021, 0.021])
    state, _ = env.reset(jax.random.PRNGKey(0))
    # randomized visuals bake to texture files next to the stage
    # (pass --textured to sample a TextureModder scenario)
    visual = None
    if "--textured" in sys.argv:
        from robosuite_tpu.utils.mjmod import sample_visual_overrides

        visual = sample_visual_overrides(env.model, jax.random.PRNGKey(7))
    exporter = USDExporter(env.model, framerate=env.control_freq, visual=visual)
    rng = np.random.default_rng(0)
    for t in range(n_frames):
        action = rng.uniform(-1, 1, env.action_dim).astype(np.float32)
        state, obs, reward, done, info = env.step(state, action)
        kin, _, _ = engine.forward_products(env.model, state.physics)
        exporter.update_scene(kin)
    exporter.save_scene(out)
    print(f"wrote {out}: {n_frames} frames at {env.control_freq} fps")


if __name__ == "__main__":
    main()
