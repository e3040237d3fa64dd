"""Render a video of sampled initial env configurations — a debugging tool
for placement randomization (reference scripts/make_reset_video.py).

Usage: python -m robosuite_tpu.scripts.make_reset_video \
        [--env Lift] [--camera agentview] [--frames 10] [--output /tmp/resets.avi]
"""

import argparse

import jax
import numpy as np

import robosuite_tpu
from robosuite_tpu.demos.demo_video_recording import write_avi_rgb
from robosuite_tpu.renderers import RaycastRenderer


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--env", type=str, default="Lift")
    parser.add_argument("--camera", type=str, default="agentview")
    parser.add_argument("--frames", type=int, default=10)
    parser.add_argument("--output", type=str, default="/tmp/resets.avi")
    args = parser.parse_args()

    env = robosuite_tpu.make(args.env, robots="Panda")
    r = RaycastRenderer(env, args.camera, height=120, width=160)
    frames = []
    for i in range(args.frames):
        state, _ = env.reset(jax.random.PRNGKey(i))
        rgb, _ = r.render(state)
        frames.append((np.clip(np.asarray(rgb), 0, 1) * 255).astype(np.uint8))
        print(f"reset {i}: rendered")
    write_avi_rgb(args.output, frames, fps=2)
    print(f"wrote {args.output} ({len(frames)} resets)")


if __name__ == "__main__":
    main()
