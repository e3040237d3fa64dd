"""Compose robots with non-default grippers/bases at env construction
(reference demos/demo_composite_robot.py: create_composite_robot + make).

Usage: python -m robosuite_tpu.demos.demo_composite_robot [robot] [gripper]
"""

import sys

import jax
import numpy as np

import robosuite_tpu


def main():
    robot = sys.argv[1] if len(sys.argv) > 1 else "UR5e"
    gripper = sys.argv[2] if len(sys.argv) > 2 else "Robotiq85Gripper"
    env = robosuite_tpu.make("Lift", robots=robot, gripper_types=gripper)
    state, obs = env.reset(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    for t in range(10):
        action = rng.uniform(-1, 1, env.action_dim).astype(np.float32)
        state, obs, reward, done, info = env.step(state, action)
    print(f"{robot} + {gripper}: 10 steps OK, reward={float(reward):.4f}")


if __name__ == "__main__":
    main()
