"""Random-action rollout demo (reference demos/demo_random_action.py).

Usage: python -m robosuite_tpu.demos.demo_random_action [env] [robot]
"""

import sys

import jax
import numpy as np

import robosuite_tpu


def main():
    env_name = sys.argv[1] if len(sys.argv) > 1 else "Lift"
    robot = sys.argv[2] if len(sys.argv) > 2 else "Panda"
    robots = (robot, robot) if env_name.startswith("TwoArm") else robot
    env = robosuite_tpu.make(env_name, robots=robots, reward_shaping=True)

    state, obs = env.reset(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    for t in range(20):
        action = rng.uniform(-1, 1, env.action_dim).astype(np.float32)
        state, obs, reward, done, info = env.step(state, action)
        print(f"t={t:3d} reward={float(reward):.4f}")


if __name__ == "__main__":
    main()
