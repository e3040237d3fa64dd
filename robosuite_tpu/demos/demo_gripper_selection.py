"""Cycle through every registered gripper on a Panda-Lift env
(reference demos/demo_gripper_selection.py).

Usage: python -m robosuite_tpu.demos.demo_gripper_selection [n_steps]
"""

import sys

import jax
import numpy as np

import robosuite_tpu
from robosuite_tpu.models.grippers import REGISTERED_GRIPPERS


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    rng = np.random.default_rng(0)
    for gripper in sorted(REGISTERED_GRIPPERS):
        if gripper == "WipingGripper":  # Wipe-only plate, no grip actuation
            continue
        env = robosuite_tpu.make("Lift", robots="Panda", gripper_types=gripper)
        state, obs = env.reset(jax.random.PRNGKey(0))
        for _ in range(n_steps):
            action = rng.uniform(-1, 1, env.action_dim).astype(np.float32)
            state, obs, reward, done, info = env.step(state, action)
        print(f"{gripper:40s} action_dim={env.action_dim} reward={float(reward):.4f}")


if __name__ == "__main__":
    main()
