"""Gym-interface demo (reference demos/demo_gym_functionality.py).

Usage: python -m robosuite_tpu.demos.demo_gym_wrapper
"""

import numpy as np

import robosuite_tpu
from robosuite_tpu.wrappers import GymWrapper


def main():
    env = GymWrapper(
        robosuite_tpu.make("Lift", robots="Panda", cube_size=[0.021, 0.021, 0.021], reward_shaping=True)
    )
    obs, info = env.reset(seed=0)
    print("obs dim:", obs.shape)
    total = 0.0
    for t in range(10):
        action = np.random.uniform(-1, 1, env.action_dim)
        obs, reward, terminated, truncated, info = env.step(action)
        total += reward
    print(f"10 steps, return {total:.4f}")


if __name__ == "__main__":
    main()
