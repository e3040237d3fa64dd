"""Controller-mode demo (reference demos/demo_control.py): run Lift under
each part-controller type and report eef motion.

Usage: python -m robosuite_tpu.demos.demo_control
"""

import jax
import numpy as np

import robosuite_tpu
from robosuite_tpu.controllers.factory import ALL_PART_CONTROLLERS


def main():
    for ctrl in sorted(ALL_PART_CONTROLLERS):
        env = robosuite_tpu.make(
            "Lift", robots="Panda", cube_size=[0.021, 0.021, 0.021],
            controller_configs=ctrl,
        )
        state, obs = env.reset(jax.random.PRNGKey(0))
        start = np.asarray(obs["robot0_eef_pos"])
        action = np.zeros(env.action_dim, dtype=np.float32)
        action[0] = 1.0  # push the first action dim
        for _ in range(5):
            state, obs, reward, done, info = env.step(state, action)
        end = np.asarray(obs["robot0_eef_pos"])
        print(f"{ctrl:15s} action_dim={env.action_dim:2d} |eef moved| = {np.linalg.norm(end - start):.4f} m")


if __name__ == "__main__":
    main()
