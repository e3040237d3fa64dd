"""Replay a recorded trajectory through the engine and verify bit-exactness.

The reference's playback_demonstrations_from_hdf5.py analog for the native
trajectory log format: reload the initial flattened state, re-apply the
recorded actions, and compare states (the reproducibility contract,
reference tests/test_environments/test_action_playback.py:17-71).

Usage: python -m robosuite_tpu.scripts.playback_trajectory <ep_dir/traj.rtl> [env] [robot]
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

import robosuite_tpu
from robosuite_tpu.native import read_log
from robosuite_tpu.physics.state import State


def main():
    path = sys.argv[1]
    env_name = sys.argv[2] if len(sys.argv) > 2 else "Lift"
    robot = sys.argv[3] if len(sys.argv) > 3 else "Panda"
    data = read_log(path)
    states = data["states"][:, 0]   # batch dim 1 for single-env collection
    actions = data["actions"][:, 0]
    times = data["times"][:, 0]

    env = robosuite_tpu.make(env_name, robots=robot, cube_size=[0.021, 0.021, 0.021])
    s, _ = env.reset(jax.random.PRNGKey(0))
    nq = env.model.nq
    phys = State(
        qpos=jnp.asarray(states[0][:nq]),
        qvel=jnp.asarray(states[0][nq:]),
        time=jnp.asarray(times[0]),
    )
    # note: playback must start from the PRE-step state; step 0's recorded
    # state is post-step, so we replay from step 0 onward and compare drift
    s = s.replace(physics=phys)
    max_err = 0.0
    for t in range(1, len(actions)):
        s, obs, r, d, i = env.step(s, jnp.asarray(actions[t]))
        err = float(np.abs(np.asarray(s.physics.qpos) - states[t][:nq]).max())
        max_err = max(max_err, err)
    print(f"replayed {len(actions) - 1} steps, max qpos deviation {max_err:.3e}")


if __name__ == "__main__":
    main()
