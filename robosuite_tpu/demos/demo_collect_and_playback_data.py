"""Collect a random-action episode with DataCollectionWrapper, then replay
the recorded states (reference demos/demo_collect_and_playback_data.py).

Usage: python -m robosuite_tpu.demos.demo_collect_and_playback_data [dir]
"""

import glob
import os
import sys
import tempfile

import jax
import numpy as np

import robosuite_tpu
from robosuite_tpu.wrappers import DataCollectionWrapper


def main():
    directory = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="rs_tpu_demo_")
    env = robosuite_tpu.make("Lift", robots="Panda", cube_size=[0.021, 0.021, 0.021])
    wrapped = DataCollectionWrapper(env, directory, flush_freq=25)

    # collect
    state, obs = wrapped.reset(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    for t in range(25):
        action = rng.uniform(-1, 1, env.action_dim).astype(np.float32)
        state, obs, reward, done, info = wrapped.step(state, action)
    wrapped.close()

    # playback: reload each flushed .npz and re-seed the env from its states
    for ep in sorted(glob.glob(os.path.join(directory, "ep_*"))):
        for npz in sorted(glob.glob(os.path.join(ep, "state_*.npz"))):
            data = np.load(npz, allow_pickle=True)
            states = data["states"]
            print(f"{npz}: {len(states)} states")
            for flat in states[:: max(len(states) // 5, 1)]:
                st = env.state_from_flattened(np.asarray(flat))
                print(f"  t={float(st.physics.time):6.3f}  qpos[:3]="
                      f"{np.asarray(st.physics.qpos[:3]).round(3)}")
    print(f"episode data in {directory}")


if __name__ == "__main__":
    main()
