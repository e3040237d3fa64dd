"""Play back demonstrations from a demo.hdf5 file.

Re-derivation of reference scripts/playback_demonstrations_from_hdf5.py: for
each demo group, reset the env, seed the sim from the recorded first state
(flattened (time, qpos, qvel) — MjSimState layout, binding_utils.py:221-250),
replay the recorded actions, and report the final-state deviation from the
recording — the reference's open-loop reproducibility contract
(tests/test_environments/test_action_playback.py:17-71), which pure
functional stepping makes exact per compiled model.

Usage:
    python -m robosuite_tpu.scripts.playback_demonstrations_from_hdf5 \
        --file /tmp/robosuite_tpu_demos/demo.hdf5 --environment Lift --robots Panda
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def playback(path, env=None, use_actions=True):
    import h5py
    import jax
    import jax.numpy as jnp

    import robosuite_tpu
    from robosuite_tpu.physics.state import State

    f = h5py.File(path, "r")
    env_info = json.loads(f["data"].attrs["env"])
    if env is None:
        robots = env_info["robots"]
        env = robosuite_tpu.make(env_info["env_name"], robots=robots if len(robots) > 1 else robots[0])

    results = []
    for demo in sorted(f["data"].keys()):
        states = np.asarray(f[f"data/{demo}/states"])
        actions = np.asarray(f[f"data/{demo}/actions"])
        # rebuild the episode's exact model from the stored MJCF (reference
        # playback_demonstrations_from_hdf5.py model_file contract —
        # construction-time randomizations like Lift's cube size are baked
        # into the compiled model)
        model_xml = f[f"data/{demo}"].attrs.get("model_file", "")
        if model_xml:
            from robosuite_tpu.models.mjcf.parser import parse_mjcf

            env.task.spec = parse_mjcf(model_xml)
            env.rebuild_model()
        # seed the full env state (physics + fresh controller state) from the
        # recorded first state
        st = env.state_from_flattened(states[0])
        if use_actions:
            for a in actions:
                st, obs, rew, done, info = env.step(st, np.asarray(a, dtype=np.float32))
            final = np.asarray(st.physics.flatten())
            err = float(np.abs(final[1:] - states[-1][1:]).max())
        else:
            err = float("nan")
        results.append((demo, len(actions), err))
        print(f"{demo}: {len(actions)} actions, final-state max deviation {err:.2e}")
    f.close()
    return results


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--file", required=True)
    p.add_argument("--no-actions", action="store_true")
    args = p.parse_args(argv)
    playback(args.file, use_actions=not args.no_actions)


if __name__ == "__main__":
    main()
