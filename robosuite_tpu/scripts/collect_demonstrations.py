"""Collect demonstrations and gather them into the reference HDF5 format.

Re-derivation of reference scripts/collect_human_demonstrations.py: drive an
env with a teleop device (or the built-in scripted reacher for headless use),
record (state, action) per step via DataCollectionWrapper, then gather the
episodes into ONE demo.hdf5 with the reference's schema
(collect_human_demonstrations.py:120-146):

    data (group)
        date / time / repository_version / env (attributes)
        demo1 (group)
            model_file (attribute)  - MJCF xml string of the episode's model
            states (dataset)        - flattened (time, qpos, qvel) states
            actions (dataset)       - actions applied

Usage:
    python -m robosuite_tpu.scripts.collect_demonstrations \
        --environment Lift --robots Panda --device scripted \
        --directory /tmp/demos --episodes 2
"""

from __future__ import annotations

import argparse
import datetime
import json
import os

import numpy as np


def gather_demonstrations_as_hdf5(directory, out_dir, env_info, model_xml=""):
    """Gather per-episode .npz dirs into demo.hdf5 (reference
    collect_human_demonstrations.py:120-146)."""
    import h5py

    hdf5_path = os.path.join(out_dir, "demo.hdf5")
    os.makedirs(out_dir, exist_ok=True)
    f = h5py.File(hdf5_path, "w")
    grp = f.create_group("data")

    num_eps = 0
    for ep_dir in sorted(os.listdir(directory)):
        ep_path = os.path.join(directory, ep_dir)
        if not os.path.isdir(ep_path):
            continue
        states, actions = [], []
        for fname in sorted(os.listdir(ep_path)):
            if fname.startswith("state_") and fname.endswith(".npz"):
                d = np.load(os.path.join(ep_path, fname), allow_pickle=True)
                states.extend(d["states"])
                actions.extend(d["action_infos"])
        if not states:
            continue
        num_eps += 1
        ep = grp.create_group(f"demo_{num_eps}")
        ep.attrs["model_file"] = model_xml
        ep.create_dataset("states", data=np.asarray(states))
        ep.create_dataset("actions", data=np.asarray(actions))

    now = datetime.datetime.now()
    grp.attrs["date"] = f"{now.month}-{now.day}-{now.year}"
    grp.attrs["time"] = f"{now.hour}:{now.minute}:{now.second}"
    import robosuite_tpu

    grp.attrs["repository_version"] = robosuite_tpu.__version__
    grp.attrs["env"] = env_info
    f.close()
    return hdf5_path


def scripted_policy(env, t):
    """Headless stand-in for a human demonstrator: reach down-forward, close
    the gripper, lift. Produces Lift demos good enough for playback tests."""
    a = np.zeros(env.action_dim, dtype=np.float32)
    if t < 12:
        a[2] = -0.6  # descend
        a[-1] = -1.0
    elif t < 20:
        a[-1] = 1.0  # close gripper
    else:
        a[2] = 0.8  # lift
        a[-1] = 1.0
    return a


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--environment", default="Lift")
    p.add_argument("--robots", nargs="+", default=["Panda"])
    p.add_argument("--device", default="scripted", choices=["scripted", "keyboard", "spacemouse", "dualsense"])
    p.add_argument("--directory", default="/tmp/robosuite_tpu_demos")
    p.add_argument("--episodes", type=int, default=1)
    p.add_argument("--steps", type=int, default=40)
    args = p.parse_args(argv)

    import jax

    import robosuite_tpu
    from robosuite_tpu.wrappers import DataCollectionWrapper

    env = robosuite_tpu.make(args.environment, robots=args.robots if len(args.robots) > 1 else args.robots[0])
    raw_dir = os.path.join(args.directory, "raw")
    wrapped = DataCollectionWrapper(env, raw_dir, flush_freq=args.steps)

    device = None
    if args.device != "scripted":
        from robosuite_tpu import devices as D

        device = {"keyboard": D.Keyboard, "spacemouse": D.SpaceMouse, "dualsense": D.DualSense}[
            args.device
        ](env)

    for ep in range(args.episodes):
        out = wrapped.reset(jax.random.PRNGKey(ep))
        st = out[0] if isinstance(out, tuple) else out
        for t in range(args.steps):
            if device is not None:
                a = device.input2action()
                if a is None:
                    break
            else:
                a = scripted_policy(env, t)
            st, obs, rew, done, info = wrapped.step(st, a)
        wrapped.close()

    from robosuite_tpu.models.mjcf.export import export_xml

    env_info = json.dumps({"env_name": args.environment, "robots": args.robots})
    xml = export_xml(env.task.spec)
    path = gather_demonstrations_as_hdf5(raw_dir, args.directory, env_info, model_xml=xml)
    print(f"wrote {path}")
    return path


if __name__ == "__main__":
    main()
