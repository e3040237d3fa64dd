"""Inspect and tune joint positions from the terminal.

Re-derivation of reference scripts/tune_joints.py (an on-screen slider panel
driving each joint): headless version lists every joint with its range and
current value, accepts `set <joint> <value>` / `bump <joint> <delta>`
commands, re-runs FK, and reports eef site poses so init_qpos entries can be
tuned without a viewer.

Usage:
    python -m robosuite_tpu.scripts.tune_joints --env Lift --robots Panda
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="Lift")
    p.add_argument("--robots", default="Panda")
    args = p.parse_args(argv)

    import jax

    import robosuite_tpu
    from robosuite_tpu.physics import kinematics

    env = robosuite_tpu.make(args.env, robots=args.robots)
    model = env.model
    state, _ = env.reset(jax.random.PRNGKey(0))
    qpos = np.asarray(state.physics.qpos).copy()

    fk = jax.jit(lambda q: kinematics.fk(model, q))

    hinge_slide = [j for j in range(model.njnt) if model.jnt_type[j] in (2, 3)]

    def report():
        kin = fk(qpos)
        print(f"{'joint':<32}{'value':>10}{'range':>24}")
        for j in hinge_slide:
            adr = model.jnt_qposadr[j]
            lo, hi = np.asarray(model.jnt_range)[j]
            rng = f"[{lo:.3f}, {hi:.3f}]" if model.jnt_limited[j] else "(unlimited)"
            print(f"{model.jnt_names[j]:<32}{qpos[adr]:>10.4f}{rng:>24}")
        for s in range(model.nsite):
            name = model.site_names[s]
            if "grip" in name or "eef" in name:
                pos = np.asarray(kin.site_xpos[s])
                print(f"site {name}: {pos.round(4)}")

    report()
    print("commands: set <joint> <value> | bump <joint> <delta> | list | x")
    while True:
        try:
            cmd = input("> ").strip().split()
        except EOFError:
            break
        if not cmd:
            continue
        if cmd[0] == "x":
            break
        if cmd[0] == "list":
            report()
            continue
        if cmd[0] in ("set", "bump") and len(cmd) == 3:
            try:
                j = model.jnt_name2id(cmd[1])
            except ValueError:
                print(f"unknown joint {cmd[1]}")
                continue
            adr = model.jnt_qposadr[j]
            v = float(cmd[2])
            qpos[adr] = v if cmd[0] == "set" else qpos[adr] + v
            if model.jnt_limited[j]:
                lo, hi = np.asarray(model.jnt_range)[j]
                qpos[adr] = float(np.clip(qpos[adr], lo, hi))
            report()

    arm_vals = [f"{qpos[model.jnt_qposadr[j]]:.4f}" for j in hinge_slide]
    print("qpos snapshot:", " ".join(arm_vals))


if __name__ == "__main__":
    main()
