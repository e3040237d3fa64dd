"""Legged-robot standing under the posture-anchored leg stack.

SpotWithArm spawns in its standing pose (legs at the spot_base init_qpos,
feet on the floor) and holds it with the raw leg position servo
(robots/robot.py LeggedRobot; reference robots/legged_robot.py analog)
while the arm tracks OSC deltas.

Usage: python -m robosuite_tpu.demos.demo_legged_standing [robot]
"""

import sys

import jax
import numpy as np

import robosuite_tpu
from robosuite_tpu.physics import kinematics


def main():
    robot = sys.argv[1] if len(sys.argv) > 1 else "SpotWithArm"
    env = robosuite_tpu.make("Lift", robots=robot)
    r = env.robots[0]
    print(f"{robot}: {type(r).__name__}, {r.num_leg_joints} leg joints, "
          f"legs actuated: {r.is_legs_actuated}")
    state, obs = env.reset(jax.random.PRNGKey(0))
    bid = env.model.site_name2id(r.rm.base.center_site)
    action = np.zeros(env.action_dim, dtype=np.float32)  # pure standing hold
    for t in range(20):
        state, obs, reward, done, info = env.step(state, action)
        if t % 5 == 4:
            kin = kinematics.fk(env.model, state.physics.qpos)
            print(f"t={t + 1:2d}: body z={float(kin.site_xpos[bid][2]):.3f}")
    assert np.isfinite(np.asarray(state.physics.qpos)).all()
    print("standing hold OK")


if __name__ == "__main__":
    main()
