"""Environment sweep: every registered env constructs with a coherent model.

The cheap analog of reference tests/test_environments/test_all_environments.py
(construction + invariants; stepping is covered per-env in dedicated tests
because XLA:CPU compile of the step graph is expensive on this host).
"""

import numpy as np
import pytest

import robosuite_tpu


@pytest.mark.parametrize("env_name", list(robosuite_tpu.ALL_ENVIRONMENTS))
def test_env_constructs(env_name):
    kwargs = {"cube_size": [0.021, 0.021, 0.021]} if env_name == "Lift" else {}
    robots = ("Panda", "Panda") if env_name.startswith("TwoArm") else "Panda"
    env = robosuite_tpu.make(env_name, robots=robots, **kwargs)
    m = env.model
    assert env.action_dim >= 6  # Wipe (no gripper dof) is 6
    assert m.nq >= 7 and m.nv >= 7
    assert m.npair > 0
    # actuators resolve to valid joints
    for j in m.actuator_jntid:
        assert 0 <= j < m.njnt
    # every robot arm dof has a torque limit from ctrlrange
    r = env.robots[0]
    lo, hi = r.torque_limits["right"]
    assert np.all(hi > lo)
    low, high = env.action_spec
    assert low.shape == (env.action_dim,)


def test_make_unknown_env_raises():
    with pytest.raises(ValueError):
        robosuite_tpu.make("NoSuchEnv")


@pytest.mark.parametrize("robot", ["Panda", "Sawyer", "IIWA", "Kinova3", "Jaco", "UR5e", "XArm7"])
def test_lift_with_all_robots(robot):
    """Every single-arm robot composes into Lift (reference
    tests/test_robots/test_all_robots.py analog)."""
    env = robosuite_tpu.make("Lift", robots=robot, cube_size=[0.021, 0.021, 0.021])
    assert env.model.nv >= 12
