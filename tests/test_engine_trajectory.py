"""Cross-engine free-running trajectory parity on the Lift world.

Replays the golden zero-ctrl substep trace (tests/fixtures/lift_panda.npz,
recorded from the real MuJoCo engine via tools/gen_golden.py) through the
TPU engine from the same initial state. Short horizons must match tightly;
contact-event chaos allows looser bounds at 50 substeps (0.1 s).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robosuite_tpu.physics import engine
from robosuite_tpu.physics.state import State

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "lift_panda.npz")


@pytest.fixture(scope="module")
def setup():
    from robosuite_tpu.models.arenas import TableArena
    from robosuite_tpu.models.bases import robot_base_factory
    from robosuite_tpu.models.grippers import gripper_factory
    from robosuite_tpu.models.objects import BoxObject
    from robosuite_tpu.models.robots import create_robot
    from robosuite_tpu.models.tasks import ManipulationTask

    g = np.load(FIXTURE)
    robot = create_robot("Panda")
    robot.add_base(robot_base_factory(robot.default_base))
    robot.add_gripper(gripper_factory("PandaGripper", arm="right"), "right")
    robot.set_base_xpos(robot.base_xpos_offset["table"](0.8))
    model = ManipulationTask(
        TableArena(), [robot], BoxObject(name="cube", size=[0.0216647, 0.0200736, 0.0211351])
    ).compile()
    return g, model


def test_zero_ctrl_substep_trajectory(setup):
    g, model = setup
    s0 = g["state0"]
    state = State(
        qpos=jnp.asarray(s0[1 : 1 + model.nq], dtype=jnp.float32),
        qvel=jnp.asarray(s0[1 + model.nq :], dtype=jnp.float32),
        time=jnp.asarray(0.0),
    )
    @jax.jit
    def roll(s):
        def body(st, _):
            st2 = engine.step(model, st, jnp.zeros(model.nu))
            return st2, st2.qpos

        _, qs = jax.lax.scan(body, s, None, length=50)
        return qs

    qs = np.concatenate([np.asarray(state.qpos)[None], np.asarray(roll(state))])
    ref = g["sub_qpos"]

    # tight parity while contact-free / early-contact
    assert np.abs(qs[5] - ref[5]).max() < 1e-4
    assert np.abs(qs[10] - ref[10]).max() < 1e-4
    # arm joints stay matched through 50 substeps (0.1 s); the free cube's
    # contact sequence is chaotic across solvers
    assert np.abs(qs[25][:7] - ref[25][:7]).max() < 1e-3
    assert np.abs(qs[50][:7] - ref[50][:7]).max() < 5e-3
    assert np.isfinite(qs).all()
