"""Third-party composite controller registration (reference
@register_composite_controller, composite_controller.py:15-27, and the
examples/third_party_controller integration path)."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_registered_controller_drives_env():
    """An externally registered goal transform plugs into make() via
    controller_configs={"type": <name>} and moves the arm."""
    import examples.third_party_controller.dls_controller  # noqa: F401  (registers)

    import robosuite_tpu
    from robosuite_tpu.controllers.composite.composite_controller import (
        THIRD_PARTY_COMPOSITE_CONTROLLERS,
    )

    assert "WHOLE_BODY_DLS" in THIRD_PARTY_COMPOSITE_CONTROLLERS

    env = robosuite_tpu.make(
        "Lift", robots="Panda",
        controller_configs={
            "type": "WHOLE_BODY_DLS",
            "composite_controller_specific_configs": {"damping": 0.05},
        },
    )
    # action layout: 6-dim task target per arm + gripper
    assert env.action_dim == 7
    state, obs = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env._step_impl)

    act = np.zeros(env.action_dim, dtype=np.float32)
    act[2] = 0.04  # +z twist target
    p0 = np.asarray(obs["robot0_eef_pos"])
    for _ in range(8):
        state, obs, reward, done, info = step(state, jnp.asarray(act))
    p1 = np.asarray(obs["robot0_eef_pos"])
    assert np.all(np.isfinite(p1))
    # the eef tracked the commanded +z direction
    assert p1[2] - p0[2] > 0.01, (p0, p1)
    # and did not drift sideways more than it climbed
    assert abs(p1[0] - p0[0]) < (p1[2] - p0[2])
