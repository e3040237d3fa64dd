"""Determinism + action playback (reference tests/test_environments/
test_env_determinism.py:27-111 and test_action_playback.py:17-71).

Pure-functional stepping makes the reference's reproducibility contract
exact: same seed -> identical reset; replaying recorded actions from the
recorded initial state -> bit-identical trajectories.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import robosuite_tpu
from robosuite_tpu.physics.state import State


def test_reset_determinism(lift_env):
    s1, o1 = lift_env.reset(jax.random.PRNGKey(7))
    s2, o2 = lift_env.reset(jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(s1.physics.qpos), np.asarray(s2.physics.qpos))
    for k in o1:
        np.testing.assert_array_equal(np.asarray(o1[k]), np.asarray(o2[k]))
    s3, _ = lift_env.reset(jax.random.PRNGKey(8))
    assert np.abs(np.asarray(s1.physics.qpos) - np.asarray(s3.physics.qpos)).max() > 1e-6


@pytest.mark.slow
def test_action_playback_bit_exact(lift_env):
    """Record 6 random-action states; replay from the flattened initial
    state -> bitwise-identical states (reference test_action_playback.py)."""
    rng = np.random.default_rng(3)
    actions = rng.uniform(-1, 1, size=(6, lift_env.action_dim)).astype(np.float32)

    state, _ = lift_env.reset(jax.random.PRNGKey(1))
    init_flat = np.asarray(state.physics.flatten())
    recorded = []
    s = state
    for a in actions:
        s, o, r, d, i = lift_env.step(s, jnp.asarray(a))
        recorded.append(np.asarray(s.physics.flatten()))

    # replay: rebuild physics from the flattened state (MjSimState layout)
    s2, _ = lift_env.reset(jax.random.PRNGKey(1))
    phys = State.from_flattened(jnp.asarray(init_flat), lift_env.model)
    s2 = s2.replace(physics=phys)
    for t, a in enumerate(actions):
        s2, o, r, d, i = lift_env.step(s2, jnp.asarray(a))
        np.testing.assert_array_equal(np.asarray(s2.physics.flatten()), recorded[t])


def test_flattened_state_layout(lift_env):
    """(time, qpos, qvel) layout matches MjSimState.flatten
    (reference binding_utils.py:248-250)."""
    state, _ = lift_env.reset(jax.random.PRNGKey(0))
    flat = np.asarray(state.physics.flatten())
    assert flat.shape == (1 + lift_env.model.nq + lift_env.model.nv,)
    assert flat[0] == 0.0  # time
    np.testing.assert_array_equal(flat[1 : 1 + lift_env.model.nq], np.asarray(state.physics.qpos))
