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


@pytest.fixture(scope="module")
def env():
    return robosuite_tpu.make(
        "Lift", robots="Panda", cube_size=[0.021, 0.021, 0.021], reward_shaping=True
    )


def test_reset_determinism(env):
    s1, o1 = env.reset(jax.random.PRNGKey(7))
    s2, o2 = env.reset(jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(s1.physics.qpos), np.asarray(s2.physics.qpos))
    for k in o1:
        np.testing.assert_array_equal(np.asarray(o1[k]), np.asarray(o2[k]))
    s3, _ = env.reset(jax.random.PRNGKey(8))
    assert np.abs(np.asarray(s1.physics.qpos) - np.asarray(s3.physics.qpos)).max() > 1e-6


def test_action_playback_bit_exact(env):
    """Record 10 random-action states; replay from the flattened initial
    state -> bitwise-identical states (reference test_action_playback.py)."""
    rng = np.random.default_rng(3)
    actions = rng.uniform(-1, 1, size=(10, env.action_dim)).astype(np.float32)

    state, _ = env.reset(jax.random.PRNGKey(1))
    init_flat = np.asarray(state.physics.flatten())
    recorded = []
    s = state
    for a in actions:
        s, o, r, d, i = env.step(s, jnp.asarray(a))
        recorded.append(np.asarray(s.physics.flatten()))

    # replay: rebuild physics from the flattened state (MjSimState layout)
    s2, _ = env.reset(jax.random.PRNGKey(1))
    phys = State.from_flattened(jnp.asarray(init_flat), env.model)
    s2 = s2.replace(physics=phys)
    for t, a in enumerate(actions):
        s2, o, r, d, i = env.step(s2, jnp.asarray(a))
        np.testing.assert_array_equal(np.asarray(s2.physics.flatten()), recorded[t])


def test_flattened_state_layout(env):
    """(time, qpos, qvel) layout matches MjSimState.flatten
    (reference binding_utils.py:248-250)."""
    state, _ = env.reset(jax.random.PRNGKey(0))
    flat = np.asarray(state.physics.flatten())
    assert flat.shape == (1 + env.model.nq + env.model.nv,)
    assert flat[0] == 0.0  # time
    np.testing.assert_array_equal(flat[1 : 1 + env.model.nq], np.asarray(state.physics.qpos))
