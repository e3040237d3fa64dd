"""Closed-loop OSC behavior: the eef tracks commanded deltas.

The dynamic analog of the reference's controller behavior tests
(tests/test_controllers/test_variable_impedance.py): command a constant
delta, verify the eef moves in that direction and settles; variable-kp
actions change tracking speed.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import robosuite_tpu


def test_osc_tracks_commanded_direction(lift_env):
    state, obs = lift_env.reset(jax.random.PRNGKey(0))
    start = np.asarray(obs["robot0_eef_pos"])
    # command +x deltas for 5 policy steps (each step caps at 5 cm)
    a = np.zeros(lift_env.action_dim, dtype=np.float32)
    a[0] = 1.0
    for _ in range(5):
        state, obs, r, d, i = lift_env.step(state, jnp.asarray(a))
    end = np.asarray(obs["robot0_eef_pos"])
    moved = end - start
    assert moved[0] > 0.03, moved                      # moved along +x
    assert abs(moved[1]) < 0.05 and abs(moved[2]) < 0.05, moved  # mostly x
    # stop commanding: holds position
    hold_start = end
    a[:] = 0.0
    for _ in range(3):
        state, obs, r, d, i = lift_env.step(state, jnp.asarray(a))
    drift = np.asarray(obs["robot0_eef_pos"]) - hold_start
    assert np.linalg.norm(drift) < 0.02, drift


def test_gripper_action_closes_fingers(lift_env):
    state, obs = lift_env.reset(jax.random.PRNGKey(0))
    open_q = np.asarray(obs["robot0_gripper_qpos"])
    a = np.zeros(lift_env.action_dim, dtype=np.float32)
    a[-1] = 1.0  # close
    for _ in range(4):
        state, obs, r, d, i = lift_env.step(state, jnp.asarray(a))
    closed_q = np.asarray(obs["robot0_gripper_qpos"])
    # panda fingers: q[0] decreases toward 0, q[1] increases toward 0
    assert closed_q[0] < open_q[0] - 0.005, (open_q, closed_q)
    assert closed_q[1] > open_q[1] + 0.005, (open_q, closed_q)
