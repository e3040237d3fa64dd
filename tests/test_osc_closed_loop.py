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


@pytest.mark.slow
def test_variable_impedance_kp_changes_tracking():
    """Mirror of reference tests/test_controllers/test_variable_impedance.py:
    under variable_kp OSC, a stiff (high-kp) action tracks a commanded delta
    much more tightly in one control period than a soft (low-kp) one."""
    env = robosuite_tpu.make(
        "Lift", robots="Panda",
        controller_configs={"right": {"type": "OSC_POSE", "impedance_mode": "variable_kp"}},
    )
    # action layout: [kp(6), delta(6), gripper(1)]
    assert env.action_dim == 13

    def displacement(kp_cmd):
        state, obs = env.reset(jax.random.PRNGKey(0))
        start = np.asarray(obs["robot0_eef_pos"])
        a = np.zeros(env.action_dim, dtype=np.float32)
        a[:6] = kp_cmd
        a[6] = 1.0  # +x delta (5 cm at full scale)
        state, obs, r, d, i = env.step(state, jnp.asarray(a))
        return float(np.asarray(obs["robot0_eef_pos"])[0] - start[0])

    soft = displacement(10.0)
    stiff = displacement(300.0)
    assert stiff > soft * 5.0, (soft, stiff)
    assert stiff > 0.005, stiff


@pytest.mark.slow
def test_linear_interpolator_ramps_goal():
    """Mirror of reference tests/test_controllers/test_linear_interpolator.py:
    with interpolation="linear" the commanded step is reached gradually —
    the first-substep goal is closer to the start, so the initial torque
    spike shrinks, while the end-of-period pose still converges."""
    from robosuite_tpu.controllers.parts import osc as osc_mod

    cfg = osc_mod.OSCConfig(interpolation="linear", ramp_ratio=0.2)
    assert cfg.interp_steps == 5

    env_interp = robosuite_tpu.make(
        "Lift", robots="Panda",
        controller_configs={"right": {"type": "OSC_POSE", "interpolation": "linear"}},
    )
    env_plain = robosuite_tpu.make("Lift", robots="Panda")

    def run(env, n):
        state, obs = env.reset(jax.random.PRNGKey(0))
        a = np.zeros(env.action_dim, dtype=np.float32)
        a[0] = 1.0
        traj = []
        for _ in range(n):
            state, obs, r, d, i = env.step(state, jnp.asarray(a))
            traj.append(float(np.asarray(obs["robot0_eef_pos"])[0]))
        return np.array(traj)

    t_plain = run(env_plain, 6)
    t_interp = run(env_interp, 6)
    # both converge to the same commanded motion over several periods
    assert abs(t_plain[-1] - t_interp[-1]) < 0.02, (t_plain, t_interp)
    # the interpolated controller lags the step command within the first period
    assert t_interp[0] <= t_plain[0] + 1e-4, (t_interp[0], t_plain[0])


@pytest.mark.slow
def test_wipe_variable_impedance_config():
    """BASELINE config #5: Wipe with variable-impedance OSC — the action
    carries [damping_ratio(6), kp(6), delta(6)] and the env tracks per-step
    impedance commands (reference test_variable_impedance.py wiring)."""
    env = robosuite_tpu.make(
        "Wipe", robots="Panda",
        controller_configs={"right": {"type": "OSC_POSE", "impedance_mode": "variable"}},
    )
    # variable mode: 6 damping + 6 kp + 6 delta (no gripper on WipingGripper)
    assert env.action_dim == 18, env.action_dim
    lo, hi = env.action_spec
    assert hi[6] > 100.0  # kp dims carry kp_limits, not [-1, 1]
    state, obs = env.reset(jax.random.PRNGKey(0))
    a = np.zeros(env.action_dim, dtype=np.float32)
    a[:6] = 1.0     # damping ratio
    a[6:12] = 150.0  # kp
    a[14] = -0.5     # press down
    for _ in range(3):
        state, obs, r, d, i = env.step(state, jnp.asarray(a))
    assert np.isfinite(np.asarray(state.physics.qpos)).all()
    assert np.isfinite(float(r))
