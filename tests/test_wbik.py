"""WHOLE_BODY_IK composite: joint differential-IK over torso+arms
(reference composite_controller.py:514-589 + utils/ik_utils.py), and the
single-robot two-arm environment configuration (two_arm_env.py:29-55).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import robosuite_tpu
from robosuite_tpu.controllers.composite import wbik


def test_wbik_solve_tracks_twist_and_respects_nullspace():
    """The damped-LSQ solve must (a) move the task space along the commanded
    twist and (b) use redundant dofs only in ways that keep task error
    small while pulling toward the posture reference."""
    rng = np.random.default_rng(0)
    n, S = 9, 1
    J = jnp.asarray(rng.normal(size=(6 * S, n)) * 0.5)
    q = jnp.asarray(rng.normal(size=n) * 0.1)
    q0 = jnp.zeros(n)
    site_pos = jnp.zeros((S, 3))
    site_mat = jnp.eye(3)[None]
    target_pos = jnp.asarray([[0.02, -0.01, 0.03]])
    target_mat = jnp.eye(3)[None]

    cfg = wbik.WBIKConfig(damping=5e-2, integration_dt=0.1, max_dq=4.0,
                          nullspace_gains=tuple([1.0] * n))
    q_des = jax.jit(lambda: wbik.wbik_solve(
        cfg, J, q, q0, site_pos, site_mat, target_pos, target_mat))()
    dq = np.asarray(q_des - q)
    # task-space displacement produced by dq matches the desired dx
    dx = np.asarray(J) @ dq
    want = np.array([0.95 * 0.02, 0.95 * -0.01, 0.95 * 0.03, 0, 0, 0])
    np.testing.assert_allclose(dx, want, atol=2e-3)
    # posture pull: with zero target twist, dq moves q toward q0 while the
    # task space stays (nearly) still
    q_hold = wbik.wbik_solve(cfg, J, q, q0, site_pos, site_mat,
                             site_pos, site_mat)
    dq_hold = np.asarray(q_hold - q)
    assert np.linalg.norm(np.asarray(J) @ dq_hold) < 5e-3
    assert np.linalg.norm(np.asarray(q_hold - q0)) < np.linalg.norm(np.asarray(q - q0))


def test_wbik_torso_clamp():
    """Torso rows obey the tighter max_dq_torso clamp (ik_utils.py:322-329)."""
    rng = np.random.default_rng(1)
    n = 6
    J = jnp.asarray(rng.normal(size=(6, n)))
    q = jnp.zeros(n)
    cfg = wbik.WBIKConfig(
        integration_dt=1.0, max_dq=100.0, max_dq_torso=0.01,
        nullspace_gains=tuple([0.0] * n),
        torso_mask=(1.0, 1.0, 0.0, 0.0, 0.0, 0.0),
    )
    q_des = wbik.wbik_solve(
        cfg, J, q, q, jnp.zeros((1, 3)), jnp.eye(3)[None],
        jnp.asarray([[0.5, 0.5, 0.5]]), jnp.eye(3)[None],
    )
    dq = np.asarray(q_des - q)
    assert np.abs(dq[:2]).max() <= 0.01 + 1e-6, dq


@pytest.mark.slow  # TwoArmLift world compile is minutes on XLA:CPU
@pytest.mark.parametrize("robot", ["Baxter", "GR1FixedLowerBody"])
def test_wbik_env_moves_both_arms(robot):
    """End-to-end: WHOLE_BODY_IK on a bimanual robot tracks per-arm delta
    targets with one joint solve (torso participates for GR1)."""
    env = robosuite_tpu.make(
        "TwoArmLift", robots=robot,
        controller_configs={"type": "WHOLE_BODY_IK",
                            "composite_controller_specific_configs": {
                                "ik_input_type": "delta"}},
    )
    r = env.robots[0]
    assert r._wbik_spec is not None
    assert env.action_dim == 12 + sum(
        r.rm.grippers[a].dof for a in r.arms if a in r.rm.grippers
    )
    state, obs = env.reset(jax.random.PRNGKey(0))
    p0_r = np.asarray(obs["robot0_eef_pos"])
    p0_l = np.asarray(obs["robot1_eef_pos"])
    a = np.zeros(env.action_dim, dtype=np.float32)
    idx = r.action_split_indexes()
    a[idx["right"][0] + 2] = 0.05   # +z target for right eef
    a[idx["left"][0] + 2] = 0.05    # +z target for left eef
    for _ in range(4):
        state, obs, rew, d, i = env.step(state, jnp.asarray(a))
    p1_r = np.asarray(obs["robot0_eef_pos"])
    p1_l = np.asarray(obs["robot1_eef_pos"])
    assert np.isfinite(np.asarray(state.physics.qpos)).all()
    assert p1_r[2] > p0_r[2] + 0.01, (p0_r, p1_r)
    assert p1_l[2] > p0_l[2] + 0.01, (p0_l, p1_l)


@pytest.mark.slow  # TwoArmLift world compile is minutes on XLA:CPU
def test_single_robot_two_arm_configuration():
    """One bimanual robot drives TwoArm envs (env_configuration
    auto-'single-robot', reference two_arm_env.py:29-55)."""
    env = robosuite_tpu.make("TwoArmLift", robots="Baxter")
    assert env.env_configuration == "single-robot"
    assert len(env.robots) == 1
    state, obs = env.reset(jax.random.PRNGKey(0))
    # two distinct eef observation streams from the one robot
    assert not np.allclose(obs["robot0_eef_pos"], obs["robot1_eef_pos"])
    a = 0.1 * np.ones(env.action_dim, dtype=np.float32)
    state, obs, rew, d, i = env.step(state, jnp.asarray(a))
    assert np.isfinite(np.asarray(state.physics.qpos)).all()
    assert np.isfinite(float(rew))
