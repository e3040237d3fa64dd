"""IK_POSE parity vs the reference solve (VERDICT r4 missing #2).

Golden fixtures (tests/fixtures/ik_probe_*.npz, tools/gen_golden_ik.py)
record the REAL reference compute_joint_positions outputs
(controllers/parts/arm/ik.py:209-302) at 48 rollout states of the reference
Lift env per robot: the site Jacobian over the arm dofs, current/initial
joints, the raw 6-dim delta action, the reference-clipped (dpos, drot), and
the reference q_des. The TPU solve (controllers/parts/ik.py) must reproduce
q_des from the same inputs, including its own input clipping.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robosuite_tpu.controllers.parts import ik as ik_mod

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")


def _load(robot):
    path = os.path.join(FIXDIR, f"ik_probe_{robot}.npz")
    if not os.path.exists(path):
        pytest.skip(f"fixture {path} missing (run tools/gen_golden_ik.py)")
    return np.load(path)


@pytest.mark.parametrize("robot", ["panda", "sawyer"])
def test_ik_solve_matches_reference(robot):
    fx = _load(robot)
    cfg = ik_mod.IKConfig(dim=fx["q"].shape[1])
    q0 = jnp.asarray(fx["initial_joint"], dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)

    solve = jax.jit(jax.vmap(
        lambda J, q, dpos, drot: ik_mod.solve_q_des(cfg, J, q, q0, dpos, drot)
    ))
    q_des = solve(
        jnp.asarray(fx["J"], dtype=jnp.float32),
        jnp.asarray(fx["q"], dtype=jnp.float32),
        jnp.asarray(fx["dpos"], dtype=jnp.float32),
        jnp.asarray(fx["drot"], dtype=jnp.float32),
    )
    # f32 vs the reference's f64: the DLS solve + nullspace projector keep
    # ~1e-5 agreement; dq magnitudes are O(0.1)
    np.testing.assert_allclose(np.asarray(q_des), fx["q_des"], atol=2e-4)


@pytest.mark.parametrize("robot", ["panda"])
def test_ik_input_clipping_matches_reference(robot):
    # clip_ik_input must reproduce the reference _clip_ik_input
    # (ik.py:476-508): translation norm-clip + rotation angle clip
    fx = _load(robot)
    cfg = ik_mod.IKConfig()
    from robosuite_tpu.utils import transforms as T

    clip = jax.jit(lambda a: ik_mod.clip_ik_input(cfg, a[:3], a[3:6]))
    for i in range(fx["actions"].shape[0]):
        dpos, dquat = clip(jnp.asarray(fx["actions"][i], dtype=jnp.float32))
        np.testing.assert_allclose(np.asarray(dpos), fx["dpos"][i], atol=1e-6)
        R = np.asarray(T.quat2mat(dquat))
        np.testing.assert_allclose(R, fx["drot"][i], atol=1e-5)


def test_ik_pose_controller_end_to_end():
    # IK_POSE as the arm controller of a live env: a +x delta must move the
    # eef in +x through the IK -> JOINT_POSITION stack
    import robosuite_tpu

    env = robosuite_tpu.make("Lift", robots="Panda", controller_configs="IK_POSE")
    state, obs = env.reset(jax.random.PRNGKey(0))
    act = np.zeros(env.action_dim)
    act[0] = 1.0
    p0 = np.asarray(obs["robot0_eef_pos"])
    for _ in range(10):
        state, obs, rew, done, _ = env.step(state, jnp.asarray(act))
    p1 = np.asarray(obs["robot0_eef_pos"])
    assert p1[0] - p0[0] > 5e-3, f"eef did not track +x IK deltas: {p1 - p0}"
    assert np.isfinite(np.asarray(state.physics.qpos)).all()
