"""Mobile / legged robot runtime: wheeled + legged robots construct, expose
the reference action layout, and step.

Reference parity anchors:
  * robots/__init__.py:15-34 ROBOT_CLASS_MAPPING (PandaOmron/Tiago wheeled,
    SpotWithArmFloating legged)
  * composite_controller.py:86-95 action split ordering; :234-291
    HybridMobileBase trailing base-mode dim
  * controllers/parts/mobile_base/joint_vel.py:159-259 base twist law
The expected split dicts below were read off the live reference
(tools/ref_harness.py) on 2026-08-18.
"""

import numpy as np
import pytest

import robosuite_tpu
from robosuite_tpu.controllers.parts import mobile_base as mb_mod

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

REF_SPLITS = {
    "PandaOmron": {
        "right": (0, 6),
        "torso": (6, 7),
        "base": (7, 10),
        "right_gripper": (10, 11),
        "base_mode": (11, 12),
    },
    "Tiago": {
        "right": (0, 6),
        "left": (6, 12),
        "torso": (12, 13),
        "head": (13, 15),
        "base": (15, 18),
        "right_gripper": (18, 19),
        "left_gripper": (19, 20),
    },
    "SpotWithArmFloating": {
        "right": (0, 6),
        "base": (6, 9),
        "right_gripper": (9, 10),
    },
}


@pytest.fixture(scope="module")
def envs():
    return {r: robosuite_tpu.make("Lift", robots=r) for r in REF_SPLITS}


@pytest.mark.parametrize("robot", sorted(REF_SPLITS))
def test_action_split_matches_reference(envs, robot):
    env = envs[robot]
    got = env.robots[0].action_split_indexes()
    assert got == REF_SPLITS[robot]
    assert env.action_dim == max(e for _, e in REF_SPLITS[robot].values())


@pytest.mark.slow
def test_pandaomron_steps_and_base_translates(envs):
    # Tiago's step graph is construction-tested only: its bimanual step
    # compile alone costs ~3 min on XLA:CPU (stepping is same code path)
    env = envs["PandaOmron"]
    out = env.reset(jax.random.PRNGKey(0))
    st = out[0] if isinstance(out, tuple) else out
    r = env.robots[0]
    base_qpos_idx = r.part_qpos_idx["base"]
    x0 = float(st.physics.qpos[base_qpos_idx[0]])

    # command forward base velocity with base-mode engaged
    a = np.zeros(env.action_dim, dtype=np.float32)
    s, e = REF_SPLITS["PandaOmron"]["base"]
    a[s] = 1.0  # forward
    a[-1] = 1.0  # base mode on
    for _ in range(3):
        st, obs, rew, done, info = env.step(st, a)
    x1 = float(st.physics.qpos[base_qpos_idx[0]])
    assert x1 > x0 + 1e-3, f"base did not translate forward: {x0} -> {x1}"


@pytest.mark.slow
def test_spot_steps_without_nan(envs):
    env = envs["SpotWithArmFloating"]
    out = env.reset(jax.random.PRNGKey(0))
    st = out[0] if isinstance(out, tuple) else out
    a = np.zeros(env.action_dim, dtype=np.float32)
    st, obs, rew, done, info = env.step(st, a)
    assert np.isfinite(np.asarray(st.physics.qpos)).all()
    assert np.isfinite(np.asarray(st.physics.qvel)).all()


def test_mobile_base_twist_rotation():
    """set_goal rotates the planar command from the current base frame into
    the initial base frame (joint_vel.py:203-216)."""
    cfg = mb_mod.MobileBaseJointVelConfig()
    st = mb_mod.init_state(cfg, init_yaw=0.0)
    # base yawed 90deg: forward command (x) maps onto the initial +y axis
    new = mb_mod.set_goal(cfg, st, jnp.array([1.0, 0.0, 0.0]), cur_yaw=jnp.pi / 2)
    np.testing.assert_allclose(np.asarray(new.goal_qvel), [0.0, -1.0, 0.0], atol=1e-6)
    # reference sign convention: reverse rotation (x*c + y*s, -x*s + y*c)
    new2 = mb_mod.set_goal(cfg, st, jnp.array([0.0, 1.0, 0.0]), cur_yaw=jnp.pi / 2)
    np.testing.assert_allclose(np.asarray(new2.goal_qvel), [1.0, 0.0, 0.0], atol=1e-6)


def test_mobile_base_run_rescales_to_ctrlrange():
    cfg = mb_mod.MobileBaseJointVelConfig()
    st = mb_mod.init_state(cfg, init_yaw=0.0)
    st = mb_mod.set_goal(cfg, st, jnp.array([1.0, -1.0, 0.0]), cur_yaw=0.0)
    lo = jnp.array([-0.5, -0.5, -1.5])
    hi = jnp.array([0.5, 0.5, 1.5])
    v = mb_mod.run(cfg, st, lo, hi)
    np.testing.assert_allclose(np.asarray(v), [0.5, -0.5, 0.0], atol=1e-6)
