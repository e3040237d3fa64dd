"""OSC torque parity vs the reference controller — the BASELINE metric.

Two fixtures:
  * osc_probe_panda_rollout.npz — states visited along an actual Lift
    rollout (the BASELINE protocol regime): strict <= 1e-3 parity.
  * osc_probe_panda.npz — uniformly random joint states including
    near-singular poses: float32 conditioning (cond(J M^-1 J^T) up to 2e5)
    bounds achievable parity to ~cond * eps32; checked at a documented
    looser tolerance. The reference computes this path in float64.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robosuite_tpu.controllers.base import ArmView
from robosuite_tpu.controllers.parts import osc
from robosuite_tpu.physics import dynamics, kinematics

HERE = os.path.dirname(__file__)


@pytest.fixture(scope="module")
def lift_model():
    from robosuite_tpu.models.arenas import TableArena
    from robosuite_tpu.models.bases import robot_base_factory
    from robosuite_tpu.models.grippers import gripper_factory
    from robosuite_tpu.models.objects import BoxObject
    from robosuite_tpu.models.robots import create_robot
    from robosuite_tpu.models.tasks import ManipulationTask

    robot = create_robot("Panda")
    robot.add_base(robot_base_factory(robot.default_base))
    robot.add_gripper(gripper_factory("PandaGripper", arm="right"), "right")
    robot.set_base_xpos(robot.base_xpos_offset["table"](0.8))
    cube = BoxObject(name="cube", size=[0.0216647, 0.0200736, 0.0211351])
    return ManipulationTask(TableArena(), [robot], cube).compile()


def make_view(model, qpos, qvel, initial_joint):
    """ArmView for the Panda right arm (dofs 0..6)."""
    kin = kinematics.fk(model, qpos)
    M = dynamics.crba(model, kin)
    bias = dynamics.rnea_bias(model, kin, qvel)
    eef_sid = model.site_name2id("gripper0_right_grip_site")
    center_sid = model.site_name2id("robot0_right_center")
    jacp, jacr = kinematics.site_jacobian(model, kin, eef_sid)
    lin, ang = kinematics.site_velocity(model, kin, qvel, eef_sid)
    olin, oang = kinematics.site_velocity(model, kin, qvel, center_sid)
    return ArmView(
        joint_pos=qpos[:7],
        joint_vel=qvel[:7],
        ref_pos=kin.site_xpos[eef_sid],
        ref_ori_mat=kin.site_xmat[eef_sid],
        ref_pos_vel=lin,
        ref_ori_vel=ang,
        J_pos=jacp[:, :7],
        J_ori=jacr[:, :7],
        mass_matrix=M[:7, :7],
        torque_compensation=bias[:7],
        initial_joint=initial_joint,
        origin_pos=kin.site_xpos[center_sid],
        origin_ori=kin.site_xmat[center_sid],
        origin_pos_vel=olin,
        origin_ori_vel=oang,
    )


def run_all_probes(model, probe):
    """One jitted vmapped call over every probe state.

    NOTE: model is closed over (constant-folded), and the batch uses
    lax.map, not vmap — XLA:CPU compile of the vmapped FK graph is
    pathologically slow on this host (407s vs 16s measured).
    """
    cfg = osc.OSCConfig()

    def single(qpos, qvel, init_j, action):
        view = make_view(model, qpos, qvel, init_j)
        st = osc.init_state(cfg, view)
        st = osc.set_goal(cfg, st, view, action)
        return osc.run(cfg, st, view)

    fn = jax.jit(lambda *a: jax.lax.map(lambda x: single(*x), a))
    return np.asarray(
        fn(
            jnp.asarray(probe["qpos"], dtype=jnp.float32),
            jnp.asarray(probe["qvel"], dtype=jnp.float32),
            jnp.asarray(probe["initial_joint"], dtype=jnp.float32),
            jnp.asarray(probe["action"][:, :6], dtype=jnp.float32),
        )
    )


def test_osc_torque_parity_rollout(lift_model):
    probe = np.load(os.path.join(HERE, "fixtures", "osc_probe_panda_rollout.npz"))
    tau = run_all_probes(lift_model, probe)
    err = np.abs(tau - probe["torques"]).max(axis=1)
    print(f"\nOSC parity (rollout states): max={err.max():.2e} mean={err.mean():.2e}")
    # BASELINE bound, strict reading: MAX per-step torque error <= 1e-3
    # along rollout states (met since the Taylor-form small-rotation maps
    # in utils/transforms.py — r1 measured max 4e-3). The f64 floor on this
    # fixture is ~5e-4 (residual model difference vs MuJoCo-derived J/M).
    assert err.mean() <= 1e-3, f"mean torque error {err.mean()} exceeds 1e-3 (BASELINE)"
    assert err.max() <= 1e-3, f"max torque error {err.max()} exceeds 1e-3 (BASELINE)"


def test_osc_torque_parity_random_states(lift_model):
    probe = np.load(os.path.join(HERE, "fixtures", "osc_probe_panda.npz"))
    tau = run_all_probes(lift_model, probe)
    err = np.abs(tau - probe["torques"]).max(axis=1)
    print(f"\nOSC parity (random states): max={err.max():.2e} mean={err.mean():.2e} p95={np.percentile(err, 95):.2e}")
    # float32 conditioning bound at near-singular poses (cond up to 2e5);
    # the reference computes this chain in float64. Documented stress case.
    # r3: the M^-1 Newton refinement pulled p95 from ~1e-1 to ~5e-3; the
    # bound locks that in (measured p95 5.1e-3, median < 2e-3, max ~1.2e-1
    # on the worst near-singular probe).
    # r4: power-of-two Jacobi equilibration in _pinv_sym cut the worst-case
    # error 8x (1.24e-1 -> 1.49e-2 measured; p95 5.1e-3 -> 3.5e-3); the
    # exact (error-free) scaling leaves rollout-regime parity bit-stable.
    assert err.max() <= 3e-2
    assert np.percentile(err, 95) <= 7e-3
    assert np.median(err) <= 4e-3
