"""Gripper harness tests (reference tests/test_grippers/* via
gripper_tester.py): the Panda gripper must grasp and lift a box."""

import numpy as np
import pytest


def test_panda_gripper_grasps_and_lifts():
    from robosuite_tpu.models.grippers.gripper_tester import GripperTester

    t = GripperTester("PandaGripper")
    out = t.run()
    assert out["finite"]
    assert out["lifted"], out


def test_xarm7_tendon_gripper_grasps_and_lifts():
    """XArm7 runs un-pinned: ONE general-actuator servo on the 'split' fixed
    tendon drives both fingers through the connect-equality linkage
    (reference grippers/xarm7_gripper.xml tendon+equality transmission)."""
    from robosuite_tpu.models.grippers.gripper_tester import GripperTester

    t = GripperTester("XArm7Gripper")
    assert t.model.ntendon == 1
    assert any(tid >= 0 for tid in t.model.actuator_tenid)
    out = t.run()
    assert out["finite"], out
    assert out["lifted"], out


@pytest.mark.parametrize(
    "name",
    ["RethinkGripper", "JacoThreeFingerDexterousGripper", "RobotiqThreeFingerDexterousGripper",
     "Robotiq85Gripper", "Robotiq140Gripper"],
)
def test_other_grippers_stable(name):
    """Other grippers at least run the harness stably (grasp success depends
    on finger geometry fidelity; tracked per-gripper). The Robotiq/Jaco
    grippers exercise tendon-equality finger couplings un-pinned."""
    from robosuite_tpu.models.grippers.gripper_tester import GripperTester

    t = GripperTester(name)
    out = t.run(n_steps_per_phase=75)
    assert out["finite"], out


def test_tendon_coupling_tracks_mujoco():
    """Cross-engine parity for the fixed-tendon + tendon-equality subsystem:
    a two-hinge pendulum coupled by a tendon equality (L = 0.5 q1 + 0.5 q2
    pinned to 0) must track real MuJoCo under a torque on joint 1
    (MuJoCo mjEQ_TENDON semantics, engine_core_constraint.c)."""
    import jax
    import jax.numpy as jnp
    import mujoco

    from robosuite_tpu.models import spec as S
    from robosuite_tpu.models.mjcf.export import export_xml
    from robosuite_tpu.models.tasks import make_world_option
    from robosuite_tpu.physics import engine
    from robosuite_tpu.physics.state import State

    ms = S.ModelSpec("tendon_test", make_world_option())
    w = ms.worldbody
    b1 = w.add_body(S.BodySpec("link1", pos=(0, 0, 0.5)))
    b1.add_joint(S.JointSpec("j1", type="hinge", axis=(0, 1, 0), damping=0.1, armature=0.01))
    b1.add_geom(S.GeomSpec("g1", type="capsule", fromto=(0, 0, 0, 0.2, 0, 0), size=(0.02,)))
    b2 = w.add_body(S.BodySpec("link2", pos=(0.3, 0, 0.5)))
    b2.add_joint(S.JointSpec("j2", type="hinge", axis=(0, 1, 0), damping=0.1, armature=0.01))
    b2.add_geom(S.GeomSpec("g2", type="capsule", fromto=(0, 0, 0, 0.2, 0, 0), size=(0.02,)))
    ms.tendons.append(S.TendonSpec("cpl", joints=["j1", "j2"], coefs=[0.5, 0.5]))
    ms.equalities.append(S.EqualitySpec(kind="tendon", tendon1="cpl", solref=(0.005, 1.0)))
    ms.add_actuator(S.ActuatorSpec("m1", joint="j1", kind="motor", ctrlrange=(-2, 2)))

    m = ms.compile()
    state = State.make(m)
    ctrl = jnp.asarray([0.8])
    stepn = jax.jit(lambda s: engine.step_n(m, s, ctrl, 100))
    out = stepn(state)
    q_tpu = np.asarray(out.qpos, dtype=np.float64)

    mjm = mujoco.MjModel.from_xml_string(export_xml(ms))
    mjd = mujoco.MjData(mjm)
    mjd.ctrl[:] = [0.8]
    for _ in range(100):
        mujoco.mj_step(mjm, mjd)
    # the equality holds L = 0 => q2 = -q1 in both engines
    assert abs(float(q_tpu[0] + q_tpu[1])) < 2e-3, q_tpu
    assert abs(float(mjd.qpos[0] + mjd.qpos[1])) < 2e-3, mjd.qpos
    assert np.allclose(q_tpu, mjd.qpos, atol=5e-3), (q_tpu, mjd.qpos)
