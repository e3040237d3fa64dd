"""Shared test helpers: build specs, run them through MuJoCo for ground truth."""

from __future__ import annotations

import numpy as np

from robosuite_tpu.models import spec as S
from robosuite_tpu.models.mjcf.export import export_xml


def make_test_world(with_free_box=True, with_slide=True, gravity=(0, 0, -9.81), density=0.0):
    """An arm-ish chain with awkward offsets + quats, a slide joint, and a
    free box: exercises every joint type the robosuite stack uses."""
    ms = S.ModelSpec("testworld", S.OptionSpec(gravity=gravity, density=density, viscosity=0.0))
    w = ms.worldbody

    l1 = w.add_body(S.BodySpec("link1", pos=(0.1, 0.0, 0.3), quat=(0.9238795, 0.0, 0.0, 0.3826834)))
    l1.add_joint(S.JointSpec("j1", type="hinge", axis=(0, 0, 1), pos=(0.02, 0.01, 0.0), damping=0.1, armature=0.02))
    l1.inertial = S.InertialSpec(mass=2.0, pos=(0.05, 0.0, 0.1), quat=(0.970, 0.0, 0.243, 0.0), diaginertia=(0.02, 0.015, 0.01))
    l1.add_geom(S.GeomSpec("g1", type="capsule", size=(0.04, 0.1), pos=(0, 0, 0.1), contype=0, conaffinity=0))
    l1.add_site(S.SiteSpec("s1", pos=(0.0, 0.02, 0.2)))

    l2 = l1.add_body(S.BodySpec("link2", pos=(0.0, 0.0, 0.25), quat=(0.9659258, 0.2588190, 0.0, 0.0)))
    l2.add_joint(S.JointSpec("j2", type="hinge", axis=(0, 1, 0), damping=0.05, armature=0.01, range=(-2.0, 2.0)))
    l2.inertial = S.InertialSpec(mass=1.5, pos=(0.0, 0.03, 0.12), diaginertia=(0.012, 0.011, 0.005))
    l2.add_geom(S.GeomSpec("g2", type="capsule", size=(0.035, 0.09), pos=(0, 0, 0.1), contype=0, conaffinity=0))

    l3 = l2.add_body(S.BodySpec("link3", pos=(0.02, 0.0, 0.22)))
    l3.add_joint(S.JointSpec("j3", type="hinge", axis=(1, 0, 0), damping=0.02))
    l3.inertial = S.InertialSpec(
        mass=0.8, pos=(0.0, 0.0, 0.08),
        fullinertia=(0.006, 0.005, 0.004, 0.0005, 0.0002, -0.0003),
    )
    l3.add_site(S.SiteSpec("ee_site", pos=(0.0, 0.0, 0.15), quat=(0.7071068, 0.0, 0.7071068, 0.0)))

    if with_slide:
        sl = l3.add_body(S.BodySpec("slider", pos=(0.0, 0.01, 0.16)))
        sl.add_joint(S.JointSpec("js", type="slide", axis=(0, 1, 0), damping=1.0, armature=0.5, range=(-0.04, 0.04)))
        sl.inertial = S.InertialSpec(mass=0.1, pos=(0, 0, 0.02), diaginertia=(1e-4, 1e-4, 5e-5))
        sl.add_geom(S.GeomSpec("gpad", type="box", size=(0.008, 0.004, 0.008), contype=0, conaffinity=0))

    if with_free_box:
        fb = w.add_body(S.BodySpec("box", pos=(0.5, 0.1, 0.2), quat=(0.9914449, 0.0, 0.1305262, 0.0)))
        fb.add_joint(S.JointSpec("boxjoint", type="free"))
        fb.add_geom(S.GeomSpec("boxgeom", type="box", size=(0.02, 0.021, 0.022), density=800.0, contype=0, conaffinity=0))

    ms.add_actuator(S.ActuatorSpec("a1", joint="j1", kind="motor", ctrlrange=(-80, 80)))
    ms.add_actuator(S.ActuatorSpec("a2", joint="j2", kind="motor", ctrlrange=(-80, 80)))
    ms.add_actuator(S.ActuatorSpec("a3", joint="j3", kind="motor", ctrlrange=(-12, 12)))
    if with_slide:
        ms.add_actuator(S.ActuatorSpec("as", joint="js", kind="position", kp=1000.0, ctrlrange=(0.0, 0.04), forcerange=(-20, 20)))
    return ms


def mj_from_spec(ms):
    import mujoco

    return mujoco.MjModel.from_xml_string(export_xml(ms))


def mj_forward_data(ms, qpos, qvel=None):
    """Compile spec in MuJoCo, set state, mj_forward, return (m, d)."""
    import mujoco

    m = mj_from_spec(ms)
    d = mujoco.MjData(m)
    d.qpos[:] = np.asarray(qpos, dtype=np.float64)
    d.qvel[:] = 0.0 if qvel is None else np.asarray(qvel, dtype=np.float64)
    mujoco.mj_forward(m, d)
    return m, d


def mj_fullM(m, d):
    import mujoco

    M = np.zeros((m.nv, m.nv))
    mujoco.mj_fullM(m, d, M)
    return M
