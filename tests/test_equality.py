"""Equality constraints: connect holds points together; joint couples joints."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robosuite_tpu.models import spec as S
from robosuite_tpu.physics import engine
from robosuite_tpu.physics.state import State


def test_connect_holds_pendulum_tip():
    """A bar with a free joint, its end held to a world anchor by a connect
    equality: it must swing like a pendulum, keeping the tip near the anchor."""
    ms = S.ModelSpec("eq")
    w = ms.worldbody
    anchor_body = w.add_body(S.BodySpec("anchor", pos=(0, 0, 1.0)))
    anchor_body.inertial = S.InertialSpec(mass=0.0, diaginertia=(0, 0, 0))
    bar = w.add_body(S.BodySpec("bar", pos=(0.1, 0, 0.9)))
    bar.add_joint(S.JointSpec("barj", type="free"))
    bar.add_geom(S.GeomSpec("barg", type="capsule", size=(0.01, 0.1), contype=0, conaffinity=0, density=1000))
    ms.equalities.append(S.EqualitySpec(kind="connect", body1="bar", body2="anchor", anchor=(0, 0, 0.1)))

    model = ms.compile()
    assert model.neq == 1
    state = State.make(model)
    # MuJoCo connect semantics: the constraint preserves the qpos0-relative
    # configuration, so the held world point is the tip's initial position
    held = np.array([0.1, 0, 1.0])
    # displace the bar sideways; the constraint must yank the tip back and
    # the bar swings about the held point
    q0 = np.asarray(state.qpos).copy()
    q0[0] += 0.05
    q0[2] -= 0.02
    state = state.replace(qpos=jnp.asarray(q0))
    stepn = jax.jit(lambda s: engine.step_n(model, s, jnp.zeros(0), 25))
    for i in range(30):
        state = stepn(state)
    q = np.asarray(state.qpos)
    from robosuite_tpu.physics import kinematics

    kin = jax.jit(kinematics.fk)(model, state.qpos)
    bid = model.body_name2id("bar")
    tip = np.asarray(kin.xpos[bid] + kin.xmat[bid] @ np.array([0, 0, 0.1]))
    assert np.linalg.norm(tip - held) < 0.02, tip
    assert np.isfinite(q).all()
    # the bar moved (swung) from its displaced start
    assert abs(q[0] - q0[0]) > 0.01


def test_joint_coupling_tracks_polycoef():
    """Two hinges coupled by a joint equality: driving one drags the other."""
    ms = S.ModelSpec("eqj")
    w = ms.worldbody
    a = w.add_body(S.BodySpec("a", pos=(0, 0, 0.5)))
    a.add_joint(S.JointSpec("ja", type="hinge", axis=(0, 1, 0), damping=0.5))
    a.inertial = S.InertialSpec(mass=0.5, pos=(0, 0, -0.1), diaginertia=(0.01, 0.01, 0.002))
    b = w.add_body(S.BodySpec("b", pos=(0.3, 0, 0.5)))
    b.add_joint(S.JointSpec("jb", type="hinge", axis=(0, 1, 0), damping=0.5))
    b.inertial = S.InertialSpec(mass=0.5, pos=(0, 0, -0.1), diaginertia=(0.01, 0.01, 0.002))
    ms.option.gravity = np.zeros(3)
    ms.add_actuator(S.ActuatorSpec("ma", joint="ja", kind="position", kp=20.0))
    ms.equalities.append(S.EqualitySpec(kind="joint", joint1="jb", joint2="ja", polycoef=(0, 1, 0, 0, 0), solref=(0.01, 1)))

    model = ms.compile()
    state = State.make(model)
    ctrl = jnp.asarray([0.6])
    stepn = jax.jit(lambda s: engine.step_n(model, s, ctrl, 25))
    for _ in range(30):
        state = stepn(state)
    q = np.asarray(state.qpos)
    assert abs(q[0] - 0.6) < 0.1, q       # servo reached target
    assert abs(q[1] - q[0]) < 0.05, q     # coupled joint follows


def test_xarm7_gripper_compiles_with_equalities():
    import robosuite_tpu

    env = robosuite_tpu.make("Lift", robots="XArm7", cube_size=[0.021, 0.021, 0.021])
    assert env.model.neq == 3
