"""Convex-hull (mesh) collision: hull cards, maxplane narrowphase, and
cross-engine parity vs real MuJoCo mesh collision (reference
models/objects/*.xml mesh objects)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robosuite_tpu.models import spec as S
from robosuite_tpu.models.objects.hull_objects import (
    BreadObject, CanObject, CerealObject, MilkObject, load_hull,
)
from robosuite_tpu.models.tasks import make_world_option
from robosuite_tpu.physics import engine
from robosuite_tpu.physics.state import State


def _hull_world(obj, start_z=0.15):
    ms = S.ModelSpec("hullworld", make_world_option())
    ms.worldbody.add_geom(S.GeomSpec("floor", type="plane", size=(2, 2, 0.1)))
    ms.worldbody.children.append(obj.get_obj())
    ms.meshes.update(obj.meshes())
    m = ms.compile()
    state = State.make(m)
    q = np.asarray(state.qpos).copy()
    q[0:3] = [0, 0, start_z]
    return ms, m, state.replace(qpos=jnp.asarray(q, dtype=jnp.float32))


@pytest.mark.parametrize("cls", [MilkObject, BreadObject, CerealObject, CanObject])
def test_hull_settles_on_plane(cls):
    obj = cls(cls.hull_name)
    ms, m, state = _hull_world(obj)
    assert m.nmesh == 1
    stepn = jax.jit(lambda s: engine.step_n(m, s, jnp.zeros(0), 50))
    for _ in range(10):
        state = stepn(state)
    q = np.asarray(state.qpos)
    assert np.isfinite(q).all()
    rest_z = -float(obj.bottom_offset[2])
    assert abs(float(q[2]) - rest_z) < 0.004, (float(q[2]), rest_z)
    # did not slide away
    assert np.linalg.norm(q[0:2]) < 0.02, q[0:3]


def test_hull_mass_matches_mujoco():
    """Hull mass/inertia from the divergence-theorem moments must match
    MuJoCo's mesh compiler on the same hull."""
    import mujoco

    from robosuite_tpu.models.mjcf.export import export_xml

    obj = MilkObject("milk")
    ms, m, _ = _hull_world(obj)
    mjm = mujoco.MjModel.from_xml_string(export_xml(ms))
    b = mjm.body("milk_main")
    np.testing.assert_allclose(np.asarray(m.body_mass)[1], b.mass[0], rtol=2e-2)
    np.testing.assert_allclose(
        np.asarray(m.body_inertia)[1], np.sort(b.inertia)[::-1], rtol=5e-2
    )


def test_hull_drop_tracks_mujoco():
    """Cross-engine: a dropped can settles at the same height in both
    engines (MuJoCo collides the same hull via its own mesh pipeline)."""
    import mujoco

    from robosuite_tpu.models.mjcf.export import export_xml

    obj = CanObject("can")
    ms, m, state = _hull_world(obj, start_z=0.08)
    stepn = jax.jit(lambda s: engine.step_n(m, s, jnp.zeros(0), 50))
    for _ in range(10):
        state = stepn(state)
    q_tpu = np.asarray(state.qpos, dtype=np.float64)

    mjm = mujoco.MjModel.from_xml_string(export_xml(ms))
    mjd = mujoco.MjData(mjm)
    mjd.qpos[:] = 0
    mjd.qpos[2] = 0.08
    mjd.qpos[3] = 1.0
    for _ in range(500):
        mujoco.mj_step(mjm, mjd)
    assert abs(q_tpu[2] - mjd.qpos[2]) < 0.005, (q_tpu[:3], mjd.qpos[:3])
    assert np.linalg.norm(q_tpu[0:2] - mjd.qpos[0:2]) < 0.02


def test_hull_grasp_between_boxes():
    """Box-hull manifold: two fingerpad-like boxes squeezing a can hold it
    against gravity (the PickPlace grasp regime)."""
    ms = S.ModelSpec("pinch", make_world_option())
    w = ms.worldbody
    obj = CanObject("can")
    root = obj.get_obj()
    w.children.append(root)
    ms.meshes.update(obj.meshes())
    r = obj.horizontal_radius
    for i, side in enumerate((-1.0, 1.0)):
        f = w.add_body(S.BodySpec(f"finger{i}", pos=(side * (r + 0.02), 0, 0.0)))
        f.add_joint(S.JointSpec(f"fj{i}", type="slide", axis=(-side, 0, 0), damping=5.0))
        f.add_geom(S.GeomSpec(f"fg{i}", type="box", size=(0.01, 0.03, 0.03),
                              friction=(1.5, 0.01, 0.0001), mass=0.2))
        ms.add_actuator(S.ActuatorSpec(f"fa{i}", joint=f"fj{i}", kind="position",
                                       kp=300.0, ctrlrange=(0.0, 0.05)))
    m = ms.compile()
    state = State.make(m)
    q = np.asarray(state.qpos).copy()
    q[0:3] = [0, 0, 0.0]
    state = state.replace(qpos=jnp.asarray(q, dtype=jnp.float32))
    ctrl = jnp.asarray([0.05, 0.05])
    stepn = jax.jit(lambda s: engine.step_n(m, s, ctrl, 50))
    for _ in range(8):
        state = stepn(state)
    q = np.asarray(state.qpos)
    assert np.isfinite(q).all()
    # pinched can must not fall (no floor in this world)
    assert q[2] > -0.05, q[:3]


@pytest.mark.slow
def test_pick_place_env_with_hull_objects():
    """PickPlace builds with the four hull-backed objects and steps finite
    (reference pick_place.py's Milk/Bread/Cereal/Can)."""
    import robosuite_tpu

    env = robosuite_tpu.make("PickPlace", robots="Panda")
    assert env.model.nmesh == 4
    state, obs = env.reset(jax.random.PRNGKey(0))
    a = np.zeros(env.action_dim, dtype=np.float32)
    for _ in range(3):
        state, obs, r, d, i = env.step(state, jnp.asarray(a))
    assert np.isfinite(np.asarray(state.physics.qpos)).all()
