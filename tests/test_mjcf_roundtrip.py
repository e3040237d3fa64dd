"""MJCF importer/exporter round trip + composite controller spec."""

import numpy as np
import pytest

from robosuite_tpu.models.mjcf.export import export_xml
from robosuite_tpu.models.mjcf.parser import parse_mjcf
from tests import helpers


def test_mjcf_export_import_roundtrip():
    ms = helpers.make_test_world()
    xml = export_xml(ms)
    ms2 = parse_mjcf(xml)
    m1 = ms.compile(device=False)
    m2 = ms2.compile(device=False)
    assert m1.nq == m2.nq and m1.nv == m2.nv and m1.nbody == m2.nbody
    np.testing.assert_allclose(np.asarray(m1.qpos0), np.asarray(m2.qpos0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m1.body_pos), np.asarray(m2.body_pos), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m1.body_mass), np.asarray(m2.body_mass), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m1.dof_armature), np.asarray(m2.dof_armature), atol=1e-8)
    assert m1.jnt_names == m2.jnt_names


def test_import_reference_robot_xml():
    """The importer handles a real reference robot MJCF (panda)."""
    import os

    path = "/root/reference/robosuite/models/assets/robots/panda/robot.xml"
    if not os.path.exists(path):
        pytest.skip("reference assets unavailable")
    ms = parse_mjcf(path)
    names = [j.name for b in ms.worldbody.walk() for j in b.joints]
    assert names[:7] == [f"joint{i}" for i in range(1, 8)]
    assert len(ms.actuators) == 7


def test_composite_controller_spec():
    from robosuite_tpu.controllers.composite import make_composite

    spec = make_composite("BASIC", arms=("right",))
    assert spec.action_dim == 7
    assert spec.action_split[0][2] == 6

    wbik = make_composite("WHOLE_BODY_IK", arms=("right", "left"))
    assert wbik.action_dim == 14


def test_light_roundtrip():
    """MJCF <light> elements survive export -> parse -> compile (reference
    arenas declare scene lights, e.g. table_arena.xml:41)."""
    import numpy as np

    from robosuite_tpu.models import spec as S
    from robosuite_tpu.models.mjcf.export import export_xml
    from robosuite_tpu.models.mjcf.parser import parse_mjcf

    ms = S.ModelSpec("lit", S.OptionSpec())
    ms.worldbody.add_geom(S.GeomSpec("floor", type="plane", size=(2, 2, 0.1)))
    ms.worldbody.add_light(
        S.LightSpec(pos=(1, 1, 1.5), dir=(-0.2, -0.2, -1), directional=True,
                    specular=(0.3, 0.3, 0.3), castshadow=False)
    )
    b = ms.worldbody.add_body(S.BodySpec("b", pos=(0, 0, 0.5)))
    b.add_geom(S.GeomSpec("bg", type="sphere", size=(0.05,)))
    b.add_light(S.LightSpec(name="spot", pos=(0, 0, 1), diffuse=(0.5, 0.4, 0.3)))

    xml = export_xml(ms)
    ms2 = parse_mjcf(xml)
    m2 = ms2.compile(device=False)
    assert m2.nlight == 2
    assert m2.light_names == ("light0", "spot")
    assert m2.light_bodyid == (0, 1)
    np.testing.assert_allclose(np.asarray(m2.light_directional), [1.0, 0.0])
    d0 = np.asarray(m2.light_dir)[0]
    np.testing.assert_allclose(d0, np.array([-0.2, -0.2, -1.0]) / np.linalg.norm([-0.2, -0.2, -1.0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m2.light_diffuse)[1], [0.5, 0.4, 0.3], atol=1e-6)
