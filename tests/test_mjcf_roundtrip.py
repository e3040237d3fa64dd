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
