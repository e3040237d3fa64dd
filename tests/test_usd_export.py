"""USD exporter: stage structure with materials, lights, cameras, and
hull-mesh prims (reference utils/usd/ exporter surface)."""

import numpy as np

from robosuite_tpu.models import spec as S
from robosuite_tpu.models.objects.hull_objects import CanObject
from robosuite_tpu.models.tasks import make_world_option
from robosuite_tpu.utils.usd.exporter import USDExporter


def test_usd_stage_contents(tmp_path):
    ms = S.ModelSpec("usd_world", make_world_option())
    w = ms.worldbody
    w.add_geom(S.GeomSpec("floor", type="plane", size=(2, 2, 0.1)))
    b = w.add_body(S.BodySpec("box", pos=(0, 0, 0.1)))
    b.add_joint(S.JointSpec("bj", type="free"))
    b.add_geom(S.GeomSpec("bg", type="box", size=(0.02, 0.02, 0.02), rgba=(0.9, 0.1, 0.1, 1)))
    w.cameras.append(S.CameraSpec("agentview", pos=(1, 0, 1), fovy=45.0))
    w.add_light(S.LightSpec(name="key", pos=(1, 1, 1.5), dir=(-0.2, -0.2, -1), directional=True))
    w.add_light(S.LightSpec(name="fill", pos=(-1, 0, 2), directional=False, diffuse=(0.8, 0.7, 0.6)))
    can = CanObject("can")
    w.children.append(can.get_obj())
    ms.meshes.update(can.meshes())
    m = ms.compile(device=False)

    ex = USDExporter(m, framerate=20, meshes=ms.meshes)

    class FakeKin:
        geom_xpos = np.zeros((m.ngeom, 3))
        geom_xmat = np.tile(np.eye(3), (m.ngeom, 1, 1))

    ex.update_scene(FakeKin())
    ex.update_scene(FakeKin())
    path = ex.save_scene(str(tmp_path / "scene.usda"))
    text = open(path).read()
    assert text.startswith("#usda 1.0")
    assert 'def Material "mat_bg"' in text
    assert "UsdPreviewSurface" in text
    # model lights: directional -> DistantLight, point -> SphereLight
    assert 'def DistantLight "key"' in text
    assert 'def SphereLight "fill"' in text
    assert "(0.8, 0.7, 0.6)" in text
    assert 'def DomeLight' in text
    assert 'def Camera "agentview"' in text
    assert 'def Mesh "can_g0"' in text
    assert "faceVertexIndices" in text
    assert "timeSamples" in text
    assert 'rel material:binding = </Materials/mat_can_g0>' in text
