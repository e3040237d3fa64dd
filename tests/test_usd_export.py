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
        xpos = np.zeros((m.nbody, 3))
        xmat = np.tile(np.eye(3), (m.nbody, 1, 1))

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


def test_usd_body_mounted_light_and_active_flag(tmp_path):
    """Lights/cameras on non-world bodies export at the composed WORLD pose
    (model light_pos is body-frame); inactive lights are skipped."""
    ms = S.ModelSpec("usd_world2", make_world_option())
    w = ms.worldbody
    b = w.add_body(S.BodySpec("carrier", pos=(0, 0, 0.5)))
    b.add_joint(S.JointSpec("cj", type="free"))
    b.add_geom(S.GeomSpec("cg", type="sphere", size=(0.05,)))
    b.lights.append(S.LightSpec(name="lamp", pos=(0.1, 0, 0), directional=False))
    w.add_light(S.LightSpec(name="dead", pos=(9, 9, 9), directional=False, active=False))
    m = ms.compile(device=False)

    ex = USDExporter(m, framerate=20)

    class FakeKin:
        geom_xpos = np.zeros((m.ngeom, 3))
        geom_xmat = np.tile(np.eye(3), (m.ngeom, 1, 1))
        xpos = np.zeros((m.nbody, 3))
        xmat = np.tile(np.eye(3), (m.nbody, 1, 1))

    k = FakeKin()
    bid = m.body_name2id("carrier")
    k.xpos = k.xpos.copy()
    k.xpos[bid] = [2.0, 3.0, 4.0]
    ex.update_scene(k)
    path = ex.save_scene(str(tmp_path / "scene2.usda"))
    text = open(path).read()
    # composed world position = body (2,3,4) + local (0.1,0,0)
    assert "(2.1, 3, 4)" in text
    assert 'def SphereLight "dead"' not in text


def test_usd_baked_textures(tmp_path):
    """Visual-override textures bake to PNG files next to the stage with a
    UsdUVTexture network per textured geom (reference usd/exporter.py
    texture export; pattern family = TextureModder checker/gradient/noise,
    utils/mjmod.py)."""
    import struct

    ms = S.ModelSpec("usd_tex", make_world_option())
    w = ms.worldbody
    w.add_geom(S.GeomSpec("floor", type="plane", size=(2, 2, 0.1)))
    b = w.add_body(S.BodySpec("box", pos=(0, 0, 0.1)))
    b.add_joint(S.JointSpec("bj", type="free"))
    b.add_geom(S.GeomSpec("bg", type="box", size=(0.02,) * 3, rgba=(0.9, 0.1, 0.1, 1)))
    can = CanObject("can")
    w.children.append(can.get_obj())
    ms.meshes.update(can.meshes())
    m = ms.compile(device=False)

    tex_mode = np.zeros(m.ngeom, dtype=int)
    tex_mode[m.geom_name2id("floor")] = 1      # checker
    tex_mode[m.geom_name2id("bg")] = 2         # gradient
    visual = dict(
        tex_mode=tex_mode,
        tex_rgb2=np.tile(np.array([0.2, 0.3, 0.4]), (m.ngeom, 1)),
    )
    ex = USDExporter(m, framerate=20, meshes=ms.meshes, visual=visual)

    class FakeKin:
        geom_xpos = np.zeros((m.ngeom, 3))
        geom_xmat = np.tile(np.eye(3), (m.ngeom, 1, 1))
        xpos = np.zeros((m.nbody, 3))
        xmat = np.tile(np.eye(3), (m.nbody, 1, 1))

    ex.update_scene(FakeKin())
    path = ex.save_scene(str(tmp_path / "scene_tex.usda"))
    text = open(path).read()
    # textured geoms gained a shader network; untextured kept plain diffuse
    assert "UsdUVTexture" in text
    assert "UsdPrimvarReader_float2" in text
    assert "@scene_tex_textures/floor.png@" in text
    assert "@scene_tex_textures/bg.png@" in text
    # baked files are valid PNGs (signature + IHDR dims)
    png = (tmp_path / "scene_tex_textures" / "floor.png").read_bytes()
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    w_, h_ = struct.unpack(">II", png[16:24])
    assert (w_, h_) == (64, 64)
    # mesh prims carry planar UVs for the texture network
    assert "primvars:st" in text
