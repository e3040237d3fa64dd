"""Ray-cast renderer: geometry + depth sanity on a controlled scene."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robosuite_tpu.models import spec as S
from robosuite_tpu.physics import kinematics
from robosuite_tpu.renderers.raycast import render_camera


@pytest.fixture(scope="module")
def scene():
    ms = S.ModelSpec("scene")
    w = ms.worldbody
    w.add_geom(S.GeomSpec("floor", type="plane", size=(3, 3, 0.1)))
    b = w.add_body(S.BodySpec("ball", pos=(0.0, 0.0, 0.5)))
    b.add_geom(S.GeomSpec("ballg", type="sphere", size=(0.2,), contype=0, conaffinity=0))
    box = w.add_body(S.BodySpec("box", pos=(0.8, 0.0, 0.3)))
    box.add_geom(S.GeomSpec("boxg", type="box", size=(0.2, 0.2, 0.3), contype=0, conaffinity=0))
    # camera looking down -x from x=3 toward origin (OpenCV forward = -x)
    w.add_camera(S.CameraSpec("cam", pos=(3.0, 0.0, 0.5), quat=(0.5, 0.5, 0.5, 0.5), fovy=45.0))
    model = ms.compile()
    kin = jax.jit(kinematics.fk)(model, model.qpos0)
    return model, kin


def test_depth_and_hits(scene):
    model, kin = scene
    rgb, depth = jax.jit(lambda k: render_camera(model, k, "cam", 64, 64))(kin)
    rgb, depth = np.asarray(rgb), np.asarray(depth)
    assert rgb.shape == (64, 64, 3) and depth.shape == (64, 64)
    assert np.isfinite(rgb).all()
    center = depth[32, 32]
    # camera at x=3 looking toward origin: the ball surface is at x=0.2 ->
    # expected depth ~2.8; the box (0.6..1.0) may occlude at ~2.0 depending
    # on the exact pixel: accept either surface
    assert 1.8 < center < 2.9, center
    # sky pixels at the top have zero depth
    assert depth[0, 0] == 0.0 or depth[-1, -1] == 0.0
    # some variety in the image (not all sky)
    hits = (depth > 0).mean()
    assert hits > 0.2


def test_renderer_batches(scene):
    model, kin = scene
    # vmap over a batch of perturbed states
    q = jnp.tile(model.qpos0[None], (4, 1))

    def r(qp):
        k = kinematics.fk(model, qp)
        _, d = render_camera(model, k, "cam", 32, 32)
        return d

    depths = jax.jit(jax.vmap(r))(q)
    assert depths.shape == (4, 32, 32)


def test_opencv_viewer_headless(lift_env, tmp_path):
    """OpenCVViewer parity surface (reference opencv_renderer.py:10-90):
    renders, concatenates cameras, records, exports frames headlessly."""
    import jax

    from robosuite_tpu.renderers import MjViewerRenderer, OpenCVViewer

    state, _ = lift_env.reset(jax.random.PRNGKey(0))
    v = OpenCVViewer(lift_env, camera_names="agentview", height=24, width=24, record=True)
    frame = v.render(state)
    assert frame.shape == (24, 24, 3) and frame.dtype == np.uint8
    # multi-camera horizontal concat + set_camera by id
    v.set_camera(camera_id=[0, 0], height=16, width=16)
    frame2 = v.render(state)
    assert frame2.shape == (16, 32, 3)
    out = v.save_video(str(tmp_path / "frames.npy"))
    assert np.load(out).ndim == 4
    v.close()
    assert v.frames == []

    mj = MjViewerRenderer(lift_env, height=16, width=16)
    assert mj.render(state).shape == (16, 16, 3)
    mj.update()
    mj.close()


def test_composite_spec_hybrid_mobile_base():
    """HYBRID_MOBILE_BASE split: arms, mobile parts, grippers, trailing
    base-mode dim (reference composite_controller.py:234-291, :86-95)."""
    from robosuite_tpu.controllers.composite import make_composite

    spec = make_composite(
        "HYBRID_MOBILE_BASE", arms=("right",), gripper_dims={"right": 1},
        part_dims={"base": 3, "torso": 1},
    )
    names = [n for n, _, _ in spec.action_split]
    assert names == ["right", "torso", "base", "right_gripper", "base_mode"]
    assert spec.action_dim == spec.arm_configs["right"].control_dim + 3 + 1 + 1 + 1


@pytest.mark.slow
def test_hull_mesh_geoms_render():
    """Hull-backed mesh geoms (PickPlace milk/bread/cereal/can) render via
    their convex face planes: they appear in the segmentation map and
    produce finite depth (VERDICT r2 missing #6 — physics collided hulls
    while cameras showed primitive shells)."""
    import numpy as np

    import robosuite_tpu
    from robosuite_tpu.physics import kinematics
    from robosuite_tpu.renderers.raycast import render_camera, render_segmentation

    env = robosuite_tpu.make("PickPlaceCan", robots="Panda")
    state, _ = env.reset(jax.random.PRNGKey(0))
    kin = kinematics.fk(env.model, state.physics.qpos)
    rgb, depth = jax.jit(lambda k: render_camera(env.model, k, "agentview", 48, 48))(kin)
    seg = jax.jit(lambda k: render_segmentation(env.model, k, "agentview", 48, 48))(kin)
    mesh_geoms = [
        g for g in range(env.model.ngeom)
        if env.model.geom_type[g] == 7 and env.model.geom_meshid[g] >= 0
    ]
    seg_ids = set(np.unique(np.asarray(seg)).tolist())
    assert any(g in seg_ids for g in mesh_geoms), "no hull geom in segmentation"
    assert np.all(np.isfinite(np.asarray(depth)))


def test_model_lights_shading():
    """The compiled <light> array drives shading: a directional light from
    +x lights the box's +x face; switching to a light from -x (via
    model.replace) changes the image without retracing the scene setup."""
    ms = S.ModelSpec("lit_scene")
    w = ms.worldbody
    w.add_geom(S.GeomSpec("floor", type="plane", size=(3, 3, 0.1)))
    box = w.add_body(S.BodySpec("box", pos=(0.0, 0.0, 0.3)))
    box.add_geom(S.GeomSpec("boxg", type="box", size=(0.2, 0.2, 0.3), contype=0, conaffinity=0))
    w.add_camera(S.CameraSpec("cam", pos=(3.0, 0.0, 0.5), quat=(0.5, 0.5, 0.5, 0.5), fovy=45.0))
    w.add_light(S.LightSpec(pos=(2, 0, 2), dir=(-1.0, 0.0, -0.3), directional=True))
    model = ms.compile()
    kin = jax.jit(kinematics.fk)(model, model.qpos0)

    # the renderer reads the model statically (cam_fovy etc.), so each
    # model closes over its own jit
    rgb_a, _ = jax.jit(lambda k: render_camera(model, k, "cam", 48, 48))(kin)
    flipped = model.replace(light_dir=jnp.asarray([[1.0, 0.0, -0.3]]) / np.linalg.norm([1, 0, -0.3]))
    rgb_b, _ = jax.jit(lambda k: render_camera(flipped, k, "cam", 48, 48))(kin)
    rgb_a, rgb_b = np.asarray(rgb_a), np.asarray(rgb_b)
    assert np.isfinite(rgb_a).all() and np.isfinite(rgb_b).all()
    # the camera faces the box's +x side: lit from +x it must be brighter
    # than lit from -x (which leaves only ambient)
    center_a = rgb_a[24, 24].mean()
    center_b = rgb_b[24, 24].mean()
    assert center_a > center_b + 0.05, (center_a, center_b)

    # point light: same scene but a point light behind the camera
    ms2 = S.ModelSpec("lit_scene2")
    w2 = ms2.worldbody
    w2.add_geom(S.GeomSpec("floor", type="plane", size=(3, 3, 0.1)))
    b2 = w2.add_body(S.BodySpec("box", pos=(0.0, 0.0, 0.3)))
    b2.add_geom(S.GeomSpec("boxg", type="box", size=(0.2, 0.2, 0.3), contype=0, conaffinity=0))
    w2.add_camera(S.CameraSpec("cam", pos=(3.0, 0.0, 0.5), quat=(0.5, 0.5, 0.5, 0.5), fovy=45.0))
    w2.add_light(S.LightSpec(pos=(2.0, 0.0, 0.5), directional=False))
    m2 = ms2.compile()
    kin2 = jax.jit(kinematics.fk)(m2, m2.qpos0)
    rgb_p, _ = jax.jit(lambda k: render_camera(m2, k, "cam", 48, 48))(kin2)
    rgb_p = np.asarray(rgb_p)
    assert np.isfinite(rgb_p).all()
    assert rgb_p[24, 24].mean() > 0.1
