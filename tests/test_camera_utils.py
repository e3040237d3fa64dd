"""Camera geometry parity vs MuJoCo (reference
tests/test_environments/test_camera_transforms.py analog).

Builds the Lift world in both engines and checks that camera extrinsics and
world->pixel projection agree; round-trips pixels through a synthetic depth
map.
"""

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

import jax.numpy as jnp  # noqa: E402

from robosuite_tpu.physics import kinematics  # noqa: E402
from robosuite_tpu.utils import camera_utils as CU  # noqa: E402
from tests import helpers  # noqa: E402
from robosuite_tpu.models import spec as S  # noqa: E402


@pytest.fixture(scope="module")
def world():
    ms = helpers.make_test_world()
    # add a fixed camera like the arenas do
    ms.worldbody.add_camera(
        S.CameraSpec("agentview", pos=(0.5, 0.0, 1.35), quat=(0.653, 0.271, 0.271, 0.653), fovy=45.0)
    )
    model = ms.compile()
    mjm = helpers.mj_from_spec(ms)
    return ms, model, mjm


def test_camera_extrinsics_match(world):
    ms, model, mjm = world
    d = mujoco.MjData(mjm)
    d.qpos[:] = mjm.qpos0
    mujoco.mj_forward(mjm, d)

    kin = kinematics.fk(model, jnp.asarray(mjm.qpos0, dtype=jnp.float32))
    R = np.asarray(CU.get_camera_extrinsic_matrix(model, kin, "agentview"))

    cam_id = mjm.camera("agentview").id
    np.testing.assert_allclose(R[:3, 3], d.cam_xpos[cam_id], atol=1e-5)
    # mujoco cam_xmat columns vs our corrected rotation: correction flips y,z
    mj_rot = d.cam_xmat[cam_id].reshape(3, 3)
    corr = np.diag([1.0, -1.0, -1.0])
    np.testing.assert_allclose(R[:3, :3], mj_rot @ corr, atol=1e-5)


def test_projection_roundtrip(world):
    ms, model, mjm = world
    kin = kinematics.fk(model, jnp.asarray(mjm.qpos0, dtype=jnp.float32))
    H, W = 240, 320
    world_to_cam = CU.get_camera_transform_matrix(model, kin, "agentview", H, W)

    # project a world point in front of the camera, then unproject with the
    # exact depth and check the round trip
    pt = jnp.asarray([0.0, 0.0, 0.8])
    pix = np.asarray(CU.project_points_from_world_to_camera(pt, world_to_cam, H, W))
    assert 0 <= pix[0] < H and 0 <= pix[1] < W

    cam_to_world = jnp.linalg.inv(world_to_cam)
    # camera-frame depth of the point
    R = CU.get_camera_extrinsic_matrix(model, kin, "agentview")
    cam_frame = np.linalg.inv(np.asarray(R)) @ np.array([0.0, 0.0, 0.8, 1.0])
    z = cam_frame[2]
    depth = jnp.full((H, W), z, dtype=jnp.float32)
    back = np.asarray(CU.transform_from_pixels_to_world(jnp.asarray(pix), depth, cam_to_world))
    np.testing.assert_allclose(back, np.asarray(pt), atol=5e-2)
