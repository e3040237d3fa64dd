"""Camera geometry: intrinsics / extrinsics / pixel<->world transforms.

Re-derivation of reference utils/camera_utils.py:20-243 as pure JAX math.
Conventions match the reference: MuJoCo camera frames look down -z; the
"camera axis correction" flips y and z so pixels follow the OpenCV
convention; IMAGE_CONVENTION controls vertical flip.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from robosuite_tpu import macros
from robosuite_tpu.utils import transforms as T


def get_camera_intrinsic_matrix(model, camera_name, camera_height, camera_width):
    """3x3 K (reference camera_utils.py:20-46)."""
    cam_id = model.cam_name2id(camera_name)
    fovy = float(np.asarray(model.cam_fovy)[cam_id])
    f = 0.5 * camera_height / np.tan(fovy * np.pi / 360.0)
    return jnp.asarray(
        [[f, 0.0, camera_width / 2.0], [0.0, f, camera_height / 2.0], [0.0, 0.0, 1.0]],
        dtype=jnp.float32,
    )


def get_camera_extrinsic_matrix(model, kin, camera_name):
    """4x4 camera pose in world (reference camera_utils.py:49-76)."""
    cam_id = model.cam_name2id(camera_name)
    bid = model.cam_bodyid[cam_id]
    cam_pos = kin.xpos[bid] + kin.xmat[bid] @ model.cam_pos[cam_id]
    cam_rot = kin.xmat[bid] @ T.quat2mat_wxyz(model.cam_quat[cam_id])
    R = jnp.zeros((4, 4), dtype=cam_pos.dtype).at[3, 3].set(1.0)
    R = R.at[:3, :3].set(cam_rot).at[:3, 3].set(cam_pos)
    # camera axis correction (reference :69-73): flip y and z
    correction = jnp.asarray(
        [[1.0, 0, 0, 0], [0, -1.0, 0, 0], [0, 0, -1.0, 0], [0, 0, 0, 1.0]], dtype=cam_pos.dtype
    )
    return R @ correction


def get_camera_transform_matrix(model, kin, camera_name, camera_height, camera_width):
    """4x4 world -> pixel (reference camera_utils.py:79-106)."""
    R = get_camera_extrinsic_matrix(model, kin, camera_name)
    K = get_camera_intrinsic_matrix(model, camera_name, camera_height, camera_width)
    K_exp = jnp.zeros((4, 4), dtype=K.dtype).at[:3, :3].set(K).at[3, 3].set(1.0)
    return K_exp @ jnp.linalg.inv(R)


def project_points_from_world_to_camera(points, world_to_camera_transform, camera_height, camera_width):
    """world points -> (pixel rows, cols) (reference camera_utils.py:136-172)."""
    points = jnp.asarray(points)
    ones = jnp.ones(points.shape[:-1] + (1,), dtype=points.dtype)
    homog = jnp.concatenate([points, ones], axis=-1)
    pix = jnp.einsum("ij,...j->...i", world_to_camera_transform, homog)
    pix = pix / pix[..., 2:3]
    u, v = pix[..., 0], pix[..., 1]
    if macros.IMAGE_CONVENTION == "opengl":
        v = camera_height - 1 - v
    return jnp.stack([v, u], axis=-1)


def transform_from_pixels_to_world(pixels, depth_map, camera_to_world_transform):
    """pixels + depth -> world points (reference camera_utils.py:175-243)."""
    pixels = jnp.asarray(pixels)
    v, u = pixels[..., 0], pixels[..., 1]
    h = depth_map.shape[-2] if depth_map.ndim >= 2 else None
    if macros.IMAGE_CONVENTION == "opengl" and h is not None:
        v_idx = h - 1 - v
    else:
        v_idx = v
    z = depth_map[..., v_idx.astype(jnp.int32), u.astype(jnp.int32)]
    cam_pts = jnp.stack([u * z, v_idx * z, z, jnp.ones_like(z)], axis=-1)
    world = jnp.einsum("ij,...j->...i", camera_to_world_transform, cam_pts)
    return world[..., :3]


def get_real_depth_map(depth_map, extent):
    """Normalized z-buffer -> metric depth (reference camera_utils.py:109-133).

    MuJoCo depth: near / (1 - d * (1 - near/far)).
    """
    near, far = 0.001 * extent, 50.0 * extent
    return near / (1.0 - depth_map * (1.0 - near / far))
