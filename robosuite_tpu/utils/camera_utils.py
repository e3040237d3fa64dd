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


def get_camera_segmentation(env, state, camera_name, camera_height, camera_width,
                            level="element"):
    """Per-pixel segmentation from the raycast renderer (reference
    camera_utils.py:90-103; levels mirror robot_env.py:452-517: "element"
    (geom id), "instance" (model instance), "class" (model class))."""
    from robosuite_tpu.physics import kinematics
    from robosuite_tpu.renderers.raycast import render_segmentation

    model = env.model
    kin = kinematics.fk(model, state.physics.qpos)
    geom_to_label = None
    if level != "element":
        inst_map, cls_map = env.task.generate_id_mappings(model)
        chosen = inst_map if level == "instance" else cls_map
        names = sorted(set(chosen.values()))
        geom_to_label = {g: names.index(v) for g, v in chosen.items()}
    return render_segmentation(
        model, kin, camera_name, camera_height, camera_width, geom_to_label=geom_to_label
    )


def bilinear_interpolate(im, x, y):
    """Bilinear sampling of image `im` at fractional pixel coords
    (reference camera_utils.py:215-243)."""
    im = jnp.asarray(im)
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, im.shape[1] - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, im.shape[0] - 2)
    x1, y1 = x0 + 1, y0 + 1
    xf = jnp.clip(x, 0.0, im.shape[1] - 1.0) - x0
    yf = jnp.clip(y, 0.0, im.shape[0] - 1.0) - y0
    Ia, Ib = im[y0, x0], im[y1, x0]
    Ic, Id = im[y0, x1], im[y1, x1]
    wa = (1.0 - xf) * (1.0 - yf)
    wb = (1.0 - xf) * yf
    wc = xf * (1.0 - yf)
    wd = xf * yf
    return wa * Ia + wb * Ib + wc * Ic + wd * Id


class CameraMover:
    """Manipulate a named camera's pose (reference camera_utils.py:246-419).

    The reference re-initializes the env and mutates the camera's mocap body.
    Here cameras are model constants, so moving one is a functional model
    update: each setter swaps `env.model` for a model with new cam_pos /
    cam_quat (jit caches key on array values, not identity, so downstream
    jitted renders stay cached per unique pose).
    """

    def __init__(self, env, camera="agentview", init_camera_pos=None, init_camera_quat=None):
        self.env = env
        self.camera = camera
        self.cam_id = env.model.cam_name2id(camera)
        if init_camera_pos is not None or init_camera_quat is not None:
            self.set_camera_pose(pos=init_camera_pos, quat=init_camera_quat)

    def get_camera_pose(self):
        """(pos (3,), quat wxyz (4,)) in the camera body's frame
        (reference :307-320)."""
        m = self.env.model
        return np.asarray(m.cam_pos[self.cam_id]), np.asarray(m.cam_quat[self.cam_id])

    def set_camera_pose(self, pos=None, quat=None):
        """reference :291-305."""
        m = self.env.model
        cam_pos = np.asarray(m.cam_pos).copy()
        cam_quat = np.asarray(m.cam_quat).copy()
        if pos is not None:
            cam_pos[self.cam_id] = np.asarray(pos)
        if quat is not None:
            cam_quat[self.cam_id] = np.asarray(quat)
        self.env.model = m.replace(cam_pos=jnp.asarray(cam_pos), cam_quat=jnp.asarray(cam_quat))
        if hasattr(self.env, "_refresh_jit"):
            self.env._refresh_jit()  # retrace so renders/steps see the new pose

    def move_camera(self, direction, scale):
        """Translate along a camera-frame direction (reference :401-419)."""
        pos, quat = self.get_camera_pose()
        R = np.asarray(T.quat2mat_wxyz(jnp.asarray(quat)))
        self.set_camera_pose(pos=pos + scale * (R @ np.asarray(direction, dtype=np.float64)))

    def rotate_camera(self, point, axis, angle):
        """Rotate the camera about `axis` through `point` (camera frame),
        angle in degrees (reference :368-399)."""
        pos, quat = self.get_camera_pose()
        rad = np.pi * angle / 180.0
        axis = np.asarray(axis, dtype=np.float64)
        axis = axis / np.linalg.norm(axis)
        K = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]])
        Rrot = np.eye(3) + np.sin(rad) * K + (1 - np.cos(rad)) * (K @ K)
        R0 = np.asarray(T.quat2mat_wxyz(jnp.asarray(quat)))
        p = np.asarray(point, dtype=np.float64) if point is not None else pos
        new_pos = p + Rrot @ (pos - p)
        new_R = Rrot @ R0
        new_quat = np.asarray(T.mat2quat_wxyz(jnp.asarray(new_R)))
        self.set_camera_pose(pos=new_pos, quat=new_quat)


class DemoPlaybackCameraMover(CameraMover):
    """Replay HDF5 demos frame by frame while moving the camera
    (reference camera_utils.py:421-628).

    Wraps an env + RaycastRenderer; `grab_episode_frames` replays a demo's
    recorded states and renders each policy step, optionally panning the
    camera about a point.
    """

    def __init__(self, demo_file, env=None, camera="agentview", height=256, width=256):
        import json

        import h5py

        self._f = h5py.File(demo_file, "r")
        if env is None:
            import robosuite_tpu

            info = json.loads(self._f["data"].attrs["env"])
            robots = info["robots"]
            env = robosuite_tpu.make(
                info["env_name"], robots=robots if len(robots) > 1 else robots[0]
            )
        super().__init__(env, camera=camera)
        self.height = height
        self.width = width
        self._states = None
        self._cursor = 0
        self._renderer = None
        # playback keeps the pose host-side and feeds it to the renderer as a
        # traced argument — one compile for the whole pan, no model rebuilds
        self._pos, self._quat = self.get_camera_pose()

    def get_camera_pose(self):
        if getattr(self, "_pos", None) is not None:
            return np.asarray(self._pos), np.asarray(self._quat)
        return super().get_camera_pose()

    def set_camera_pose(self, pos=None, quat=None):
        if getattr(self, "_pos", None) is None:  # during base __init__
            return super().set_camera_pose(pos=pos, quat=quat)
        if pos is not None:
            self._pos = np.asarray(pos)
        if quat is not None:
            self._quat = np.asarray(quat)

    def load_episode_xml(self, demo_num):
        """Point the playback at demo `demo_num` (reference :531-565);
        rebuilds the env model from the stored MJCF when present."""
        key = f"demo_{demo_num}" if f"data/demo_{demo_num}" in self._f else f"demo{demo_num}"
        grp = self._f[f"data/{key}"]
        model_xml = grp.attrs.get("model_file", "")
        if model_xml:
            from robosuite_tpu.models.mjcf.parser import parse_mjcf

            self.env.task.spec = parse_mjcf(model_xml)
            self.env.rebuild_model()
            self.cam_id = self.env.model.cam_name2id(self.camera)
            self._renderer = None  # new model constants -> retrace
        self._states = np.asarray(grp["states"])
        self._cursor = 0

    def grab_next_frame(self):
        """Render the next recorded state; None when the episode ends
        (reference :567-593)."""
        if self._states is None or self._cursor >= len(self._states):
            return None
        from robosuite_tpu.renderers.raycast import RaycastRenderer

        st = self.env.state_from_flattened(self._states[self._cursor])
        self._cursor += 1
        if self._renderer is None:
            self._renderer = RaycastRenderer(self.env, self.camera, self.height, self.width)
        rgb, _ = self._renderer.render(st, cam_pos=self._pos, cam_quat=self._quat)
        return (np.clip(rgb, 0, 1) * 255).astype(np.uint8)

    def grab_episode_frames(self, demo_num, pan_point=(0, 0, 0.8), pan_axis=(0, 0, 1), pan_rate=0.01):
        """All frames of one episode with a continuous camera pan
        (reference :595-628)."""
        self.load_episode_xml(demo_num)
        frames = []
        while True:
            frame = self.grab_next_frame()
            if frame is None:
                break
            frames.append(frame)
            self.rotate_camera(point=pan_point, axis=pan_axis, angle=360.0 * pan_rate)
        return frames
