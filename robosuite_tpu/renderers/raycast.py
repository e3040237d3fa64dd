"""Ray-cast renderer: camera observations in pure JAX.

The reference renders cameras through OpenGL (EGL/GLFW/OSMesa contexts,
binding_utils.py:49-219) — a host-side C dependency that cannot batch. This
renderer computes analytic ray-primitive intersections (plane / sphere /
capsule / cylinder / box) for every pixel under jit, so camera observables
vmap across thousands of scenarios on TPU like everything else.

Produces RGB (Lambertian, one directional light) + metric depth. Mesh geoms
are skipped (primitive shells render instead). Resolution and cameras come
from the model's compiled camera array.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from robosuite_tpu.models import spec as S
from robosuite_tpu import macros

_BIG = 1e9


def _ray_plane(o, d, R):
    """Plane at origin with normal R[:,2] (local z); infinite extent."""
    n = R[:, 2]
    denom = jnp.dot(d, n)
    t = jnp.where(jnp.abs(denom) > 1e-9, -jnp.dot(o, n) / denom, _BIG)
    t = jnp.where(t > 1e-4, t, _BIG)
    return t, n * jnp.sign(-denom)


def _ray_sphere(o, d, r):
    b = jnp.dot(o, d)
    c = jnp.dot(o, o) - r * r
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = jnp.where(disc > 0, -b - sq, _BIG)
    t = jnp.where(t > 1e-4, t, _BIG)
    n = o + t * d
    return t, n / jnp.maximum(jnp.linalg.norm(n), 1e-9)


def _ray_box(o, d, half):
    inv = 1.0 / jnp.where(jnp.abs(d) > 1e-9, d, 1e-9)
    t1 = (-half - o) * inv
    t2 = (half - o) * inv
    tmin = jnp.max(jnp.minimum(t1, t2))
    tmax = jnp.min(jnp.maximum(t1, t2))
    hit = (tmax > jnp.maximum(tmin, 1e-4))
    t = jnp.where(hit, tmin, _BIG)
    t = jnp.where(t > 1e-4, t, _BIG)
    p = o + t * d
    # face normal: axis of largest |p|/half
    q = jnp.abs(p) / jnp.maximum(half, 1e-9)
    ax = jnp.argmax(q)
    n = jnp.sign(p) * (jnp.arange(3) == ax)
    return t, n


def _ray_capsule(o, d, r, hl):
    # infinite cylinder around local z
    a = d[0] * d[0] + d[1] * d[1]
    b = o[0] * d[0] + o[1] * d[1]
    c = o[0] * o[0] + o[1] * o[1] - r * r
    disc = b * b - a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_cyl = jnp.where((disc > 0) & (a > 1e-12), (-b - sq) / jnp.maximum(a, 1e-12), _BIG)
    z_hit = o[2] + t_cyl * d[2]
    t_cyl = jnp.where(jnp.abs(z_hit) <= hl, t_cyl, _BIG)
    # end spheres
    def sphere_at(zc):
        oc = o - jnp.array([0.0, 0.0, 1.0]) * zc
        bb = jnp.dot(oc, d)
        cc = jnp.dot(oc, oc) - r * r
        dd = bb * bb - cc
        ss = jnp.sqrt(jnp.maximum(dd, 0.0))
        return jnp.where(dd > 0, -bb - ss, _BIG)

    t_top = sphere_at(hl)
    t_bot = sphere_at(-hl)
    t = jnp.minimum(t_cyl, jnp.minimum(t_top, t_bot))
    t = jnp.where(t > 1e-4, t, _BIG)
    p = o + t * d
    pz = jnp.clip(p[2], -hl, hl)
    n = p - jnp.array([0.0, 0.0, 1.0]) * pz
    return t, n / jnp.maximum(jnp.linalg.norm(n), 1e-9)


def _ray_cylinder(o, d, r, hl):
    a = d[0] * d[0] + d[1] * d[1]
    b = o[0] * d[0] + o[1] * d[1]
    c = o[0] * o[0] + o[1] * o[1] - r * r
    disc = b * b - a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_side = jnp.where((disc > 0) & (a > 1e-12), (-b - sq) / jnp.maximum(a, 1e-12), _BIG)
    z_hit = o[2] + t_side * d[2]
    t_side = jnp.where(jnp.abs(z_hit) <= hl, t_side, _BIG)
    # caps
    t_cap_top = jnp.where(jnp.abs(d[2]) > 1e-9, (hl - o[2]) / d[2], _BIG)
    in_top = (o[0] + t_cap_top * d[0]) ** 2 + (o[1] + t_cap_top * d[1]) ** 2 <= r * r
    t_cap_top = jnp.where(in_top, t_cap_top, _BIG)
    t_cap_bot = jnp.where(jnp.abs(d[2]) > 1e-9, (-hl - o[2]) / d[2], _BIG)
    in_bot = (o[0] + t_cap_bot * d[0]) ** 2 + (o[1] + t_cap_bot * d[1]) ** 2 <= r * r
    t_cap_bot = jnp.where(in_bot, t_cap_bot, _BIG)
    t = jnp.minimum(t_side, jnp.minimum(t_cap_top, t_cap_bot))
    t = jnp.where(t > 1e-4, t, _BIG)
    p = o + t * d
    side_n = jnp.array([p[0], p[1], 0.0])
    side_n = side_n / jnp.maximum(jnp.linalg.norm(side_n), 1e-9)
    n = jnp.where(t == t_side, side_n, jnp.array([0.0, 0.0, 1.0]) * jnp.sign(p[2]))
    return t, n


def _trace_one(model, geom_xpos, geom_xmat, origin, direction, geom_ids):
    """Closest hit over the given static geom id list.

    Returns (t, normal_world, geom_index_in_list)."""
    best_t = jnp.asarray(_BIG)
    best_n = jnp.zeros(3)
    best_i = jnp.asarray(-1)
    for idx, g in enumerate(geom_ids):
        R = geom_xmat[g]
        p = geom_xpos[g]
        o_l = R.T @ (origin - p)
        d_l = R.T @ direction
        gt = model.geom_type[g]
        size = model.geom_size[g]
        if gt == S.PLANE:
            t, n_l = _ray_plane(o_l, d_l, jnp.eye(3))
        elif gt == S.SPHERE:
            t, n_l = _ray_sphere(o_l, d_l, size[0])
        elif gt == S.BOX:
            t, n_l = _ray_box(o_l, d_l, size)
        elif gt == S.CAPSULE:
            t, n_l = _ray_capsule(o_l, d_l, size[0], size[1])
        elif gt == S.CYLINDER:
            t, n_l = _ray_cylinder(o_l, d_l, size[0], size[1])
        else:  # mesh etc: skip
            continue
        closer = t < best_t
        best_n = jnp.where(closer, R @ n_l, best_n)
        best_i = jnp.where(closer, idx, best_i)
        best_t = jnp.where(closer, t, best_t)
    return best_t, best_n, best_i


def render_camera(model, kin, camera_name, height=84, width=84, geom_groups=(0, 1)):
    """Render (rgb (H,W,3) float in [0,1], depth (H,W) metric) from a fixed
    camera. jit/vmap friendly; geoms selected statically by group."""
    from robosuite_tpu.utils import camera_utils as CU

    cam_id = model.cam_name2id(camera_name)
    fovy = float(np.asarray(model.cam_fovy)[cam_id])
    f = 0.5 * height / np.tan(fovy * np.pi / 360.0)

    R = CU.get_camera_extrinsic_matrix(model, kin, camera_name)
    cam_pos = R[:3, 3]
    cam_rot = R[:3, :3]  # columns: x right, y down, z forward (OpenCV)

    # static geom selection: visual + collision groups, no mesh
    geom_ids = [
        g for g in range(model.ngeom)
        if model.geom_type[g] != S.MESH
    ]

    ys = (jnp.arange(height) - height / 2.0 + 0.5) / f
    xs = (jnp.arange(width) - width / 2.0 + 0.5) / f
    dirs_cam = jnp.stack(
        [
            jnp.broadcast_to(xs[None, :], (height, width)),
            jnp.broadcast_to(ys[:, None], (height, width)),
            jnp.ones((height, width)),
        ],
        axis=-1,
    )
    dirs = dirs_cam @ cam_rot.T
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    rgba = jnp.asarray(np.array([[0.5, 0.5, 0.5, 1.0]]).repeat(model.ngeom, 0), dtype=jnp.float32)
    # use spec rgba if available on the model? geoms carry rgba in spec only;
    # shade by normal + per-geom pseudo-color from index for contrast
    light_dir = jnp.asarray([0.3, 0.3, -0.9])
    light_dir = light_dir / jnp.linalg.norm(light_dir)

    colors = []
    rng = np.random.default_rng(0)
    for g in geom_ids:
        colors.append(rng.uniform(0.3, 0.9, 3))
    colors = jnp.asarray(np.array(colors), dtype=jnp.float32)

    def pixel(d):
        t, n, gi = _trace_one(model, kin.geom_xpos, kin.geom_xmat, cam_pos, d, geom_ids)
        hit = t < _BIG * 0.5
        lam = jnp.clip(jnp.dot(n, -light_dir), 0.0, 1.0)
        base = jnp.where(gi >= 0, colors[jnp.maximum(gi, 0)], jnp.ones(3) * 0.7)
        col = base * (0.35 + 0.65 * lam)
        sky = jnp.asarray([0.7, 0.8, 0.9])
        rgb = jnp.where(hit, col, sky)
        # depth along camera forward axis
        depth = jnp.where(hit, t * jnp.dot(d, cam_rot[:, 2]), 0.0)
        return rgb, depth

    rgb, depth = jax.vmap(jax.vmap(pixel))(dirs)
    if macros.IMAGE_CONVENTION == "opengl":
        rgb = rgb[::-1]
        depth = depth[::-1]
    return rgb, depth


class RaycastRenderer:
    """Host-side convenience: bind a model + camera, render states.

    The functional core (render_camera) is what envs embed for camera
    observables; this wrapper mirrors the reference's renderer objects
    (renderers/viewer/*.py) for scripting.
    """

    def __init__(self, env, camera_name="agentview", height=84, width=84):
        self.env = env
        self.camera_name = camera_name
        self.height = height
        self.width = width
        from robosuite_tpu.physics import kinematics

        def _render(qpos):
            kin = kinematics.fk(env.model, qpos)
            return render_camera(env.model, kin, camera_name, height, width)

        self._render = jax.jit(_render)

    def render(self, state):
        rgb, depth = self._render(state.physics.qpos)
        return np.asarray(rgb), np.asarray(depth)
