"""Ray-cast renderer: camera observations in pure JAX.

The reference renders cameras through OpenGL (EGL/GLFW/OSMesa contexts,
binding_utils.py:49-219) — a host-side C dependency that cannot batch. This
renderer computes analytic ray-primitive intersections (plane / sphere /
capsule / cylinder / box) for every pixel under jit, so camera observables
vmap across thousands of scenarios on TPU like everything else.

Produces RGB (Lambertian over the model's <light> array — directional and
point lights, reference arena lights e.g. table_arena.xml:41 — with a
single-directional-light fallback) + metric depth. Mesh geoms
with hull cards render via their convex face planes (ray-halfspace clip);
only card-less meshes fall back to being skipped. Resolution and cameras
come from the model's compiled camera array.
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


def _ray_hull(o, d, fnorm, fdist):
    """Convex hull from face planes (n.x <= d): half-space slab clipping.
    Entry face gives the normal. Padded zero-normal rows drop out (dn ~ 0).
    """
    dn = fnorm @ d
    on = fnorm @ o
    safe = jnp.where(jnp.abs(dn) > 1e-9, dn, 1e-9)
    t = (fdist - on) / safe
    t_in = jnp.where(dn < -1e-9, t, -_BIG)
    t_out = jnp.where(dn > 1e-9, t, _BIG)
    t_enter = jnp.max(t_in)
    t_exit = jnp.min(t_out)
    hit = (t_enter <= t_exit) & (t_enter > 1e-4)
    n = fnorm[jnp.argmax(t_in)]
    return jnp.where(hit, t_enter, _BIG), n


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
        elif gt == S.MESH and model.geom_meshid[g] >= 0:
            mid = model.geom_meshid[g]
            t, n_l = _ray_hull(o_l, d_l, jnp.asarray(model.mesh_fnorm[mid]),
                               jnp.asarray(model.mesh_fdist[mid]))
        else:  # card-less mesh: skip
            continue
        closer = t < best_t
        best_n = jnp.where(closer, R @ n_l, best_n)
        best_i = jnp.where(closer, idx, best_i)
        best_t = jnp.where(closer, t, best_t)
    return best_t, best_n, best_i


def render_camera(model, kin, camera_name, height=84, width=84, geom_groups=None,
                  visual=None):
    """Render (rgb (H,W,3) float in [0,1], depth (H,W) metric) from a fixed
    camera. jit/vmap friendly; geoms selected statically by group.

    `visual` (optional) is a pytree of traced render-time overrides — the
    TPU-native analog of the reference's Texture/Lighting/Camera modders
    (utils/mjmod.py:62,518,782), which mutate a global MjModel and therefore
    cannot differ across parallel instances. Recognized keys (all optional):
      geom_rgb   (ngeom, 3) replacement colors (pattern color 1)
      tex_mode   (ngeom,) 0 rgb | 1 checker | 2 gradient | 3 noise
      tex_rgb2   (ngeom, 3) pattern color 2
      tex_scale  (ngeom,) pattern cell size (m)
      tex_fraction (ngeom,) noise-mode rgb2 fraction (rand_noise)
      tex_grad_vert (ngeom,) bool: gradient along local z (else local x)
      mat_rss    (ngeom, 3) material (reflectance, shininess, specular)
      sky_rgb1/sky_rgb2 (3,) skybox gradient colors
      light_dir  (3,) directional light (world frame)
      ambient    () ambient intensity (default 0.35)
      diffuse    () diffuse intensity (default 0.65)
      cam_dpos   (3,) world-frame camera position offset
      fovy_scale () multiplier on the camera's vertical fov
    """
    from robosuite_tpu.utils import camera_utils as CU

    visual = visual or {}
    cam_id = model.cam_name2id(camera_name)
    fovy = float(np.asarray(model.cam_fovy)[cam_id])
    base_f = 0.5 * height / np.tan(fovy * np.pi / 360.0)
    # fovy_scale rescales the focal length: f = h/2 / tan(scale*fovy/2);
    # small-angle linearization keeps it trace-friendly for scale ~ 1
    fovy_scale = visual.get("fovy_scale", None)
    f = base_f if fovy_scale is None else 0.5 * height / jnp.tan(
        fovy_scale * fovy * jnp.pi / 360.0
    )

    if "cam_pos_local" in visual or "cam_quat_local" in visual:
        # traced camera pose (CameraMover pans without retracing): replaces
        # the model's cam_pos/cam_quat constants in the extrinsics
        from robosuite_tpu.utils import transforms as T

        bid = model.cam_bodyid[cam_id]
        c_pos = visual.get("cam_pos_local", jnp.asarray(model.cam_pos)[cam_id])
        c_quat = visual.get("cam_quat_local", jnp.asarray(model.cam_quat)[cam_id])
        cam_pos = kin.xpos[bid] + kin.xmat[bid] @ c_pos
        cam_rot = (kin.xmat[bid] @ T.quat2mat_wxyz(c_quat)) @ jnp.diag(
            jnp.asarray([1.0, -1.0, -1.0])
        )  # camera axis correction (camera_utils.py:69-73)
    else:
        R = CU.get_camera_extrinsic_matrix(model, kin, camera_name)
        cam_pos = R[:3, 3]
        cam_rot = R[:3, :3]  # columns: x right, y down, z forward (OpenCV)
    if "cam_dpos" in visual:
        cam_pos = cam_pos + visual["cam_dpos"]

    # static geom selection: by group when given (reference renders group
    # 0/1 by default); hull-backed meshes render, card-less meshes skip
    geom_ids = [
        g for g in range(model.ngeom)
        if (model.geom_type[g] != S.MESH or model.geom_meshid[g] >= 0)
        and (geom_groups is None or model.geom_group[g] in geom_groups)
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

    # lighting: the model's compiled <light> array when present (world-frame
    # via the carrying body's pose), else the legacy single key light. A
    # visual["light_dir"] override (LightingModder) forces the single-light
    # path so per-scenario randomization keeps working unchanged.
    use_model_lights = model.nlight > 0 and "light_dir" not in visual
    if use_model_lights:
        lpos_l = jnp.asarray(model.light_pos)        # (nl, 3) body frame
        ldir_l = jnp.asarray(model.light_dir)
        lbid = np.asarray(model.light_bodyid, dtype=np.int32)
        l_xmat = kin.xmat[lbid]                      # (nl, 3, 3)
        lpos_w = kin.xpos[lbid] + jnp.einsum("nij,nj->ni", l_xmat, lpos_l)
        ldir_w = jnp.einsum("nij,nj->ni", l_xmat, ldir_l)
        l_directional = jnp.asarray(model.light_directional)
        l_diffuse = jnp.asarray(model.light_diffuse)  # (nl, 3)
        l_active = jnp.asarray(model.light_active)
    light_dir = visual.get("light_dir", jnp.asarray([0.3, 0.3, -0.9]))
    light_dir = light_dir / jnp.maximum(jnp.linalg.norm(light_dir), 1e-9)
    ambient = visual.get("ambient", 0.35)
    diffuse = visual.get("diffuse", 0.65)

    gid_arr = np.asarray(geom_ids, dtype=np.int32)
    all_rgb = visual.get("geom_rgb", jnp.asarray(model.geom_rgba)[:, :3])
    colors = all_rgb[gid_arr]
    # procedural textures (reference TextureModder checker/gradient/noise
    # bitmaps, mjmod.py:213-330): evaluated analytically at the hit point in
    # the geom's local frame instead of uv-mapped bitmaps
    tex_mode = visual.get("tex_mode", None)          # (ngeom,) 0 rgb|1 checker|2 gradient|3 noise
    if tex_mode is not None:
        tex_mode_g = jnp.asarray(tex_mode)[gid_arr]
        tex_rgb2_g = jnp.asarray(visual.get("tex_rgb2", all_rgb))[gid_arr]
        tex_scale_g = jnp.asarray(
            visual.get("tex_scale", jnp.full((model.ngeom,), 0.08))
        )[gid_arr]
        tex_frac_g = jnp.asarray(
            visual.get("tex_fraction", jnp.full((model.ngeom,), 0.5))
        )[gid_arr]
        tex_vert_g = jnp.asarray(
            visual.get("tex_grad_vert", jnp.ones((model.ngeom,), dtype=bool))
        )[gid_arr]
        xpos_g = kin.geom_xpos[gid_arr]
        xmat_g = kin.geom_xmat[gid_arr]
    # material (reflectance, shininess, specular) per geom — reference
    # TextureModder.set_material (mjmod.py:955-969); drives a Blinn-Phong
    # specular highlight on top of the Lambertian term
    mat_rss = visual.get("mat_rss", None)
    if mat_rss is not None:
        mat_rss_g = jnp.asarray(mat_rss)[gid_arr]

    def pixel(d):
        t, n, gi = _trace_one(model, kin.geom_xpos, kin.geom_xmat, cam_pos, d, geom_ids)
        hit = t < _BIG * 0.5
        if use_model_lights:
            # accumulate Lambertian over the light array: directional lights
            # use -dir; point lights the hit->light direction (MuJoCo's
            # default attenuation [1,0,0] is constant, so no falloff term)
            p_hit_l = cam_pos + t * d

            def light_contrib(lp, ld, is_dir, dif, act):
                to_l = lp - p_hit_l
                to_l = to_l / jnp.maximum(jnp.linalg.norm(to_l), 1e-9)
                ldir_eff = jnp.where(is_dir > 0.5, -ld, to_l)
                return act * jnp.clip(jnp.dot(n, ldir_eff), 0.0, 1.0) * dif

            lam_rgb = jnp.clip(
                jnp.sum(
                    jax.vmap(light_contrib)(
                        lpos_w, ldir_w, l_directional, l_diffuse, l_active
                    ),
                    axis=0,
                ),
                0.0,
                1.0,
            )
        else:
            lam_rgb = jnp.clip(jnp.dot(n, -light_dir), 0.0, 1.0)
        gsafe = jnp.maximum(gi, 0)
        base = jnp.where(gi >= 0, colors[gsafe], jnp.ones(3) * 0.7)
        if tex_mode is not None:
            # analytic pattern weight at the hit point in the geom's local
            # frame (reference set_checker/set_gradient/set_noise bitmaps,
            # mjmod.py:1162-1247, evaluated per-ray instead of per-texel)
            p_hit = cam_pos + t * d
            pl = xmat_g[gsafe].T @ (p_hit - xpos_g[gsafe]) / jnp.maximum(tex_scale_g[gsafe], 1e-4)
            cell = jnp.floor(pl)
            checker = jnp.mod(jnp.sum(cell), 2.0)
            # gradient axis: local z when tex_grad_vert, else local x
            g_ax = jnp.where(tex_vert_g[gsafe], pl[2], pl[0])
            grad_t = jnp.clip(0.5 + 0.5 * g_ax, 0.0, 1.0)
            # noise: rgb2 with probability tex_fraction (rand_noise)
            h = jnp.sin(jnp.dot(cell, jnp.asarray([12.9898, 78.233, 37.719]))) * 43758.5453
            noise_u = h - jnp.floor(h)
            noise = (noise_u < tex_frac_g[gsafe]).astype(base.dtype)
            mode = tex_mode_g[gsafe]
            w = jnp.where(mode == 1, checker, jnp.where(mode == 2, grad_t, jnp.where(mode == 3, noise, 0.0)))
            base = base * (1.0 - w) + tex_rgb2_g[gsafe] * w
        col = base * (ambient + diffuse * lam_rgb)
        if mat_rss is not None:
            # Blinn-Phong specular from the randomized material: intensity
            # follows specular, lobe width follows shininess, and
            # reflectance brightens the diffuse response (the raycast
            # analog of MuJoCo's (reflectance, shininess, specular) triple)
            refl, shine, spec = (mat_rss_g[gsafe, 0], mat_rss_g[gsafe, 1],
                                 mat_rss_g[gsafe, 2])
            hvec = -(d + light_dir)
            hvec = hvec / jnp.maximum(jnp.linalg.norm(hvec), 1e-9)
            ndh = jnp.clip(jnp.dot(n, hvec), 0.0, 1.0)
            col = col * (1.0 + 0.5 * refl) + spec * ndh ** (4.0 + 60.0 * shine)
        sky = jnp.asarray([0.7, 0.8, 0.9])
        if "sky_rgb1" in visual:
            # skybox gradient by view elevation (reference randomize_skybox
            # re-synthesizes the skybox bitmap, mjmod.py:925-927)
            sky_t = jnp.clip(0.5 + 0.5 * jnp.dot(d, jnp.asarray([0.0, 0.0, 1.0])), 0.0, 1.0)
            sky = visual["sky_rgb1"] * (1.0 - sky_t) + visual.get(
                "sky_rgb2", visual["sky_rgb1"]) * sky_t
        rgb = jnp.where(hit, jnp.clip(col, 0.0, 1.0), sky)
        # depth along camera forward axis
        depth = jnp.where(hit, t * jnp.dot(d, cam_rot[:, 2]), 0.0)
        return rgb, depth

    rgb, depth = jax.vmap(jax.vmap(pixel))(dirs)
    if macros.IMAGE_CONVENTION == "opengl":
        rgb = rgb[::-1]
        depth = depth[::-1]
    return rgb, depth


def render_segmentation(model, kin, camera_name, height=84, width=84,
                        geom_to_label=None, geom_groups=None):
    """Per-pixel segmentation map (H, W) int32 under jit.

    Default labels are GLOBAL GEOM IDS (+ -1 background), matching the
    reference's element-level segmentation (robot_env.py:452-517,
    camera_utils.py:90-103 get_camera_segmentation). Pass `geom_to_label`
    (dict geom id -> int, e.g. from ManipulationTask.generate_id_mappings)
    for instance- or class-level maps.
    """
    from robosuite_tpu.utils import camera_utils as CU

    cam_id = model.cam_name2id(camera_name)
    fovy = float(np.asarray(model.cam_fovy)[cam_id])
    f = 0.5 * height / np.tan(fovy * np.pi / 360.0)
    R = CU.get_camera_extrinsic_matrix(model, kin, camera_name)
    cam_pos, cam_rot = R[:3, 3], R[:3, :3]

    geom_ids = [
        g for g in range(model.ngeom)
        if (model.geom_type[g] != S.MESH or model.geom_meshid[g] >= 0)
        and (geom_groups is None or model.geom_group[g] in geom_groups)
    ]
    labels = np.asarray(
        [geom_to_label.get(g, -1) if geom_to_label else g for g in geom_ids],
        dtype=np.int32,
    )
    labels_j = jnp.asarray(labels)

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

    def pixel(d):
        t, _, gi = _trace_one(model, kin.geom_xpos, kin.geom_xmat, cam_pos, d, geom_ids)
        hit = t < _BIG * 0.5
        return jnp.where(hit & (gi >= 0), labels_j[jnp.maximum(gi, 0)], -1)

    seg = jax.vmap(jax.vmap(pixel))(dirs)
    if macros.IMAGE_CONVENTION == "opengl":
        seg = seg[::-1]
    return seg


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

        def _render_posed(qpos, cam_pos_local, cam_quat_local):
            kin = kinematics.fk(env.model, qpos)
            return render_camera(
                env.model, kin, camera_name, height, width,
                visual={"cam_pos_local": cam_pos_local, "cam_quat_local": cam_quat_local},
            )

        self._render = jax.jit(_render)
        self._render_posed = jax.jit(_render_posed)

    def render(self, state, cam_pos=None, cam_quat=None):
        """Render a state; optional traced camera pose override (local pos +
        wxyz quat in the camera body frame) compiles ONCE for all poses."""
        qpos = state.physics.qpos
        if cam_pos is not None or cam_quat is not None:
            cid = self.env.model.cam_name2id(self.camera_name)
            p = jnp.asarray(self.env.model.cam_pos)[cid] if cam_pos is None else jnp.asarray(cam_pos)
            q = jnp.asarray(self.env.model.cam_quat)[cid] if cam_quat is None else jnp.asarray(cam_quat)
            rgb, depth = self._render_posed(qpos, p, q)
        else:
            rgb, depth = self._render(qpos)
        return np.asarray(rgb), np.asarray(depth)
