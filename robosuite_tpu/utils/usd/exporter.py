"""USD scene exporter.

Re-derivation of reference utils/usd/ (exporter.py USDExporter, shapes.py,
objects.py, lights.py, camera.py — MuJoCo scene -> USD for Omniverse /
Blender): writes an ASCII .usda stage with
  * one Xform per geom with time-sampled transforms for recorded frames,
  * primitive USD shapes (Cube/Sphere/Cylinder/Capsule) and UsdGeomMesh
    prims for hull-backed mesh geoms (points + triangulated faces),
  * UsdPreviewSurface materials bound per geom (diffuse color/opacity from
    geom rgba — the reference's material/texture path, usd/utils.py),
  * UsdLux lights (distant key light + dome) and UsdGeomCamera prims for
    the model's cameras (reference usd/lights.py, usd/camera.py).

No pxr dependency — the ASCII schema is emitted directly, so exports work
in the TPU container and open in any USD-aware DCC.
"""

from __future__ import annotations

import os
import struct
import zlib
from typing import List, Optional

import numpy as np

from robosuite_tpu.models import spec as S


def _write_png(path, rgb):
    """Write an (H, W, 3) uint8 array as a PNG (no PIL dependency — the
    reference saves texture files via PIL, usd/utils.py save_path logic;
    a minimal zlib encoder keeps the TPU container dependency-free)."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w = rgb.shape[:2]
    raw = b"".join(b"\x00" + rgb[i].tobytes() for i in range(h))

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def _bake_texture(mode, rgb1, rgb2, seed, size=64):
    """Evaluate the procedural texture model (the raycast renderer's
    flat/checker/gradient/noise modes, renderers/raycast.py:268-320 — the
    reference TextureModder's pattern family, mjmod.py rand_checker/
    rand_gradient/rand_noise) into an (size, size, 3) uint8 image."""
    u = np.linspace(0.0, 1.0, size, endpoint=False)
    uu, vv = np.meshgrid(u, u, indexing="xy")
    if mode == 1:  # checker: 8x8 cells over the unit square
        w = (np.floor(uu * 8) + np.floor(vv * 8)) % 2.0
    elif mode == 2:  # gradient along v
        w = vv
    elif mode == 3:  # noise: deterministic per-geom speckle
        w = np.random.default_rng(seed).random((size, size))
    else:  # flat
        w = np.zeros((size, size))
    rgb1 = np.asarray(rgb1, dtype=np.float64)[:3]
    rgb2 = np.asarray(rgb2, dtype=np.float64)[:3]
    img = rgb1[None, None] * (1.0 - w[..., None]) + rgb2[None, None] * w[..., None]
    return (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)


def _quat_to_usd(q):
    # USD quatf is (w, x, y, z) — same as our wxyz
    return f"({q[0]:.6g}, {q[1]:.6g}, {q[2]:.6g}, {q[3]:.6g})"


def _quat_minus_z_to(d):
    """wxyz quaternion rotating -Z onto direction d (USD light axis)."""
    d = np.asarray(d, dtype=np.float64)
    n = np.linalg.norm(d)
    if n < 1e-12:
        return np.array([1.0, 0.0, 0.0, 0.0])
    d = d / n
    src = np.array([0.0, 0.0, -1.0])
    c = float(np.dot(src, d))
    if c > 1.0 - 1e-12:
        return np.array([1.0, 0.0, 0.0, 0.0])
    if c < -1.0 + 1e-12:  # antiparallel: rotate pi about X
        return np.array([0.0, 1.0, 0.0, 0.0])
    axis = np.cross(src, d)
    s = np.sqrt((1.0 + c) * 2.0)
    return np.array([s * 0.5, axis[0] / s, axis[1] / s, axis[2] / s])


def _quat_wxyz_to_mat(q):
    """wxyz quaternion -> 3x3 rotation matrix (numpy, save-time)."""
    w, x, y, z = [float(v) for v in q]
    n = w * w + x * x + y * y + z * z
    s = 0.0 if n < 1e-18 else 2.0 / n
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return np.array([
        [1.0 - (yy + zz), xy - wz, xz + wy],
        [xy + wz, 1.0 - (xx + zz), yz - wx],
        [xz - wy, yz + wx, 1.0 - (xx + yy)],
    ])


def _mat_to_quat_wxyz(R):
    """Single 3x3 rotation matrix -> wxyz quaternion (numpy, save-time)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2.0
        return np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                         (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(max(R[i, i] - R[j, j] - R[k, k] + 1.0, 1e-18)) * 2.0
    q = np.zeros(4)
    q[0] = (R[k, j] - R[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (R[j, i] + R[i, j]) / s
    q[1 + k] = (R[k, i] + R[i, k]) / s
    return q


def _sanitize(name):
    out = "".join(c if c.isalnum() or c == "_" else "_" for c in name)
    return out if not out[:1].isdigit() else "_" + out


class USDExporter:
    """Collect frames (kin snapshots) and save a .usda stage."""

    def __init__(self, model, camera_names=None, framerate=20, meshes=None,
                 visual=None):
        self.model = model
        self.framerate = framerate
        self.camera_names = camera_names
        self.meshes = meshes or {}  # mesh name -> hull card (verts, ...)
        self.frames = []  # list of (geom_xpos (ngeom,3), geom_xquat wxyz)
        # visual override dict (utils/mjmod.py sample_visual_overrides):
        # per-geom rgb / tex_mode / tex_rgb2 drive baked texture files —
        # the reference's texture export path (usd/exporter.py writes the
        # model's texture bitmaps next to the stage, usd/utils.py)
        self.visual = visual or {}

    def update_scene(self, kin):
        from robosuite_tpu.utils import transforms as T

        quats = np.asarray(T.mat2quat_wxyz(kin.geom_xmat))
        # body poses too: lights/cameras attached to non-world bodies need
        # their carrying body's world pose composed in at save time
        self.frames.append(
            (np.asarray(kin.geom_xpos).copy(), quats,
             np.asarray(kin.xpos).copy(), np.asarray(kin.xmat).copy())
        )

    # -- materials ----------------------------------------------------------
    def _material_block(self, name, rgba, tex_file=None):
        """UsdPreviewSurface material; with `tex_file`, diffuse comes from a
        UsdUVTexture + UsdPrimvarReader_float2 network over baked texture
        files (reference usd/exporter.py material/texture wiring)."""
        r, g, b, a = [float(x) for x in rgba]
        if tex_file is None:
            diffuse = f"                color3f inputs:diffuseColor = ({r:.4g}, {g:.4g}, {b:.4g})"
            extra = []
        else:
            diffuse = (f"                color3f inputs:diffuseColor.connect = "
                       f"</Materials/{name}/tex.outputs:rgb>")
            extra = [
                f'            def Shader "stReader"',
                "            {",
                '                uniform token info:id = "UsdPrimvarReader_float2"',
                '                token inputs:varname = "st"',
                "                float2 outputs:result",
                "            }",
                f'            def Shader "tex"',
                "            {",
                '                uniform token info:id = "UsdUVTexture"',
                f"                asset inputs:file = @{tex_file}@",
                f'                float2 inputs:st.connect = </Materials/{name}/stReader.outputs:result>',
                '                token inputs:wrapS = "repeat"',
                '                token inputs:wrapT = "repeat"',
                "                float3 outputs:rgb",
                "            }",
            ]
        return [
            f'        def Material "{name}"',
            "        {",
            f'            token outputs:surface.connect = </Materials/{name}/pbr.outputs:surface>',
            f'            def Shader "pbr"',
            "            {",
            '                uniform token info:id = "UsdPreviewSurface"',
            diffuse,
            f"                float inputs:opacity = {a:.4g}",
            "                float inputs:roughness = 0.6",
            '                token outputs:surface',
            "            }",
            *extra,
            "        }",
        ]

    def _mesh_prim(self, name, mesh_name, indent="        "):
        """UsdGeomMesh from a hull card (triangulated via ConvexHull)."""
        card = self.meshes[mesh_name]
        verts = np.asarray(card["verts"], dtype=np.float64)
        try:
            from scipy.spatial import ConvexHull

            hull = ConvexHull(verts)
            tris = []
            centroid = verts.mean(axis=0)
            for simplex in hull.simplices:
                a, b, c = verts[simplex]
                n = np.cross(b - a, c - a)
                if np.dot(n, (a + b + c) / 3.0 - centroid) < 0:
                    simplex = simplex[[0, 2, 1]]
                tris.append(simplex)
            tris = np.asarray(tris)
        except Exception:  # degenerate hulls: emit points only
            tris = np.zeros((0, 3), dtype=int)
        pts = ", ".join(f"({v[0]:.6g}, {v[1]:.6g}, {v[2]:.6g})" for v in verts)
        counts = ", ".join("3" for _ in tris)
        idx = ", ".join(str(int(i)) for t in tris for i in t)
        # planar-projected per-vertex UVs so baked textures map onto hulls
        lo, hi = verts.min(axis=0), verts.max(axis=0)
        span = np.maximum(hi - lo, 1e-9)
        st = ", ".join(
            f"({(v[0] - lo[0]) / span[0]:.4g}, {(v[1] - lo[1]) / span[1]:.4g})"
            for v in verts
        )
        return [
            f'{indent}def Mesh "{name}"',
            indent + "{",
            f"{indent}    point3f[] points = [{pts}]",
            f"{indent}    int[] faceVertexCounts = [{counts}]",
            f"{indent}    int[] faceVertexIndices = [{idx}]",
            f'{indent}    texCoord2f[] primvars:st = [{st}] (',
            f'{indent}        interpolation = "vertex"',
            f"{indent}    )",
            f'{indent}    uniform token subdivisionScheme = "none"',
            indent + "}",
        ]

    def save_scene(self, filename: str):
        m = self.model
        lines = [
            "#usda 1.0",
            "(",
            '    doc = "robosuite_tpu export"',
            f"    timeCodesPerSecond = {self.framerate}",
            "    startTimeCode = 0",
            f"    endTimeCode = {max(len(self.frames) - 1, 0)}",
            '    upAxis = "Z"',
            '    defaultPrim = "World"',
            ")",
            "",
        ]

        # materials: one per geom (diffuse from rgba / visual overrides);
        # textured geoms (tex_mode != flat) get their pattern baked to a PNG
        # next to the stage and a UsdUVTexture network (the reference writes
        # the model's texture bitmaps alongside the stage, usd/utils.py)
        rgba = np.asarray(m.geom_rgba).copy()
        vis = self.visual
        if "rgb" in vis:
            rgba[:, :3] = np.asarray(vis["rgb"])
        tex_mode = np.asarray(vis["tex_mode"]) if "tex_mode" in vis else None
        tex_rgb2 = np.asarray(vis.get("tex_rgb2", rgba[:, :3]))
        tex_dir = os.path.splitext(os.path.basename(filename))[0] + "_textures"
        out_dir = os.path.dirname(os.path.abspath(filename))
        tex_files = [None] * m.ngeom
        if tex_mode is not None:
            os.makedirs(os.path.join(out_dir, tex_dir), exist_ok=True)
            for g in range(m.ngeom):
                mode = int(tex_mode[g])
                if mode == 0:
                    continue
                rel = f"{tex_dir}/{_sanitize(m.geom_names[g])}.png"
                img = _bake_texture(mode, rgba[g, :3], tex_rgb2[g], seed=g)
                _write_png(os.path.join(out_dir, rel), img)
                tex_files[g] = rel
        lines += ['def Scope "Materials"', "{"]
        mat_names = []
        for g in range(m.ngeom):
            name = "mat_" + _sanitize(m.geom_names[g])
            mat_names.append(name)
            lines += self._material_block(name, rgba[g], tex_file=tex_files[g])
        lines.append("}")
        lines.append("")

        lines += ['def Xform "World"', "{"]

        # lights (reference usd/lights.py): the model's compiled <light>
        # array when present — DistantLight for directional, SphereLight
        # for point — plus a dome fill; fixed key light as fallback.
        # light_pos/light_dir are BODY-frame (model.py): compose the
        # carrying body's world pose per recorded frame (time-sampled when
        # the body moves); inactive lights are skipped.
        nlight = getattr(m, "nlight", 0)
        if nlight:
            lpos = np.asarray(m.light_pos)
            ldir = np.asarray(m.light_dir)
            ldirectional = np.asarray(m.light_directional)
            ldiffuse = np.asarray(m.light_diffuse)
            lactive = np.asarray(m.light_active) if m.light_active is not None else np.ones(nlight)
            lbody = np.asarray(m.light_bodyid, dtype=int)
            for li in range(nlight):
                if lactive[li] < 0.5:
                    continue
                lname = _sanitize(m.light_names[li])
                r, g, b = [float(x) for x in ldiffuse[li]]
                bid = int(lbody[li])
                if self.frames:
                    wpos = [f[2][bid] + f[3][bid] @ lpos[li] for f in self.frames]
                    wdir = [f[3][bid] @ ldir[li] for f in self.frames]
                else:  # no frames recorded: body frame == world only for worldbody
                    wpos, wdir = [lpos[li]], [ldir[li]]
                moving = len(wpos) > 1 and not np.allclose(wpos[0], wpos[-1])
                if ldirectional[li] > 0.5:
                    # orient -Z (USD light axis) onto the light direction
                    qs = [_quat_to_usd(_quat_minus_z_to(d)) for d in wdir]
                    if moving:
                        q_samples = ", ".join(f"{t}: {q}" for t, q in enumerate(qs))
                        orient = f"        quatf xformOp:orient.timeSamples = {{{q_samples}}}"
                    else:
                        orient = f"        quatf xformOp:orient = {qs[0]}"
                    lines += [
                        f'    def DistantLight "{lname}"',
                        "    {",
                        "        float inputs:intensity = 1000",
                        f"        color3f inputs:color = ({r:.4g}, {g:.4g}, {b:.4g})",
                        orient,
                        '        uniform token[] xformOpOrder = ["xformOp:orient"]',
                        "    }",
                    ]
                else:
                    if moving:
                        t_samples = ", ".join(
                            f"{t}: ({p[0]:.6g}, {p[1]:.6g}, {p[2]:.6g})"
                            for t, p in enumerate(wpos)
                        )
                        trans = f"        double3 xformOp:translate.timeSamples = {{{t_samples}}}"
                    else:
                        p = wpos[0]
                        trans = f"        double3 xformOp:translate = ({p[0]:.6g}, {p[1]:.6g}, {p[2]:.6g})"
                    lines += [
                        f'    def SphereLight "{lname}"',
                        "    {",
                        "        float inputs:intensity = 3000",
                        "        float inputs:radius = 0.05",
                        f"        color3f inputs:color = ({r:.4g}, {g:.4g}, {b:.4g})",
                        trans,
                        '        uniform token[] xformOpOrder = ["xformOp:translate"]',
                        "    }",
                    ]
        else:
            lines += [
                '    def DistantLight "key_light"',
                "    {",
                "        float inputs:intensity = 1000",
                "        float3 xformOp:rotateXYZ = (-35, 20, 0)",
                '        uniform token[] xformOpOrder = ["xformOp:rotateXYZ"]',
                "    }",
            ]
        lines += [
            '    def DomeLight "dome"',
            "    {",
            "        float inputs:intensity = 350",
            "    }",
        ]

        # cameras (reference usd/camera.py: fovy -> focal length at 24mm ap.)
        cam_names = self.camera_names or list(m.cam_names)
        for cname in cam_names:
            try:
                ci = m.cam_name2id(cname)
            except ValueError:
                continue
            fovy = float(np.asarray(m.cam_fovy)[ci])
            focal = 12.0 / np.tan(np.radians(fovy) / 2.0)  # 24mm aperture
            cp = np.asarray(m.cam_pos)[ci]
            cq = np.asarray(m.cam_quat)[ci]
            # cam pos/quat are body-frame: compose the carrying body's world
            # pose (time-sampled for cameras mounted on moving bodies)
            bid = int(np.asarray(m.cam_bodyid, dtype=int)[ci])
            Rl = _quat_wxyz_to_mat(cq)
            if self.frames:
                wp = [f[2][bid] + f[3][bid] @ cp for f in self.frames]
                wq = [_mat_to_quat_wxyz(f[3][bid] @ Rl) for f in self.frames]
            else:
                wp, wq = [cp], [cq]
            moving = len(wp) > 1 and not np.allclose(wp[0], wp[-1])
            if moving:
                t_samples = ", ".join(
                    f"{t}: ({p[0]:.6g}, {p[1]:.6g}, {p[2]:.6g})" for t, p in enumerate(wp)
                )
                q_samples = ", ".join(
                    f"{t}: {_quat_to_usd(q)}" for t, q in enumerate(wq)
                )
                xf = [
                    f"        double3 xformOp:translate.timeSamples = {{{t_samples}}}",
                    f"        quatf xformOp:orient.timeSamples = {{{q_samples}}}",
                ]
            else:
                xf = [
                    f"        double3 xformOp:translate = ({wp[0][0]:.6g}, {wp[0][1]:.6g}, {wp[0][2]:.6g})",
                    f"        quatf xformOp:orient = {_quat_to_usd(wq[0])}",
                ]
            lines += [
                f'    def Camera "{_sanitize(cname)}"',
                "    {",
                f"        float focalLength = {focal:.6g}",
                "        float horizontalAperture = 24",
                "        float verticalAperture = 24",
                *xf,
                '        uniform token[] xformOpOrder = ["xformOp:translate", "xformOp:orient"]',
                "    }",
            ]

        for g in range(m.ngeom):
            gt = m.geom_type[g]
            name = _sanitize(m.geom_names[g])
            size = np.asarray(m.geom_size)[g]
            mesh_ref = None
            if gt == S.MESH:
                mid = m.geom_meshid[g]
                if mid < 0 or m.mesh_names[mid] not in self.meshes:
                    continue  # visual-only mesh shell with no committed hull
                mesh_ref = m.mesh_names[mid]
            prim, attrs = None, []
            if gt == S.BOX:
                prim = "Cube"
                attrs.append("        double size = 2")
                attrs.append(f"        float3 xformOp:scale = ({size[0]:.6g}, {size[1]:.6g}, {size[2]:.6g})")
            elif gt == S.SPHERE:
                prim = "Sphere"
                attrs.append(f"        double radius = {size[0]:.6g}")
            elif gt in (S.CYLINDER, S.CAPSULE):
                prim = "Cylinder" if gt == S.CYLINDER else "Capsule"
                attrs.append(f"        double radius = {size[0]:.6g}")
                attrs.append(f"        double height = {2 * size[1]:.6g}")
                attrs.append('        uniform token axis = "Z"')
            elif gt == S.PLANE:
                prim = "Cube"
                attrs.append("        double size = 2")
                attrs.append("        float3 xformOp:scale = (3, 3, 0.001)")
            elif gt == S.MESH:
                prim = "__mesh__"
            else:
                continue

            # transform samples
            if self.frames:
                t_samples = ", ".join(
                    f"{t}: ({f[0][g][0]:.6g}, {f[0][g][1]:.6g}, {f[0][g][2]:.6g})"
                    for t, f in enumerate(self.frames)
                )
                q_samples = ", ".join(
                    f"{t}: {_quat_to_usd(f[1][g])}" for t, f in enumerate(self.frames)
                )
                xform = [
                    f"        double3 xformOp:translate.timeSamples = {{{t_samples}}}",
                    f"        quatf xformOp:orient.timeSamples = {{{q_samples}}}",
                ]
            else:
                xform = ["        double3 xformOp:translate = (0, 0, 0)"]
            ops = '["xformOp:translate", "xformOp:orient"'
            if any("xformOp:scale" in a for a in attrs):
                ops += ', "xformOp:scale"'
            ops += "]"
            lines += [
                f'    def Xform "{name}_xf"',
                "    {",
                *xform,
                *[a for a in attrs if "xformOp:scale" in a],
                f"        uniform token[] xformOpOrder = {ops}",
                f'        rel material:binding = </Materials/{mat_names[g]}>',
            ]
            if prim == "__mesh__":
                lines += self._mesh_prim(name, mesh_ref)
            else:
                lines += [
                    f'        def {prim} "{name}"',
                    "        {",
                    *["    " + a for a in attrs if "xformOp" not in a],
                    "        }",
                ]
            lines.append("    }")
        lines.append("}")
        os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
        with open(filename, "w") as f:
            f.write("\n".join(lines) + "\n")
        return filename
