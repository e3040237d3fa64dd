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
from typing import List, Optional

import numpy as np

from robosuite_tpu.models import spec as S


def _quat_to_usd(q):
    # USD quatf is (w, x, y, z) — same as our wxyz
    return f"({q[0]:.6g}, {q[1]:.6g}, {q[2]:.6g}, {q[3]:.6g})"


def _sanitize(name):
    out = "".join(c if c.isalnum() or c == "_" else "_" for c in name)
    return out if not out[:1].isdigit() else "_" + out


class USDExporter:
    """Collect frames (kin snapshots) and save a .usda stage."""

    def __init__(self, model, camera_names=None, framerate=20, meshes=None):
        self.model = model
        self.framerate = framerate
        self.camera_names = camera_names
        self.meshes = meshes or {}  # mesh name -> hull card (verts, ...)
        self.frames = []  # list of (geom_xpos (ngeom,3), geom_xquat wxyz)

    def update_scene(self, kin):
        from robosuite_tpu.utils import transforms as T

        quats = np.asarray(T.mat2quat_wxyz(kin.geom_xmat))
        self.frames.append((np.asarray(kin.geom_xpos).copy(), quats))

    # -- materials ----------------------------------------------------------
    def _material_block(self, name, rgba):
        r, g, b, a = [float(x) for x in rgba]
        return [
            f'        def Material "{name}"',
            "        {",
            f'            token outputs:surface.connect = </Materials/{name}/pbr.outputs:surface>',
            f'            def Shader "pbr"',
            "            {",
            '                uniform token info:id = "UsdPreviewSurface"',
            f"                color3f inputs:diffuseColor = ({r:.4g}, {g:.4g}, {b:.4g})",
            f"                float inputs:opacity = {a:.4g}",
            "                float inputs:roughness = 0.6",
            '                token outputs:surface',
            "            }",
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
        return [
            f'{indent}def Mesh "{name}"',
            indent + "{",
            f"{indent}    point3f[] points = [{pts}]",
            f"{indent}    int[] faceVertexCounts = [{counts}]",
            f"{indent}    int[] faceVertexIndices = [{idx}]",
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

        # materials: one per geom (diffuse from rgba)
        rgba = np.asarray(m.geom_rgba)
        lines += ['def Scope "Materials"', "{"]
        mat_names = []
        for g in range(m.ngeom):
            name = "mat_" + _sanitize(m.geom_names[g])
            mat_names.append(name)
            lines += self._material_block(name, rgba[g])
        lines.append("}")
        lines.append("")

        lines += ['def Xform "World"', "{"]

        # lights (reference usd/lights.py): the model's compiled <light>
        # array when present — DistantLight for directional, SphereLight
        # for point — plus a dome fill; fixed key light as fallback
        nlight = getattr(m, "nlight", 0)
        if nlight:
            lpos = np.asarray(m.light_pos)
            ldir = np.asarray(m.light_dir)
            ldirectional = np.asarray(m.light_directional)
            ldiffuse = np.asarray(m.light_diffuse)
            for li in range(nlight):
                lname = _sanitize(m.light_names[li])
                r, g, b = [float(x) for x in ldiffuse[li]]
                if ldirectional[li] > 0.5:
                    # orient -Z (USD light axis) onto the light direction
                    d = ldir[li]
                    pitch = float(np.degrees(np.arcsin(np.clip(d[1], -1, 1))))
                    yaw = float(np.degrees(np.arctan2(-d[0], -d[2])))
                    lines += [
                        f'    def DistantLight "{lname}"',
                        "    {",
                        "        float inputs:intensity = 1000",
                        f"        color3f inputs:color = ({r:.4g}, {g:.4g}, {b:.4g})",
                        f"        float3 xformOp:rotateXYZ = ({pitch:.4g}, {yaw:.4g}, 0)",
                        '        uniform token[] xformOpOrder = ["xformOp:rotateXYZ"]',
                        "    }",
                    ]
                else:
                    p = lpos[li]
                    lines += [
                        f'    def SphereLight "{lname}"',
                        "    {",
                        "        float inputs:intensity = 3000",
                        "        float inputs:radius = 0.05",
                        f"        color3f inputs:color = ({r:.4g}, {g:.4g}, {b:.4g})",
                        f"        double3 xformOp:translate = ({p[0]:.6g}, {p[1]:.6g}, {p[2]:.6g})",
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
            lines += [
                f'    def Camera "{_sanitize(cname)}"',
                "    {",
                f"        float focalLength = {focal:.6g}",
                "        float horizontalAperture = 24",
                "        float verticalAperture = 24",
                f"        double3 xformOp:translate = ({cp[0]:.6g}, {cp[1]:.6g}, {cp[2]:.6g})",
                f"        quatf xformOp:orient = {_quat_to_usd(cq)}",
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
