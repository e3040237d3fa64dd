"""USD scene exporter.

Re-derivation of reference utils/usd/exporter.py:51+ (MuJoCo scene -> USD
for Omniverse/Blender): writes an ASCII .usda stage with one Xform per geom
(primitive shapes; meshes skipped) and time-sampled transforms for recorded
trajectories. No pxr dependency — the ASCII schema is emitted directly.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from robosuite_tpu.models import spec as S


def _quat_to_usd(q):
    # USD quatf is (w, x, y, z) — same as our wxyz
    return f"({q[0]:.6g}, {q[1]:.6g}, {q[2]:.6g}, {q[3]:.6g})"


class USDExporter:
    """Collect frames (kin snapshots) and save a .usda stage."""

    def __init__(self, model, camera_names=None, framerate=20):
        self.model = model
        self.framerate = framerate
        self.frames = []  # list of (geom_xpos (ngeom,3), geom_xquat-ish mats)

    def update_scene(self, kin):
        from robosuite_tpu.utils import transforms as T
        import jax.numpy as jnp

        quats = np.asarray(T.mat2quat_wxyz(kin.geom_xmat))
        self.frames.append((np.asarray(kin.geom_xpos).copy(), quats))

    def save_scene(self, filename: str):
        m = self.model
        lines = [
            "#usda 1.0",
            "(",
            f'    doc = "robosuite_tpu export"',
            f"    timeCodesPerSecond = {self.framerate}",
            f"    startTimeCode = 0",
            f"    endTimeCode = {max(len(self.frames) - 1, 0)}",
            '    upAxis = "Z"',
            ")",
            "",
            'def Xform "World"',
            "{",
        ]
        for g in range(m.ngeom):
            gt = m.geom_type[g]
            name = m.geom_names[g].replace("-", "_").replace(".", "_")
            size = np.asarray(m.geom_size)[g]
            if gt == S.MESH:
                continue
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
                f"        uniform token[] xformOpOrder = {ops}",
                f'        def {prim} "{name}"',
                "        {",
                *["    " + a for a in attrs if "xformOp" not in a],
                "        }",
                "    }",
            ]
            # scale op belongs on the Xform
            for a in attrs:
                if "xformOp:scale" in a:
                    lines.insert(len(lines) - 4, a)
        lines.append("}")
        os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
        with open(filename, "w") as f:
            f.write("\n".join(lines) + "\n")
        return filename
