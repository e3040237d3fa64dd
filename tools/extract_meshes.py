"""Extract convex-hull collision data for the reference's mesh objects.

Reads each pick-place object XML (public physical specifications:
mesh scale, density/site extents) plus its STL mesh, computes the convex
hull (scipy), reduces it to <= V_MAX vertices / F_MAX faces, computes exact
hull mass properties (divergence theorem over the hull triangulation), and
writes JSON hull cards under robosuite_tpu/models/objects/hulls/.

The hull cards are the committed source of truth for mesh collision
(physics/contact.py maxplane narrowphase); rerun only on reference upgrades.

Usage: python tools/extract_meshes.py
"""

from __future__ import annotations

import json
import os
import struct
import sys
import xml.etree.ElementTree as ET

import numpy as np
from scipy.spatial import ConvexHull

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF_OBJ = "/root/reference/robosuite/models/assets/objects"
OUT_DIR = os.path.join(
    os.path.dirname(__file__), "..", "robosuite_tpu", "models", "objects", "hulls"
)

V_MAX = 32
F_MAX = 40

OBJECTS = ["milk", "bread", "cereal", "can", "bottle", "lemon"]


def load_stl(path: str) -> np.ndarray:
    """Binary/ASCII STL -> (n, 3) unique vertices."""
    with open(path, "rb") as f:
        head = f.read(80)
        if head[:5] == b"solid" and b"facet" in open(path, "rb").read(2048):
            # ASCII
            verts = []
            for line in open(path):
                t = line.split()
                if t[:1] == ["vertex"]:
                    verts.append([float(x) for x in t[1:4]])
            return np.unique(np.asarray(verts, dtype=np.float64), axis=0)
        ntri = struct.unpack("<I", f.read(4))[0]
        data = np.frombuffer(f.read(ntri * 50), dtype=np.uint8).reshape(ntri, 50)
        tri = data[:, 12:48].copy().view("<f4").reshape(ntri, 3, 3)
        return np.unique(tri.reshape(-1, 3).astype(np.float64), axis=0)


def reduce_hull(points: np.ndarray, v_max: int) -> np.ndarray:
    """Hull vertices, reduced by farthest-point selection to <= v_max."""
    hull = ConvexHull(points)
    verts = points[hull.vertices]
    if len(verts) <= v_max:
        return verts
    # greedy farthest-point subset, seeded from the lowest point so resting
    # faces survive the reduction
    chosen = [int(np.argmin(verts[:, 2]))]
    d = np.linalg.norm(verts - verts[chosen[0]], axis=1)
    while len(chosen) < v_max:
        i = int(np.argmax(d))
        chosen.append(i)
        d = np.minimum(d, np.linalg.norm(verts - verts[i], axis=1))
    return verts[np.asarray(chosen)]


def hull_faces(verts: np.ndarray, f_max: int):
    """Outward face planes (n, d) of the hull, deduplicated and capped."""
    hull = ConvexHull(verts)
    # ConvexHull equations: n·x + d <= 0 inside -> store as n·x <= dist
    eqs = np.unique(np.round(hull.equations, 9), axis=0)
    normals = eqs[:, :3]
    dists = -eqs[:, 3]
    if len(normals) > f_max:
        # keep the faces with the largest area (approx: by greedy normal
        # diversity — farthest-normal selection)
        chosen = [int(np.argmax(dists))]
        d = normals @ normals[chosen[0]]
        score = -d
        while len(chosen) < f_max:
            i = int(np.argmax(score))
            chosen.append(i)
            score = np.minimum(score, -(normals @ normals[i]))
        normals, dists = normals[np.asarray(chosen)], dists[np.asarray(chosen)]
    return normals, dists


def hull_mass_properties(verts: np.ndarray):
    """(volume, com, unit-density inertia about com) via the divergence
    theorem over the hull triangulation (standard polyhedron moments)."""
    hull = ConvexHull(verts)
    vol = 0.0
    com = np.zeros(3)
    # signed tetrahedra against the origin
    for simplex in hull.simplices:
        a, b, c = verts[simplex]
        # orient outward
        n = np.cross(b - a, c - a)
        centroid = (a + b + c) / 3.0
        if np.dot(n, centroid - hull.points.mean(axis=0)) < 0:
            b, c = c, b
        v6 = np.dot(a, np.cross(b, c))
        vol += v6 / 6.0
        com += v6 / 24.0 * (a + b + c + 0.0)
    com = com / vol if vol > 0 else verts.mean(axis=0)
    # inertia via second moments of tetrahedra
    I = np.zeros((3, 3))
    for simplex in hull.simplices:
        a, b, c = verts[simplex] - com
        n = np.cross(b - a, c - a)
        centroid = (a + b + c) / 3.0
        if np.dot(n, centroid + com - hull.points.mean(axis=0)) < 0:
            b, c = c, b
        v6 = np.dot(a, np.cross(b, c))
        P = np.stack([a, b, c])
        # covariance of a tetra (origin, a, b, c): C = v6/120 * (P^T P + sum outer)
        C = v6 / 120.0 * (P.T @ P + np.outer(P.sum(0), P.sum(0)))
        I += np.trace(C) * np.eye(3) - C
    return float(vol), com, I


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in OBJECTS:
        xml_path = os.path.join(REF_OBJ, f"{name}.xml")
        root = ET.parse(xml_path).getroot()
        mesh_el = root.find(".//asset/mesh")
        scale = np.array(
            [float(x) for x in mesh_el.get("scale", "1 1 1").split()], dtype=np.float64
        )
        stl = os.path.join(REF_OBJ, "meshes", f"{name}.stl")
        pts = load_stl(stl) * scale
        verts = reduce_hull(pts, V_MAX)
        normals, dists = hull_faces(verts, F_MAX)
        vol, com, inertia = hull_mass_properties(verts)
        # collision geom attrs from the XML (density etc.)
        geom = root.find(".//worldbody//geom[@group='0']")
        if geom is None:
            geom = root.find(".//worldbody//geom")
        density = float(geom.get("density", "1000")) if geom is not None else 1000.0
        card = dict(
            name=name,
            verts=[[round(float(v), 7) for v in row] for row in verts],
            face_normals=[[round(float(v), 7) for v in row] for row in normals],
            face_dists=[round(float(v), 7) for v in dists],
            volume=round(vol, 9),
            com=[round(float(v), 7) for v in com],
            inertia=[[round(float(v), 10) for v in row] for row in inertia],
            density=density,
        )
        out = os.path.join(OUT_DIR, f"{name}.json")
        with open(out, "w") as f:
            json.dump(card, f)
        print(f"{name}: {len(verts)} verts, {len(normals)} faces, vol {vol:.6f}, density {density}")


if __name__ == "__main__":
    main()
