"""Model compiler: ModelSpec -> frozen array pytree.

TPU-native replacement for the MuJoCo model compiler as consumed by the
reference (models/base.py:125-147 get_model -> mujoco.MjModel). All name
resolution happens here, once, at compile time — the runtime physics core
sees only integer-indexed arrays (the reference resolves names to addresses
once per episode at _setup_references time, robots/robot.py:302-332; we do it
once per model, at trace time).

Static structure (tree topology, joint types, pair lists) lives in the
pytree's aux data so jitted functions can unroll over it; numeric parameters
are array leaves.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

from robosuite_tpu.models import spec as S


def _static(**kw):
    return struct.field(pytree_node=False, **kw)


@struct.dataclass
class Model:
    """Compiled model: constants of one world, shared across all batched
    scenarios. Array leaves are jnp arrays; structural metadata is static."""

    # ---- static structure -------------------------------------------------
    nq: int = _static()
    nv: int = _static()
    nu: int = _static()
    nbody: int = _static()
    njnt: int = _static()
    ngeom: int = _static()
    nsite: int = _static()
    ncam: int = _static()
    npair: int = _static()

    body_parentid: Tuple[int, ...] = _static()
    body_jntadr: Tuple[int, ...] = _static()
    body_jntnum: Tuple[int, ...] = _static()
    body_weldid: Tuple[int, ...] = _static()
    jnt_type: Tuple[int, ...] = _static()
    jnt_bodyid: Tuple[int, ...] = _static()
    jnt_qposadr: Tuple[int, ...] = _static()
    jnt_dofadr: Tuple[int, ...] = _static()
    dof_bodyid: Tuple[int, ...] = _static()
    dof_jntid: Tuple[int, ...] = _static()
    geom_bodyid: Tuple[int, ...] = _static()
    geom_type: Tuple[int, ...] = _static()
    geom_group: Tuple[int, ...] = _static()
    site_bodyid: Tuple[int, ...] = _static()
    cam_bodyid: Tuple[int, ...] = _static()
    actuator_kind: Tuple[str, ...] = _static()
    actuator_jntid: Tuple[int, ...] = _static()   # -1 for tendon transmission
    actuator_tenid: Tuple[int, ...] = _static()   # -1 for joint transmission
    pair_geom1: Tuple[int, ...] = _static()
    pair_geom2: Tuple[int, ...] = _static()
    neq: int = _static()
    eq_kind: Tuple[str, ...] = _static()
    eq_obj1: Tuple[int, ...] = _static()   # body id (connect/weld), joint id (joint), tendon id (tendon)
    eq_obj2: Tuple[int, ...] = _static()
    ntendon: int = _static()
    tendon_names: Tuple[str, ...] = _static()
    tendon_limited: Tuple[int, ...] = _static()
    nmesh: int = _static()
    mesh_names: Tuple[str, ...] = _static()
    geom_meshid: Tuple[int, ...] = _static()   # -1 = no hull (primitive/visual)

    body_names: Tuple[str, ...] = _static()
    jnt_names: Tuple[str, ...] = _static()
    geom_names: Tuple[str, ...] = _static()
    site_names: Tuple[str, ...] = _static()
    cam_names: Tuple[str, ...] = _static()
    actuator_names: Tuple[str, ...] = _static()

    timestep: float = _static()
    impratio: float = _static()
    # contact-solver iteration override (None -> contact.APGD_ITERS).
    # Coarse planning models (mpc/receding.py) trade solver tightness for
    # throughput: planning contacts don't need execution-grade convergence.
    solver_iters: Optional[int] = _static(default=None)
    # power-iteration count for the APGD step-size estimate (None ->
    # contact.POWER_ITERS); planning/linearization models can cheapen it
    solver_power_iters: Optional[int] = _static(default=None)
    # per-pair contact-manifold point cap override (None -> contact.
    # MANIFOLD_CAP). Reduced-manifold PLANNING models (mpc/receding.py)
    # use 1-2 points per pair: halves the solver's row count (APGD matvec
    # cost ~ nv*ntot) and the fused megakernel's VMEM-resident whitened
    # operator, which is what lets the kernel pack 8 scenarios into VPU
    # sublanes. Execution models keep the full manifolds.
    pair_points_cap: Optional[int] = _static(default=None)

    # ---- array parameters --------------------------------------------------
    body_pos: Any = None          # (nbody, 3)
    body_quat: Any = None         # (nbody, 4) wxyz
    body_ipos: Any = None         # (nbody, 3)
    body_iquat: Any = None        # (nbody, 4) wxyz
    body_mass: Any = None         # (nbody,)
    body_inertia: Any = None      # (nbody, 3) principal moments

    jnt_pos: Any = None           # (njnt, 3)
    jnt_axis: Any = None          # (njnt, 3)
    jnt_range: Any = None         # (njnt, 2)
    jnt_limited: Any = None       # (njnt,) 0/1
    jnt_stiffness: Any = None     # (njnt,)

    dof_damping: Any = None       # (nv,)
    dof_armature: Any = None      # (nv,)
    dof_frictionloss: Any = None  # (nv,)

    geom_pos: Any = None          # (ngeom, 3)
    geom_quat: Any = None         # (ngeom, 4)
    geom_size: Any = None         # (ngeom, 3)
    geom_friction: Any = None     # (ngeom, 3)
    geom_margin: Any = None       # (ngeom,)
    geom_rgba: Any = None         # (ngeom, 4) — renderer colors (reference
                                  # geom rgba / material, mjcf_utils.py:135)

    site_pos: Any = None          # (nsite, 3)
    site_quat: Any = None         # (nsite, 4)

    cam_pos: Any = None           # (ncam, 3)
    cam_quat: Any = None          # (ncam, 4)
    cam_fovy: Any = None          # (ncam,)

    # lights (MJCF <light>, reference arenas): raycast shading + USD export
    nlight: int = _static(default=0)
    light_bodyid: Tuple[int, ...] = _static(default=())
    light_names: Tuple[str, ...] = _static(default=())
    light_pos: Any = None         # (nlight, 3) body-frame position
    light_dir: Any = None         # (nlight, 3) unit direction
    light_directional: Any = None # (nlight,) 1 = directional, 0 = point
    light_diffuse: Any = None     # (nlight, 3)
    light_ambient: Any = None     # (nlight, 3)
    light_active: Any = None      # (nlight,) 0/1

    actuator_gear: Any = None       # (nu,)
    actuator_ctrlrange: Any = None  # (nu, 2)
    actuator_forcerange: Any = None # (nu, 2)
    actuator_gainprm: Any = None    # (nu,) kp / kv / general gain
    actuator_biasprm: Any = None    # (nu, 3) general affine bias
    actuator_ctrllimited: Any = None  # (nu,)
    actuator_forcelimited: Any = None # (nu,)

    # fixed tendons (MJCF <tendon><fixed>): length = ten_Jq @ qpos + const;
    # moment/velocity rows live on the dof axis (ten_J)
    ten_J: Any = None             # (ntendon, nv) constant moment rows
    ten_Jq: Any = None            # (ntendon, nq) length rows
    ten_range: Any = None         # (ntendon, 2)
    ten_stiffness: Any = None     # (ntendon,)
    ten_springlength: Any = None  # (ntendon,)
    ten_frictionloss: Any = None  # (ntendon,)
    ten_damping: Any = None       # (ntendon,)
    ten_length0: Any = None       # (ntendon,) length at qpos0

    # convex hulls for mesh collision (padded to the model-wide max V/F;
    # vertex padding repeats vertex 0, face padding is a far plane)
    mesh_verts: Any = None        # (nmesh, V, 3) geom-frame hull vertices
    mesh_fnorm: Any = None        # (nmesh, F, 3) outward face normals
    mesh_fdist: Any = None        # (nmesh, F) face plane offsets (n·x <= d)

    eq_anchor: Any = None         # (neq, 3) body1-frame anchor (connect)
    eq_anchor2: Any = None        # (neq, 3) body2-frame anchor (compiled)
    eq_polycoef: Any = None       # (neq, 5)
    eq_solref: Any = None         # (neq, 2)

    pair_friction: Any = None     # (npair, 3)
    pair_solref: Any = None       # (npair, 2)
    pair_solimp: Any = None       # (npair, 5)
    pair_margin: Any = None       # (npair,)

    qpos0: Any = None             # (nq,)
    qpos_spring: Any = None       # (nq,)
    gravity: Any = None           # (3,)
    ancestor_mask: Any = None     # (nbody, nv) 1.0 if dof moves body

    # ---- name lookup -------------------------------------------------------
    def body_name2id(self, name: str) -> int:
        return self.body_names.index(name)

    def jnt_name2id(self, name: str) -> int:
        return self.jnt_names.index(name)

    def geom_name2id(self, name: str) -> int:
        return self.geom_names.index(name)

    def site_name2id(self, name: str) -> int:
        return self.site_names.index(name)

    def cam_name2id(self, name: str) -> int:
        return self.cam_names.index(name)

    def actuator_name2id(self, name: str) -> int:
        return self.actuator_names.index(name)

    def tendon_name2id(self, name: str) -> int:
        return self.tendon_names.index(name)

    def jnt_qpos_slice(self, name: str):
        j = self.jnt_name2id(name)
        return slice(self.jnt_qposadr[j], self.jnt_qposadr[j] + S.JOINT_NQ[self.jnt_type[j]])

    def jnt_dof_slice(self, name: str):
        j = self.jnt_name2id(name)
        return slice(self.jnt_dofadr[j], self.jnt_dofadr[j] + S.JOINT_NV[self.jnt_type[j]])


# ---------------------------------------------------------------------------
# geometry -> inertia helpers (MuJoCo-equivalent analytic formulas)
# ---------------------------------------------------------------------------


def _geom_mass_inertia(g: S.GeomSpec, meshes=None):
    """Return (mass, COM-frame 3x3 inertia in geom frame, COM offset in geom
    frame) for a primitive or hull-backed mesh geom."""
    m, I = _geom_mass_inertia_primitive(g, meshes)
    if S.GEOM_TYPES[g.type] == S.MESH and meshes and g.mesh in meshes:
        h = meshes[g.mesh]
        return m, I, np.asarray(h["com"], dtype=np.float64)
    return m, I, np.zeros(3)


def _geom_mass_inertia_primitive(g: S.GeomSpec, meshes=None):
    t = S.GEOM_TYPES[g.type]
    if t == S.MESH and meshes and g.mesh in meshes:
        # exact hull mass properties (tools/extract_meshes.py divergence-
        # theorem moments; MuJoCo mesh-inertia semantics)
        h = meshes[g.mesh]
        vol = float(h["volume"])
        m = g.mass if g.mass is not None else g.density * vol
        I_unit = np.asarray(h["inertia"], dtype=np.float64)  # unit density
        scale = (m / vol) if vol > 0 else 0.0
        return m, I_unit * scale
    sz = g.size
    if t == S.SPHERE:
        r = sz[0]
        vol = 4.0 / 3.0 * math.pi * r ** 3
        m = g.mass if g.mass is not None else g.density * vol
        i = 0.4 * m * r * r
        return m, np.diag([i, i, i])
    if t == S.BOX:
        hx, hy, hz = sz
        vol = 8.0 * hx * hy * hz
        m = g.mass if g.mass is not None else g.density * vol
        return m, np.diag(
            [m / 3.0 * (hy * hy + hz * hz), m / 3.0 * (hx * hx + hz * hz), m / 3.0 * (hx * hx + hy * hy)]
        )
    if t == S.CYLINDER:
        r, hl = sz[0], sz[1]
        vol = math.pi * r * r * 2.0 * hl
        m = g.mass if g.mass is not None else g.density * vol
        ixx = m * (3.0 * r * r + 4.0 * hl * hl) / 12.0
        return m, np.diag([ixx, ixx, m * r * r / 2.0])
    if t == S.CAPSULE:
        r, hl = sz[0], sz[1]
        vc = math.pi * r * r * 2.0 * hl
        vs = 4.0 / 3.0 * math.pi * r ** 3
        if g.mass is not None:
            rho = g.mass / (vc + vs)
        else:
            rho = g.density
        mc, ms = rho * vc, rho * vs
        L = 2.0 * hl
        izz = mc * r * r / 2.0 + ms * 2.0 * r * r / 5.0
        ixx = mc * (L * L / 12.0 + r * r / 4.0) + ms * (2.0 * r * r / 5.0 + L * L / 4.0 + 3.0 * L * r / 8.0)
        return mc + ms, np.diag([ixx, ixx, izz])
    if t == S.ELLIPSOID:
        a, b, c = sz
        vol = 4.0 / 3.0 * math.pi * a * b * c
        m = g.mass if g.mass is not None else g.density * vol
        return m, np.diag([m / 5.0 * (b * b + c * c), m / 5.0 * (a * a + c * c), m / 5.0 * (a * a + b * b)])
    # planes / meshes carry no computed inertia
    return 0.0, np.zeros((3, 3))


def _quat_mul_np(q1, q2):
    w1, x1, y1, z1 = q1
    w2, x2, y2, z2 = q2
    return np.array(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ]
    )


def _quat_rot_np(q, v):
    return _quat2mat_np(q) @ v


def _quat2mat_np(q):
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def _mat2quat_np(m):
    tr = np.trace(m)
    if tr > 0:
        s = math.sqrt(tr + 1.0) * 2
        return np.array([0.25 * s, (m[2, 1] - m[1, 2]) / s, (m[0, 2] - m[2, 0]) / s, (m[1, 0] - m[0, 1]) / s])
    i = int(np.argmax(np.diag(m)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = math.sqrt(max(m[i, i] - m[j, j] - m[k, k] + 1.0, 1e-12)) * 2
    q = np.zeros(4)
    q[0] = (m[k, j] - m[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (m[j, i] + m[i, j]) / s
    q[1 + k] = (m[k, i] + m[i, k]) / s
    if q[0] < 0:
        q = -q
    return q / np.linalg.norm(q)


def _eig_principal(I):
    """Eigendecompose a 3x3 inertia (MuJoCo convention: already-diagonal
    tensors keep their axis order with the identity frame; otherwise
    principal moments sorted descending with a right-handed frame)."""
    off = abs(I[0, 1]) + abs(I[0, 2]) + abs(I[1, 2])
    if off < 1e-12 * max(np.trace(I), 1e-12):
        return np.diag(I).copy(), np.eye(3)
    w, v = np.linalg.eigh(I)
    order = np.argsort(w)[::-1]
    w = w[order]
    v = v[:, order]
    if np.linalg.det(v) < 0:
        v[:, 2] *= -1
    return w.copy(), v


def _body_inertial(body: S.BodySpec, inertia_group_range=(0, 0), meshes=None):
    """Compute (mass, ipos, iquat, principal diag inertia) for a body.

    Uses the explicit InertialSpec if present, else accumulates over the
    body's primitive/hull geoms (MuJoCo compiler behavior with
    inertiagrouprange as in reference base.xml:3).
    """
    if body.inertial is not None:
        it = body.inertial
        if it.fullinertia is not None:
            ixx, iyy, izz, ixy, ixz, iyz = it.fullinertia
            I = np.array([[ixx, ixy, ixz], [ixy, iyy, iyz], [ixz, iyz, izz]])
            w, v = _eig_principal(I)
            q_principal = _mat2quat_np(_quat2mat_np(it.quat) @ v)
            return it.mass, it.pos.copy(), q_principal, w
        diag = it.diaginertia if it.diaginertia is not None else np.zeros(3)
        return it.mass, it.pos.copy(), it.quat.copy(), diag.copy()

    # accumulate from geoms
    total_m = 0.0
    com = np.zeros(3)
    contributing = []
    for g in body.geoms:
        if not (inertia_group_range[0] <= g.group <= inertia_group_range[1]):
            continue
        m, I_g, com_off = _geom_mass_inertia(g, meshes)
        if m <= 0:
            continue
        g_com = g.pos + _quat2mat_np(g.quat) @ com_off
        contributing.append((g, m, I_g, g_com))
        total_m += m
        com += m * g_com
    if total_m <= 0:
        # MuJoCo convention for massless (welded) bodies: ipos mirrors the
        # body's own frame offset (observed from compiled reference models)
        return 0.0, np.asarray(body.pos, dtype=np.float64).copy(), np.array([1.0, 0, 0, 0]), np.zeros(3)
    com /= total_m
    I_total = np.zeros((3, 3))
    for g, m, I_g, g_com in contributing:
        R = _quat2mat_np(g.quat)
        I_rot = R @ I_g @ R.T
        d = g_com - com
        I_total += I_rot + m * (np.dot(d, d) * np.eye(3) - np.outer(d, d))
    w, v = _eig_principal(I_total)
    return total_m, com, _mat2quat_np(v), w


# ---------------------------------------------------------------------------
# collision pair enumeration
# ---------------------------------------------------------------------------

# primitive narrowphase support; MESH collides iff hull-backed (its mesh
# name has hull data from tools/extract_meshes.py) — bare mesh geoms are
# visual-only (robot links keep their primitive collision shells)
_COLLIDABLE = {S.PLANE, S.SPHERE, S.CAPSULE, S.CYLINDER, S.BOX}


def _enumerate_pairs(bodies, geoms, geom_bodyid, body_parentid, body_weldid, excludes,
                     body_name_to_id, hullbacked=frozenset()):
    """MuJoCo-style broadphase-free static pair list.

    Filtering rules re-derived from MuJoCo's mj_collision:
      * contype/conaffinity compatibility
      * no same-body / same-weld pairs
      * no parent-child weld pairs (filterparent), EXCEPT when parent is world
      * explicit <exclude> pairs
    """
    excluded_body_pairs = set()
    for ex in excludes:
        b1 = body_name_to_id.get(ex.body1)
        b2 = body_name_to_id.get(ex.body2)
        if b1 is not None and b2 is not None:
            excluded_body_pairs.add((min(b1, b2), max(b1, b2)))

    # parent weld of each weld group: weld of the parent body of the weld root
    nbody = len(body_parentid)
    weld_parent = [0] * nbody
    for b in range(1, nbody):
        if body_weldid[b] == b:  # weld root
            weld_parent[b] = body_weldid[body_parentid[b]]
        else:
            weld_parent[b] = weld_parent[body_weldid[b]]

    def collidable(g, t):
        if t == S.MESH:
            return g.mesh in hullbacked
        return t in _COLLIDABLE

    pairs = []
    ngeom = len(geoms)
    for i in range(ngeom):
        gi = geoms[i]
        ti = S.GEOM_TYPES[gi.type]
        if not collidable(gi, ti):
            continue
        for j in range(i + 1, ngeom):
            gj = geoms[j]
            tj = S.GEOM_TYPES[gj.type]
            if not collidable(gj, tj):
                continue
            if ti == S.PLANE and tj == S.PLANE:
                continue
            if not ((gi.contype & gj.conaffinity) or (gj.contype & gi.conaffinity)):
                continue
            b1, b2 = geom_bodyid[i], geom_bodyid[j]
            w1, w2 = body_weldid[b1], body_weldid[b2]
            if w1 == w2:
                continue
            # filterparent (skip if welds are parent-child, unless parent is world weld 0)
            if weld_parent[w1] == w2 and w2 != 0:
                continue
            if weld_parent[w2] == w1 and w1 != 0:
                continue
            if (min(b1, b2), max(b1, b2)) in excluded_body_pairs:
                continue
            pairs.append((i, j))
    return pairs


def _mix_pair_params(g1: S.GeomSpec, g2: S.GeomSpec):
    """MuJoCo contact parameter mixing (solmix defaults -> average solref/imp,
    elementwise max friction, max margin)."""
    if g1.priority > g2.priority:
        return g1.friction.copy(), g1.solref.copy(), g1.solimp.copy(), max(g1.margin, g2.margin)
    if g2.priority > g1.priority:
        return g2.friction.copy(), g2.solref.copy(), g2.solimp.copy(), max(g1.margin, g2.margin)
    friction = np.maximum(g1.friction, g2.friction)
    solref = 0.5 * (g1.solref + g2.solref)
    solimp = 0.5 * (g1.solimp + g2.solimp)
    return friction, solref, solimp, max(g1.margin, g2.margin)


# ---------------------------------------------------------------------------
# the compiler
# ---------------------------------------------------------------------------


def compile_spec(ms: S.ModelSpec, dtype=np.float32) -> Model:
    bodies = ms.bodies()  # DFS order, world first — matches MuJoCo body ordering
    nbody = len(bodies)
    body_id = {b.name: i for i, b in enumerate(bodies)}
    assert len(body_id) == nbody, "duplicate body names"
    body_parentid = [0] * nbody
    for i, b in enumerate(bodies):
        for c in b.children:
            body_parentid[bodies.index(c)] = i

    # joints in body order
    joints, jnt_bodyid = [], []
    body_jntadr, body_jntnum = [], []
    for i, b in enumerate(bodies):
        body_jntadr.append(len(joints) if b.joints else -1)
        body_jntnum.append(len(b.joints))
        for j in b.joints:
            joints.append(j)
            jnt_bodyid.append(i)
    njnt = len(joints)

    jnt_qposadr, jnt_dofadr = [], []
    nq = nv = 0
    dof_bodyid, dof_jntid = [], []
    for jid, j in enumerate(joints):
        jnt_qposadr.append(nq)
        jnt_dofadr.append(nv)
        nq += j.nq
        nv += j.nv
        for _ in range(j.nv):
            dof_bodyid.append(jnt_bodyid[jid])
            dof_jntid.append(jid)

    # weld groups: bodies with no joints are welded to their parent
    body_weldid = [0] * nbody
    for i in range(1, nbody):
        body_weldid[i] = i if body_jntnum[i] > 0 else body_weldid[body_parentid[i]]

    # geoms / sites / cameras / lights in body order
    geoms, geom_bodyid, sites, site_bodyid, cams, cam_bodyid = [], [], [], [], [], []
    lights, light_bodyid = [], []
    for i, b in enumerate(bodies):
        for g in b.geoms:
            geoms.append(g)
            geom_bodyid.append(i)
        for s in b.sites:
            sites.append(s)
            site_bodyid.append(i)
        for c in b.cameras:
            cams.append(c)
            cam_bodyid.append(i)
        for lt in b.lights:
            lights.append(lt)
            light_bodyid.append(i)
    ngeom, nsite, ncam = len(geoms), len(sites), len(cams)
    nlight = len(lights)

    # inertials
    body_mass = np.zeros(nbody)
    body_ipos = np.zeros((nbody, 3))
    body_iquat = np.tile(np.array([1.0, 0, 0, 0]), (nbody, 1))
    body_inertia = np.zeros((nbody, 3))
    for i, b in enumerate(bodies):
        if i == 0:
            continue
        m, ipos, iquat, diag = _body_inertial(b, meshes=ms.meshes)
        body_mass[i] = m
        body_ipos[i] = ipos
        body_iquat[i] = iquat
        body_inertia[i] = diag

    # qpos0 / spring reference
    qpos0 = np.zeros(nq)
    qpos_spring = np.zeros(nq)
    jnt_stiffness = np.zeros(njnt)
    for jid, j in enumerate(joints):
        t = S.JOINT_TYPES[j.type]
        adr = jnt_qposadr[jid]
        if t == S.FREE:
            # free-joint qpos is the body's WORLD pose (MuJoCo semantics):
            # initialize from the pose composed through the ancestor chain,
            # not the body's local offset — a free body nested under a
            # placed robot root (e.g. Spot's legged base) must spawn where
            # the placement put it
            bi = jnt_bodyid[jid]
            w_pos = np.zeros(3)
            w_quat = np.array([1.0, 0.0, 0.0, 0.0])
            chain = []
            while bi != 0:
                chain.append(bi)
                bi = body_parentid[bi]
            for bi in reversed(chain):
                b = bodies[bi]
                w_pos = w_pos + _quat_rot_np(w_quat, np.asarray(b.pos, dtype=np.float64))
                w_quat = _quat_mul_np(w_quat, np.asarray(b.quat, dtype=np.float64))
            qpos0[adr : adr + 3] = w_pos
            qpos0[adr + 3 : adr + 7] = w_quat
            qpos_spring[adr : adr + 7] = qpos0[adr : adr + 7]
        elif t == S.BALL:
            qpos0[adr] = 1.0
            qpos_spring[adr] = 1.0
        else:
            qpos0[adr] = j.ref
            qpos_spring[adr] = j.springref
        jnt_stiffness[jid] = j.stiffness

    # dofs
    dof_damping = np.zeros(nv)
    dof_armature = np.zeros(nv)
    dof_frictionloss = np.zeros(nv)
    # float32 conditioning: MuJoCo runs CRBA in f64 and tolerates ~1e-8 kg*m^2
    # finger-link inertias next to ~10 kg*m^2 arm terms; at f32 that spread
    # (>1e8 conditioning) makes the joint-space mass matrix lose PSD-ness to
    # rounding. An armature floor on hinge/slide dofs (exactly MuJoCo's
    # armature semantics: adds to the M diagonal) restores PSD with
    # negligible dynamic effect on servo-damped fingers.
    ARMATURE_FLOOR = 1e-5
    for jid, j in enumerate(joints):
        adr = jnt_dofadr[jid]
        floor = ARMATURE_FLOOR if j.type in ("hinge", "slide") else 0.0
        for k in range(j.nv):
            dof_damping[adr + k] = j.damping
            dof_armature[adr + k] = max(j.armature, floor)
            dof_frictionloss[adr + k] = j.frictionloss

    # fixed tendons: constant coupling rows on the qpos/dof axes
    jnt_id = {j.name: i for i, j in enumerate(joints)}
    ntendon = len(ms.tendons)
    ten_id = {t.name: i for i, t in enumerate(ms.tendons)}
    assert len(ten_id) == ntendon, "duplicate tendon names"
    ten_J = np.zeros((ntendon, nv))
    ten_Jq = np.zeros((ntendon, max(nq, 1)))[:, :nq]
    ten_range = np.zeros((ntendon, 2))
    tendon_limited = []
    ten_stiffness = np.zeros(ntendon)
    ten_springlength = np.zeros(ntendon)
    ten_frictionloss = np.zeros(ntendon)
    ten_damping = np.zeros(ntendon)
    ten_length0 = np.zeros(ntendon)
    for t_i, t in enumerate(ms.tendons):
        for jname, coef in zip(t.joints, t.coefs):
            assert jname in jnt_id, f"tendon {t.name}: unknown joint {jname}"
            j = jnt_id[jname]
            assert joints[j].type in ("hinge", "slide"), (
                f"tendon {t.name}: fixed tendons couple scalar joints only"
            )
            ten_J[t_i, jnt_dofadr[j]] += coef
            ten_Jq[t_i, jnt_qposadr[j]] += coef
        if t.range is not None:
            ten_range[t_i] = t.range
        tendon_limited.append(1 if t.limited else 0)
        ten_stiffness[t_i] = t.stiffness
        ten_frictionloss[t_i] = t.frictionloss
        ten_damping[t_i] = t.damping
        ten_length0[t_i] = float(ten_Jq[t_i] @ qpos0) if nq else 0.0
        # MJCF springlength default -1 -> spring rest at the qpos0 length
        ten_springlength[t_i] = (
            t.springlength if t.springlength is not None else ten_length0[t_i]
        )

    # actuators
    nu = len(ms.actuators)
    actuator_kind, actuator_jntid, actuator_tenid = [], [], []
    actuator_gear = np.ones(nu)
    actuator_ctrlrange = np.zeros((nu, 2))
    actuator_forcerange = np.zeros((nu, 2))
    actuator_gainprm = np.zeros(nu)
    actuator_biasprm = np.zeros((nu, 3))
    actuator_ctrllimited = np.zeros(nu)
    actuator_forcelimited = np.zeros(nu)
    for a_i, a in enumerate(ms.actuators):
        actuator_kind.append(a.kind)
        if a.tendon is not None:
            assert a.tendon in ten_id, f"actuator {a.name}: unknown tendon {a.tendon}"
            actuator_jntid.append(-1)
            actuator_tenid.append(ten_id[a.tendon])
        else:
            assert a.joint in jnt_id, f"actuator {a.name}: unknown joint {a.joint}"
            actuator_jntid.append(jnt_id[a.joint])
            actuator_tenid.append(-1)
        actuator_gear[a_i] = a.gear
        if a.ctrlrange is not None:
            actuator_ctrlrange[a_i] = a.ctrlrange
            actuator_ctrllimited[a_i] = 1.0
        if a.forcerange is not None:
            actuator_forcerange[a_i] = a.forcerange
            actuator_forcelimited[a_i] = 1.0
        if a.kind == "general":
            actuator_gainprm[a_i] = a.gainprm
            actuator_biasprm[a_i] = a.biasprm
        else:
            actuator_gainprm[a_i] = a.kp if a.kind == "position" else (a.kv if a.kind == "velocity" else 0.0)

    # convex-hull meshes (collision-backed mesh geoms)
    hull_names = sorted(ms.meshes)
    mesh_id = {n: i for i, n in enumerate(hull_names)}
    nmesh = len(hull_names)
    V = max([len(ms.meshes[n]["verts"]) for n in hull_names], default=1)
    F = max([len(ms.meshes[n]["face_dists"]) for n in hull_names], default=1)
    mesh_verts = np.zeros((nmesh, V, 3))
    mesh_fnorm = np.tile(np.array([0.0, 0.0, 1.0]), (nmesh, F, 1))
    mesh_fdist = np.full((nmesh, F), 1e6)
    for n, mi in mesh_id.items():
        h = ms.meshes[n]
        v = np.asarray(h["verts"], dtype=np.float64)
        mesh_verts[mi, : len(v)] = v
        mesh_verts[mi, len(v):] = v[0]  # pad by repetition (support-safe)
        fn_ = np.asarray(h["face_normals"], dtype=np.float64)
        fd_ = np.asarray(h["face_dists"], dtype=np.float64)
        mesh_fnorm[mi, : len(fn_)] = fn_
        mesh_fdist[mi, : len(fd_)] = fd_
    geom_meshid = [
        mesh_id.get(g.mesh, -1) if S.GEOM_TYPES[g.type] == S.MESH else -1 for g in geoms
    ]

    # collision pairs
    pairs = _enumerate_pairs(
        bodies, geoms, geom_bodyid, body_parentid, body_weldid, ms.excludes, body_id,
        hullbacked=set(mesh_id),
    )
    npair = len(pairs)
    pair_friction = np.zeros((npair, 3))
    pair_solref = np.zeros((npair, 2))
    pair_solimp = np.zeros((npair, 5))
    pair_margin = np.zeros(npair)
    for p, (i, j) in enumerate(pairs):
        fr, sr, si, mg = _mix_pair_params(geoms[i], geoms[j])
        pair_friction[p] = fr
        pair_solref[p] = sr
        pair_solimp[p] = si
        pair_margin[p] = mg

    # equality constraints: resolve names; for connect, compile the body2-frame
    # anchor from the default configuration (MuJoCo compiler behavior)
    neq = len(ms.equalities)
    eq_kind, eq_obj1, eq_obj2 = [], [], []
    eq_anchor = np.zeros((neq, 3))
    eq_anchor2 = np.zeros((neq, 3))
    eq_polycoef = np.zeros((neq, 5))
    eq_solref = np.tile(np.array([0.02, 1.0]), (neq, 1))
    if neq:
        # FK at qpos0 (numpy) for anchor compilation
        xpos0 = np.zeros((nbody, 3))
        xquat0 = np.tile(np.array([1.0, 0, 0, 0]), (nbody, 1))
        for b in range(1, nbody):
            p = body_parentid[b]
            xpos0[b] = xpos0[p] + _quat2mat_np(xquat0[p]) @ bodies[b].pos
            q = xquat0[p]
            q2 = bodies[b].quat
            xquat0[b] = np.array([
                q[0]*q2[0]-q[1]*q2[1]-q[2]*q2[2]-q[3]*q2[3],
                q[0]*q2[1]+q[1]*q2[0]+q[2]*q2[3]-q[3]*q2[2],
                q[0]*q2[2]-q[1]*q2[3]+q[2]*q2[0]+q[3]*q2[1],
                q[0]*q2[3]+q[1]*q2[2]-q[2]*q2[1]+q[3]*q2[0],
            ])
        for i, eq in enumerate(ms.equalities):
            eq_kind.append(eq.kind)
            eq_solref[i] = eq.solref
            if eq.kind in ("connect", "weld"):
                b1 = body_id[eq.body1]
                b2 = body_id[eq.body2] if eq.body2 else 0
                eq_obj1.append(b1)
                eq_obj2.append(b2)
                eq_anchor[i] = eq.anchor
                # world anchor at qpos0 -> body2 frame
                wa = xpos0[b1] + _quat2mat_np(xquat0[b1]) @ eq.anchor
                eq_anchor2[i] = _quat2mat_np(xquat0[b2]).T @ (wa - xpos0[b2])
            elif eq.kind == "tendon":
                eq_obj1.append(ten_id[eq.tendon1])
                eq_obj2.append(ten_id[eq.tendon2] if eq.tendon2 else -1)
                eq_polycoef[i] = eq.polycoef
            else:  # joint
                eq_obj1.append(jnt_id[eq.joint1])
                eq_obj2.append(jnt_id[eq.joint2] if eq.joint2 else -1)
                eq_polycoef[i] = eq.polycoef

    # ancestor mask: dof d moves body b iff d's joint body is an ancestor of b
    ancestor_mask = np.zeros((nbody, nv))
    for b in range(1, nbody):
        anc = b
        chain = set()
        while anc != 0:
            chain.add(anc)
            anc = body_parentid[anc]
        for d in range(nv):
            if dof_bodyid[d] in chain:
                ancestor_mask[b, d] = 1.0

    # Model leaves stay as NUMPY arrays: jitted functions close over the
    # model, so XLA bakes them as constants at trace time (maximal constant
    # folding) and NO eager device transfers happen at construction — on the
    # axon TPU backend each eager op round-trips a remote-compile tunnel.
    jnp_ = lambda x: np.asarray(x, dtype=dtype)

    def names_of(elems):
        out = [e.name for e in elems]
        assert len(set(out)) == len(out), f"duplicate names: {sorted(out)}"
        return tuple(out)

    return Model(
        nq=nq, nv=nv, nu=nu, nbody=nbody, njnt=njnt, ngeom=ngeom, nsite=nsite, ncam=ncam, npair=npair,
        body_parentid=tuple(body_parentid),
        body_jntadr=tuple(body_jntadr),
        body_jntnum=tuple(body_jntnum),
        body_weldid=tuple(body_weldid),
        jnt_type=tuple(S.JOINT_TYPES[j.type] for j in joints),
        jnt_bodyid=tuple(jnt_bodyid),
        jnt_qposadr=tuple(jnt_qposadr),
        jnt_dofadr=tuple(jnt_dofadr),
        dof_bodyid=tuple(dof_bodyid),
        dof_jntid=tuple(dof_jntid),
        geom_bodyid=tuple(geom_bodyid),
        geom_type=tuple(S.GEOM_TYPES[g.type] for g in geoms),
        geom_group=tuple(int(g.group) for g in geoms),
        site_bodyid=tuple(site_bodyid),
        cam_bodyid=tuple(cam_bodyid),
        actuator_kind=tuple(actuator_kind),
        actuator_jntid=tuple(actuator_jntid),
        actuator_tenid=tuple(actuator_tenid),
        ntendon=ntendon,
        tendon_names=tuple(t.name for t in ms.tendons),
        tendon_limited=tuple(tendon_limited),
        nmesh=nmesh,
        mesh_names=tuple(hull_names),
        geom_meshid=tuple(geom_meshid),
        pair_geom1=tuple(p[0] for p in pairs),
        pair_geom2=tuple(p[1] for p in pairs),
        neq=neq,
        eq_kind=tuple(eq_kind),
        eq_obj1=tuple(eq_obj1),
        eq_obj2=tuple(eq_obj2),
        body_names=names_of(bodies),
        jnt_names=names_of(joints),
        geom_names=names_of(geoms),
        site_names=names_of(sites),
        cam_names=names_of(cams),
        actuator_names=tuple(a.name for a in ms.actuators),
        timestep=float(ms.option.timestep),
        impratio=float(ms.option.impratio),
        body_pos=jnp_(np.stack([b.pos for b in bodies])),
        body_quat=jnp_(np.stack([b.quat for b in bodies])),
        body_ipos=jnp_(body_ipos),
        body_iquat=jnp_(body_iquat),
        body_mass=jnp_(body_mass),
        body_inertia=jnp_(body_inertia),
        jnt_pos=jnp_(np.stack([j.pos for j in joints]) if njnt else np.zeros((0, 3))),
        jnt_axis=jnp_(np.stack([j.axis for j in joints]) if njnt else np.zeros((0, 3))),
        jnt_range=jnp_(
            np.stack([j.range if j.range is not None else np.zeros(2) for j in joints])
            if njnt else np.zeros((0, 2))
        ),
        jnt_limited=jnp_([1.0 if j.limited else 0.0 for j in joints]),
        jnt_stiffness=jnp_(jnt_stiffness),
        dof_damping=jnp_(dof_damping),
        dof_armature=jnp_(dof_armature),
        dof_frictionloss=jnp_(dof_frictionloss),
        geom_pos=jnp_(np.stack([g.pos for g in geoms]) if ngeom else np.zeros((0, 3))),
        geom_quat=jnp_(np.stack([g.quat for g in geoms]) if ngeom else np.zeros((0, 4))),
        geom_size=jnp_(np.stack([g.size for g in geoms]) if ngeom else np.zeros((0, 3))),
        geom_friction=jnp_(np.stack([g.friction for g in geoms]) if ngeom else np.zeros((0, 3))),
        geom_margin=jnp_([g.margin for g in geoms]),
        geom_rgba=jnp_(np.stack([g.rgba for g in geoms]) if ngeom else np.zeros((0, 4))),
        site_pos=jnp_(np.stack([s.pos for s in sites]) if nsite else np.zeros((0, 3))),
        site_quat=jnp_(np.stack([s.quat for s in sites]) if nsite else np.zeros((0, 4))),
        cam_pos=jnp_(np.stack([c.pos for c in cams]) if ncam else np.zeros((0, 3))),
        cam_quat=jnp_(np.stack([c.quat for c in cams]) if ncam else np.zeros((0, 4))),
        cam_fovy=jnp_([c.fovy for c in cams]),
        nlight=nlight,
        light_bodyid=tuple(light_bodyid),
        light_names=tuple(
            lt.name or f"light{k}" for k, lt in enumerate(lights)
        ),
        light_pos=jnp_(np.stack([lt.pos for lt in lights]) if nlight else np.zeros((0, 3))),
        light_dir=jnp_(np.stack([lt.dir for lt in lights]) if nlight else np.zeros((0, 3))),
        light_directional=jnp_(
            [1.0 if lt.directional else 0.0 for lt in lights]
        ),
        light_diffuse=jnp_(np.stack([lt.diffuse for lt in lights]) if nlight else np.zeros((0, 3))),
        light_ambient=jnp_(np.stack([lt.ambient for lt in lights]) if nlight else np.zeros((0, 3))),
        light_active=jnp_([1.0 if lt.active else 0.0 for lt in lights]),
        actuator_gear=jnp_(actuator_gear),
        actuator_ctrlrange=jnp_(actuator_ctrlrange),
        actuator_forcerange=jnp_(actuator_forcerange),
        actuator_gainprm=jnp_(actuator_gainprm),
        actuator_biasprm=jnp_(actuator_biasprm),
        ten_J=jnp_(ten_J),
        ten_Jq=jnp_(ten_Jq),
        ten_range=jnp_(ten_range),
        ten_stiffness=jnp_(ten_stiffness),
        ten_springlength=jnp_(ten_springlength),
        ten_frictionloss=jnp_(ten_frictionloss),
        ten_damping=jnp_(ten_damping),
        ten_length0=jnp_(ten_length0),
        mesh_verts=jnp_(mesh_verts),
        mesh_fnorm=jnp_(mesh_fnorm),
        mesh_fdist=jnp_(mesh_fdist),
        actuator_ctrllimited=jnp_(actuator_ctrllimited),
        actuator_forcelimited=jnp_(actuator_forcelimited),
        eq_anchor=jnp_(eq_anchor),
        eq_anchor2=jnp_(eq_anchor2),
        eq_polycoef=jnp_(eq_polycoef),
        eq_solref=jnp_(eq_solref),
        pair_friction=jnp_(pair_friction),
        pair_solref=jnp_(pair_solref),
        pair_solimp=jnp_(pair_solimp),
        pair_margin=jnp_(pair_margin),
        qpos0=jnp_(qpos0),
        qpos_spring=jnp_(qpos_spring),
        gravity=jnp_(ms.option.gravity),
        ancestor_mask=jnp_(ancestor_mask),
    )
