"""Fused forward-products Pallas kernel: FK + CRBA + RNEA in one pass.

After the contact solve moved on-chip (pallas_contact.py), the smooth
dynamics became the profile leader: 17 ms of a 47 ms Lift policy step at
batch 512 went to fk/crba/rnea in XLA. The root cause is layout, not FLOPs —
every (…, 3)-minor array (spatial vectors, cross products, the CRBA
(nv, nbody, 3) intermediates) pads its last dim 3 → 128 lanes on TPU, a 42x
HBM-traffic amplification on arrays that are re-materialized 25 times per
policy step.

This kernel computes the whole forward-products bundle
(body/geom/site poses, per-dof motion subspace, CRBA mass matrix, RNEA bias)
with every per-scenario scalar living on the lane axis (batch-minor): one
HBM read of (qpos, qvel) + the DR-randomizable model leaves, one write of
the outputs, zero padding waste in between. Tree structure, joint layout,
and non-randomized model constants are baked as immediates.

Static sparsity: CRBA iterates only (dof, body-in-subtree) pairs and only
the ancestor-linked entries of M; RNEA's ancestor/subtree sums unroll the
static tree instead of masked (nbody, nv) matmuls.

Dispatched via jax.custom_vmap from engine.forward_products: unbatched and
non-TPU calls run the reference XLA path (kinematics.fk + dynamics.crba +
rnea_bias); batched TPU calls hit the kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.custom_batching import custom_vmap

from robosuite_tpu.models import spec as S

LANES = 128


# ---- row-tuple vector algebra (each component is a (128,) lane vector) ----

def _cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _scale(s, a):
    return (s * a[0], s * a[1], s * a[2])


def _quat_mul(q, r):
    w0, x0, y0, z0 = q
    w1, x1, y1, z1 = r
    return (
        w0 * w1 - x0 * x1 - y0 * y1 - z0 * z1,
        w0 * x1 + x0 * w1 + y0 * z1 - z0 * y1,
        w0 * y1 - x0 * z1 + y0 * w1 + z0 * x1,
        w0 * z1 + x0 * y1 - y0 * x1 + z0 * w1,
    )


def _quat_rot(q, v):
    w, x, y, z = q
    u = (x, y, z)
    uv = _cross(u, v)
    uuv = _cross(u, uv)
    return (
        v[0] + 2.0 * (w * uv[0] + uuv[0]),
        v[1] + 2.0 * (w * uv[1] + uuv[1]),
        v[2] + 2.0 * (w * uv[2] + uuv[2]),
    )


def _quat2mat(q):
    """3x3 rotation as nested row tuples R[i][j]."""
    w, x, y, z = q
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return (
        (1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy)),
        (2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx)),
        (2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy)),
    )


def _mat_col(R, i):
    return (R[0][i], R[1][i], R[2][i])


def _tree_sum3(vs):
    """Pairwise-tree sum of a list of 3-tuples. Sequential left-fold f32
    accumulation of the CRBA/RNEA cancellation-heavy terms loses ~2e-3
    relative accuracy; pairwise matches XLA's reduce ordering (~1e-5)."""
    if not vs:
        return None
    while len(vs) > 1:
        nxt = [_add(vs[i], vs[i + 1]) for i in range(0, len(vs) - 1, 2)]
        if len(vs) % 2:
            nxt.append(vs[-1])
        vs = nxt
    return vs[0]


def _tree_sum1(vs):
    while len(vs) > 1:
        nxt = [vs[i] + vs[i + 1] for i in range(0, len(vs) - 1, 2)]
        if len(vs) % 2:
            nxt.append(vs[-1])
        vs = nxt
    return vs[0]


def _tree_meta(model):
    """Static tree structure used by the kernel."""
    nb, nv = model.nbody, model.nv
    anc_dofs = [[] for _ in range(nb)]  # dofs moving body b, outboard-in order
    for b in range(nb):
        k = b
        while k != 0:
            jadr, jnum = model.body_jntadr[k], model.body_jntnum[k]
            for jj in range(jnum):
                j = jadr + jj
                d0 = model.jnt_dofadr[j]
                for d in range(d0, d0 + S.JOINT_NV[model.jnt_type[j]]):
                    anc_dofs[b].append(d)
            k = model.body_parentid[k]
        anc_dofs[b] = sorted(anc_dofs[b])
    moving = [b for b in range(nb) if anc_dofs[b]]
    sub_bodies = [[b for b in moving if d in anc_dofs[b]] for d in range(nv)]
    desc = [[b2 for b2 in range(nb) if b in _ancestors(model, b2)] for b in range(nb)]
    return anc_dofs, moving, sub_bodies, desc


def _ancestors(model, b):
    out = []
    k = b
    while True:
        out.append(k)
        if k == 0:
            return out
        k = model.body_parentid[k]


class ForwardLanes:
    """Lane-tuple forward products: every field is a per-scenario scalar as a
    (128,) lane vector (or a tuple/list of them). Produced by
    forward_lane_body; consumed by this module's kernel and by the fused
    substep megakernel (ops/pallas_substep.py)."""

    __slots__ = ("xpos", "xquat", "xmat", "xipos", "ximat", "sdof_ang",
                 "sdof_lin", "M_rows", "bias", "geom_pose", "site_pose",
                 "one", "zero", "const3", "const4")


def forward_lane_body(model, q, qd, mass, inertia, grav_in, arma, dtype):
    """FK + CRBA + RNEA on lane tuples — the shared kernel body.

    Args: q/qd lists of (128,) lanes; mass/inertia/arma indexable per body/
    dof; grav_in (3,) indexable. Returns a ForwardLanes."""
    nb, nv = model.nbody, model.nv
    body_pos = np.asarray(model.body_pos, dtype=np.float32)
    body_quat = np.asarray(model.body_quat, dtype=np.float32)
    body_ipos = np.asarray(model.body_ipos, dtype=np.float32)
    body_iquat = np.asarray(model.body_iquat, dtype=np.float32)
    jnt_pos = np.asarray(model.jnt_pos, dtype=np.float32)
    jnt_axis = np.asarray(model.jnt_axis, dtype=np.float32)
    qpos0 = np.asarray(model.qpos0, dtype=np.float32)
    geom_pos = np.asarray(model.geom_pos, dtype=np.float32)
    geom_quat = np.asarray(model.geom_quat, dtype=np.float32)
    site_pos = np.asarray(model.site_pos, dtype=np.float32) if model.nsite else None
    site_quat = np.asarray(model.site_quat, dtype=np.float32) if model.nsite else None

    anc_dofs, moving, sub_bodies, desc = _tree_meta(model)
    dof_body = [model.dof_bodyid[d] for d in range(nv)]
    # free-joint translation dofs (world-fixed axes -> Sdot = 0)
    free_trans = set()
    for j in range(model.njnt):
        if model.jnt_type[j] == S.FREE:
            for i in range(3):
                free_trans.add(model.jnt_dofadr[j] + i)

    if True:  # (indentation shim: body below unchanged from the kernel)
        one = jnp.ones((LANES,), dtype=dtype)
        zero = jnp.zeros((LANES,), dtype=dtype)

        def const3(arr):
            return (arr[0] * one, arr[1] * one, arr[2] * one)

        def const4(arr):
            return (arr[0] * one, arr[1] * one, arr[2] * one, arr[3] * one)

        # ---- FK + sdof ------------------------------------------------------
        xpos = [None] * nb
        xquat = [None] * nb
        xpos[0] = (zero, zero, zero)
        xquat[0] = (one, zero, zero, zero)
        sdof_ang = [None] * nv
        sdof_lin = [None] * nv

        for b in range(1, nb):
            p = model.body_parentid[b]
            pos = _add(xpos[p], _quat_rot(xquat[p], const3(body_pos[b])))
            quat = _quat_mul(xquat[p], const4(body_quat[b]))

            jadr, jnum = model.body_jntadr[b], model.body_jntnum[b]
            for kk in range(jnum):
                j = jadr + kk
                jt = model.jnt_type[j]
                qadr = model.jnt_qposadr[j]
                dadr = model.jnt_dofadr[j]
                if jt == S.FREE:
                    pos = (q[qadr], q[qadr + 1], q[qadr + 2])
                    qw, qx, qy, qz = q[qadr + 3], q[qadr + 4], q[qadr + 5], q[qadr + 6]
                    inv_n = jax.lax.rsqrt(qw * qw + qx * qx + qy * qy + qz * qz + 1e-12)
                    quat = (qw * inv_n, qx * inv_n, qy * inv_n, qz * inv_n)
                    R = _quat2mat(quat)
                    e = ((one, zero, zero), (zero, one, zero), (zero, zero, one))
                    for i in range(3):
                        sdof_ang[dadr + i] = (zero, zero, zero)
                        sdof_lin[dadr + i] = e[i]
                    for i in range(3):
                        a = _mat_col(R, i)
                        sdof_ang[dadr + 3 + i] = a
                        sdof_lin[dadr + 3 + i] = _cross(pos, a)
                elif jt == S.BALL:
                    anchor = _add(pos, _quat_rot(quat, const3(jnt_pos[j])))
                    qw, qx, qy, qz = q[qadr], q[qadr + 1], q[qadr + 2], q[qadr + 3]
                    inv_n = jax.lax.rsqrt(qw * qw + qx * qx + qy * qy + qz * qz + 1e-12)
                    quat = _quat_mul(quat, (qw * inv_n, qx * inv_n, qy * inv_n, qz * inv_n))
                    pos = _sub(anchor, _quat_rot(quat, const3(jnt_pos[j])))
                    R = _quat2mat(quat)
                    for i in range(3):
                        a = _mat_col(R, i)
                        sdof_ang[dadr + i] = a
                        sdof_lin[dadr + i] = _cross(anchor, a)
                elif jt == S.SLIDE:
                    axis_w = _quat_rot(quat, const3(jnt_axis[j]))
                    amt = q[qadr] - qpos0[qadr]
                    pos = _add(pos, _scale(amt, axis_w))
                    sdof_ang[dadr] = (zero, zero, zero)
                    sdof_lin[dadr] = axis_w
                else:  # HINGE
                    axis_w = _quat_rot(quat, const3(jnt_axis[j]))
                    anchor = _add(pos, _quat_rot(quat, const3(jnt_pos[j])))
                    half = 0.5 * (q[qadr] - qpos0[qadr])
                    c, s = jnp.cos(half), jnp.sin(half)
                    lq = (c, s * jnt_axis[j][0], s * jnt_axis[j][1], s * jnt_axis[j][2])
                    quat = _quat_mul(quat, lq)
                    pos = _sub(anchor, _quat_rot(quat, const3(jnt_pos[j])))
                    sdof_ang[dadr] = axis_w
                    sdof_lin[dadr] = _cross(anchor, axis_w)

            xpos[b] = pos
            xquat[b] = quat

        xmat = [_quat2mat(xquat[b]) for b in range(nb)]
        xipos = [
            _add(xpos[b], _quat_rot(xquat[b], const3(body_ipos[b]))) for b in range(nb)
        ]
        ximat = [
            _quat2mat(_quat_mul(xquat[b], const4(body_iquat[b]))) for b in range(nb)
        ]

        m = [mass[b] for b in range(nb)]
        Idiag = [inertia[b] for b in range(nb)]
        grav = (grav_in[0], grav_in[1], grav_in[2])

        def I_about_com(b):
            """R diag(I) R^T rows for body b (inertia frame = ximat)."""
            R = ximat[b]
            Ix, Iy, Iz = Idiag[b]
            rows = [[None] * 3 for _ in range(3)]
            for i in range(3):
                for jj in range(i, 3):
                    v = R[i][0] * Ix * R[jj][0] + R[i][1] * Iy * R[jj][1] + R[i][2] * Iz * R[jj][2]
                    rows[i][jj] = v
                    rows[jj][i] = v
            return rows

        I_C = [I_about_com(b) if b in moving else None for b in range(nb)]

        def matvec3(A, v):
            return (
                A[0][0] * v[0] + A[0][1] * v[1] + A[0][2] * v[2],
                A[1][0] * v[0] + A[1][1] * v[1] + A[1][2] * v[2],
                A[2][0] * v[0] + A[2][1] * v[1] + A[2][2] * v[2],
            )

        # ---- CRBA (per-column anchored, static subtree sparsity) -----------
        F_ang = [None] * nv
        F_lin = [None] * nv
        s_lin_p = [None] * nv
        for d in range(nv):
            p_d = xpos[dof_body[d]]
            s_a = sdof_ang[d]
            s_lp = _add(sdof_lin[d], _cross(s_a, p_d))
            s_lin_p[d] = s_lp
            fa_terms, fl_terms = [], []
            for b in sub_bodies[d]:
                r = _sub(xipos[b], p_d)
                v_com = _add(s_lp, _cross(s_a, r))
                f_lin = _scale(m[b], v_com)
                fa_terms.append(_add(matvec3(I_C[b], s_a), _cross(r, f_lin)))
                fl_terms.append(f_lin)
            F_ang[d] = _tree_sum3(fa_terms) or (zero, zero, zero)
            F_lin[d] = _tree_sum3(fl_terms) or (zero, zero, zero)

        M_rows = [[zero] * nv for _ in range(nv)]
        for d in range(nv):
            p_d = xpos[dof_body[d]]
            for e in anc_dofs[dof_body[d]]:
                lin_e = _add(sdof_lin[e], _cross(sdof_ang[e], p_d))
                a = _dot(sdof_ang[e], F_ang[d]) + _dot(lin_e, F_lin[d])
                M_rows[e][d] = a
                M_rows[d][e] = a
        for d in range(nv):
            M_rows[d][d] = M_rows[d][d] + arma[d]

        # ---- RNEA bias (centroid-referenced, static tree sums) --------------
        msum = _tree_sum1([m[b] for b in range(nb)])
        mo = _tree_sum3([_scale(m[b], xipos[b]) for b in range(nb)])
        inv_ms = 1.0 / msum
        o = _scale(inv_ms, mo)

        sd_lin = [_add(sdof_lin[d], _cross(sdof_ang[d], o)) for d in range(nv)]
        c_rc = [_sub(xipos[b], o) for b in range(nb)]
        h = [_scale(m[b], c_rc[b]) for b in range(nb)]

        def I_O_mul(b, x):
            """(I_O x) with I_O = I_C + m(|c|^2 E - c c^T), all about centroid."""
            ic = I_C[b]
            if ic is None:
                ic = I_about_com(b)
            t = matvec3(ic, x)
            c = c_rc[b]
            c2 = _dot(c, c)
            cx = _dot(c, x)
            return (
                t[0] + m[b] * (c2 * x[0] - c[0] * cx),
                t[1] + m[b] * (c2 * x[1] - c[1] * cx),
                t[2] + m[b] * (c2 * x[2] - c[2] * cx),
            )

        def imul(b, x_ang, x_lin):
            lin = _add(_scale(m[b], x_lin), _cross(x_ang, h[b]))
            ang = _add(I_O_mul(b, x_ang), _cross(h[b], x_lin))
            return ang, lin

        v_ang = [(zero, zero, zero)] * nb
        v_lin = [(zero, zero, zero)] * nb
        for b in range(nb):
            if anc_dofs[b]:
                v_ang[b] = _tree_sum3([_scale(qd[d], sdof_ang[d]) for d in anc_dofs[b]])
                v_lin[b] = _tree_sum3([_scale(qd[d], sd_lin[d]) for d in anc_dofs[b]])

        sdot_ang = [None] * nv
        sdot_lin = [None] * nv
        for d in range(nv):
            if d in free_trans:
                sdot_ang[d] = (zero, zero, zero)
                sdot_lin[d] = (zero, zero, zero)
                continue
            bd = dof_body[d]
            sdot_ang[d] = _cross(v_ang[bd], sdof_ang[d])
            sdot_lin[d] = _add(_cross(v_ang[bd], sd_lin[d]), _cross(v_lin[bd], sdof_ang[d]))

        f_ang_b = [None] * nb
        f_lin_b = [None] * nb
        for b in range(nb):
            if anc_dofs[b]:
                aa = _tree_sum3([_scale(qd[d], sdot_ang[d]) for d in anc_dofs[b]])
                al = _tree_sum3([_scale(qd[d], sdot_lin[d]) for d in anc_dofs[b]])
            else:
                aa, al = (zero, zero, zero), (zero, zero, zero)
            al = _sub(al, grav)
            Ia_ang, Ia_lin = imul(b, aa, al)
            Iv_ang, Iv_lin = imul(b, v_ang[b], v_lin[b])
            f_ang_b[b] = _add(Ia_ang, _add(_cross(v_ang[b], Iv_ang), _cross(v_lin[b], Iv_lin)))
            f_lin_b[b] = _add(Ia_lin, _cross(v_ang[b], Iv_lin))

        ft_ang = [None] * nb
        ft_lin = [None] * nb
        for b in range(nb):
            ft_ang[b] = _tree_sum3([f_ang_b[b2] for b2 in desc[b]])
            ft_lin[b] = _tree_sum3([f_lin_b[b2] for b2 in desc[b]])

        bias_rows = [None] * nv
        for d in range(nv):
            bd = dof_body[d]
            bias_rows[d] = _dot(sdof_ang[d], ft_ang[bd]) + _dot(sd_lin[d], ft_lin[bd])

    out = ForwardLanes()
    out.xpos = xpos
    out.xquat = xquat
    out.xmat = xmat
    out.xipos = xipos
    out.ximat = ximat
    out.sdof_ang = sdof_ang
    out.sdof_lin = sdof_lin
    out.M_rows = M_rows
    out.bias = bias_rows
    out.one = one
    out.zero = zero
    out.const3 = const3
    out.const4 = const4

    def geom_pose(g):
        """(pos 3-tuple, rot 3x3 row tuples) of geom g in world."""
        b = model.geom_bodyid[g]
        gp = _add(xpos[b], _quat_rot(xquat[b], const3(geom_pos[g])))
        gR = _quat2mat(_quat_mul(xquat[b], const4(geom_quat[g])))
        return gp, gR

    def site_pose(s_i):
        b = model.site_bodyid[s_i]
        sp = _add(xpos[b], _quat_rot(xquat[b], const3(site_pos[s_i])))
        sR = _quat2mat(_quat_mul(xquat[b], const4(site_quat[s_i])))
        return sp, sR

    out.geom_pose = geom_pose
    out.site_pose = site_pose
    return out


def _make_kernel(model):
    nb, nv, nq = model.nbody, model.nv, model.nq
    ngeom, nsite = model.ngeom, model.nsite

    def kernel(qpos_ref, qvel_ref, mass_ref, inertia_ref, grav_ref, arma_ref,
               xpos_ref, xquat_ref, xmat_ref, gx_ref, gm_ref, sx_ref, sm_ref,
               sa_ref, sl_ref, M_ref, bias_ref, xipos_ref, ximat_ref):
        q = [qpos_ref[i] for i in range(nq)]
        qd = [qvel_ref[i] for i in range(nv)]
        mass = [mass_ref[b] for b in range(nb)]
        inertia = [(inertia_ref[b, 0], inertia_ref[b, 1], inertia_ref[b, 2])
                   for b in range(nb)]
        grav = (grav_ref[0], grav_ref[1], grav_ref[2])
        arma = [arma_ref[d] for d in range(nv)]
        fw = forward_lane_body(model, q, qd, mass, inertia, grav, arma,
                               qpos_ref.dtype)

        # ---- outputs ---------------------------------------------------------
        for b in range(nb):
            for i in range(3):
                xpos_ref[b * 3 + i] = fw.xpos[b][i]
            for i in range(4):
                xquat_ref[b * 4 + i] = fw.xquat[b][i]
            for i in range(3):
                for jj in range(3):
                    xmat_ref[b * 9 + i * 3 + jj] = fw.xmat[b][i][jj]
        for g in range(ngeom):
            gp, gR = fw.geom_pose(g)
            for i in range(3):
                gx_ref[g * 3 + i] = gp[i]
            for i in range(3):
                for jj in range(3):
                    gm_ref[g * 9 + i * 3 + jj] = gR[i][jj]
        for s_i in range(nsite):
            sp, sR = fw.site_pose(s_i)
            for i in range(3):
                sx_ref[s_i * 3 + i] = sp[i]
            for i in range(3):
                for jj in range(3):
                    sm_ref[s_i * 9 + i * 3 + jj] = sR[i][jj]
        for d in range(nv):
            for i in range(3):
                sa_ref[d * 3 + i] = fw.sdof_ang[d][i]
                sl_ref[d * 3 + i] = fw.sdof_lin[d][i]
        for i in range(nv):
            for jj in range(nv):
                M_ref[i * nv + jj] = fw.M_rows[i][jj]
        for d in range(nv):
            bias_ref[d] = fw.bias[d]
        for b in range(nb):
            for i in range(3):
                xipos_ref[b * 3 + i] = fw.xipos[b][i]
            for i in range(3):
                for jj in range(3):
                    ximat_ref[b * 9 + i * 3 + jj] = fw.ximat[b][i][jj]

    return kernel


def _pallas_forward(model):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb, nv, nq = model.nbody, model.nv, model.nq
    ngeom, nsite = model.ngeom, model.nsite
    kernel = _make_kernel(model)

    def spec(*dims):
        return pl.BlockSpec(dims + (LANES,), lambda i: (0,) * len(dims) + (i,),
                            memory_space=pltpu.VMEM)

    out_rows = (nb * 3, nb * 4, nb * 9, ngeom * 3, ngeom * 9,
                max(nsite * 3, 1), max(nsite * 9, 1), nv * 3, nv * 3, nv * nv, nv,
                nb * 3, nb * 9)

    @jax.jit
    def run(qpos, qvel, mass, inertia, gravity, armature):
        B = qpos.shape[0]
        Bp = ((B + LANES - 1) // LANES) * LANES
        pad = Bp - B

        def prep(x):
            x = jnp.moveaxis(x, 0, -1)
            if pad:
                x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
            return x

        args = tuple(prep(a) for a in (qpos, qvel, mass, inertia, gravity, armature))
        outs = pl.pallas_call(
            kernel,
            grid=(Bp // LANES,),
            in_specs=[spec(nq), spec(nv), spec(nb), spec(nb, 3), spec(3), spec(nv)],
            out_specs=tuple(spec(r) for r in out_rows),
            out_shape=tuple(jax.ShapeDtypeStruct((r, Bp), qpos.dtype) for r in out_rows),
        )(*args)

        def unpack(x, *shape):
            return jnp.moveaxis(x, -1, 0)[:B].reshape((B,) + shape)

        from robosuite_tpu.physics.state import KinData

        xpos = unpack(outs[0], nb, 3)
        xquat = unpack(outs[1], nb, 4)
        xmat = unpack(outs[2], nb, 3, 3)
        kin = KinData(
            xpos=xpos,
            xquat=xquat,
            xmat=xmat,
            xipos=unpack(outs[11], nb, 3),
            ximat=unpack(outs[12], nb, 3, 3),
            sdof_ang=unpack(outs[7], nv, 3),
            sdof_lin=unpack(outs[8], nv, 3),
            geom_xpos=unpack(outs[3], ngeom, 3),
            geom_xmat=unpack(outs[4], ngeom, 3, 3),
            site_xpos=unpack(outs[5], nsite, 3) if nsite else jnp.zeros((B, 0, 3), qpos.dtype),
            site_xmat=unpack(outs[6], nsite, 3, 3) if nsite else jnp.zeros((B, 0, 3, 3), qpos.dtype),
        )
        M = unpack(outs[9], nv, nv)
        bias = unpack(outs[10], nv)
        return kin, M, bias

    return run


def make_forward_solver(model):
    """Returns fp(qpos, qvel, mass, inertia, gravity, armature) ->
    (KinData, M, bias): custom_vmap — batched TPU calls run the fused kernel,
    unbatched / non-TPU calls run the reference XLA path."""
    from robosuite_tpu.physics import dynamics, kinematics

    def _xla(qpos, qvel, mass, inertia, gravity, armature):
        m = model.replace(body_mass=mass, body_inertia=inertia,
                          gravity=gravity, dof_armature=armature)
        kin = kinematics.fk(m, qpos)
        M = dynamics.crba(m, kin)
        bias = dynamics.rnea_bias(m, kin, qvel)
        return kin, M, bias

    _flat_cache = []

    @custom_vmap
    def fp_inner(qpos, qvel, mass, inertia, gravity, armature):
        return _xla(qpos, qvel, mass, inertia, gravity, armature)

    @fp_inner.def_vmap
    def _fp_vmap(axis_size, in_batched, *args):
        def bc(x, b):
            return x if b else jnp.broadcast_to(x[None], (axis_size,) + x.shape)

        args = [bc(a, b) for a, b in zip(args, in_batched)]
        if jax.default_backend() == "tpu":
            if not _flat_cache:
                from robosuite_tpu.ops.vmap_flat import flat_batched

                _flat_cache.append(flat_batched(_pallas_forward(model)))
            out = _flat_cache[0](*args)
        else:
            out = jax.vmap(_xla)(*args)
        return out, jax.tree_util.tree_map(lambda _: True, out)

    # Differentiation boundary: custom_vmap composes with vmap but not with
    # jvp (the MPC linearization, jacfwd through the rollout, needs it).
    # custom_jvp sits OUTSIDE so primal-only calls still dispatch to the
    # Pallas kernel, while tangents ride the plain XLA path.
    @jax.custom_jvp
    def fp(qpos, qvel, mass, inertia, gravity, armature):
        return fp_inner(qpos, qvel, mass, inertia, gravity, armature)

    @fp.defjvp
    def _fp_jvp(primals, tangents):
        return jax.jvp(_xla, primals, tangents)

    return fp
