"""Inverse/forward dynamics building blocks: CRBA mass matrix, RNEA bias.

Replaces MuJoCo's mj_crb / mj_rne as consumed by the reference controller
stack (mj_fullM at controllers/parts/controller.py:226-229, qfrc_bias at
:303-311). World-frame, origin-referenced spatial algebra; the heavy
reductions are (nv,3)/(nbody,nv) matmuls so XLA tiles them onto the MXU when
vmapped over scenarios.

Composite spatial inertia is carried as the additive triple (m, h = m*c,
I_O = inertia about world origin), so subtree accumulation is a plain masked
matmul instead of a 6x6 matrix chain.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _body_ancestor_matrix(model):
    """anc[i, j] = 1 if body i is ancestor-of-or-equal-to body j (static)."""
    nb = model.nbody
    anc = np.zeros((nb, nb), dtype=np.float32)
    for j in range(nb):
        k = j
        while True:
            anc[k, j] = 1.0
            if k == 0:
                break
            k = model.body_parentid[k]
    return anc


def _recenter(model, kin):
    """Shift the spatial-algebra reference point from the world origin to the
    scene's mass centroid.

    Any reference point yields the same M / bias in exact arithmetic; the
    centroid minimizes |c| and |I_O| magnitudes, which is what keeps the
    float32 CRBA PSD (gram-scale finger links ~1 m from the origin otherwise
    cancel catastrophically: I ~ 1e-8 vs m|c|^2 ~ 1e-2).

    Returns (c, sd_lin): recentered COM positions and dof linear subspace
    (v_{O'} = v_O + omega x (O' - O))."""
    m = model.body_mass
    msum = jnp.sum(m)
    o = jnp.sum(m[:, None] * kin.xipos, axis=0) / msum
    sd_lin = kin.sdof_lin + jnp.cross(kin.sdof_ang, o[None, :])
    c = kin.xipos - o[None, :]
    return c, sd_lin


def spatial_inertia(model, kin, c=None):
    """Per-body (m, h, I_O) in world frame about the reference point implied
    by `c` (COM positions relative to that point; defaults to world origin).

    I_O = R I_diag R^T + m (|c|^2 E - c c^T), h = m c.
    """
    m = model.body_mass  # (nbody,)
    c = kin.xipos if c is None else c  # (nbody, 3)
    R = kin.ximat  # (nbody, 3, 3)
    I_C = jnp.einsum("bij,bj,bkj->bik", R, model.body_inertia, R)
    cc = jnp.einsum("bi,bj->bij", c, c)
    c2 = jnp.sum(c * c, axis=-1)
    eye = jnp.eye(3, dtype=c.dtype)
    I_O = I_C + m[:, None, None] * (c2[:, None, None] * eye - cc)
    h = m[:, None] * c
    return m, h, I_O


def _imul(m, h, I_O, x_ang, x_lin):
    """Apply spatial inertia (m,h,I_O) to a motion vector (x_ang, x_lin).

    Returns (momentum_ang_about_origin, momentum_lin):
      lin = m x_lin + x_ang x h? (note: omega x (m c) = -(m c) x omega)
      ang = I_O x_ang + h x x_lin
    """
    lin = m[..., None] * x_lin + jnp.cross(x_ang, h)
    ang = jnp.einsum("...ij,...j->...i", I_O, x_ang) + jnp.cross(h, x_lin)
    return ang, lin


def crba(model, kin):
    """Composite-rigid-body mass matrix, (nv, nv), dense.

    Matches mj_fullM output ordering (world dof ordering) including armature.

    Numerics: every column d is referenced at its OWN body origin p_d (any
    reference point is exact in real arithmetic), so all intermediates are
    entry-scaled — the analog of MuJoCo's accumulate-about-joint-frames CRBA.
    A single global reference point makes the f32 matrix lose PSD-ness: the
    parallel-axis terms m|c|^2 of the heavy far bodies (~1e2 kg m^2) cancel
    against the S-projections down to entries ~1e-8 kg m^2 for gram-scale
    finger links, 1e6x beyond f32 resolution. With per-column referencing
    the relative error is ~1e-6 and Cholesky stays stable.

    Shapes are (nv, nbody, 3) einsums — still batched matmuls for the MXU
    under vmap, just with the body axis kept explicit instead of
    pre-contracted.
    """
    dof_body = np.asarray(model.dof_bodyid, dtype=np.int32)  # static index
    # static pruning: bodies moved by no dof (world, arena, table, pedestal)
    # are in no dof's subtree and never contribute to M — drop them from the
    # (nv, nbody) einsum axes (30-50% of a manipulation world's bodies).
    # Derived from the static tree fields (parent ids + joint counts), NOT
    # model.ancestor_mask, which is a traced array leaf under jit.
    def _is_moving(b):
        k = b
        while k != 0:
            if model.body_jntnum[k] > 0:
                return True
            k = model.body_parentid[k]
        return False

    moving = np.array([b for b in range(model.nbody) if _is_moving(b)], dtype=np.int32)
    m = model.body_mass[moving]                               # (nb_m,)
    c = kin.xipos[moving]                                     # (nb_m, 3) COM, world
    R = kin.ximat[moving]
    I_C = jnp.einsum("bij,bj,bkj->bik", R, model.body_inertia[moving], R)  # about COM

    p = kin.xpos[dof_body]                                    # (nv, 3) column anchors
    # motion of dof d referenced at p_d: lin(p) = lin(0) + ang x p
    s_ang = kin.sdof_ang                                      # (nv, 3)
    s_lin_p = kin.sdof_lin + jnp.cross(s_ang, p)              # (nv, 3)

    # subtree mask: sub[d, b] = 1 if dof d moves body b
    sub = model.ancestor_mask.T[:, moving]                    # (nv, nb_m)

    # per-(dof, body): COM offset from the column anchor, body-COM velocity
    r = c[None, :, :] - p[:, None, :]                         # (nv, nb, 3)
    v_com = s_lin_p[:, None, :] + jnp.cross(s_ang[:, None, :], r)  # (nv, nb, 3)

    # momentum of body b under unit dof-d motion, referenced at p_d
    mw = m[None, :, None] * sub[:, :, None]                   # masked body mass
    f_lin = mw * v_com                                        # (nv, nb, 3)
    f_ang = jnp.einsum("bij,dj->dbi", I_C, s_ang) * sub[:, :, None] + jnp.cross(r, f_lin)

    F_lin = jnp.sum(f_lin, axis=1)                            # (nv, 3)
    F_ang = jnp.sum(f_ang, axis=1)                            # (nv, 3)

    # M[e, d] = ang_e . F_ang_d + lin_e(p_d) . F_lin_d
    lin_e_pd = kin.sdof_lin[:, None, :] + jnp.cross(s_ang[:, None, :], p[None, :, :])  # (e, d, 3)
    A = s_ang @ F_ang.T + jnp.einsum("edi,di->ed", lin_e_pd, F_lin)

    # M[e, d] = A[e, d] where dof e moves body(d); symmetric completion
    AM = model.ancestor_mask[dof_body, :].T  # (nv_e, nv_d): e ancestor-dof of body(d)
    M = jnp.where(AM > 0, A, jnp.where(AM.T > 0, A.T, 0.0))
    M = M + jnp.diag(model.dof_armature)
    return M


def rnea_bias(model, kin, qvel):
    """qfrc_bias = C(q, qvel) qvel + G(q): inverse dynamics with qacc = 0.

    Matches mjData.qfrc_bias (used as the reference's gravity compensation,
    controllers/parts/controller.py:303-311).
    """
    c_rc, sd_lin = _recenter(model, kin)
    m, h, I_O = spatial_inertia(model, kin, c=c_rc)
    anc_b = _body_ancestor_matrix(model)

    # body spatial velocities (centroid-referenced, see _recenter)
    sq_ang = kin.sdof_ang * qvel[:, None]
    sq_lin = sd_lin * qvel[:, None]
    v_ang = model.ancestor_mask @ sq_ang  # (nbody, 3)
    v_lin = model.ancestor_mask @ sq_lin

    # sdof rate of change: crossMotion(v_body(d), S_d); own-dof terms vanish.
    # Free-joint translation dofs have world-fixed axes -> Sdot = 0.
    dof_body = np.asarray(model.dof_bodyid, dtype=np.int32)  # static index
    vb_ang, vb_lin = v_ang[dof_body], v_lin[dof_body]
    sdot_ang = jnp.cross(vb_ang, kin.sdof_ang)
    sdot_lin = jnp.cross(vb_ang, sd_lin) + jnp.cross(vb_lin, kin.sdof_ang)
    fixed_axis = np.ones(model.nv, dtype=np.float32)
    for j in range(model.njnt):
        from robosuite_tpu.models import spec as S

        if model.jnt_type[j] == S.FREE:
            fixed_axis[model.jnt_dofadr[j] : model.jnt_dofadr[j] + 3] = 0.0
    fa = jnp.asarray(fixed_axis)[:, None]
    sdot_ang = sdot_ang * fa
    sdot_lin = sdot_lin * fa

    # body spatial accelerations with qacc = 0: a = anc @ (Sdot * qvel) + a0
    a_ang = model.ancestor_mask @ (sdot_ang * qvel[:, None])
    a_lin = model.ancestor_mask @ (sdot_lin * qvel[:, None]) - model.gravity[None, :]

    # per-body force: f = I a + v x* (I v)
    Ia_ang, Ia_lin = _imul(m, h, I_O, a_ang, a_lin)
    Iv_ang, Iv_lin = _imul(m, h, I_O, v_ang, v_lin)
    # force cross product: v x* f = (w x f_ang + v x f_lin, w x f_lin)
    f_ang = Ia_ang + jnp.cross(v_ang, Iv_ang) + jnp.cross(v_lin, Iv_lin)
    f_lin = Ia_lin + jnp.cross(v_ang, Iv_lin)

    # backward pass: subtree force sums then project onto sdof
    ft_ang = anc_b @ f_ang
    ft_lin = anc_b @ f_lin
    qfrc = jnp.sum(kin.sdof_ang * ft_ang[dof_body], axis=-1) + jnp.sum(
        sd_lin * ft_lin[dof_body], axis=-1
    )
    return qfrc


def _scalar_joint_index(model):
    """Static (qadr, dadr, jids) arrays for all 1-dof (hinge/slide) joints —
    lets the per-joint force loops collapse into one gather/scatter pair."""
    from robosuite_tpu.models import spec as S

    jids = np.array(
        [j for j in range(model.njnt) if model.jnt_type[j] in (S.HINGE, S.SLIDE)],
        dtype=np.int32,
    )
    qadr = np.array([model.jnt_qposadr[j] for j in jids], dtype=np.int32)
    dadr = np.array([model.jnt_dofadr[j] for j in jids], dtype=np.int32)
    return qadr, dadr, jids


def passive_forces(model, qpos, qvel):
    """Joint springs + (explicit part of) damping.

    Damping is integrated implicitly in the engine (MuJoCo Euler-damp
    behavior); springs follow qfrc_spring = -stiffness * (qpos - springref).
    Returns spring force only; damping handled by the integrator.
    """
    qfrc = jnp.zeros_like(qvel)
    qadr, dadr, jids = _scalar_joint_index(model)
    if len(jids) == 0:
        return qfrc
    f = -model.jnt_stiffness[jids] * (qpos[qadr] - model.qpos_spring[qadr])
    return qfrc.at[dadr].add(f)


def joint_limit_forces(model, qpos, qvel, Mdiag=None, solref=(0.02, 1.0)):
    """Compliant joint-limit forces (MuJoCo limit constraints as a
    mass-scaled spring-damper, reference constraint impedance semantics:
    stiffness/damping are per unit effective inertia, engine.c solref docs).

    Returns (qfrc_spring, extra_damping): the spring part goes into the
    smooth force; the damping part MUST be integrated implicitly — an
    explicit b*v on a light finger link (inertia ~1e-5) diverges within a
    few 2 ms substeps, which is exactly why MuJoCo solves limits inside the
    constraint solver. `Mdiag` is diag(M) incl. armature (m_eff per dof)."""
    qfrc = jnp.zeros_like(qvel)
    damp = jnp.zeros_like(qvel)
    qadr, dadr, jids = _scalar_joint_index(model)
    if len(jids) == 0:
        return qfrc, damp
    timeconst, dampratio = solref
    q = qpos[qadr]
    lo = model.jnt_range[jids, 0]
    hi = model.jnt_range[jids, 1]
    d_lo = lo - q  # positive when violated
    d_hi = q - hi
    m_eff = Mdiag[dadr] if Mdiag is not None else jnp.ones_like(q)
    # MuJoCo impedance with d=0.9, dmax=0.95 (default solimp flat region)
    d_imp, dmax = 0.9, 0.95
    k = d_imp / (dmax * dmax * timeconst * timeconst * dampratio * dampratio) * m_eff
    b = 2.0 / (dmax * timeconst) * m_eff
    f = k * (jnp.maximum(d_lo, 0.0) - jnp.maximum(d_hi, 0.0))
    active = ((d_lo > 0) | (d_hi > 0)).astype(qfrc.dtype)
    limited = jnp.asarray(model.jnt_limited)[jids]
    return qfrc.at[dadr].add(limited * f), damp.at[dadr].add(limited * active * b)


def tendon_forces(model, qpos, qvel, Mdiag=None, solref=(0.02, 1.0)):
    """Fixed-tendon passive forces: spring, smooth dry friction, and
    range-limit spring-dampers (MuJoCo tendon stiffness/frictionloss/limited
    semantics; the limit constraint becomes the same mass-scaled compliant
    law as joint_limit_forces).

    Returns (qfrc, extra_damping_diag): the damping part of the limit law
    and tendon damping are diagonalized onto dofs (J^T b J ≈ diag(b J_i^2))
    and folded into the engine's implicit (M + dt*diag(D)) velocity solve —
    explicit tendon-limit damping on light finger links diverges exactly
    like explicit joint-limit damping does."""
    qfrc = jnp.zeros_like(qvel)
    damp = jnp.zeros_like(qvel)
    if model.ntendon == 0:
        return qfrc, damp
    L = model.ten_Jq @ qpos    # (ntendon,)
    V = model.ten_J @ qvel
    f = -model.ten_stiffness * (L - model.ten_springlength)
    f = f - model.ten_frictionloss * jnp.tanh(V / 0.005)

    # range limits (one-sided springs, mass-scaled impedance)
    timeconst, dampratio = solref
    m_eff = (
        (model.ten_J ** 2) @ Mdiag if Mdiag is not None else jnp.ones_like(L)
    )  # effective inertia along the tendon (diagonal approximation)
    d_imp, dmax = 0.9, 0.95
    k_lim = d_imp / (dmax * dmax * timeconst * timeconst * dampratio * dampratio) * m_eff
    b_lim = 2.0 / (dmax * timeconst) * m_eff
    d_lo = model.ten_range[:, 0] - L
    d_hi = L - model.ten_range[:, 1]
    limited = jnp.asarray(model.tendon_limited, dtype=qfrc.dtype)
    active = ((d_lo > 0) | (d_hi > 0)).astype(qfrc.dtype) * limited
    f = f + limited * k_lim * (jnp.maximum(d_lo, 0.0) - jnp.maximum(d_hi, 0.0))

    qfrc = qfrc + f @ model.ten_J
    b_total = active * b_lim + model.ten_damping
    damp = damp + b_total @ (model.ten_J ** 2)
    return qfrc, damp
