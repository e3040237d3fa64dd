"""Equality constraints: bilateral rows for the constraint solver.

Replaces MuJoCo's equality rows (connect / weld / joint coupling). Each
equality contributes Jacobian rows + a solref-parameterized reference
acceleration; the rows are appended to the contact system and solved jointly
by the APGD solver (bilateral: no cone projection). Used by linkage grippers
(XArm7) and composite mechanisms.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from robosuite_tpu.physics import kinematics as K
from robosuite_tpu.utils import transforms as T


def equality_row_count(model) -> int:
    """Static number of bilateral rows (3/connect, 6/weld, 1/joint)."""
    return sum(
        {"connect": 3, "weld": 6}.get(model.eq_kind[i], 1) for i in range(model.neq)
    )


def _poly(coef, d):
    return coef[0] + d * (coef[1] + d * (coef[2] + d * (coef[3] + d * coef[4])))


def _dpoly(coef, d):
    return coef[1] + d * (2 * coef[2] + d * (3 * coef[3] + d * 4 * coef[4]))


def equality_rows(model, kin, qpos, qvel):
    """-> (J_eq (ne, nv), aref_eq (ne,), reg_scale (ne,)) or None.

    ne is static: 3 rows per connect, 6 per weld, 1 per joint coupling.
    """
    if model.neq == 0:
        return None
    J_rows = []
    aref_rows = []
    for i in range(model.neq):
        kind = model.eq_kind[i]
        timeconst = jnp.maximum(model.eq_solref[i, 0], 2.0 * model.timestep)
        dampratio = jnp.maximum(model.eq_solref[i, 1], 1e-3)
        k = 1.0 / (timeconst * timeconst * dampratio * dampratio)
        b = 2.0 / timeconst

        if kind in ("connect", "weld"):
            b1, b2 = model.eq_obj1[i], model.eq_obj2[i]
            p1 = kin.xpos[b1] + kin.xmat[b1] @ model.eq_anchor[i]
            p2 = kin.xpos[b2] + kin.xmat[b2] @ model.eq_anchor2[i]
            jacp1, jacr1 = K.point_jacobian(model, kin, b1, p1)
            jacp2, jacr2 = K.point_jacobian(model, kin, b2, p2)
            Jrel = jacp1 - jacp2  # (3, nv)
            err = p1 - p2
            vel = Jrel @ qvel
            for r in range(3):
                J_rows.append(Jrel[r])
                aref_rows.append(-b * vel[r] - k * err[r])
            if kind == "weld":
                Jang = jacr1 - jacr2
                ang_err = T.orientation_error(kin.xmat[b2], kin.xmat[b1])
                ang_vel = Jang @ qvel
                for r in range(3):
                    J_rows.append(Jang[r])
                    aref_rows.append(-b * ang_vel[r] - k * (-ang_err[r]))
        elif kind == "tendon":
            # tendon1 length coupled to poly(tendon2 length) (MuJoCo
            # mjEQ_TENDON: with no tendon2 the length is pinned to
            # polycoef[0]) — the robotiq/jaco coupled-finger pattern
            t1, t2 = model.eq_obj1[i], model.eq_obj2[i]
            coef = model.eq_polycoef[i]
            L1 = model.ten_Jq[t1] @ qpos
            row = model.ten_J[t1]
            if t2 >= 0:
                d = model.ten_Jq[t2] @ qpos - model.ten_length0[t2]
                row = row - _dpoly(coef, d) * model.ten_J[t2]
                err = (L1 - model.ten_length0[t1]) - _poly(coef, d)
            else:
                err = L1 - coef[0]
            vel = row @ qvel
            J_rows.append(row)
            aref_rows.append(-b * vel - k * err)
        else:  # joint coupling
            j1, j2 = model.eq_obj1[i], model.eq_obj2[i]
            a1, d1 = model.jnt_qposadr[j1], model.jnt_dofadr[j1]
            coef = model.eq_polycoef[i]
            row = jnp.zeros(model.nv, dtype=qvel.dtype).at[d1].set(1.0)
            if j2 >= 0:
                a2, d2 = model.jnt_qposadr[j2], model.jnt_dofadr[j2]
                q2 = qpos[a2]
                poly = coef[0] + q2 * (coef[1] + q2 * (coef[2] + q2 * (coef[3] + q2 * coef[4])))
                dpoly = coef[1] + q2 * (2 * coef[2] + q2 * (3 * coef[3] + q2 * 4 * coef[4]))
                row = row.at[d2].set(-dpoly)
                err = qpos[a1] - poly
            else:
                err = qpos[a1] - coef[0]
            vel = row @ qvel
            J_rows.append(row)
            aref_rows.append(-b * vel - k * err)

    return jnp.stack(J_rows), jnp.stack(aref_rows)
