"""Whole-body differential IK (the WHOLE_BODY_IK composite controller).

Re-derivation of the reference's WholeBodyIK composite
(controllers/composite/composite_controller.py:514-589) and its IKSolver
(utils/ik_utils.py:15-340) as a pure function over stacked site Jacobians:

    twist_i = [Kpos * (p*_i - p_i); Kori * rotvec(R*_i R_i^T)] / dt
    dq      = J^T (J J^T + damping^2 I)^-1 twist          (damped LSQ)
    dq     += (I - pinv(J) J) Kn (q0 - q)                 (nullspace posture)
    dq      = clamp(dq, max_dq); torso rows clamp to max_dq_torso
    q_des   = q + dq * dt

solved jointly over ALL selected dofs (torso + both arms for GR1-class
humanoids — the coordination the per-arm reduction could not express).
The q_des slices feed the per-part JOINT_POSITION controllers, exactly the
reference's actuation path (WholeBody.update_state -> joint_action_policy).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax.numpy as jnp

from robosuite_tpu.ops import linalg as fastla


@dataclasses.dataclass(frozen=True)
class WBIKConfig:
    """Static config (reference composite_controller_specific_configs,
    e.g. controllers/config/robots/default_gr1.json)."""

    damping: float = 5e-2            # ik_pseudo_inverse_damping
    integration_dt: float = 0.1      # ik_integration_dt
    max_dq: float = 4.0              # ik_max_dq
    max_dq_torso: float = 0.2        # ik_max_dq_torso
    Kpos: float = 0.95
    Kori: float = 0.95
    nullspace_gains: Tuple[float, ...] = ()  # per selected dof (Kn)
    torso_mask: Tuple[float, ...] = ()       # 1.0 where dof is a torso joint
    input_type: str = "delta"        # delta: actions are twists about the
                                     # current site pose; absolute: targets


def wbik_solve(cfg: WBIKConfig, J, q, q0, site_pos, site_mat, target_pos, target_mat):
    """One differential-IK solve.

    Args:
        J: (S*6, n) stacked site Jacobians over the selected dofs.
        q, q0: (n,) current / posture-reference joint positions.
        site_pos: (S, 3), site_mat: (S, 3, 3) current site poses.
        target_pos: (S, 3), target_mat: (S, 3, 3) target poses (world).

    Returns q_des (n,) integrated joint-position targets.
    """
    from robosuite_tpu.utils import transforms as T

    S = site_pos.shape[0]
    n = q.shape[0]
    dt = cfg.integration_dt

    def site_twist(i):
        dx = cfg.Kpos * (target_pos[i] - site_pos[i]) / dt
        # rotation error as a rotation vector (mju_quat2Vel semantics);
        # mat2quat returns xyzw — quat2axisangle's expected layout
        R_err = target_mat[i] @ site_mat[i].T
        w = T.quat2axisangle(T.mat2quat(R_err)) * cfg.Kori / dt
        return jnp.concatenate([dx, w])

    twist = jnp.concatenate([site_twist(i) for i in range(S)])  # (S*6,)

    m = twist.shape[0]
    JJt = J @ J.T + (cfg.damping ** 2) * jnp.eye(m, dtype=J.dtype)
    dq = J.T @ fastla.solve_spd(JJt, twist)

    # nullspace posture: project Kn*(q0 - q) onto null(J). The reference
    # uses an exact pinv here (ik_utils.py:313); the damped projector is
    # numerically safer and identical away from singularities.
    Kn = jnp.asarray(cfg.nullspace_gains, dtype=J.dtype) if cfg.nullspace_gains else jnp.ones(n, dtype=J.dtype)
    dq_posture = Kn * (q0 - q)
    dq_null = dq_posture - J.T @ fastla.solve_spd(JJt, J @ dq_posture)
    dq = dq + dq_null

    if cfg.max_dq > 0:
        scale = jnp.minimum(1.0, cfg.max_dq / (jnp.max(jnp.abs(dq)) + 1e-9))
        dq = dq * scale
    if cfg.torso_mask and cfg.max_dq_torso > 0:
        tm = jnp.asarray(cfg.torso_mask, dtype=J.dtype)
        dq_torso_max = jnp.max(jnp.abs(dq * tm)) + 1e-9
        tscale = jnp.minimum(1.0, cfg.max_dq_torso / dq_torso_max)
        dq = dq * (tm * tscale + (1.0 - tm))

    return q + dq * dt
