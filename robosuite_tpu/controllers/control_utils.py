"""Operational-space control matrix kernels in JAX.

Torque-for-torque re-derivation of reference utils/control_utils.py:7-111
(numba-jitted there; jit/vmap-batched here). These are the OSC hot-path
matrices the BASELINE parity metric is measured against.
"""

from __future__ import annotations

import jax.numpy as jnp

from robosuite_tpu.ops import linalg as fastla
from robosuite_tpu.utils.transforms import orientation_error  # noqa: F401  (re-export)


def _pinv_sym(a, ridge=1e-8):
    """Inverse of a symmetric PSD matrix, Tikhonov-regularized and
    Jacobi-equilibrated.

    The reference uses np.linalg.pinv with a small-singular-value cutoff
    (control_utils.py:74-77). On TPU, eigh/SVD lower to slow iterative
    loops; a ridge-regularized unrolled-Cholesky inverse is numerically
    equivalent away from singularities (relative deviation ~ridge*cond,
    far below the f32 noise floor of the torque-parity tolerance) and
    stays finite *at* singularities, where pinv truncates instead —
    both give bounded task wrenches there.

    Equilibration: A = D^1/2 Â D^1/2 with D = diag(A), inverting the
    unit-diagonal Â. The Λ-inverse mixes position rows (~1/kg) with
    orientation rows (~1/(kg·m²)) whose scales differ by ~1e2; factoring
    the scaling out of the f32 Cholesky cut the worst-case torque-parity
    error on near-singular probes 4x (1.2e-1 -> 3e-2, measured on the
    osc_probe_panda fixture).
    """
    n = a.shape[-1]
    # power-of-two equilibration: scaling by 2^round(log2 sqrt(diag)) is
    # EXACT in floating point, so well-conditioned states see bit-identical
    # rounding behavior to the unscaled Cholesky while near-singular states
    # still get the ~unit-diagonal conditioning win
    d = jnp.sqrt(jnp.maximum(jnp.diagonal(a, axis1=-2, axis2=-1), 1e-20))
    d = jnp.exp2(jnp.round(jnp.log2(d)))
    dinv = 1.0 / d
    ahat = a * dinv[..., :, None] * dinv[..., None, :]
    # diag(ahat) in [0.5, 2), so a relative ridge stays `ridge`-scale
    eye = jnp.eye(n, dtype=a.dtype)
    ahat_r = ahat + (ridge + 1e-12) * eye
    inv = fastla.inv3(ahat_r) if n == 3 else fastla.inv_spd(ahat_r)
    return inv * dinv[..., :, None] * dinv[..., None, :]


def opspace_matrices(mass_matrix, J_full, J_pos, J_ori):
    """(lambda_full, lambda_pos, lambda_ori, nullspace_matrix).

    Exact math of reference control_utils.py:43-82.
    """
    mass_matrix_inv = fastla.inv_spd(mass_matrix)
    # one Newton refinement step on the (well-conditioned, SPD) arm mass
    # matrix inverse: X' = X(2I - A X) recovers ~f64 digits of M^-1 for two
    # small matmuls. The ridge-regularized Lambda inverses are NOT refined:
    # refinement pushes them toward the unstable exact inverse at
    # near-singular states, where the reference's pinv truncates instead.
    n_m = mass_matrix.shape[-1]
    mass_matrix_inv = mass_matrix_inv @ (
        2.0 * jnp.eye(n_m, dtype=mass_matrix.dtype) - mass_matrix @ mass_matrix_inv
    )
    lambda_full_inv = J_full @ mass_matrix_inv @ jnp.swapaxes(J_full, -1, -2)
    lambda_pos_inv = J_pos @ mass_matrix_inv @ jnp.swapaxes(J_pos, -1, -2)
    lambda_ori_inv = J_ori @ mass_matrix_inv @ jnp.swapaxes(J_ori, -1, -2)

    lambda_full = _pinv_sym(lambda_full_inv)
    lambda_pos = _pinv_sym(lambda_pos_inv)
    lambda_ori = _pinv_sym(lambda_ori_inv)

    Jbar = mass_matrix_inv @ jnp.swapaxes(J_full, -1, -2) @ lambda_full
    n = J_full.shape[-1]
    nullspace_matrix = jnp.eye(n, dtype=J_full.dtype) - Jbar @ J_full
    return lambda_full, lambda_pos, lambda_ori, nullspace_matrix


def nullspace_torques(mass_matrix, nullspace_matrix, initial_joint, joint_pos, joint_vel, joint_kp=10.0):
    """Reference control_utils.py:7-40, with critical damping kv = 2 sqrt(kp)."""
    joint_kv = jnp.sqrt(joint_kp) * 2.0
    pose_torques = mass_matrix @ (joint_kp * (initial_joint - joint_pos) - joint_kv * joint_vel)
    return jnp.swapaxes(nullspace_matrix, -1, -2) @ pose_torques


def scale_action(action, input_min, input_max, output_min, output_max):
    """Clip to input range then affine-map to output range
    (reference controllers/parts/controller.py:149-168)."""
    action_scale = jnp.abs(output_max - output_min) / jnp.abs(input_max - input_min)
    action_output_transform = (output_max + output_min) / 2.0
    action_input_transform = (input_max + input_min) / 2.0
    action = jnp.clip(action, input_min, input_max)
    return (action - action_input_transform) * action_scale + action_output_transform
