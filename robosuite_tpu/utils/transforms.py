"""Rotation / pose math in JAX.

Re-derivation of the reference's transform utilities
(/root/reference/robosuite/utils/transform_utils.py:50-906) as pure, jittable,
batch-friendly JAX functions.

Conventions (matching the reference exactly):
  * Public API quaternions are **xyzw** (reference transform_utils.py:50-66).
  * MuJoCo-convention helpers are suffixed ``_wxyz`` and are what the physics
    core uses internally (MuJoCo stores wxyz).
  * Euler functions implement the static-frame 'sxyz' convention only (the
    only convention the reference uses on its hot paths).

All functions broadcast over leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-8

PI = jnp.pi

# ---------------------------------------------------------------------------
# Quaternion convention conversion
# ---------------------------------------------------------------------------


def convert_quat(q, to="xyzw"):
    """Convert quaternion between wxyz and xyzw conventions.

    Mirrors reference transform_utils.py:50-65: if ``to == 'xyzw'`` the input
    is assumed wxyz, and vice versa.
    """
    if to == "xyzw":
        return q[..., jnp.array([1, 2, 3, 0])]
    if to == "wxyz":
        return q[..., jnp.array([3, 0, 1, 2])]
    raise ValueError("convert_quat: `to` must be 'xyzw' or 'wxyz'")


# ---------------------------------------------------------------------------
# xyzw-convention API (reference-compatible surface)
# ---------------------------------------------------------------------------


def quat_multiply(q1, q0):
    """Hamilton product q1*q0, xyzw (reference transform_utils.py:67-95)."""
    x0, y0, z0, w0 = jnp.moveaxis(q0, -1, 0)
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    return jnp.stack(
        [
            x1 * w0 + y1 * z0 - z1 * y0 + w1 * x0,
            -x1 * z0 + y1 * w0 + z1 * x0 + w1 * y0,
            x1 * y0 - y1 * x0 + z1 * w0 + w1 * z0,
            -x1 * x0 - y1 * y0 - z1 * z0 + w1 * w0,
        ],
        axis=-1,
    )


def quat_conjugate(q):
    """Conjugate, xyzw (reference transform_utils.py:96-117)."""
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_inverse(q):
    """Inverse, xyzw (reference transform_utils.py:118-136)."""
    return quat_conjugate(q) / jnp.sum(q * q, axis=-1, keepdims=True)


def quat_distance(q1, q0):
    """q1 * q0^-1 (reference transform_utils.py:137-150)."""
    return quat_multiply(q1, quat_inverse(q0))


def quat_slerp(quat0, quat1, fraction, shortestpath=True):
    """Spherical linear interpolation, xyzw (reference transform_utils.py:151-203).

    Branch-free (lax.select) so it is jit/vmap friendly.
    """
    q0 = unit_vector(quat0)
    q1 = unit_vector(quat1)
    d = jnp.sum(q0 * q1, axis=-1)
    if shortestpath:
        flip = d < 0.0
        d = jnp.where(flip, -d, d)
        q1 = jnp.where(flip[..., None], -q1, q1)
    d = jnp.clip(d, -1.0, 1.0)
    angle = jnp.arccos(d)
    isin = 1.0 / jnp.maximum(jnp.sin(angle), EPS)
    f = jnp.asarray(fraction, dtype=q0.dtype)
    w0 = jnp.sin((1.0 - f) * angle) * isin
    w1 = jnp.sin(f * angle) * isin
    out = w0[..., None] * q0 + w1[..., None] * q1
    # Degenerate cases: identical quats, or opposite quats.
    close = jnp.abs(d - 1.0) < EPS
    lerp = (1.0 - f)[..., None] * q0 + f[..., None] * q1 if f.ndim else (1.0 - f) * q0 + f * q1
    return jnp.where(close[..., None], lerp, out)


def unit_vector(data, axis=-1):
    """Normalize along axis (reference transform_utils.py:802-859)."""
    n = jnp.linalg.norm(data, axis=axis, keepdims=True)
    return data / jnp.maximum(n, EPS)


def quat2mat(quaternion):
    """xyzw quaternion -> 3x3 rotation matrix (reference transform_utils.py:462-489)."""
    q = unit_vector(quaternion)
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def mat2quat(rmat):
    """3x3 rotation matrix -> xyzw quaternion (reference transform_utils.py:317-357).

    Branch-free Shepperd's method: compute all four candidate forms and pick
    the best-conditioned one, which is stable under jit/vmap.
    """
    m = rmat
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates (w-major, x-major, y-major, z-major), each valid when its
    # pivot is the largest.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    pivots = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4, 4) wxyz order
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = unit_vector(q)
    # normalize sign: w >= 0 (matches the reference's canonical output up to sign)
    q = jnp.where(q[..., 0:1] < 0, -q, q)
    return convert_quat(q, to="xyzw")


def euler2mat(euler):
    """(r, p, y) euler angles -> rotation matrix, mirroring the reference's
    exact formulation (transform_utils.py:358-391: negated reversed angles
    filled transposed — equivalent to R = Rz(y) Ry(p) Rx(r))."""
    ai, aj, ak = -euler[..., 2], -euler[..., 1], -euler[..., 0]
    si, sj, sk = jnp.sin(ai), jnp.sin(aj), jnp.sin(ak)
    ci, cj, ck = jnp.cos(ai), jnp.cos(aj), jnp.cos(ak)
    cc, cs = ci * ck, ci * sk
    sc, ss = si * ck, si * sk
    m = jnp.stack(
        [
            cj * ci, cj * si, -sj,
            sj * cs - sc, sj * ss + cc, cj * sk,
            sj * cc + ss, sj * sc - cs, cj * ck,
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def mat2euler(rmat):
    """Rotation matrix -> 'sxyz' euler (reference transform_utils.py:394-442).

    NOTE: like the reference, this is NOT the inverse of euler2mat above —
    the pair follows the reference's (historical) conventions exactly.
    """
    m = rmat
    cy = jnp.sqrt(m[..., 0, 0] ** 2 + m[..., 1, 0] ** 2)
    cond = cy > EPS
    ax = jnp.where(cond, jnp.arctan2(m[..., 2, 1], m[..., 2, 2]), jnp.arctan2(-m[..., 1, 2], m[..., 1, 1]))
    ay = jnp.arctan2(-m[..., 2, 0], cy)
    az = jnp.where(cond, jnp.arctan2(m[..., 1, 0], m[..., 0, 0]), jnp.zeros_like(ax))
    return jnp.stack([ax, ay, az], axis=-1)


def axisangle2quat(vec):
    """Exponential coordinates (axis*angle) -> xyzw quaternion
    (reference transform_utils.py:515-540).

    Differentiable at vec=0: the where() falls back to a 2nd-order Taylor
    branch computed from the *squared* norm, so both the value and the
    tangent are exact there (a plain identity fallback zeroes the
    derivative, blinding the MPC linearization at small rotations)."""
    sq = jnp.sum(vec * vec, axis=-1, keepdims=True)
    small = sq < 1e-12
    safe_sq = jnp.where(small, 1.0, sq)
    angle = jnp.sqrt(safe_sq)
    # sin(theta/2)/theta and cos(theta/2), with Taylor forms near 0
    k = jnp.where(small, 0.5 - sq / 48.0, jnp.sin(angle / 2.0) / angle)
    w = jnp.where(small, 1.0 - sq / 8.0, jnp.cos(angle / 2.0))
    return jnp.concatenate([vec * k, w], axis=-1)


def quat2axisangle(quat):
    """xyzw quaternion -> exponential coordinates (reference transform_utils.py:490-514)."""
    w = jnp.clip(quat[..., 3:4], -1.0, 1.0)
    den = jnp.sqrt(jnp.maximum(1.0 - w * w, 0.0))
    angle = 2.0 * jnp.arccos(w)
    out = quat[..., :3] * angle / jnp.maximum(den, EPS)
    return jnp.where(den < EPS, jnp.zeros_like(out), out)


# ---------------------------------------------------------------------------
# Poses (4x4 homogeneous)
# ---------------------------------------------------------------------------


def pose2mat(pose):
    """(pos, xyzw quat) -> 4x4 (reference transform_utils.py:443-461)."""
    pos, quat = pose
    return make_pose(pos, quat2mat(quat))


def mat2pose(hmat):
    """4x4 -> (pos, xyzw quat) (reference transform_utils.py:298-316)."""
    return hmat[..., :3, 3], mat2quat(hmat[..., :3, :3])


def make_pose(translation, rotation):
    """(pos 3, rot 3x3) -> 4x4 (reference transform_utils.py:784-801)."""
    batch = jnp.broadcast_shapes(translation.shape[:-1], rotation.shape[:-2])
    out = jnp.zeros(batch + (4, 4), dtype=rotation.dtype)
    out = out.at[..., :3, :3].set(rotation)
    out = out.at[..., :3, 3].set(translation)
    out = out.at[..., 3, 3].set(1.0)
    return out


def pose_inv(pose):
    """Invert 4x4 pose (reference transform_utils.py:562-590)."""
    rot_t = jnp.swapaxes(pose[..., :3, :3], -1, -2)
    pos = -jnp.einsum("...ij,...j->...i", rot_t, pose[..., :3, 3])
    return make_pose(pos, rot_t)


def pose_in_A_to_pose_in_B(pose_A, pose_A_in_B):
    """Frame change (reference transform_utils.py:541-561)."""
    return pose_A_in_B @ pose_A


# ---------------------------------------------------------------------------
# wxyz (MuJoCo) convention helpers — used by the physics core
# ---------------------------------------------------------------------------


def quat_mul_wxyz(u, v):
    """Hamilton product, wxyz convention."""
    w0, x0, y0, z0 = jnp.moveaxis(u, -1, 0)
    w1, x1, y1, z1 = jnp.moveaxis(v, -1, 0)
    return jnp.stack(
        [
            w0 * w1 - x0 * x1 - y0 * y1 - z0 * z1,
            w0 * x1 + x0 * w1 + y0 * z1 - z0 * y1,
            w0 * y1 - x0 * z1 + y0 * w1 + z0 * x1,
            w0 * z1 + x0 * y1 - y0 * x1 + z0 * w1,
        ],
        axis=-1,
    )


def quat_conj_wxyz(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rot_wxyz(q, v):
    """Rotate vector v by wxyz quaternion q."""
    w = q[..., 0:1]
    u = q[..., 1:4]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat2mat_wxyz(q):
    return quat2mat(convert_quat(q, to="xyzw"))


def mat2quat_wxyz(m):
    return convert_quat(mat2quat(m), to="wxyz")


def quat_integrate_wxyz(q, omega, dt):
    """Integrate wxyz quaternion by angular velocity omega (local frame) * dt.

    Matches MuJoCo's mju_quatIntegrate: q' = q * exp(0.5 * omega * dt) with
    omega expressed in the child (body-local) frame.
    """
    v = omega * dt
    sq = jnp.sum(v * v, axis=-1, keepdims=True)
    # Taylor branch at omega=0 keeps value AND tangent exact (see
    # axisangle2quat) — a resting free body must still have a correct
    # d(quat)/d(omega) for MPC linearization
    small = sq < 1e-12
    safe_sq = jnp.where(small, 1.0, sq)
    angle = jnp.sqrt(safe_sq)
    k = jnp.where(small, 0.5 - sq / 48.0, jnp.sin(angle / 2.0) / angle)
    w = jnp.where(small, 1.0 - sq / 8.0, jnp.cos(angle / 2.0))
    dq = jnp.concatenate([w, v * k], axis=-1)
    out = quat_mul_wxyz(q, dq)
    return unit_vector(out)


def axisangle2quat_wxyz(vec):
    return convert_quat(axisangle2quat(vec), to="wxyz")


# ---------------------------------------------------------------------------
# Misc small helpers used across the stack
# ---------------------------------------------------------------------------


def skew(v):
    """3-vector -> skew-symmetric matrix."""
    z = jnp.zeros_like(v[..., 0])
    rows = jnp.stack(
        [z, -v[..., 2], v[..., 1], v[..., 2], z, -v[..., 0], -v[..., 1], v[..., 0], z],
        axis=-1,
    )
    return rows.reshape(v.shape[:-1] + (3, 3))


def orientation_error(desired, current):
    """3D orientation error between rotation matrices.

    Exact re-derivation of reference control_utils.py:85-111:
    0.5 * sum_i cross(current[:, i], desired[:, i]).
    """
    rc = jnp.moveaxis(current, -1, 0)   # columns
    rd = jnp.moveaxis(desired, -1, 0)
    return 0.5 * (
        jnp.cross(rc[0], rd[0], axis=-1)
        + jnp.cross(rc[1], rd[1], axis=-1)
        + jnp.cross(rc[2], rd[2], axis=-1)
    )


def rotation_matrix(angle, direction):
    """Rotation matrix about axis `direction` by `angle`
    (reference transform_utils.py:663-720, point=None case)."""
    d = unit_vector(jnp.asarray(direction, dtype=jnp.float32))
    sina = jnp.sin(angle)
    cosa = jnp.cos(angle)
    m = jnp.eye(3) * cosa
    m = m + jnp.outer(d, d) * (1.0 - cosa)
    m = m + skew(d) * sina
    return m
