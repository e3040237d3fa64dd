"""Pallas fused forward-kinematics kernel (batch-minor layout).

The XLA-compiled physics step is memory-bound: ~2.4 GB of HBM traffic per
batched substep for only 0.44 GFLOP (cost_analysis), because hundreds of
tiny (B, 3/4)-shaped ops round-trip intermediates through HBM and pad the
3/4-wide trailing dims to 128 lanes.

This kernel inverts the layout: the BATCH lives on the lane dimension
(tiles of 128 scenarios), every per-body quantity is a (1, 128) row held in
VMEM, and the whole kinematic chain is unrolled with model constants baked
as immediates. One HBM read of qpos, one write of the outputs — everything
else stays on-chip. It is the prototype for the fused substep kernel
(SURVEY §7: "Pallas kernels: rollout step").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from robosuite_tpu.models import spec as S

LANES = 128


def _quat_mul_rows(w0, x0, y0, z0, w1, x1, y1, z1):
    return (
        w0 * w1 - x0 * x1 - y0 * y1 - z0 * z1,
        w0 * x1 + x0 * w1 + y0 * z1 - z0 * y1,
        w0 * y1 - x0 * z1 + y0 * w1 + z0 * x1,
        w0 * z1 + x0 * y1 - y0 * x1 + z0 * w1,
    )


def _quat_rot_rows(w, x, y, z, vx, vy, vz):
    # v + 2 w (u x v) + 2 u x (u x v), u = (x, y, z)
    uvx = y * vz - z * vy
    uvy = z * vx - x * vz
    uvz = x * vy - y * vx
    uuvx = y * uvz - z * uvy
    uuvy = z * uvx - x * uvz
    uuvz = x * uvy - y * uvx
    return (vx + 2.0 * (w * uvx + uuvx), vy + 2.0 * (w * uvy + uuvy), vz + 2.0 * (w * uvz + uuvz))


def make_fk_kernel(model, interpret=False):
    """Build a fused FK kernel specialized to `model`.

    Returns fk_pallas(qpos (B, nq)) -> (xpos (B, nbody, 3), xquat (B, nbody, 4))
    with B a multiple of 128. Model constants are baked into the kernel as
    immediates (they are compile-time Python floats).
    """
    nb = model.nbody
    nq = model.nq
    body_pos = np.asarray(model.body_pos, dtype=np.float32)
    body_quat = np.asarray(model.body_quat, dtype=np.float32)
    jnt_pos = np.asarray(model.jnt_pos, dtype=np.float32)
    jnt_axis = np.asarray(model.jnt_axis, dtype=np.float32)
    qpos0 = np.asarray(model.qpos0, dtype=np.float32)

    def kernel(qpos_ref, xpos_ref, xquat_ref):
        # per-lane rows, one per scalar quantity
        q = [qpos_ref[i, :] for i in range(nq)]
        one = jnp.ones_like(q[0]) if nq else None
        zero = jnp.zeros_like(q[0])

        xpos = [None] * nb
        xquat = [None] * nb
        xpos[0] = (zero, zero, zero)
        xquat[0] = (one, zero, zero, zero)

        for b in range(1, nb):
            p = model.body_parentid[b]
            pw, px, py, pz = xquat[p]
            bp = body_pos[b]
            # pos = parent_pos + R(parent_quat) @ body_pos  (body_pos immediate)
            rx, ry, rz = _quat_rot_rows(pw, px, py, pz, bp[0] * one, bp[1] * one, bp[2] * one)
            pos = (xpos[p][0] + rx, xpos[p][1] + ry, xpos[p][2] + rz)
            bq = body_quat[b]
            quat = _quat_mul_rows(pw, px, py, pz, bq[0] * one, bq[1] * one, bq[2] * one, bq[3] * one)

            jadr, jnum = model.body_jntadr[b], model.body_jntnum[b]
            for k in range(jnum):
                j = jadr + k
                jt = model.jnt_type[j]
                qadr = model.jnt_qposadr[j]
                if jt == S.FREE:
                    pos = (q[qadr], q[qadr + 1], q[qadr + 2])
                    qw, qx, qy, qz = q[qadr + 3], q[qadr + 4], q[qadr + 5], q[qadr + 6]
                    inv_n = jax.lax.rsqrt(qw * qw + qx * qx + qy * qy + qz * qz + 1e-12)
                    quat = (qw * inv_n, qx * inv_n, qy * inv_n, qz * inv_n)
                elif jt == S.SLIDE:
                    ax = jnt_axis[j]
                    dx, dy, dz = _quat_rot_rows(*quat, ax[0] * one, ax[1] * one, ax[2] * one)
                    amt = q[qadr] - qpos0[qadr]
                    pos = (pos[0] + dx * amt, pos[1] + dy * amt, pos[2] + dz * amt)
                elif jt == S.HINGE:
                    ax = jnt_axis[j]
                    jp = jnt_pos[j]
                    # anchor in world
                    ax_w = _quat_rot_rows(*quat, jp[0] * one, jp[1] * one, jp[2] * one)
                    anchor = (pos[0] + ax_w[0], pos[1] + ax_w[1], pos[2] + ax_w[2])
                    half = 0.5 * (q[qadr] - qpos0[qadr])
                    c, s = jnp.cos(half), jnp.sin(half)
                    lq = (c, s * ax[0], s * ax[1], s * ax[2])
                    quat = _quat_mul_rows(*quat, *lq)
                    back = _quat_rot_rows(*quat, jp[0] * one, jp[1] * one, jp[2] * one)
                    pos = (anchor[0] - back[0], anchor[1] - back[1], anchor[2] - back[2])

            xpos[b] = pos
            xquat[b] = quat

        for b in range(nb):
            for i in range(3):
                xpos_ref[b * 3 + i, :] = xpos[b][i]
            for i in range(4):
                xquat_ref[b * 4 + i, :] = xquat[b][i]

    @jax.jit
    def fk_pallas(qpos):
        B = qpos.shape[0]
        assert B % LANES == 0, f"batch {B} must be a multiple of {LANES}"
        qT = qpos.T  # (nq, B), batch-minor

        grid = (B // LANES,)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((nq, LANES), lambda i: (0, i), memory_space=pltpu.VMEM)],
            out_specs=(
                pl.BlockSpec((nb * 3, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((nb * 4, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((nb * 3, B), qpos.dtype),
                jax.ShapeDtypeStruct((nb * 4, B), qpos.dtype),
            ),
            interpret=interpret,
        )(qT)
        xpos = out[0].T.reshape(B, nb, 3)
        xquat = out[1].T.reshape(B, nb, 4)
        return xpos, xquat

    return fk_pallas
