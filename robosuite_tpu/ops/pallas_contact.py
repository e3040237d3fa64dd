"""Pallas APGD cone-QP kernel: the contact solve with all iterations on-chip.

The XLA fori_loop APGD re-streams its loop-invariant operands (Jf, M^-1 J^T,
regularizer, rhs) from HBM on every one of its ~38 iterations — measured
~20 MB/iteration at batch 512 on v5e, i.e. the solver was pure HBM traffic
(APGD 30-iter delta: 24 ms of a 72 ms policy step). This kernel loads the
per-scenario operands into VMEM once, runs the triangular solves, power
iteration, and all APGD iterations in-kernel, and writes back only
qfrc (nv) + f (ntot).

Layout: batch-minor. Every (i, j) scalar of the per-scenario problem is a
(128,)-lane vector across scenarios; row-blocks like (ntot, 128) occupy full
8x128 VPU tiles, so the small-matrix math runs at vector width instead of
one scenario per op.

Row grouping: cone rows arrive grouped [normals (K) | t1 (K) | t2 (K) |
equality (ne)] so the friction-cone projection is three contiguous
(K, 128) block ops instead of stride-3 gathers.

Exposed through jax.custom_vmap: the unbatched call (single scenario, CPU
tests, trace-time shapes) runs the reference XLA implementation; the vmapped
call pads the batch to lane multiples and dispatches the kernel. On
non-TPU backends the fallback vmaps the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.custom_batching import custom_vmap

LANES = 128

# VMEM feasibility gate for the fused vel-solver kernel: its scoped live set
# is dominated by the whitened operator Y (nv x ntot rows) plus the incoming
# JfT block, both double-buffered across grid steps — measured 25.12M scoped
# at nv*ntot = 9504 (Sawyer PickPlaceCan) and 17.13M at 6912 (TwoArmLift
# 2xPanda), vs the 16M limit. Worlds past this row budget run one 128-lane
# chunk per pallas_call (grid=1, no pipeline buffers) instead of the
# pipelined multi-step grid.
PALLAS_VEL_ROWS_MAX = 6000


def _vel_update_xla(M, JfT, aref, qfrc_smooth, qvel, damping, reg3, mu, active,
                    K, ne, iters, power_iters, dt):
    """Full constrained velocity update, single scenario (reference path):
    qacc_smooth solve + APGD cone QP + implicit-damping velocity solve.
    Identical math to the kernel."""
    from robosuite_tpu.ops import linalg as fastla

    Lm = fastla.chol_factor(M)
    qacc_smooth = fastla.chol_solve(Lm, qfrc_smooth - damping * qvel)
    qfrc_con, f = _apgd_xla(JfT, Lm, aref, qacc_smooth, reg3, mu, active,
                            K, ne, iters, power_iters)
    Mh = M + dt * jnp.diag(damping)
    qvel_new = qvel + dt * fastla.solve_spd(Mh, qfrc_smooth + qfrc_con - damping * qvel)
    return qvel_new, f


def _apgd_xla(JfT, Lm, aref, qacc_smooth, reg3, mu, active, K, ne, iters, power_iters):
    """Reference implementation (single scenario): identical math to the
    kernel, used unbatched and on non-TPU backends.

    JfT: (nv, ntot) grouped-row constraint Jacobian transpose.
    """
    nv, ntot = JfT.shape
    # Whitened operator: A = Jf M^-1 Jf^T = Y^T Y with Y = L^-1 Jf^T
    # (forward substitution only) — HALF the resident memory of the old
    # JfT + MinvJT pair and the same leading matvec cost; Jf^T f is
    # recovered as L (Y f).
    Y = _forward_sub(Lm, JfT)            # (nv, ntot)
    diagA = jnp.maximum(jnp.sum(Y * Y, axis=0), 1e-8)
    R = reg3 * diagA
    rhs = aref - Y.T @ (Lm.T @ qacc_smooth)

    def project(x):
        fn = jnp.maximum(x[:K], 0.0) * active
        t1 = x[K : 2 * K]
        t2 = x[2 * K : 3 * K]
        # sqrt has an inf derivative at 0 and jnp.maximum's JVP multiplies
        # (not selects) the branch tangents, so 0*NaN leaks: floor the
        # *radicand* instead so the MPC linearization (jvp through this
        # path) stays finite
        tn = jnp.sqrt(jnp.maximum(t1 * t1 + t2 * t2, 1e-18))
        scale = jnp.minimum(1.0, mu * fn / jnp.maximum(tn, 1e-9)) * active
        out = jnp.concatenate([fn, t1 * scale, t2 * scale])
        if ne:
            out = jnp.concatenate([out, x[3 * K :]])
        return out

    def matvec(x):
        return Y.T @ (Y @ x) + R * x

    # Power-iterate the ACTIVE submatrix only: APGD iterates live in the
    # active subspace (projection zeroes inactive rows), so the step size
    # must come from the active rows' spectrum. Without the mask, inactive
    # rows on light links (finger pads: A_ii ~ 1/m) inflate L and the step
    # size collapses — contacts then barely decelerate anything.
    rowmask = jnp.concatenate(
        [active, active, active, jnp.ones(ne, dtype=aref.dtype)]
    ) if ne else jnp.concatenate([active, active, active])

    def power_body(_, v):
        w = matvec(v) * rowmask
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-9)

    v0 = rowmask + 1e-6
    v0 = v0 / jnp.maximum(jnp.linalg.norm(v0), 1e-9)
    v = jax.lax.fori_loop(0, power_iters, power_body, v0)
    L = jnp.maximum(jnp.sum(v * (matvec(v) * rowmask)), 1e-6)
    inv_L = 1.0 / (1.1 * L)

    def apgd_iter(_, carry):
        f, y, t = carry
        g = matvec(y) - rhs
        f_new = project(y - inv_L * g)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        y_new = f_new + ((t - 1.0) / t_new) * (f_new - f)
        return f_new, y_new, t_new

    f0 = jnp.zeros(ntot, dtype=aref.dtype)
    f, _, _ = jax.lax.fori_loop(0, iters, apgd_iter, (f0, f0, jnp.asarray(1.0, dtype=aref.dtype)))
    return Lm @ (Y @ f), f


def _forward_sub(L, B):
    """Solve L Y = B (lower-triangular forward substitution), B (n, m)."""
    n = L.shape[-1]
    y = [None] * n
    for i in range(n):
        s = B[i]
        for k in range(i):
            s = s - L[i, k] * y[k]
        y[i] = s / L[i, i]
    return jnp.stack(y)


def _chol_rows(A_rows, n):
    """Unrolled Cholesky on per-entry (128,) lane rows; returns L rows."""
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A_rows[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, 1e-12))
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            s = A_rows[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    return L


def _chol_solve_vec(L, b, n):
    """Solve L L^T x = b for per-entry (128,) rows b (list of n)."""
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


def constrained_vel_lanes(nv, ntot, K, ne, iters, power_iters, dt_step,
                          A_rows, damp, qv, qf, JfT, aref_a, reg3_a, mu, act):
    """Lane-level constrained velocity update (the kernel body, reusable by
    the fused substep megakernel in ops/pallas_substep.py).

    A_rows: M as per-entry (128,) lane rows; damp/qv/qf: lists of (128,);
    JfT: (nv, ntot, 128); aref_a/reg3_a: (ntot, 128); mu/act: (K, 128).
    Returns (qvel_new rows list, f (ntot, 128))."""
    if True:
        dt = JfT.dtype
        # ---- factor M, solve qacc_smooth ----------------------------------
        Lr = _chol_rows(A_rows, nv)
        qacc_l = _chol_solve_vec(Lr, [qf[i] - damp[i] * qv[i] for i in range(nv)], nv)

        # ---- whitened operator: Y = L^-1 Jf^T (forward substitution only) --
        # A = Jf M^-1 Jf^T = Y^T Y: only Y stays resident (HALF the VMEM of
        # the old JfT + MinvJT pair); Jf^T f is recovered as L (Y f) and
        # Jf qacc as Y^T (L^T qacc).
        y = [None] * nv
        for i in range(nv):
            s = JfT[i]              # (ntot, 128)
            for k in range(i):
                s = s - Lr[i][k][None, :] * y[k]
            y[i] = s / Lr[i][i][None, :]
        Y = jnp.stack(y)            # (nv, ntot, 128)
        del JfT

        # ---- diagA, R, rhs -------------------------------------------------
        diagA = jnp.maximum(jnp.sum(Y * Y, axis=0), 1e-8)  # (ntot, 128)
        R = reg3_a * diagA
        # v = L^T qacc; a0 = Y^T v
        vts = [None] * nv
        for i in range(nv):
            s = Lr[i][i] * qacc_l[i]
            for k in range(i + 1, nv):
                s = s + Lr[k][i] * qacc_l[k]
            vts[i] = s
        a0 = jnp.zeros((ntot, LANES), dtype=dt)
        for i in range(nv):
            a0 = a0 + Y[i] * vts[i][None, :]
        rhs = aref_a - a0

        def matvec(xv):
            # t = Y @ xv : contract over rows
            t = jnp.sum(Y * xv[None, :, :], axis=1)           # (nv, 128)
            out = R * xv
            for i in range(nv):
                out = out + Y[i] * t[i][None, :]
            return out

        def project(xv):
            fn = jnp.maximum(xv[:K], 0.0) * act
            t1 = xv[K : 2 * K]
            t2 = xv[2 * K : 3 * K]
            tn = jnp.sqrt(t1 * t1 + t2 * t2)
            scale = jnp.minimum(1.0, mu * fn / jnp.maximum(tn, 1e-9)) * act
            parts = [fn, t1 * scale, t2 * scale]
            if ne:
                parts.append(xv[3 * K :])
            return jnp.concatenate(parts, axis=0)

        # ---- power iteration for the step size ----------------------------
        # active-submatrix only (see _apgd_xla rowmask note)
        if ne:
            rowmask = jnp.concatenate(
                [act, act, act, jnp.ones((ne, LANES), dtype=dt)], axis=0
            )
        else:
            rowmask = jnp.concatenate([act, act, act], axis=0)
        v = (rowmask + 1e-6) / jnp.sqrt(
            jnp.maximum(jnp.sum((rowmask + 1e-6) ** 2, axis=0), 1e-18)
        )[None, :]
        for _ in range(power_iters):
            w = matvec(v) * rowmask
            nrm = jnp.sqrt(jnp.maximum(jnp.sum(w * w, axis=0), 1e-18))
            v = w / nrm[None, :]
        L_est = jnp.maximum(jnp.sum(v * (matvec(v) * rowmask), axis=0), 1e-6)
        inv_L = 1.0 / (1.1 * L_est)  # (128,)

        # ---- APGD ----------------------------------------------------------
        f = jnp.zeros((ntot, LANES), dtype=dt)
        yv = f
        t_m = jnp.ones((LANES,), dtype=dt)
        for _ in range(iters):
            g = matvec(yv) - rhs
            f_new = project(yv - inv_L[None, :] * g)
            t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t_m * t_m))
            yv = f_new + ((t_m - 1.0) / t_new)[None, :] * (f_new - f)
            f = f_new
            t_m = t_new

        # ---- velocity update: (M + dt diag(damping)) dv = rhs_v ------------
        # qfrc_con = Jf^T f = L (Y f)
        w = jnp.sum(Y * f[None, :, :], axis=1)           # (nv, 128)
        qfrc_con = [None] * nv
        for i in range(nv):
            s = Lr[i][0] * w[0]
            for k in range(1, i + 1):
                s = s + Lr[i][k] * w[k]
            qfrc_con[i] = s
        Ah_rows = [
            [A_rows[i][j] + (dt_step * damp[i] if i == j else 0.0) for j in range(nv)]
            for i in range(nv)
        ]
        Lh = _chol_rows(Ah_rows, nv)
        rhs_v = [qf[i] + qfrc_con[i] - damp[i] * qv[i] for i in range(nv)]
        dv = _chol_solve_vec(Lh, rhs_v, nv)
        return [qv[i] + dt_step * dv[i] for i in range(nv)], f


def _make_kernel(nv, ntot, K, ne, iters, power_iters, dt_step):
    """Batched kernel: all arrays batch-minor (..., B-tile of 128 lanes).

    One substep's constrained velocity update: M factor, smooth solve, APGD
    cone QP, implicit-damping velocity solve — all operands VMEM-resident.
    Thin ref wrapper over constrained_vel_lanes."""

    def kernel(M_ref, JfT_ref, aref_ref, qfrc_ref_in, qvel_ref, damp_ref,
               reg3_ref, mu_ref, act_ref, qvel_out_ref, f_ref):
        A_rows = [[M_ref[i, j] for j in range(nv)] for i in range(nv)]
        damp = [damp_ref[i] for i in range(nv)]
        qv = [qvel_ref[i] for i in range(nv)]
        qf = [qfrc_ref_in[i] for i in range(nv)]
        qvel_new, f = constrained_vel_lanes(
            nv, ntot, K, ne, iters, power_iters, dt_step,
            A_rows, damp, qv, qf, JfT_ref[...], aref_ref[...], reg3_ref[...],
            mu_ref[...], act_ref[...],
        )
        qvel_out_ref[...] = jnp.stack(qvel_new)
        f_ref[...] = f

    return kernel


@functools.lru_cache(maxsize=64)
def _pallas_solver(nv, ntot, K, ne, iters, power_iters, dt_step, dtype_name):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = _make_kernel(nv, ntot, K, ne, iters, power_iters, dt_step)

    # big-row worlds (Sawyer PickPlace, TwoArm): a multi-step grid
    # double-buffers the (nv, ntot, 128) JfT block next to the whitened Y,
    # blowing scoped VMEM (measured 25.12M vs 16M at nv*ntot = 9504). One
    # 128-lane chunk per pallas_call (grid=1) skips the pipelining buffers
    # and fits; small worlds keep the pipelined multi-step grid.
    chunked = nv * ntot > PALLAS_VEL_ROWS_MAX

    def spec(*dims):
        return pl.BlockSpec(dims + (LANES,), lambda i: (0,) * len(dims) + (i,),
                            memory_space=pltpu.VMEM)

    def call(args, g):
        return pl.pallas_call(
            kernel,
            grid=(g,),
            in_specs=[
                spec(nv, nv), spec(nv, ntot), spec(ntot), spec(nv), spec(nv),
                spec(nv), spec(ntot), spec(K), spec(K),
            ],
            out_specs=(spec(nv), spec(ntot)),
            out_shape=(
                jax.ShapeDtypeStruct((nv, g * LANES), args[0].dtype),
                jax.ShapeDtypeStruct((ntot, g * LANES), args[0].dtype),
            ),
        )(*args)

    @jax.jit
    def solve_batched(M, JfT, aref, qfrc_smooth, qvel, damping, reg3, mu, active):
        # inputs batch-major (B, ...); transpose to batch-minor, pad lanes
        B = JfT.shape[0]
        Bp = ((B + LANES - 1) // LANES) * LANES
        pad = Bp - B

        def prep(x):
            x = jnp.moveaxis(x, 0, -1)
            if pad:
                x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
            return x

        args = tuple(prep(a) for a in
                     (M, JfT, aref, qfrc_smooth, qvel, damping, reg3, mu, active))
        G = Bp // LANES
        if not chunked or G == 1:
            qvel_new, f = call(args, G)
        else:
            outs = [
                call(tuple(a[..., c * LANES : (c + 1) * LANES] for a in args), 1)
                for c in range(G)
            ]
            qvel_new = jnp.concatenate([o[0] for o in outs], axis=-1)
            f = jnp.concatenate([o[1] for o in outs], axis=-1)
        return jnp.moveaxis(qvel_new, -1, 0)[:B], jnp.moveaxis(f, -1, 0)[:B]

    return solve_batched


def make_vel_solver(nv, ntot, K, ne, iters, power_iters, dt_step):
    """Returns solve(M, JfT (nv,ntot), aref, qfrc_smooth, qvel, damping, reg3,
    mu, active) -> (qvel_new (nv,), f (ntot,)): the full constrained velocity
    update for one substep. A custom_vmap function: batched calls on TPU hit
    the Pallas kernel; unbatched / non-TPU calls run the XLA path."""

    _flat_cache = []

    @custom_vmap
    def solve_inner(M, JfT, aref, qfrc_smooth, qvel, damping, reg3, mu, active):
        return _vel_update_xla(M, JfT, aref, qfrc_smooth, qvel, damping, reg3,
                               mu, active, K, ne, iters, power_iters, dt_step)

    @solve_inner.def_vmap
    def _solve_vmap(axis_size, in_batched, *batched_args):
        # broadcast any unbatched operands (all are per-scenario in practice)
        def bc(x, b):
            return x if b else jnp.broadcast_to(x[None], (axis_size,) + x.shape)

        args = [bc(a, b) for a, b in zip(batched_args, in_batched)]
        if jax.default_backend() == "tpu":
            if not _flat_cache:
                from robosuite_tpu.ops.vmap_flat import flat_batched

                _flat_cache.append(flat_batched(
                    _pallas_solver(nv, ntot, K, ne, iters, power_iters, dt_step,
                                   str(args[0].dtype))
                ))
            out = _flat_cache[0](*args)
        else:
            out = jax.vmap(
                lambda *a: _vel_update_xla(*a, K, ne, iters, power_iters, dt_step)
            )(*args)
        return out, (True, True)

    # custom_jvp boundary (see pallas_forward.make_forward_solver): MPC
    # linearization differentiates through the contact solve; tangents take
    # the XLA APGD path, primal-only calls still hit the Pallas kernel.
    @jax.custom_jvp
    def solve(M, JfT, aref, qfrc_smooth, qvel, damping, reg3, mu, active):
        return solve_inner(M, JfT, aref, qfrc_smooth, qvel, damping, reg3, mu, active)

    @solve.defjvp
    def _solve_jvp(primals, tangents):
        return jax.jvp(
            lambda *a: _vel_update_xla(*a, K, ne, iters, power_iters, dt_step),
            primals, tangents,
        )

    return solve
