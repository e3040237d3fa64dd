"""Small dense linear algebra, unrolled for static sizes.

XLA:TPU lowers jnp.linalg.{cholesky,solve,inv} of small batched matrices
(7-40 dims here) to generic LAPACK-style loops with terrible occupancy;
these unrolled versions emit pure elementwise/fma graphs that fuse and vmap
cleanly — the physics hot path (mass-matrix solves, contact 3x3 blocks)
uses only these.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def chol_factor(A):
    """Cholesky factor L (lower) of SPD matrix A, unrolled for static n.

    Returns L with A = L L^T. Batched over leading dims.
    """
    n = A.shape[-1]
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, 1e-12))
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    rows = []
    zero = jnp.zeros_like(A[..., 0, 0])
    for i in range(n):
        rows.append(jnp.stack([L[i][j] if j <= i else zero for j in range(n)], axis=-1))
    return jnp.stack(rows, axis=-2)


def chol_solve(L, b):
    """Solve A x = b given L = chol_factor(A). b: (..., n) or (..., n, m)."""
    n = L.shape[-1]
    vec = b.ndim == L.ndim - 1
    if vec:
        b = b[..., None]
    # forward substitution L y = b
    y = [None] * n
    for i in range(n):
        s = b[..., i, :]
        for k in range(i):
            s = s - L[..., i, k, None] * y[k]
        y[i] = s / L[..., i, i, None]
    # back substitution L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[..., k, i, None] * x[k]
        x[i] = s / L[..., i, i, None]
    out = jnp.stack(x, axis=-2)
    if vec:
        out = out[..., 0]
    return out


def solve_spd(A, b):
    """Solve SPD system A x = b (unrolled Cholesky)."""
    return chol_solve(chol_factor(A), b)


def inv3(A):
    """Closed-form inverse of (..., 3, 3) matrices via adjugate."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    rows = jnp.stack(
        [
            jnp.stack([A11, A12, A13], axis=-1),
            jnp.stack([A21, A22, A23], axis=-1),
            jnp.stack([A31, A32, A33], axis=-1),
        ],
        axis=-2,
    )
    return rows * inv_det[..., None, None]


def inv_spd(A):
    """Inverse of an SPD matrix via unrolled Cholesky solves."""
    n = A.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    return chol_solve(chol_factor(A), eye)
