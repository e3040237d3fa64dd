"""iLQR: iterative LQR trajectory optimization.

The refinement stage of the MPC engine (SURVEY §7 layer 5): linearize the
dynamics along a nominal trajectory (jax.jacfwd through the jitted step),
run a Riccati backward pass, and line-search the forward rollout.
Everything is jit/vmap-able, so thousands of independent iLQR solves batch
over scenarios exactly like the MPPI sampler.

Two backward passes:
  * sequential lax.scan Riccati (default) — O(H) depth, fully batched.
  * associative-scan Riccati (`parallel_backward=True`) — the horizon-axis
    parallelism component (SURVEY §2.9): the LQR value recursion is
    reformulated as an associative combine over conditional value-function
    elements (Särkkä & García-Fernández, "Temporal Parallelization of
    Dynamic Programming and Linear Quadratic Control", 2021), giving
    O(log H) depth via jax.lax.associative_scan. Exact-equivalent to the
    sequential pass (tests/test_mpc.py asserts gain-level agreement).

All inner SPD solves (Quu systems) use the repo's unrolled Cholesky
(ops/linalg.py) instead of jnp.linalg.inv — the same kernels the physics
hot path uses.

Divergence handling: non-finite line-search costs are masked to +inf so a
diverging rollout can never be accepted; if every candidate diverges the
iterate is frozen (reg grows) rather than poisoned.

Generic over (dynamics, cost): dynamics(x, u) -> x'; cost(x, u, t) -> scalar;
terminal_cost(x) -> scalar.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import struct

from robosuite_tpu.ops import linalg as fastla


@dataclasses.dataclass(frozen=True)
class ILQRConfig:
    horizon: int = 10
    n_iterations: int = 10
    reg_init: float = 1e-6
    reg_max: float = 1e6
    line_search_steps: int = 8
    parallel_backward: bool = False  # associative-scan Riccati over H
    use_jacfwd: bool = True          # forward-mode linearization (nx+nu tangents)
    use_fd: bool = False             # finite-difference fx/fu (see below)
    fd_eps: float = 1e-3
    # use_fd: forward-difference linearization via (nx+nu) extra dynamics
    # evaluations, all vmapped through the SAME compiled forward step (the
    # Pallas kernels batch over the perturbation axis). For contact-physics
    # dynamics this is the TPU-right choice: autodiff tangents must ride the
    # XLA reference path (custom_jvp boundary), whose H*(nx+nu)-tangent
    # graph explodes XLA compile time at H=64, while FD reuses one forward
    # graph — the same trade MuJoCo MPC makes with its FD derivatives.


@struct.dataclass
class ILQRSolution:
    xs: Any        # (H+1, nx) optimized state trajectory
    us: Any        # (H, nu) optimized controls
    cost: Any      # scalar final cost
    gains_K: Any   # (H, nu, nx) feedback gains (from the last backward pass,
                   # linearized about the last iteration's PRE-update
                   # trajectory: one iteration behind xs/us — applying
                   # u = us + k + K(x - xs) is the standard RTI approximation)
    gains_k: Any   # (H, nu) feedforward (same one-iteration lag)
    metrics: Any = None  # dict: per-iteration cost / alpha / accepted
    lin: Any = None      # (fx (H,nx,nx), fu (H,nx,nu)) dynamics linearization
                         # used by the last iteration — carry it across
                         # receding-horizon ticks for RTI-style reuse


def _rollout(dynamics, cost, terminal_cost, x0, us):
    def body(x, u_t):
        u, t = u_t
        c = cost(x, u, t)
        x2 = dynamics(x, u)
        return x2, (x2, c)

    H = us.shape[0]
    xT, (xs, cs) = jax.lax.scan(body, x0, (us, jnp.arange(H)))
    xs = jnp.concatenate([x0[None], xs])
    total = jnp.sum(cs) + terminal_cost(xs[-1])
    return xs, total


# --------------------------------------------------------------------------
# Parallel (associative-scan) Riccati backward pass.
#
# Element e_t = (A, b, C, eta, J) parameterizes the conditional value
# function between two times; combining e_i (earlier) with e_j (later)
# eliminates the intermediate state:
#     A_ij = A_j (I + C_i J_j)^-1 A_i
#     b_ij = A_j (I + C_i J_j)^-1 (b_i + C_i eta_j) + b_j
#     C_ij = A_j (I + C_i J_j)^-1 C_i A_j^T + C_j
#   eta_ij = A_i^T (I + J_j C_i)^-1 (eta_j - J_j b_i) + eta_i
#     J_ij = A_i^T (I + J_j C_i)^-1 J_j A_i + J_i
# Scanning (reversed) yields the cost-to-go V_t(x) = 0.5 x'S x - eta'x with
# S = J, s = -eta, from which the per-step gains follow in parallel.
# --------------------------------------------------------------------------


def _lqr_elements(fx, fu, cx, cu, cxx, cuu, cux, Vx_T, Vxx_T, reg):
    """Build per-step associative elements from the linearized problem.

    Cross terms and linear-in-u costs are eliminated by completing the
    square in u first (deviations: c_t = 0 affine dynamics)."""
    nu = cu.shape[-1]

    def per_step(A, B, q, r, Q, R, P):
        R = R + reg * jnp.eye(nu, dtype=R.dtype)
        LR = fastla.chol_factor(R)
        Rinv_P = fastla.chol_solve(LR, P)       # (nu, nx)
        Rinv_r = fastla.chol_solve(LR, r)       # (nu,)
        Rinv_BT = fastla.chol_solve(LR, B.T)    # (nu, nx)
        A_e = A - B @ Rinv_P
        b_e = -B @ Rinv_r
        C_e = B @ Rinv_BT
        J_e = Q - P.T @ Rinv_P
        eta_e = -(q - P.T @ Rinv_r)
        return A_e, b_e, C_e, eta_e, J_e

    A_e, b_e, C_e, eta_e, J_e = jax.vmap(per_step)(fx, fu, cx, cu, cxx, cuu, cux)
    nx = fx.shape[-1]
    # terminal element: pure state cost, no transition
    zA = jnp.zeros((1, nx, nx), dtype=fx.dtype)
    zb = jnp.zeros((1, nx), dtype=fx.dtype)
    A_e = jnp.concatenate([A_e, zA])
    b_e = jnp.concatenate([b_e, zb])
    C_e = jnp.concatenate([C_e, zA[0][None] * 0.0])
    eta_e = jnp.concatenate([eta_e, -Vx_T[None]])
    J_e = jnp.concatenate([J_e, Vxx_T[None]])
    return A_e, b_e, C_e, eta_e, J_e


def _combine(later, earlier):
    """Associative combine. With `reverse=True` below, lax.associative_scan
    feeds (element closer to T, element closer to 0)."""
    Aj, bj, Cj, etaj, Jj = later
    Ai, bi, Ci, etai, Ji = earlier
    nx = Ai.shape[-1]
    I = jnp.eye(nx, dtype=Ai.dtype)
    # (I + C_i J_j)^-1 applied from the left
    M1 = I + Ci @ Jj
    A_ij = Aj @ jnp.linalg.solve(M1, Ai)
    b_ij = Aj @ jnp.linalg.solve(M1, bi + Ci @ etaj) + bj
    C_ij = Aj @ jnp.linalg.solve(M1, Ci @ jnp.swapaxes(Aj, -1, -2)) + Cj
    M2 = I + Jj @ Ci
    eta_ij = jnp.swapaxes(Ai, -1, -2) @ jnp.linalg.solve(M2, etaj - Jj @ bi) + etai
    J_ij = jnp.swapaxes(Ai, -1, -2) @ jnp.linalg.solve(M2, Jj @ Ai) + Ji
    return A_ij, b_ij, C_ij, eta_ij, J_ij


def _combine_batched(a, b):
    return jax.vmap(_combine)(a, b)


def backward_associative(fx, fu, cx, cu, cxx, cuu, cux, Vx_T, Vxx_T, reg):
    """O(log H)-depth Riccati backward pass. Returns (ks, Ks, dV, Ss, ss)
    where Ss[t], ss[t] parameterize the cost-to-go at step t."""
    elems = _lqr_elements(fx, fu, cx, cu, cxx, cuu, cux, Vx_T, Vxx_T, reg)
    # suffix combine: scanned element t = e_t ⊗ e_{t+1} ⊗ ... ⊗ e_T
    scanned = jax.lax.associative_scan(_combine_batched, elems, reverse=True)
    _, _, _, etas, Js = scanned
    Ss = Js          # (H+1, nx, nx) cost-to-go Hessians
    ss = -etas       # (H+1, nx) cost-to-go gradients

    nu = cu.shape[-1]

    def gains(A, B, q, r, Q, R, P, S1, s1):
        Qu = r + B.T @ s1
        Quu = R + B.T @ S1 @ B + reg * jnp.eye(nu, dtype=R.dtype)
        Qux = P + B.T @ S1 @ A
        L = fastla.chol_factor(Quu)
        k = -fastla.chol_solve(L, Qu)
        K = -fastla.chol_solve(L, Qux)
        dv = -0.5 * jnp.dot(k, Quu @ k) - jnp.dot(k, Qu)
        return k, K, dv

    ks, Ks, dvs = jax.vmap(gains)(fx, fu, cx, cu, cxx, cuu, cux, Ss[1:], ss[1:])
    return ks, Ks, jnp.sum(dvs), Ss, ss


def backward_sequential(fx, fu, cx, cu, cxx, cuu, cux, Vx_T, Vxx_T, reg):
    """Classic O(H)-depth Riccati recursion (lax.scan, reverse)."""
    nu = cu.shape[-1]

    def body(carry, inp):
        Vx, Vxx = carry
        fx_t, fu_t, cx_t, cu_t, cxx_t, cuu_t, cux_t = inp
        Qx = cx_t + fx_t.T @ Vx
        Qu = cu_t + fu_t.T @ Vx
        Qxx = cxx_t + fx_t.T @ Vxx @ fx_t
        Quu = cuu_t + fu_t.T @ Vxx @ fu_t + reg * jnp.eye(nu, dtype=cuu_t.dtype)
        Qux = cux_t + fu_t.T @ Vxx @ fx_t
        L = fastla.chol_factor(Quu)
        k = -fastla.chol_solve(L, Qu)
        K = -fastla.chol_solve(L, Qux)
        Vx2 = Qx + K.T @ Quu @ k + K.T @ Qu + Qux.T @ k
        Vxx2 = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
        Vxx2 = 0.5 * (Vxx2 + Vxx2.T)
        dv = -0.5 * jnp.dot(k, Quu @ k) - jnp.dot(k, Qu)
        return (Vx2, Vxx2), (k, K, dv)

    (_, _), (ks, Ks, dvs) = jax.lax.scan(
        body, (Vx_T, Vxx_T), (fx, fu, cx, cu, cxx, cuu, cux), reverse=True
    )
    return ks, Ks, jnp.sum(dvs)


def gauss_newton_quadratics(residual: Callable, gn_reg: float = 1e-6):
    """Build a cost-quadratics callable from a residual function
    r(x, u, t) -> (m,) with cost = 0.5 ||r||^2. Gauss-Newton: the cost
    Hessian is approximated J_r^T J_r, needing only ONE Jacobian of the
    residual (nx+nu forward tangents) instead of a full second-order
    autodiff sweep — the standard iLQG trick for least-squares costs."""

    def quads(x, u, t):
        r = residual(x, u, t)
        Jx = jax.jacfwd(residual, argnums=0)(x, u, t)
        Ju = jax.jacfwd(residual, argnums=1)(x, u, t)
        cx = Jx.T @ r
        cu = Ju.T @ r
        cxx = Jx.T @ Jx
        cuu = Ju.T @ Ju + gn_reg * jnp.eye(u.shape[-1], dtype=u.dtype)
        cux = Ju.T @ Jx
        return cx, cu, cxx, cuu, cux

    return quads


def solve(cfg: ILQRConfig, dynamics: Callable, cost: Callable, terminal_cost: Callable, x0, us_init,
          quadratics: Callable = None, terminal_quadratics: Callable = None,
          frozen_lin=None, lin_dynamics: Callable = None):
    """Run iLQR. Returns ILQRSolution.

    quadratics (optional): (x, u, t) -> (cx, cu, cxx, cuu, cux) — overrides
    the autodiff second-order expansion of `cost` (e.g. Gauss-Newton from
    residuals via gauss_newton_quadratics; `cost` is still used for the
    line-search rollout objective). terminal_quadratics: x -> (Vx, Vxx).

    frozen_lin (optional): (fx (H,nx,nx), fu (H,nx,nu)) — use this dynamics
    linearization instead of computing one (RTI-style reuse across
    receding-horizon ticks: the FD linearization is ~1.5x the cost of the
    whole MPPI warm start per iteration, while the trajectory it is taken
    about shifts by only one step per tick). Cost quadratics are still
    evaluated fresh; the line search still rolls the TRUE dynamics, so a
    stale linearization can degrade the step but never corrupt the plan.

    lin_dynamics (optional): dynamics used ONLY for the fx/fu linearization
    (FD or jacfwd) — e.g. a coarser-integration planning model. It must map
    the same per-step state spacing as `dynamics` (one planned control
    period); the rollout/line-search path always uses `dynamics`, so — as
    with frozen_lin — a cheaper linearization can only shrink the accepted
    step, never corrupt the plan.
    """
    nu = us_init.shape[-1]
    H = us_init.shape[0]
    lin_src = dynamics if lin_dynamics is None else lin_dynamics

    if cfg.use_fd:
        def lin_dyn(x, u):
            # one fused perturbation batch: f0 once, all nx+nu forward
            # differences in a single vmap (best lane packing through the
            # Pallas substep kernels)
            nx_, nu_ = x.shape[0], u.shape[0]
            f0 = lin_src(x, u)
            dxs = jnp.concatenate([
                jnp.eye(nx_, dtype=x.dtype),
                jnp.zeros((nu_, nx_), dtype=x.dtype),
            ])
            dus = jnp.concatenate([
                jnp.zeros((nx_, nu_), dtype=u.dtype),
                jnp.eye(nu_, dtype=u.dtype),
            ])
            cols = jax.vmap(
                lambda dx, du: lin_src(x + cfg.fd_eps * dx, u + cfg.fd_eps * du)
            )(dxs, dus)
            cols = (cols - f0) / cfg.fd_eps  # (nx+nu, nx)
            return cols[:nx_].T, cols[nx_:].T
    else:
        jac = jax.jacfwd if cfg.use_jacfwd else jax.jacrev
        _fx_fn = jac(lin_src, argnums=0)
        _fu_fn = jac(lin_src, argnums=1)

        def lin_dyn(x, u):
            return _fx_fn(x, u), _fu_fn(x, u)
    if quadratics is None:
        cx_fn = jax.grad(cost, argnums=0)
        cu_fn = jax.grad(cost, argnums=1)
        cxx_fn = jax.hessian(cost, argnums=0)
        cuu_fn = jax.hessian(cost, argnums=1)
        cux_fn = jax.jacrev(jax.grad(cost, argnums=1), argnums=0)

        def quadratics(x, u, t):
            return cx_fn(x, u, t), cu_fn(x, u, t), cxx_fn(x, u, t), cuu_fn(x, u, t), cux_fn(x, u, t)

    if terminal_quadratics is None:
        vx_fn = jax.grad(terminal_cost)
        vxx_fn = jax.hessian(terminal_cost)

        def terminal_quadratics(x):
            return vx_fn(x), vxx_fn(x)

    def linearize(xs, us):
        ts = jnp.arange(H)
        if frozen_lin is not None:
            fx, fu = frozen_lin
        else:
            fx, fu = jax.vmap(lin_dyn)(xs[:-1], us)
        cx, cu, cxx, cuu, cux = jax.vmap(quadratics)(xs[:-1], us, ts)
        return fx, fu, cx, cu, cxx, cuu, cux

    def backward(xs, us, reg):
        fx, fu, *cquads = linearize(xs, us)
        Vx, Vxx = terminal_quadratics(xs[-1])
        if cfg.parallel_backward:
            ks, Ks, dv, _, _ = backward_associative(fx, fu, *cquads, Vx, Vxx, reg)
        else:
            ks, Ks, dv = backward_sequential(fx, fu, *cquads, Vx, Vxx, reg)
        return ks, Ks, dv, (fx, fu)

    def forward(xs, us, ks, Ks, alpha):
        def body(x, inp):
            x_ref, u_ref, k, K, t = inp
            u = u_ref + alpha * k + K @ (x - x_ref)
            c = cost(x, u, t)
            x2 = dynamics(x, u)
            return x2, (x2, u, c)

        H_ = us.shape[0]
        xT, (xs2, us2, cs) = jax.lax.scan(body, xs[0], (xs[:-1], us, ks, Ks, jnp.arange(H_)))
        xs2 = jnp.concatenate([xs[0][None], xs2])
        total = jnp.sum(cs) + terminal_cost(xs2[-1])
        return xs2, us2, total

    xs0, cost0 = _rollout(dynamics, cost, terminal_cost, x0, us_init)

    def iteration(carry, _):
        xs, us, J, reg, _gains = carry
        ks, Ks, expected, lin = backward(xs, us, reg)

        # backtracking line search over alphas, pick the best improvement
        alphas = 0.5 ** jnp.arange(cfg.line_search_steps, dtype=x0.dtype)

        def try_alpha(alpha):
            xs2, us2, J2 = forward(xs, us, ks, Ks, alpha)
            return xs2, us2, J2

        xs_c, us_c, J_c = jax.vmap(try_alpha)(alphas)
        # divergence masking: a NaN/Inf rollout can never be accepted
        J_c = jnp.where(jnp.isfinite(J_c), J_c, jnp.inf)
        best = jnp.argmin(J_c)
        improved = J_c[best] < J
        xs_new = jnp.where(improved, xs_c[best], xs)
        us_new = jnp.where(improved, us_c[best], us)
        J_new = jnp.where(improved, J_c[best], J)
        reg_new = jnp.where(improved, jnp.maximum(reg * 0.5, cfg.reg_init), jnp.minimum(reg * 10.0, cfg.reg_max))
        metrics = dict(cost=J_new, alpha=alphas[best], accepted=improved)
        # gains travel in the carry (only the LAST iteration's are consumed)
        # instead of being stacked in ys — saves O(n_iter * H * nx^2) memory
        return (xs_new, us_new, J_new, reg_new, (ks, Ks, lin)), metrics

    if cfg.n_iterations > 0:
        reg0 = jnp.asarray(cfg.reg_init, dtype=x0.dtype)
        # shape-matching zero placeholders for the gains slot of the carry
        # (eval_shape: no actual backward pass is computed for them)
        ks_s, Ks_s, _, lin_s = jax.eval_shape(backward, xs0, us_init, reg0)
        gains0 = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), (ks_s, Ks_s, lin_s)
        )
        (xs, us, J, _, (ks, Ks, lin)), metrics = jax.lax.scan(
            iteration, (xs0, us_init, cost0, reg0, gains0), None,
            length=cfg.n_iterations,
        )
        # NOTE: gains/lin come from the backward pass about the last
        # iteration's PRE-update trajectory (standard iLQR; a post-loop
        # backward would re-linearize — at H=64 FD that is ~1.5x the entire
        # MPPI warm start of wasted work per solve). See ILQRSolution.
    else:
        xs, us, J = xs0, us_init, cost0
        metrics = None
        ks, Ks, _, lin = backward(xs, us, jnp.asarray(cfg.reg_init, dtype=x0.dtype))
    return ILQRSolution(xs=xs, us=us, cost=J, gains_K=Ks, gains_k=ks,
                        metrics=metrics, lin=lin)
