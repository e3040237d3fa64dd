"""iLQR: iterative LQR trajectory optimization.

The refinement stage of the MPC engine (SURVEY §7 layer 5): linearize the
dynamics along a nominal trajectory (jax.jacrev through the jitted step),
run a Riccati backward pass (lax.scan over the horizon), and line-search the
forward rollout. Everything is jit/vmap-able, so thousands of independent
iLQR solves batch over scenarios exactly like the MPPI sampler.

Generic over (dynamics, cost): dynamics(x, u) -> x'; cost(x, u, t) -> scalar;
terminal_cost(x) -> scalar.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import struct


@dataclasses.dataclass(frozen=True)
class ILQRConfig:
    horizon: int = 10
    n_iterations: int = 10
    reg_init: float = 1e-6
    reg_max: float = 1e6
    line_search_steps: int = 8


@struct.dataclass
class ILQRSolution:
    xs: Any        # (H+1, nx) optimized state trajectory
    us: Any        # (H, nu) optimized controls
    cost: Any      # scalar final cost
    gains_K: Any   # (H, nu, nx) feedback gains
    gains_k: Any   # (H, nu) feedforward


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


def solve(cfg: ILQRConfig, dynamics: Callable, cost: Callable, terminal_cost: Callable, x0, us_init):
    """Run iLQR. Returns ILQRSolution."""
    nx = x0.shape[-1]
    nu = us_init.shape[-1]
    H = us_init.shape[0]

    fx_fn = jax.jacrev(dynamics, argnums=0)
    fu_fn = jax.jacrev(dynamics, argnums=1)
    cx_fn = jax.grad(cost, argnums=0)
    cu_fn = jax.grad(cost, argnums=1)
    cxx_fn = jax.hessian(cost, argnums=0)
    cuu_fn = jax.hessian(cost, argnums=1)
    cux_fn = jax.jacrev(jax.grad(cost, argnums=1), argnums=0)
    vx_fn = jax.grad(terminal_cost)
    vxx_fn = jax.hessian(terminal_cost)

    def linearize(xs, us):
        ts = jnp.arange(H)
        fx = jax.vmap(fx_fn)(xs[:-1], us)
        fu = jax.vmap(fu_fn)(xs[:-1], us)
        cx = jax.vmap(cx_fn)(xs[:-1], us, ts)
        cu = jax.vmap(cu_fn)(xs[:-1], us, ts)
        cxx = jax.vmap(cxx_fn)(xs[:-1], us, ts)
        cuu = jax.vmap(cuu_fn)(xs[:-1], us, ts)
        cux = jax.vmap(cux_fn)(xs[:-1], us, ts)
        return fx, fu, cx, cu, cxx, cuu, cux

    def backward(xs, us, reg):
        fx, fu, cx, cu, cxx, cuu, cux = linearize(xs, us)
        Vx = vx_fn(xs[-1])
        Vxx = vxx_fn(xs[-1])

        def body(carry, inp):
            Vx, Vxx = carry
            fx_t, fu_t, cx_t, cu_t, cxx_t, cuu_t, cux_t = inp
            Qx = cx_t + fx_t.T @ Vx
            Qu = cu_t + fu_t.T @ Vx
            Qxx = cxx_t + fx_t.T @ Vxx @ fx_t
            Quu = cuu_t + fu_t.T @ Vxx @ fu_t + reg * jnp.eye(nu)
            Qux = cux_t + fu_t.T @ Vxx @ fx_t
            Quu_inv = jnp.linalg.inv(Quu)
            k = -Quu_inv @ Qu
            K = -Quu_inv @ Qux
            Vx2 = Qx + K.T @ Quu @ k + K.T @ Qu + Qux.T @ k
            Vxx2 = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
            Vxx2 = 0.5 * (Vxx2 + Vxx2.T)
            dv = -0.5 * jnp.dot(k, Quu @ k) - jnp.dot(k, Qu)
            return (Vx2, Vxx2), (k, K, dv)

        (_, _), (ks, Ks, dvs) = jax.lax.scan(
            body, (Vx, Vxx), (fx, fu, cx, cu, cxx, cuu, cux), reverse=True
        )
        return ks, Ks, jnp.sum(dvs)

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
        xs, us, J, reg = carry
        ks, Ks, expected = backward(xs, us, reg)

        # backtracking line search over alphas, pick the best improvement
        alphas = 0.5 ** jnp.arange(cfg.line_search_steps, dtype=x0.dtype)

        def try_alpha(alpha):
            xs2, us2, J2 = forward(xs, us, ks, Ks, alpha)
            return xs2, us2, J2

        xs_c, us_c, J_c = jax.vmap(try_alpha)(alphas)
        best = jnp.argmin(J_c)
        improved = J_c[best] < J
        xs_new = jnp.where(improved, xs_c[best], xs)
        us_new = jnp.where(improved, us_c[best], us)
        J_new = jnp.where(improved, J_c[best], J)
        reg_new = jnp.where(improved, jnp.maximum(reg * 0.5, cfg.reg_init), jnp.minimum(reg * 10.0, cfg.reg_max))
        return (xs_new, us_new, J_new, reg_new), J_new

    (xs, us, J, _), _ = jax.lax.scan(
        iteration, (xs0, us_init, cost0, jnp.asarray(cfg.reg_init, dtype=x0.dtype)), None,
        length=cfg.n_iterations,
    )
    ks, Ks, _ = backward(xs, us, jnp.asarray(cfg.reg_init, dtype=x0.dtype))
    return ILQRSolution(xs=xs, us=us, cost=J, gains_K=Ks, gains_k=ks)
