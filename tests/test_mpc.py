"""MPC solver tests: iLQR on canonical problems + MPPI machinery."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robosuite_tpu.mpc import ilqr, mppi


def test_ilqr_double_integrator():
    """iLQR must recover the LQR solution on a linear system."""
    dt = 0.1
    A = jnp.array([[1.0, dt], [0.0, 1.0]])
    B = jnp.array([[0.0], [dt]])

    def dynamics(x, u):
        return A @ x + B @ u

    def cost(x, u, t):
        return jnp.sum(x**2) + 0.1 * jnp.sum(u**2)

    def terminal(x):
        return 10.0 * jnp.sum(x**2)

    cfg = ilqr.ILQRConfig(horizon=20, n_iterations=8)
    x0 = jnp.array([1.0, 0.0])
    us0 = jnp.zeros((20, 1))
    sol = jax.jit(lambda x, u: ilqr.solve(cfg, dynamics, cost, terminal, x, u))(x0, us0)

    # exact finite-horizon LQR optimum via Riccati recursion (numpy)
    An, Bn = np.asarray(A), np.asarray(B)
    Q, Rm, Qf = np.eye(2) * 2.0, np.eye(1) * 0.2, np.eye(2) * 20.0
    # J uses x^2 sums (weight 1) + 0.1 u^2 => quadratic forms with factor 2
    # handled consistently: cost = x^T (Q/2) x + u^T (R/2) u
    P = Qf
    for _ in range(20):
        K = np.linalg.solve(Rm + Bn.T @ P @ Bn, Bn.T @ P @ An)
        P = Q + An.T @ P @ (An - Bn @ K)
    J_star = 0.5 * float(np.asarray(x0) @ P @ np.asarray(x0))
    assert float(sol.cost) <= J_star * 1.05, (float(sol.cost), J_star)


def test_ilqr_pendulum_swing():
    """Nonlinear sanity: pendulum moves toward upright under iLQR."""
    dt = 0.05

    def dynamics(x, u):
        th, w = x[0], x[1]
        w2 = w + dt * (-9.81 * jnp.sin(th + jnp.pi) + u[0])
        return jnp.stack([th + dt * w2, w2])

    def cost(x, u, t):
        return (x[0] ** 2 + 0.1 * x[1] ** 2 + 0.01 * u[0] ** 2)

    def terminal(x):
        return 10.0 * (x[0] ** 2 + 0.1 * x[1] ** 2)

    cfg = ilqr.ILQRConfig(horizon=40, n_iterations=15)
    x0 = jnp.array([2.5, 0.0])
    us0 = jnp.zeros((40, 1))
    sol = jax.jit(lambda x, u: ilqr.solve(cfg, dynamics, cost, terminal, x, u))(x0, us0)
    assert abs(float(sol.xs[-1, 0])) < abs(float(x0[0])) * 0.5


def test_mppi_update_improves_simple_objective():
    """MPPI must move the nominal sequence toward higher reward."""
    target = jnp.array([0.5, -0.3])

    def rollout_step(state, action):
        new = state + 0.1 * action
        reward = -jnp.sum((new - target) ** 2)
        return new, reward

    cfg = mppi.MPPIConfig(horizon=5, n_samples=64, noise_sigma=0.5, temperature=0.1)
    planner = mppi.init_state(cfg, 2, jax.random.PRNGKey(0))
    state = jnp.zeros(2)
    update = jax.jit(lambda s, p: mppi.mppi_update(cfg, rollout_step, s, p))

    def run(planner, state, n):
        total = 0.0
        for _ in range(n):
            action, planner, _ = update(state, planner)
            state, r = rollout_step(state, action)
            total = r
        return float(total), state

    r_final, state_final = run(planner, state, 15)
    assert float(jnp.linalg.norm(state_final - target)) < 0.2


def test_parallel_backward_matches_sequential():
    """Associative-scan Riccati must reproduce the sequential gains exactly
    (random nonlinear problem, including cross terms from the cost)."""
    rng = np.random.default_rng(3)
    nx, nu, H = 5, 2, 16
    W = jnp.asarray(rng.normal(size=(nx, nx)) * 0.3)
    B = jnp.asarray(rng.normal(size=(nx, nu)))

    def dynamics(x, u):
        return x + 0.1 * jnp.tanh(W @ x) + 0.1 * (B @ u)

    Q = jnp.asarray(rng.normal(size=(nx, nx)))
    Q = Q @ Q.T + jnp.eye(nx)
    P = jnp.asarray(rng.normal(size=(nu, nx)) * 0.1)

    def cost(x, u, t):
        return 0.5 * x @ Q @ x + 0.05 * jnp.sum(u**2) + u @ P @ x + 0.3 * jnp.sum(x) + 0.1 * jnp.sum(u)

    def terminal(x):
        return 2.0 * jnp.sum(x**2) + 0.2 * jnp.sum(x)

    x0 = jnp.asarray(rng.normal(size=nx))
    us = jnp.asarray(rng.normal(size=(H, nu)) * 0.2)

    cfg_seq = ilqr.ILQRConfig(horizon=H, n_iterations=3, parallel_backward=False)
    cfg_par = ilqr.ILQRConfig(horizon=H, n_iterations=3, parallel_backward=True)
    sol_seq = jax.jit(lambda x, u: ilqr.solve(cfg_seq, dynamics, cost, terminal, x, u))(x0, us)
    sol_par = jax.jit(lambda x, u: ilqr.solve(cfg_par, dynamics, cost, terminal, x, u))(x0, us)

    np.testing.assert_allclose(np.asarray(sol_par.gains_k), np.asarray(sol_seq.gains_k), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sol_par.gains_K), np.asarray(sol_seq.gains_K), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(float(sol_par.cost), float(sol_seq.cost), rtol=1e-5)


def test_ilqr_divergence_masking():
    """A dynamics that explodes for |u| large must not poison the solve:
    the line search masks non-finite costs and keeps the nominal."""
    def dynamics(x, u):
        # blows up (NaN) when pushed past the cliff
        return x + u + jnp.where(jnp.abs(u) > 1e3, jnp.nan, 0.0)

    def cost(x, u, t):
        return jnp.sum(x**2) + 1e-8 * jnp.sum(u**2)  # near-singular Quu -> huge k

    def terminal(x):
        return jnp.sum(x**2)

    cfg = ilqr.ILQRConfig(horizon=5, n_iterations=6)
    sol = jax.jit(lambda x, u: ilqr.solve(cfg, dynamics, cost, terminal, x, u))(
        jnp.ones(1), jnp.zeros((5, 1))
    )
    assert np.isfinite(float(sol.cost))
    assert np.all(np.isfinite(np.asarray(sol.us)))


def test_mppi_divergence_masking():
    """NaN rollouts get zero softmax weight; all-NaN keeps the old mean."""
    def bad_step(state, action):
        new = state + action
        return new, jnp.where(action[0] > 0, jnp.nan, -jnp.sum(new**2))

    cfg = mppi.MPPIConfig(horizon=3, n_samples=32, noise_sigma=0.5)
    planner = mppi.init_state(cfg, 1, jax.random.PRNGKey(0))
    action, planner2, metrics = jax.jit(
        lambda s, p: mppi.mppi_update(cfg, bad_step, s, p)
    )(jnp.zeros(1), planner)
    assert np.all(np.isfinite(np.asarray(action)))
    assert np.all(np.isfinite(np.asarray(planner2.mean)))
    assert int(metrics["n_masked"]) > 0


def test_ilqr_fd_linearization_matches_jacfwd():
    """Finite-difference fx/fu (ILQRConfig.use_fd — the compile-friendly
    path for contact dynamics) must solve the pendulum swing-up as well as
    the autodiff linearization."""
    dt = 0.05

    def dynamics(x, u):
        th, om = x
        om2 = om + dt * (u[0] * 2.0 - 9.81 * jnp.sin(th) - 0.1 * om)
        return jnp.array([th + dt * om2, om2])

    def cost(x, u, t):
        return 0.1 * jnp.sum(u**2) + (jnp.cos(x[0]) + 1.0) ** 2 + 0.01 * x[1] ** 2

    def terminal(x):
        return 10.0 * ((jnp.cos(x[0]) + 1.0) ** 2 + 0.1 * x[1] ** 2)

    x0 = jnp.array([0.1, 0.0])
    us0 = jnp.zeros((40, 1))
    cfg_ad = ilqr.ILQRConfig(horizon=40, n_iterations=15)
    cfg_fd = ilqr.ILQRConfig(horizon=40, n_iterations=15, use_fd=True, fd_eps=1e-4)
    sol_ad = jax.jit(lambda x, u: ilqr.solve(cfg_ad, dynamics, cost, terminal, x, u))(x0, us0)
    sol_fd = jax.jit(lambda x, u: ilqr.solve(cfg_fd, dynamics, cost, terminal, x, u))(x0, us0)
    assert float(sol_fd.cost) <= float(sol_ad.cost) * 1.10 + 1e-3, (
        float(sol_fd.cost), float(sol_ad.cost),
    )


def test_ilqr_frozen_lin_rti_reuse():
    """RTI-style linearization reuse: a solve fed the PREVIOUS tick's
    (fx, fu) shifted one step (frozen_lin) must still refine the shifted
    warm start — the receding-horizon trade receding.MPCConfig.relin_every
    makes (the FD sweep is ~1.5x the whole MPPI warm start per iteration).
    Smooth nonlinear dynamics + convex quadratic cost: the regulation
    regime RTI is designed for (receding-horizon steady state, where the
    trajectory shifts little tick-over-tick)."""
    rng = np.random.default_rng(7)
    nx, nu, H = 5, 2, 40
    W = jnp.asarray(rng.normal(size=(nx, nx)) * 0.3)
    B = jnp.asarray(rng.normal(size=(nx, nu)))

    def dynamics(x, u):
        return x + 0.1 * jnp.tanh(W @ x) + 0.1 * (B @ u)

    def cost(x, u, t):
        return 0.5 * jnp.sum(x**2) + 0.05 * jnp.sum(u**2)

    def terminal(x):
        return 2.0 * jnp.sum(x**2)

    cfg = ilqr.ILQRConfig(horizon=H, n_iterations=2, use_fd=True, fd_eps=1e-4)
    x0 = jnp.asarray(rng.normal(size=nx))
    sol1 = jax.jit(lambda x, u: ilqr.solve(cfg, dynamics, cost, terminal, x, u))(
        x0, jnp.zeros((H, nu))
    )
    assert sol1.lin is not None and sol1.lin[0].shape == (H, nx, nx)
    assert bool(sol1.metrics["accepted"][-1])

    # receding tick: execute the first action, shift plan + linearization
    x1 = dynamics(x0, sol1.us[0])
    us_ws = jnp.concatenate([sol1.us[1:], sol1.us[-1:]])
    frozen = tuple(jnp.concatenate([a[1:], a[-1:]]) for a in sol1.lin)

    _, j_ws = ilqr._rollout(dynamics, cost, terminal, x1, us_ws)
    sol_rti = jax.jit(
        lambda x, u, fl: ilqr.solve(cfg, dynamics, cost, terminal, x, u, frozen_lin=fl)
    )(x1, us_ws, frozen)
    sol_full = jax.jit(lambda x, u: ilqr.solve(cfg, dynamics, cost, terminal, x, u))(
        x1, us_ws
    )
    # the stale linearization still refines, and is close to the full relin
    assert float(sol_rti.cost) < float(j_ws)
    assert float(sol_rti.cost) <= float(sol_full.cost) * 1.25 + 1e-3


def test_ilqr_coarse_lin_dynamics():
    """lin_dynamics (receding.MPCConfig.fd_timestep): fx/fu from a coarser-
    integration model of the SAME per-step transition must still refine —
    the line search rolls the true dynamics, so a coarse linearization can
    only shrink the accepted step, never corrupt the plan."""
    dt = 0.05

    def dyn_fine(x, u):  # two half-steps per control period
        for _ in range(2):
            th, om = x[0], x[1]
            om = om + 0.5 * dt * (u[0] * 2.0 - 9.81 * jnp.sin(th) - 0.1 * om)
            x = jnp.stack([th + 0.5 * dt * om, om])
        return x

    def dyn_coarse(x, u):  # one full step per control period
        th, om = x
        om2 = om + dt * (u[0] * 2.0 - 9.81 * jnp.sin(th) - 0.1 * om)
        return jnp.array([th + dt * om2, om2])

    def cost(x, u, t):
        return 0.1 * jnp.sum(u**2) + (jnp.cos(x[0]) + 1.0) ** 2 + 0.01 * x[1] ** 2

    def terminal(x):
        return 10.0 * ((jnp.cos(x[0]) + 1.0) ** 2 + 0.1 * x[1] ** 2)

    x0 = jnp.array([0.1, 0.0])
    us0 = jnp.zeros((40, 1))
    cfg = ilqr.ILQRConfig(horizon=40, n_iterations=15, use_fd=True, fd_eps=1e-4)
    sol_fine = jax.jit(lambda x, u: ilqr.solve(cfg, dyn_fine, cost, terminal, x, u))(x0, us0)
    sol_mix = jax.jit(
        lambda x, u: ilqr.solve(cfg, dyn_fine, cost, terminal, x, u,
                                lin_dynamics=dyn_coarse)
    )(x0, us0)
    _, j0 = ilqr._rollout(dyn_fine, cost, terminal, x0, us0)
    assert float(sol_mix.cost) < float(j0)  # refines from the warm start
    assert float(sol_mix.cost) <= float(sol_fine.cost) * 1.10 + 1e-3
