"""Receding-horizon MPC on robosuite_tpu environments — the BASELINE.json
north-star workload: parallel Panda-Lift MPC solves at H=64 within the 20 Hz
(50 ms) control budget.

One *solve* = one control tick:
  1. MPPI warm start: K sampled action sequences of length H rolled through
     a coarse-timestep *planning model* of the full contact physics,
     importance-weighted into the nominal plan (mpc/mppi.py).
  2. iLQR refinement (optional, n_ilqr_iters > 0): the nominal plan is
     refined by iterative LQR on the same planning dynamics — fx/fu by
     jacfwd through the physics step (the custom_jvp boundary in
     ops/pallas_{forward,contact}.py routes tangents through the XLA path),
     Gauss-Newton cost quadratics from a residual function, Riccati
     backward pass (sequential or associative-scan, mpc/ilqr.py).
  3. Execute the first action; shift the plan (warm start for the next tick).

The planning model is the env's compiled model with a coarser integrator
step (default 10 ms vs the 2 ms simulation timestep, mirroring MuJoCo MPC's
plan-vs-sim timestep split) so one planned control period costs 5 substeps
instead of 25. The *executed* env always steps at full fidelity.

Everything here is pure-functional over (EnvState, MPCState): `make_solve`
returns a jittable solve that vmaps over batched scenarios and shard_maps
over device meshes (parallel/mesh.py).

Reference anchors: the inner tracking law is the reference OSC_POSE
controller (controllers/parts/arm/osc.py:403-495); the task cost mirrors
the Lift reward terms (environments/manipulation/lift.py:224-273).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
from flax import struct

from robosuite_tpu.mpc import ilqr as ilqr_mod
from robosuite_tpu.mpc import mppi as mppi_mod
from robosuite_tpu.physics.state import State


@dataclasses.dataclass(frozen=True)
class MPCConfig:
    horizon: int = 64                 # H policy steps per solve
    n_samples: int = 32               # MPPI rollouts per solve
    temperature: float = 0.1
    noise_sigma: float = 0.3
    gamma: float = 1.0
    n_knots: int = 8                  # MPPI spline-knot noise (0 = white)
    n_ilqr_iters: int = 1             # 0 = MPPI-only
    ilqr_line_search: int = 4
    ilqr_reg: float = 1e-3
    ilqr_fd: bool = True              # FD linearization (jacfwd through the
                                      # contact rollout explodes XLA compile
                                      # time at H=64; see ILQRConfig.use_fd)
    parallel_backward: bool = False   # associative-scan Riccati
    plan_timestep: float = 0.01       # planning-model integrator dt
    plan_solver_iters: int = 10       # planning-model APGD iterations
                                      # (execution keeps contact.APGD_ITERS)
    plan_pair_points: Optional[int] = None
                                      # per-pair contact-manifold points for
                                      # the PLANNING model (None = the same
                                      # manifolds as execution — the default,
                                      # so planning dynamics match the config
                                      # that was parity-validated). Opt in to
                                      # 1-2 points to halve the solver rows
                                      # (APGD matvec ~ nv*ntot) for big
                                      # worlds; 2-point manifolds cannot
                                      # resist roll about the contact line,
                                      # so validate task success before
                                      # enabling. Execution always runs full
                                      # manifolds.
    fd_solver_iters: int = 6          # APGD iterations for iLQR's FD
    fd_power_iters: int = 4           # linearization evals: the H*(nx+nu)
                                      # perturbed rollouts tolerate a coarser
                                      # contact solve than the nominal plan
    fd_timestep: Optional[float] = None
                                      # integrator dt for the FD linearization
                                      # ONLY (None = plan_timestep). A coarser
                                      # dt (e.g. one 50 ms substep per planned
                                      # step instead of two 25 ms) halves the
                                      # H*(nx+nu) FD sweep — the dominant cost
                                      # of a full-relin tick — while the line
                                      # search still rolls the plan-timestep
                                      # dynamics, so a coarser linearization
                                      # can only shrink the accepted step.
    u_cost: float = 0.05              # control-effort residual weight
    relin_every: int = 1              # RTI-style linearization reuse: run the
                                      # full FD linearization only every R-th
                                      # tick; in between, shift the carried
                                      # (fx, fu) one step with the plan (the
                                      # FD sweep is ~1.5x the cost of the
                                      # whole MPPI warm start per iteration;
                                      # real-time-iteration SQP makes the
                                      # same trade). 1 = always relinearize.


@struct.dataclass
class MPCState:
    us: Any    # (H, act_dim) nominal plan
    rng: Any
    # RTI carry (relin_every > 1 only; None otherwise so the pytree stays
    # minimal for MPPI-only / full-relin configs)
    fxs: Any = None   # (H, nx, nx) dynamics linearization about the plan
    fus: Any = None   # (H, nx, nu)
    tick: Any = None  # scalar int32 tick counter (drives the relin cadence)


def init_state(cfg: MPCConfig, act_dim: int, rng, nx: int | None = None) -> MPCState:
    us = jnp.zeros((cfg.horizon, act_dim))
    if cfg.n_ilqr_iters > 0 and cfg.relin_every > 1:
        if nx is None:
            raise ValueError("relin_every > 1 needs nx (use RecedingMPC.init_state)")
        return MPCState(
            us=us, rng=rng,
            fxs=jnp.zeros((cfg.horizon, nx, nx)),
            fus=jnp.zeros((cfg.horizon, nx, act_dim)),
            tick=jnp.zeros((), dtype=jnp.int32),
        )
    return MPCState(us=us, rng=rng)


class RecedingMPC:
    """Host-side harness binding an env to the MPPI+iLQR solve.

    Args:
        env: a RobotEnv (single robot) — e.g. Lift.
        cfg: MPCConfig.
        residual: optional planning-cost residual r(env, plan_model, qpos,
            qvel, u) -> (m,) with stage cost 0.5||r||^2; defaults to
            lift_residual for Lift-style cube tasks.
    """

    def __init__(self, env, cfg: MPCConfig, residual: Optional[Callable] = None):
        self.env = env
        self.cfg = cfg
        self.plan_model = env.model.replace(
            timestep=cfg.plan_timestep, solver_iters=cfg.plan_solver_iters,
            pair_points_cap=cfg.plan_pair_points,
        )
        self.plan_substeps = max(1, int(round(1.0 / (env.control_freq * cfg.plan_timestep))))
        if residual is None:
            from robosuite_tpu.mpc.residuals import residual_for

            residual = residual_for(env) or lift_residual
        self._residual = residual

        # template EnvState for (qpos, qvel, grip) <-> EnvState mapping:
        # OSC goals are overwritten by set_goals each tick ("achieved" mode);
        # kp/kd are constants in fixed-impedance mode.
        self._template = env._reset_jit(jax.random.PRNGKey(0))[0]
        self._nu = env.action_dim

        # ravel structure for the iLQR state x = (qpos, qvel, gripper ramps);
        # multi-robot envs pack ctrl as a tuple of RobotCtrlStates
        flat, unravel = jax.flatten_util.ravel_pytree(
            (self._template.physics.qpos, self._template.physics.qvel,
             self._grips_of(self._template.ctrl))
        )
        self._unravel_x = unravel
        self.nx = flat.shape[0]

    def init_state(self, rng) -> MPCState:
        """MPCState for this harness (allocates the RTI linearization carry
        when cfg.relin_every > 1)."""
        return init_state(self.cfg, self.env.action_dim, rng, nx=self.nx)

    # -- EnvState <-> iLQR state ------------------------------------------------
    @staticmethod
    def _grips_of(ctrl):
        if isinstance(ctrl, tuple):
            return tuple(cs.gripper_action for cs in ctrl)
        return ctrl.gripper_action

    def _to_x(self, env_state):
        return jax.flatten_util.ravel_pytree(
            (env_state.physics.qpos, env_state.physics.qvel,
             self._grips_of(env_state.ctrl))
        )[0]

    def _to_env_state(self, x):
        qpos, qvel, grip = self._unravel_x(x)
        t = self._template
        if isinstance(t.ctrl, tuple):
            ctrl = tuple(cs.replace(gripper_action=g) for cs, g in zip(t.ctrl, grip))
        else:
            ctrl = t.ctrl.replace(gripper_action=grip)
        return t.replace(
            physics=t.physics.replace(qpos=qpos, qvel=qvel),
            ctrl=ctrl,
        )

    # -- planning dynamics -------------------------------------------------------
    def plan_rollout_step(self, env_state, action):
        """(EnvState, action) -> (EnvState, reward) on the planning model."""
        return self.env._rollout_impl(
            env_state, action, model=self.plan_model, n_substeps=self.plan_substeps
        )

    def plan_rollout_return(self, env_state, seq, discounts):
        """Whole-sequence rollout return — delegates to the env's planner
        builder (fused aux-carrying scan when the megakernel covers the
        world; product-carrying scan otherwise)."""
        if not hasattr(self, "_plan_return_fn"):
            self._plan_return_fn = self.env.make_plan_return(
                self.plan_model, self.plan_substeps
            )
        return self._plan_return_fn(env_state, seq, discounts)

    def _ilqr_dynamics(self, x, u):
        if not hasattr(self, "_plan_dyn_fn"):
            fd_model = self.plan_model.replace(
                solver_iters=self.cfg.fd_solver_iters,
                solver_power_iters=self.cfg.fd_power_iters,
            )
            self._fd_model = fd_model  # keep the ref: fused cache keys on id
            self._plan_dyn_fn = self.env.make_plan_dynamics(
                fd_model, self.plan_substeps
            )
        es = self._plan_dyn_fn(self._to_env_state(x), u)
        return self._to_x(es)

    def _ilqr_lin_dynamics(self, x, u):
        """Coarse-dt dynamics for the FD fx/fu sweep only (cfg.fd_timestep):
        same one-control-period state spacing, fewer integrator substeps."""
        if not hasattr(self, "_lin_dyn_fn"):
            lin_model = self.plan_model.replace(
                timestep=self.cfg.fd_timestep,
                solver_iters=self.cfg.fd_solver_iters,
                solver_power_iters=self.cfg.fd_power_iters,
            )
            self._lin_model = lin_model  # keep the ref: fused cache keys on id
            n_sub = max(1, int(round(1.0 / (self.env.control_freq * self.cfg.fd_timestep))))
            self._lin_dyn_fn = self.env.make_plan_dynamics(lin_model, n_sub)
        es = self._lin_dyn_fn(self._to_env_state(x), u)
        return self._to_x(es)

    @property
    def _lin_dynamics_opt(self):
        """lin_dynamics kwarg for ilqr.solve (None when fd_timestep unset)."""
        return self._ilqr_lin_dynamics if self.cfg.fd_timestep else None

    def _ilqr_residual(self, x, u, t):
        qpos, qvel, _ = self._unravel_x(x)
        r_task = self._residual(self.env, self.plan_model, qpos, qvel, u)
        return jnp.concatenate([r_task, self.cfg.u_cost * u])

    def _ilqr_cost(self, x, u, t):
        r = self._ilqr_residual(x, u, t)
        return 0.5 * jnp.sum(r * r)

    def _ilqr_terminal(self, x):
        return self._ilqr_cost(x, jnp.zeros(self._nu, dtype=x.dtype), 0) * 4.0

    # -- the solve ---------------------------------------------------------------
    def make_solve(self):
        """Returns solve(env_state, mpc_state) -> (action, mpc_state',
        metrics): one full MPC tick (jit/vmap-able)."""
        cfg = self.cfg
        env = self.env
        self._nu = env.action_dim
        mppi_cfg = mppi_mod.MPPIConfig(
            horizon=cfg.horizon, n_samples=cfg.n_samples, temperature=cfg.temperature,
            noise_sigma=cfg.noise_sigma, gamma=cfg.gamma, n_knots=cfg.n_knots,
        )
        ilqr_cfg = ilqr_mod.ILQRConfig(
            horizon=cfg.horizon, n_iterations=cfg.n_ilqr_iters,
            reg_init=cfg.ilqr_reg, line_search_steps=cfg.ilqr_line_search,
            parallel_backward=cfg.parallel_backward, use_fd=cfg.ilqr_fd,
        )
        quads = ilqr_mod.gauss_newton_quadratics(self._ilqr_residual)

        def refine_one(env_state, mean, frozen):
            """One iLQR refinement; frozen=(fxs, fus) reuses that dynamics
            linearization (RTI), None runs the full FD sweep. Returns
            (us, cost, ok, fx, fu) with non-finite lin zeroed so a diverged
            solve cannot poison the RTI carry."""
            x0 = self._to_x(env_state)
            sol = ilqr_mod.solve(
                ilqr_cfg, self._ilqr_dynamics, self._ilqr_cost,
                self._ilqr_terminal, x0, mean, quadratics=quads,
                frozen_lin=frozen, lin_dynamics=self._lin_dynamics_opt,
            )
            ok = jnp.all(jnp.isfinite(sol.us))
            us = jnp.where(ok, jnp.clip(sol.us, -1.0, 1.0), mean)
            fx, fu = sol.lin
            fx = jnp.where(jnp.isfinite(fx), fx, 0.0)
            fu = jnp.where(jnp.isfinite(fu), fu, 0.0)
            return us, sol.cost, ok, fx, fu

        self._refine_one = refine_one

        def solve(env_state, mpc: MPCState):
            rng, k_noise = jax.random.split(mpc.rng)
            # 1. MPPI warm start (full env reward as the sampling objective)
            mean, metrics = mppi_mod.mppi_step(
                mppi_cfg, self.plan_rollout_step, env_state, mpc.us, k_noise,
                rollout_return_fn=self.plan_rollout_return,
            )

            # 2. iLQR refinement on the raveled state
            lin_carry = {}
            if cfg.n_ilqr_iters > 0 and cfg.relin_every > 1:
                us, ilqr_cost, ok, fx, fu = jax.lax.cond(
                    (mpc.tick % cfg.relin_every) == 0,
                    lambda es, m, a, b: refine_one(es, m, None),
                    lambda es, m, a, b: refine_one(es, m, (a, b)),
                    env_state, mean, mpc.fxs, mpc.fus,
                )
                metrics = dict(metrics, ilqr_cost=ilqr_cost, ilqr_accepted=ok)
                # shift the linearization with the plan
                lin_carry = dict(
                    fxs=jnp.concatenate([fx[1:], fx[-1:]]),
                    fus=jnp.concatenate([fu[1:], fu[-1:]]),
                    tick=mpc.tick + 1,
                )
            elif cfg.n_ilqr_iters > 0:
                us, ilqr_cost, ok, _, _ = refine_one(env_state, mean, None)
                metrics = dict(metrics, ilqr_cost=ilqr_cost, ilqr_accepted=ok)
            else:
                us = mean

            action = us[0]
            shifted = jnp.concatenate([us[1:], jnp.zeros((1, us.shape[-1]), dtype=us.dtype)])
            return action, MPCState(us=shifted, rng=rng, **lin_carry), metrics

        return solve

    def make_solve_batch(self):
        """Batched solve over B scenarios with the (B, K) planning grid
        flattened into ONE vmap (mppi.mppi_step_batch) — the vmap(solve)
        nesting fires the Pallas kernels' custom_vmap at width K and pads
        K to the 128-lane tile, wasting 4x lanes at K=32.

        Returns solve_batch(env_states, mpc_states) -> (actions, states',
        metrics), all with a leading (B,) axis. iLQR refinement (if
        enabled) runs per-solve under vmap as before."""
        cfg = self.cfg
        mppi_cfg = mppi_mod.MPPIConfig(
            horizon=cfg.horizon, n_samples=cfg.n_samples, temperature=cfg.temperature,
            noise_sigma=cfg.noise_sigma, gamma=cfg.gamma, n_knots=cfg.n_knots,
        )
        ilqr_cfg = ilqr_mod.ILQRConfig(
            horizon=cfg.horizon, n_iterations=cfg.n_ilqr_iters,
            reg_init=cfg.ilqr_reg, line_search_steps=cfg.ilqr_line_search,
            parallel_backward=cfg.parallel_backward, use_fd=cfg.ilqr_fd,
        )
        quads = ilqr_mod.gauss_newton_quadratics(self._ilqr_residual)

        def refine_one(env_state, mean, frozen):
            x0 = self._to_x(env_state)
            sol = ilqr_mod.solve(
                ilqr_cfg, self._ilqr_dynamics, self._ilqr_cost,
                self._ilqr_terminal, x0, mean, quadratics=quads,
                frozen_lin=frozen, lin_dynamics=self._lin_dynamics_opt,
            )
            ok = jnp.all(jnp.isfinite(sol.us))
            us = jnp.where(ok, jnp.clip(sol.us, -1.0, 1.0), mean)
            fx, fu = sol.lin
            fx = jnp.where(jnp.isfinite(fx), fx, 0.0)
            fu = jnp.where(jnp.isfinite(fu), fu, 0.0)
            return us, sol.cost, ok, fx, fu

        def solve_batch(env_states, mpcs: MPCState):
            keys = jax.vmap(jax.random.split)(mpcs.rng)  # (B, 2, key)
            rngs, k_noise = keys[:, 0], keys[:, 1]
            means, metrics = mppi_mod.mppi_step_batch(
                mppi_cfg, self.plan_rollout_return, env_states, mpcs.us, k_noise
            )

            lin_carry = {}
            if cfg.n_ilqr_iters > 0 and cfg.relin_every > 1:
                # ticks are lock-stepped across the batch (init_state +1 per
                # solve), so the relin decision is a scalar and the cond sits
                # OUTSIDE the vmap — under vmap it would lower to a select
                # that executes BOTH branches, paying the full FD every tick.
                us, ilqr_cost, ok, fx, fu = jax.lax.cond(
                    (mpcs.tick[0] % cfg.relin_every) == 0,
                    lambda es, m, a, b: jax.vmap(
                        lambda e1, m1, a1, b1: refine_one(e1, m1, None)
                    )(es, m, a, b),
                    lambda es, m, a, b: jax.vmap(
                        lambda e1, m1, a1, b1: refine_one(e1, m1, (a1, b1))
                    )(es, m, a, b),
                    env_states, means, mpcs.fxs, mpcs.fus,
                )
                metrics = dict(metrics, ilqr_cost=ilqr_cost, ilqr_accepted=ok)
                lin_carry = dict(
                    fxs=jnp.concatenate([fx[:, 1:], fx[:, -1:]], axis=1),
                    fus=jnp.concatenate([fu[:, 1:], fu[:, -1:]], axis=1),
                    tick=mpcs.tick + 1,
                )
            elif cfg.n_ilqr_iters > 0:
                us, ilqr_cost, ok, _, _ = jax.vmap(
                    lambda e1, m1: refine_one(e1, m1, None)
                )(env_states, means)
                metrics = dict(metrics, ilqr_cost=ilqr_cost, ilqr_accepted=ok)
            else:
                us = means

            actions = us[:, 0]
            shifted = jnp.concatenate(
                [us[:, 1:], jnp.zeros((us.shape[0], 1, us.shape[-1]), dtype=us.dtype)], axis=1
            )
            return actions, MPCState(us=shifted, rng=rngs, **lin_carry), metrics

        return solve_batch


# -----------------------------------------------------------------------------
# Task residuals (planning costs). These are smooth least-squares stand-ins
# for the env rewards — same targets, differentiable-everywhere form (the
# reference rewards use tanh/step terms, lift.py:224-273).
# -----------------------------------------------------------------------------


def lift_residual(env, plan_model, qpos, qvel, u):
    """Planning residual for Lift: reach the cube, lift it above the
    success height (reference lift.py:224-273 reward terms as residuals)."""
    from robosuite_tpu.physics import kinematics

    kin = kinematics.fk(plan_model, qpos)
    eef = kin.site_xpos[env.eef_site]
    cube = kin.xpos[env.cube_body_id]
    z_target = env.table_top_z + 0.10
    r_reach = 2.0 * (eef - cube)
    r_lift = 6.0 * jnp.minimum(cube[2] - z_target, 0.0)[None]
    r_vel = 0.02 * qvel
    return jnp.concatenate([r_reach, r_lift, r_vel])
