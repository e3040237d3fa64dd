"""MPPI: sampling-based MPC over the batched env dynamics.

The flagship workload from BASELINE.json: thousands of parallel Panda-Lift
MPC solves per second. Each "solve" = K sampled action sequences of length H
policy steps rolled through the full physics+controller step, softmax-
weighted into an updated nominal sequence (receding horizon).

Pure-functional: `mppi_update` is jitted/vmapped/shard_mapped by callers;
cross-device reductions (weight normalization) ride ICI via psum when run
under shard_map (robosuite_tpu.parallel).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import struct


@dataclasses.dataclass(frozen=True)
class MPPIConfig:
    horizon: int = 8            # policy steps per solve
    n_samples: int = 32         # sampled sequences per solve
    temperature: float = 0.3
    noise_sigma: float = 0.4
    gamma: float = 1.0          # reward discount


@struct.dataclass
class MPPIState:
    mean: Any   # (H, act_dim) nominal action sequence
    rng: Any


def init_state(cfg: MPPIConfig, act_dim: int, rng) -> MPPIState:
    return MPPIState(mean=jnp.zeros((cfg.horizon, act_dim)), rng=rng)


def mppi_update(cfg: MPPIConfig, rollout_step: Callable, env_state, planner: MPPIState):
    """One MPPI solve. rollout_step(env_state, action) -> (env_state, reward).

    Returns (action_to_execute, new_planner_state, metrics) where metrics is
    a dict of per-solve solver observability (best/mean return, masked-
    rollout count) — the SURVEY §5 metrics-pipeline analog.
    """
    rng, k_noise = jax.random.split(planner.rng)
    H, A = planner.mean.shape
    noise = cfg.noise_sigma * jax.random.normal(k_noise, (cfg.n_samples, H, A), dtype=planner.mean.dtype)
    seqs = jnp.clip(planner.mean[None] + noise, -1.0, 1.0)

    discounts = cfg.gamma ** jnp.arange(H, dtype=planner.mean.dtype)

    def rollout(seq):
        def body(s, a):
            s2, r = rollout_step(s, a)
            return s2, r

        _, rewards = jax.lax.scan(body, env_state, seq)
        return jnp.sum(rewards * discounts)

    returns = jax.vmap(rollout)(seqs)  # (K,)

    # divergence masking (SURVEY §5 failure-detection analog): a rollout
    # that went NaN/Inf gets zero weight instead of poisoning the softmax
    finite = jnp.isfinite(returns)
    masked_returns = jnp.where(finite, returns, -jnp.inf)
    any_finite = jnp.any(finite)

    # softmax weighting on returns (cost = -return)
    w = jax.nn.softmax(masked_returns / cfg.temperature)
    w = jnp.where(any_finite, w, jnp.zeros_like(w))
    new_mean = jnp.einsum("k,khA->hA", w, seqs)
    new_mean = jnp.where(any_finite, new_mean, planner.mean)

    action = new_mean[0]
    # receding horizon: shift the plan
    shifted = jnp.concatenate([new_mean[1:], jnp.zeros((1, A), dtype=new_mean.dtype)])
    metrics = dict(
        best_return=jnp.max(masked_returns),
        mean_return=jnp.sum(jnp.where(finite, returns, 0.0)) / jnp.maximum(jnp.sum(finite), 1),
        n_masked=jnp.sum(~finite),
    )
    return action, MPPIState(mean=shifted, rng=rng), metrics


def make_solver(cfg: MPPIConfig, env):
    """Bind MPPI to an env's lean rollout step. Returns
    solve(env_state, planner) -> (action, planner', metrics)."""

    def solve(env_state, planner):
        return mppi_update(cfg, env._rollout_impl, env_state, planner)

    return solve
