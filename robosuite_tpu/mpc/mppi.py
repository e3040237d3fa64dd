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
    n_knots: int = 0            # 0 = white per-step noise; k > 0 = noise
                                # sampled at k spline knots and linearly
                                # interpolated over the horizon (correlated
                                # exploration — essential at H >= 32, where
                                # white noise averages itself out)


@struct.dataclass
class MPPIState:
    mean: Any   # (H, act_dim) nominal action sequence
    rng: Any


def init_state(cfg: MPPIConfig, act_dim: int, rng) -> MPPIState:
    return MPPIState(mean=jnp.zeros((cfg.horizon, act_dim)), rng=rng)


def mppi_step(cfg: MPPIConfig, rollout_step: Callable, env_state, mean, rng,
              rollout_return_fn: Callable = None):
    """One MPPI importance-weighted update of the nominal sequence (no
    receding-horizon shift). Returns (new_mean, metrics).

    Divergence masking (SURVEY §5 failure-detection analog): a rollout that
    went NaN/Inf gets zero softmax weight instead of poisoning the update;
    if every sample diverged the previous mean is kept."""
    H, A = mean.shape
    if cfg.n_knots and cfg.n_knots < H:
        # correlated exploration: noise lives on k knots, linearly
        # interpolated to H steps (MJPC-style spline sampling)
        k = cfg.n_knots
        knots = jax.random.normal(rng, (cfg.n_samples, k, A), dtype=mean.dtype)
        t = jnp.linspace(0.0, k - 1.0, H)
        i0 = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, k - 2)
        frac = (t - i0)[None, :, None]
        noise = cfg.noise_sigma * (
            knots[:, i0, :] * (1.0 - frac) + knots[:, i0 + 1, :] * frac
        )
    else:
        noise = cfg.noise_sigma * jax.random.normal(rng, (cfg.n_samples, H, A), dtype=mean.dtype)
    seqs = jnp.clip(mean[None] + noise, -1.0, 1.0)

    discounts = cfg.gamma ** jnp.arange(H, dtype=mean.dtype)

    if rollout_return_fn is not None:
        # caller-supplied rollout (e.g. a product-carrying scan that reuses
        # forward kinematics between consecutive planned steps)
        rollout = lambda seq: rollout_return_fn(env_state, seq, discounts)
    else:
        def rollout(seq):
            def body(s, a):
                s2, r = rollout_step(s, a)
                return s2, r

            _, rewards = jax.lax.scan(body, env_state, seq)
            return jnp.sum(rewards * discounts)

    returns = jax.vmap(rollout)(seqs)  # (K,)

    finite = jnp.isfinite(returns)
    masked_returns = jnp.where(finite, returns, -jnp.inf)
    any_finite = jnp.any(finite)

    # softmax weighting on returns (cost = -return)
    w = jax.nn.softmax(masked_returns / cfg.temperature)
    w = jnp.where(any_finite, w, jnp.zeros_like(w))
    new_mean = jnp.einsum("k,khA->hA", w, seqs)
    new_mean = jnp.where(any_finite, new_mean, mean)

    metrics = dict(
        best_return=jnp.max(masked_returns),
        mean_return=jnp.sum(jnp.where(finite, returns, 0.0)) / jnp.maximum(jnp.sum(finite), 1),
        n_masked=jnp.sum(~finite),
    )
    return new_mean, metrics


def mppi_step_batch(cfg: MPPIConfig, rollout_return_fn: Callable, env_states, means, rngs):
    """Batched MPPI update over B solves with the (B, K) rollout grid
    FLATTENED into one (B*K,) vmap.

    The nested form — vmap over solves of [vmap over K samples] — fires the
    kernels' custom_vmap rule at the INNER width K, padding K=32 to the
    128-lane tile and then batching the padded call over B: 4x wasted lanes
    on every planning substep. Flattening keeps the kernels at full width.

    rollout_return_fn(env_state, seq, discounts) -> total return (the
    product-carrying scan, mpc/receding.py). env_states/means/rngs carry a
    leading (B,) axis. Returns (new_means (B, H, A), metrics)."""
    B, H, A = means.shape
    K = cfg.n_samples
    dtype = means.dtype

    if cfg.n_knots and cfg.n_knots < H:
        k = cfg.n_knots
        knots = jax.vmap(lambda key: jax.random.normal(key, (K, k, A), dtype=dtype))(rngs)
        t = jnp.linspace(0.0, k - 1.0, H)
        i0 = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, k - 2)
        frac = (t - i0)[None, None, :, None]
        noise = cfg.noise_sigma * (
            knots[:, :, i0, :] * (1.0 - frac) + knots[:, :, i0 + 1, :] * frac
        )  # (B, K, H, A)
    else:
        noise = cfg.noise_sigma * jax.vmap(
            lambda key: jax.random.normal(key, (K, H, A), dtype=dtype)
        )(rngs)
    seqs = jnp.clip(means[:, None] + noise, -1.0, 1.0)  # (B, K, H, A)

    discounts = cfg.gamma ** jnp.arange(H, dtype=dtype)

    flat_seqs = seqs.reshape(B * K, H, A)
    flat_states = jax.tree.map(
        lambda x: jnp.repeat(x, K, axis=0), env_states
    )
    returns = jax.vmap(
        lambda s, q: rollout_return_fn(s, q, discounts)
    )(flat_states, flat_seqs).reshape(B, K)

    finite = jnp.isfinite(returns)
    masked = jnp.where(finite, returns, -jnp.inf)
    any_finite = jnp.any(finite, axis=1)
    w = jax.nn.softmax(masked / cfg.temperature, axis=1)
    w = jnp.where(any_finite[:, None], w, jnp.zeros_like(w))
    new_means = jnp.einsum("bk,bkhA->bhA", w, seqs)
    new_means = jnp.where(any_finite[:, None, None], new_means, means)

    metrics = dict(
        best_return=jnp.max(masked, axis=1),
        mean_return=jnp.sum(jnp.where(finite, returns, 0.0), axis=1)
        / jnp.maximum(jnp.sum(finite, axis=1), 1),
        n_masked=jnp.sum(~finite, axis=1),
    )
    return new_means, metrics


def mppi_update(cfg: MPPIConfig, rollout_step: Callable, env_state, planner: MPPIState):
    """One MPPI solve. rollout_step(env_state, action) -> (env_state, reward).

    Returns (action_to_execute, new_planner_state, metrics) where metrics is
    a dict of per-solve solver observability (best/mean return, masked-
    rollout count) — the SURVEY §5 metrics-pipeline analog.
    """
    rng, k_noise = jax.random.split(planner.rng)
    new_mean, metrics = mppi_step(cfg, rollout_step, env_state, planner.mean, k_noise)
    H, A = planner.mean.shape

    action = new_mean[0]
    # receding horizon: shift the plan
    shifted = jnp.concatenate([new_mean[1:], jnp.zeros((1, A), dtype=new_mean.dtype)])
    return action, MPPIState(mean=shifted, rng=rng), metrics


def make_solver(cfg: MPPIConfig, env):
    """Bind MPPI to an env's lean rollout step. Returns
    solve(env_state, planner) -> (action, planner', metrics)."""

    def solve(env_state, planner):
        return mppi_update(cfg, env._rollout_impl, env_state, planner)

    return solve
