"""Device-mesh scaling: shard batched envs/solvers over TPU meshes.

The TPU-native replacement for the reference's (absent) distributed story
(SURVEY.md §2.9): scenario-axis data parallelism via shard_map over a 1-D
mesh, with XLA collectives (psum/pmean) for cross-scenario reductions
(MPPI weight normalization, convergence tests, metric aggregation). DCN
multi-host scaling uses the same code path — jax.distributed.initialize +
a larger mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:  # jax >= 0.4.35: public API; experimental path is deprecated
    from jax import shard_map as _shard_map_raw

    def shard_map(f, mesh=None, in_specs=None, out_specs=None, check_rep=False):
        # the public API renamed/dropped check_rep; keep the call sites'
        # signature stable across jax versions
        try:
            return _shard_map_raw(f, mesh=mesh, in_specs=in_specs,
                                  out_specs=out_specs, check_vma=check_rep)
        except TypeError:
            return _shard_map_raw(f, mesh=mesh, in_specs=in_specs,
                                  out_specs=out_specs)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


SCENARIO_AXIS = "scenario"


def make_mesh(n_devices: Optional[int] = None, axis: str = SCENARIO_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch(mesh: Mesh, tree, axis: str = SCENARIO_AXIS):
    """Place a batched pytree with its leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(tree, sharding)


def sharded_env_step(env, mesh: Mesh, axis: str = SCENARIO_AXIS, batcher=None,
                     model=None, n_substeps=None):
    """Batched env step sharded over the scenario axis.

    Returns step(states, actions) -> (states', mean_reward) where the mean
    reward is reduced across the full batch with an ICI psum.

    batcher: jax.vmap (default, TPU) or a lax.map-based fallback — XLA:CPU
    compile of the vmapped physics graph is pathologically slow, so CPU
    dryruns pass batcher="map".
    model / n_substeps: optional coarse-timestep overrides (the same knobs
    env._rollout_impl exposes to MPC planners) — small CPU-mesh tests step
    a 2-substep planning model instead of the 25-substep execution model.
    """
    spec = P(axis)

    def _one(es, a):
        return env._rollout_impl(es, a, model=model, n_substeps=n_substeps)

    def _batched(states, actions):
        if batcher == "map":
            return jax.lax.map(lambda sa: _one(*sa), (states, actions))
        return jax.vmap(_one)(states, actions)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=(spec, P()),
        check_rep=False,
    )
    def _step(states, actions):
        states2, rewards = _batched(states, actions)
        local_sum = jnp.sum(rewards)
        total = jax.lax.psum(local_sum, axis)
        n = jax.lax.psum(jnp.asarray(rewards.shape[0], dtype=rewards.dtype), axis)
        return states2, total / n

    return jax.jit(_step)


def sharded_mpc_tick(env, mppi_cfg, mesh: Mesh, plan_model=None, plan_substeps=None,
                     axis: str = SCENARIO_AXIS, batcher=None):
    """One receding-horizon MPC control tick for a sharded scenario batch:
    MPPI solve on the (optionally coarse-timestep) planning model, then
    execute the chosen action at full fidelity. The flagship multi-chip /
    multi-host workload (BASELINE "Reporting points"); the mean return is
    psum-reduced across the whole mesh (ICI within a host, DCN across).

    Returns tick(states, planners) -> (states', planners', mean_return).
    batcher="map" for CPU dryruns (XLA:CPU vmap compile pathology).
    """
    from robosuite_tpu.mpc import mppi as mppi_mod

    if plan_model is not None:
        def rollout_step(es, a):
            return env._rollout_impl(es, a, model=plan_model, n_substeps=plan_substeps)
    else:
        rollout_step = env._rollout_impl

    spec = P(axis)

    def one(es, pl):
        a, p2, _ = mppi_mod.mppi_update(mppi_cfg, rollout_step, es, pl)
        es2, r = env._rollout_impl(es, a)
        return es2, p2, r

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=(spec, spec, P()),
        check_rep=False,
    )
    def _tick(states, planners):
        if batcher == "map":
            states2, planners2, rewards = jax.lax.map(lambda sp: one(*sp), (states, planners))
        else:
            states2, planners2, rewards = jax.vmap(one)(states, planners)
        total = jax.lax.psum(jnp.sum(rewards), axis)
        n = jax.lax.psum(jnp.asarray(rewards.shape[0], dtype=rewards.dtype), axis)
        return states2, planners2, total / n

    return jax.jit(_tick)


def sharded_mppi_solver(env, mppi_cfg, mesh: Mesh, axis: str = SCENARIO_AXIS):
    """Batch of independent MPC solves, sharded over devices.

    Each element of the batch is one receding-horizon MPC instance; the
    sampled rollouts within each solve vmap on-device. Returns
    solve(env_states, planner_states) -> (actions, planners', mean_return).
    """
    from robosuite_tpu.mpc import mppi as mppi_mod

    spec = P(axis)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=(spec, spec, P()),
        check_rep=False,
    )
    def _solve(env_states, planners):
        def one(es, pl):
            a, p2, _ = mppi_mod.mppi_update(mppi_cfg, env._rollout_impl, es, pl)
            return a, p2

        actions, new_planners = jax.vmap(one)(env_states, planners)
        mean_ret = jax.lax.pmean(jnp.mean(jnp.sum(new_planners.mean, axis=(-2, -1))), axis)
        return actions, new_planners, mean_ret

    return jax.jit(_solve)
