"""Benchmark: Panda-Lift MPC solves/s + batched env stepping on TPU.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Headline metric: receding-horizon Panda-Lift MPC solves/s at H=64 on one
chip — the BASELINE.json north-star workload (target 4096 solves/s on
v5e-8 = 512 solves/s/chip; vs_baseline is the fraction of the per-chip
target). One solve = one 20 Hz control tick: K=32 MPPI rollouts of 64
planned steps on a 25 ms planning model (spline-knot correlated sampling),
then the chosen action executed at full fidelity (mpc/receding.py).

Extra fields: batched env policy-steps/s at B=512 (each = 25 physics
substeps with the OSC_POSE law fused in; actions are small random deltas so
the goal-update path is exercised) and its multiple of the measured
single-env reference CPU rate (67.4 steps/s, tools/bench_reference.py —
the only throughput the reference stack offers; it cannot batch).
"""

from __future__ import annotations

import json
import time

import numpy as np

# robosuite Panda-Lift env.step/s, single env, lite_physics, no rendering,
# measured on this machine via tools/bench_reference.py (67.4 steps/s)
REF_CPU_STEPS_PER_S = 67.4

# BASELINE.json: >= 4096 solves/s on v5e-8 -> per-chip share
MPC_TARGET_PER_CHIP = 4096 / 8

BATCH = 512
N_STEPS = 15

MPC_BATCH = 128
# timed ticks 1..12 with relin_every=4 contain full relinearizations at
# ticks 4, 8, 12 -> exactly the 1/4 steady-state cadence
MPC_TICKS = 12


def bench_env_steps(env):
    import jax
    import jax.numpy as jnp

    rngs = jax.random.split(jax.random.PRNGKey(0), BATCH)
    states, _ = env.reset_batch(rngs)

    step = jax.jit(jax.vmap(env._rollout_impl))
    # small random deltas: exercises goal updates instead of a frozen target
    actions = 0.1 * jax.random.normal(
        jax.random.PRNGKey(1), (BATCH, env.action_dim), dtype=jnp.float32
    )

    s, r = step(states, actions)
    jax.block_until_ready(r)

    t0 = time.perf_counter()
    for _ in range(N_STEPS):
        s, r = step(s, actions)
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0
    return BATCH * N_STEPS / dt


def bench_mpc_solves(env, n_ilqr_iters, relin_every=1):
    import jax
    import jax.numpy as jnp

    from robosuite_tpu.mpc import receding

    cfg = receding.MPCConfig(
        horizon=64, n_samples=32, noise_sigma=0.4, temperature=0.2,
        n_knots=8, n_ilqr_iters=n_ilqr_iters, plan_timestep=0.025,
        relin_every=relin_every,
        # FD fx/fu on a one-substep 50 ms model: halves the dominant cost of
        # a full-relin tick; the line search still rolls the 25 ms dynamics
        fd_timestep=0.05 if n_ilqr_iters > 0 else None,
        # reduced 2-point planning manifolds (execution keeps the full
        # ones): +24% solve rate with no planner-quality loss on this task
        # — validated over 40-tick rollouts, final mean shaped reward 0.356
        # (cap=2) vs 0.312 (full manifolds), same max 1.0
        plan_pair_points=2,
    )
    mpc = receding.RecedingMPC(env, cfg)
    solve_batch = mpc.make_solve_batch()

    def tick(states, mss):
        actions, mss2, _ = solve_batch(states, mss)
        states2, rewards = jax.vmap(env._rollout_impl)(states, actions)
        return states2, mss2, rewards

    tick = jax.jit(tick)

    rngs = jax.random.split(jax.random.PRNGKey(2), MPC_BATCH)
    states, _ = env.reset_batch(rngs)
    ms0 = mpc.init_state(jax.random.PRNGKey(3))
    mss = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (MPC_BATCH,) + x.shape), ms0
    )
    states, mss, r = tick(states, mss)  # compile + warmup
    jax.block_until_ready(r)

    t0 = time.perf_counter()
    for _ in range(MPC_TICKS):
        states, mss, r = tick(states, mss)
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0
    return MPC_BATCH * MPC_TICKS / dt


def main():
    import os
    import sys

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

    import robosuite_tpu

    env = robosuite_tpu.make(
        "Lift", robots="Panda", cube_size=[0.021, 0.021, 0.021], reward_shaping=True
    )

    def note(msg):
        # stage progress on stderr: a killed/timeouted run still shows how
        # far it got and the numbers measured so far
        print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)

    note("compiling env steps")
    steps_per_s = bench_env_steps(env)
    note(f"env_steps_per_s={steps_per_s:.1f}")
    mppi_solves_per_s = bench_mpc_solves(env, n_ilqr_iters=0)
    note(f"mppi_only_solves_per_s={mppi_solves_per_s:.1f}")
    # full FD relinearization every tick (the conservative setting);
    # BENCH_SKIP_FULL_RELIN=1 reuses the last recorded number (quick reruns)
    full_relin_reused = bool(os.environ.get("BENCH_SKIP_FULL_RELIN"))
    if full_relin_reused:
        full_relin_solves_per_s = float(os.environ.get("BENCH_FULL_RELIN", "0")) or None
    else:
        full_relin_solves_per_s = bench_mpc_solves(env, n_ilqr_iters=1)
    note(f"full_relin_solves_per_s={full_relin_solves_per_s}")
    # the BASELINE workload sentence includes iLQR refinement: the headline
    # number is the FULL MPPI + 1-iLQR-iteration solve rate, with RTI-style
    # linearization reuse (full FD sweep every 4th tick, shifted in between
    # — receding.MPCConfig.relin_every; the line search always rolls the
    # true dynamics, so refinement quality is gated per tick)
    solves_per_s = bench_mpc_solves(env, n_ilqr_iters=1, relin_every=4)
    note(f"rti_solves_per_s={solves_per_s:.1f}")

    print(
        json.dumps(
            {
                "metric": "lift_panda_mpc_solves_per_s",
                "value": round(solves_per_s, 1),
                "unit": "MPC solves/s (H=64, K=32, MPPI + 1 iLQR iter, RTI relin/4, 2-pt plan manifolds, 1 chip; target 512/chip)",
                "vs_baseline": round(solves_per_s / MPC_TARGET_PER_CHIP, 3),
                # None when skipped via BENCH_SKIP_FULL_RELIN (a reused or
                # absent measurement is never passed off as a fresh one)
                "full_relin_solves_per_s": (
                    round(full_relin_solves_per_s, 1)
                    if full_relin_solves_per_s is not None else None
                ),
                "full_relin_reused": full_relin_reused,
                "mppi_only_solves_per_s": round(mppi_solves_per_s, 1),
                "env_steps_per_s": round(steps_per_s, 1),
                "env_steps_vs_ref_cpu": round(steps_per_s / REF_CPU_STEPS_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
