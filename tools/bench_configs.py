"""Per-config MPC solve rates (BASELINE.json configs 2-5) on the live chip.

Writes BENCH_CONFIGS.json: one row per config with solves/s at the config's
horizon. MPPI-only sampling budgets (K=16) — the per-config rows bound the
breadth of the engine; the headline MPPI+iLQR number lives in bench.py.

Run AFTER bench.py (the axon tunnel serializes TPU processes).
"""

from __future__ import annotations

import json
import os
import sys
import time

# runnable as `python tools/bench_configs.py` without installing the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


CONFIGS = [
    # (row name, env, robots, controller, horizon, plan_timestep)
    ("lift_panda_osc_H64", "Lift", "Panda", None, 64, 0.025),
    ("stack_panda_jointpos_H128", "Stack", "Panda", "JOINT_POSITION", 128, 0.025),
    ("pickplacecan_sawyer_jointpos_H128", "PickPlaceCan", "Sawyer", "JOINT_POSITION", 128, 0.025),
    ("door_panda_osc_H64", "Door", "Panda", None, 64, 0.025),
    ("nutassembly_panda_osc_H64", "NutAssemblySingle", "Panda", None, 64, 0.025),
    ("twoarmlift_2panda_osc_H64", "TwoArmLift", ("Panda", "Panda"), None, 64, 0.025),
    ("wipe_panda_varimp_osc_H64", "Wipe", "Panda",
     {"right": {"type": "OSC_POSE", "impedance_mode": "variable_kp"}}, 64, 0.025),
]

BATCH = 32
TICKS = 3


def bench_one(name, env_name, robots, controller, horizon, plan_dt):
    import jax
    import jax.numpy as jnp

    import robosuite_tpu
    from robosuite_tpu.mpc import receding

    kwargs = dict(reward_shaping=True)
    if env_name == "Wipe":
        kwargs.update(num_markers=4, seed=1)
    env = robosuite_tpu.make(env_name, robots=robots, controller_configs=controller, **kwargs)
    cfg = receding.MPCConfig(
        horizon=horizon, n_samples=16, noise_sigma=0.4, temperature=0.2,
        n_knots=8, n_ilqr_iters=0, plan_timestep=plan_dt,
    )
    mpc = receding.RecedingMPC(env, cfg)
    solve_batch = mpc.make_solve_batch()

    def tick(states, mss):
        actions, mss2, _ = solve_batch(states, mss)
        states2, _ = jax.vmap(env._rollout_impl)(states, actions)
        return states2, mss2

    tick = jax.jit(tick)
    rngs = jax.random.split(jax.random.PRNGKey(0), BATCH)
    states, _ = env.reset_batch(rngs)
    ms0 = receding.init_state(cfg, env.action_dim, jax.random.PRNGKey(1))
    mss = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (BATCH,) + x.shape), ms0)

    t0 = time.perf_counter()
    states, mss = tick(states, mss)
    jax.block_until_ready(states.physics.qpos)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(TICKS):
        states, mss = tick(states, mss)
    jax.block_until_ready(states.physics.qpos)
    dt = (time.perf_counter() - t0) / TICKS
    return dict(
        config=name, solves_per_s=round(BATCH / dt, 1), horizon=horizon,
        n_samples=16, batch=BATCH, compile_s=round(compile_s, 1),
        fused_substep=env._fused_for(mpc.plan_model) is not None,
    )


def main():
    import jax

    # The interactive TPU environment pins JAX_PLATFORMS=axon via a
    # sitecustomize hook; a clean driver shell inherits the env var without
    # the plugin registration, and every backend init then fails with
    # "Backend 'axon' is not in the list of known backends". Fall back to
    # auto-selection (tpu if present, else cpu) instead of erroring out.
    try:
        jax.devices()
    except RuntimeError:
        jax.config.update("jax_platforms", "")
        jax.devices()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

    # optional config-name filters: rerun a subset (e.g. after a transient
    # remote-compile failure) and merge into the existing BENCH_CONFIGS.json
    only = set(sys.argv[1:])
    prior = {}
    if only and os.path.exists("BENCH_CONFIGS.json"):
        with open("BENCH_CONFIGS.json") as f:
            prior = {row["config"]: row for row in json.load(f)}

    rows = []
    for spec in CONFIGS:
        if only and spec[0] not in only:
            rows.append(prior.get(spec[0], dict(config=spec[0], error="skipped")))
            continue
        try:
            row = bench_one(*spec)
        except Exception as e:  # record the failure, keep the sweep going
            row = dict(config=spec[0], error=f"{type(e).__name__}: {e}"[:200])
        print(json.dumps(row), flush=True)
        rows.append(row)
    with open("BENCH_CONFIGS.json", "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
