"""MPC tuning driver: run a full receding-horizon Lift episode under one jit
and report cube height / success. Usage:
    python tools/mpc_tune.py [K] [H] [sigma] [temp] [n_ilqr] [ticks] [batch] [knots] [plan_dt]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

import robosuite_tpu
from robosuite_tpu.mpc import receding


def main():
    a = sys.argv[1:]
    K = int(a[0]) if len(a) > 0 else 32
    H = int(a[1]) if len(a) > 1 else 10
    sigma = float(a[2]) if len(a) > 2 else 0.4
    temp = float(a[3]) if len(a) > 3 else 0.1
    n_ilqr = int(a[4]) if len(a) > 4 else 0
    ticks = int(a[5]) if len(a) > 5 else 40
    B = int(a[6]) if len(a) > 6 else 4
    knots = int(a[7]) if len(a) > 7 else 8
    plan_dt = float(a[8]) if len(a) > 8 else 0.01

    env = robosuite_tpu.make(
        "Lift", robots="Panda", cube_size=[0.021, 0.021, 0.021], reward_shaping=True
    )
    cfg = receding.MPCConfig(
        horizon=H, n_samples=K, noise_sigma=sigma, temperature=temp,
        n_ilqr_iters=n_ilqr, ilqr_line_search=4, n_knots=knots,
        plan_timestep=plan_dt,
    )
    mpc = receding.RecedingMPC(env, cfg)
    solve = mpc.make_solve()

    def episode(rng):
        r1, r2 = jax.random.split(rng)
        state, _ = env._reset_impl(r1)
        ms = receding.init_state(cfg, env.action_dim, r2)

        def tick(carry, _):
            state, ms = carry
            action, ms, metrics = solve(state, ms)
            state, reward = env._rollout_impl(state, action)
            return (state, ms), (reward, state.physics.qpos[env.cube_qpos_slice][2])

        (state, ms), (rewards, cube_z) = jax.lax.scan(tick, (state, ms), None, length=ticks)
        from robosuite_tpu.physics import engine
        kin, _, _ = engine.forward_products(env.model, state.physics)
        success = env._check_success(state.physics, kin)
        return success, rewards, cube_z

    run = jax.jit(jax.vmap(episode))
    rngs = jax.random.split(jax.random.PRNGKey(0), B)
    t0 = time.time()
    success, rewards, cube_z = run(rngs)
    jax.block_until_ready(success)
    t_compile_and_run = time.time() - t0
    t0 = time.time()
    success, rewards, cube_z = run(jax.random.split(jax.random.PRNGKey(1), B))
    jax.block_until_ready(success)
    t_run = time.time() - t0

    print(f"cfg K={K} H={H} sigma={sigma} temp={temp} ilqr={n_ilqr} ticks={ticks} B={B} knots={knots} plan_dt={plan_dt}")
    print(f"success: {success.tolist()}  ({float(jnp.mean(success))*100:.0f}%)")
    print(f"final cube_z per seed: {[round(float(z),3) for z in cube_z[:, -1]]}  (table {env.table_top_z}, need > {env.table_top_z+0.04})")
    print(f"max cube_z per seed:   {[round(float(z),3) for z in jnp.max(cube_z, axis=1)]}")
    print(f"final reward per seed: {[round(float(r),3) for r in rewards[:, -1]]}")
    print(f"compile+run {t_compile_and_run:.0f}s, steady run {t_run:.1f}s -> {B*ticks/t_run:.1f} solves/s")


if __name__ == "__main__":
    main()
