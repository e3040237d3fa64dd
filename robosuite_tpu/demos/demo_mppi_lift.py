"""MPPI MPC demo on Lift: plan with sampled rollouts, execute receding
horizon (the BASELINE.json flagship workload).

Usage: python -m robosuite_tpu.demos.demo_mppi_lift [n_solves]
"""

import sys
import time

import jax

import robosuite_tpu
from robosuite_tpu.mpc import mppi


def main():
    n_solves = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    env = robosuite_tpu.make(
        "Lift", robots="Panda", cube_size=[0.021, 0.021, 0.021], reward_shaping=True
    )
    cfg = mppi.MPPIConfig(horizon=4, n_samples=16, noise_sigma=0.5)

    state, obs = env.reset(jax.random.PRNGKey(0))
    planner = mppi.init_state(cfg, env.action_dim, jax.random.PRNGKey(1))
    solve = jax.jit(lambda s, p: mppi.mppi_update(cfg, env._rollout_impl, s, p))

    action, planner, _ = solve(state, planner)  # compile
    t0 = time.perf_counter()
    for i in range(n_solves):
        action, planner, _ = solve(state, planner)
        state, obs, reward, done, info = env.step(state, action)
        print(f"solve {i}: reward={float(reward):.4f} cube_z={float(obs['cube_pos'][2]):.3f}")
    dt = time.perf_counter() - t0
    print(f"{n_solves / dt:.2f} MPC solves/s (K={cfg.n_samples}, H={cfg.horizon})")


if __name__ == "__main__":
    main()
