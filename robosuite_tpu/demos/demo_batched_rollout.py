"""Batched-rollout demo: thousands of Lift scenarios in one jitted call.

The TPU-native capability the reference lacks (SURVEY §2.9): scenario-axis
data parallelism via vmap (single chip) or shard_map (mesh).

Usage: python -m robosuite_tpu.demos.demo_batched_rollout [batch] [steps]
"""

import sys
import time

import jax
import jax.numpy as jnp

import robosuite_tpu


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    env = robosuite_tpu.make("Lift", robots="Panda", cube_size=[0.021, 0.021, 0.021], reward_shaping=True)
    rngs = jax.random.split(jax.random.PRNGKey(0), batch)
    states, _ = env.reset_batch(rngs)

    step = jax.jit(jax.vmap(env._rollout_impl))
    actions = jnp.zeros((batch, env.action_dim))
    s, r = step(states, actions)
    jax.block_until_ready(r)

    t0 = time.perf_counter()
    for _ in range(steps):
        s, r = step(s, actions)
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0
    print(f"{batch} scenarios x {steps} policy steps: {batch * steps / dt:.0f} env-steps/s")
    print(f"mean reward {float(jnp.mean(r)):.4f}")


if __name__ == "__main__":
    main()
