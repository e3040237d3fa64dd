"""Benchmark: batched Panda-Lift stepping / MPC throughput on TPU.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Metric: batched Lift env policy-steps/s (each policy step = 25 physics
substeps with the OSC_POSE law fused in, vmapped over scenarios on one chip).
Baseline: the reference robosuite single-env CPU stepping rate measured on
this machine (tools/bench_reference.py; see REF_CPU_STEPS_PER_S below) —
the only throughput the reference stack can offer (no batching, SURVEY §2.9).
"""

from __future__ import annotations

import json
import time

import numpy as np

# robosuite Panda-Lift env.step/s, single env, lite_physics, no rendering,
# measured on this machine via tools/bench_reference.py (67.4 steps/s)
REF_CPU_STEPS_PER_S = 67.4

BATCH = 512
N_STEPS = 15


def main():
    import jax
    import jax.numpy as jnp

    import robosuite_tpu

    env = robosuite_tpu.make(
        "Lift", robots="Panda", cube_size=[0.021, 0.021, 0.021], reward_shaping=True
    )

    rngs = jax.random.split(jax.random.PRNGKey(0), BATCH)
    states, _ = env.reset_batch(rngs)

    step = jax.jit(jax.vmap(env._rollout_impl))
    actions = jnp.zeros((BATCH, env.action_dim), dtype=jnp.float32)

    # warmup/compile
    s, r = step(states, actions)
    jax.block_until_ready(r)

    t0 = time.perf_counter()
    for _ in range(N_STEPS):
        s, r = step(s, actions)
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0

    steps_per_s = BATCH * N_STEPS / dt
    print(
        json.dumps(
            {
                "metric": "lift_panda_env_steps_per_s",
                "value": round(steps_per_s, 1),
                "unit": "policy_steps/s (batch=%d, 25 substeps each)" % BATCH,
                "vs_baseline": round(steps_per_s / REF_CPU_STEPS_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
