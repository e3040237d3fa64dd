"""Per-scenario dynamics randomization demo
(reference demos/demo_domain_randomization.py, upgraded: every batched
scenario gets its own dynamics).

Usage: python -m robosuite_tpu.demos.demo_domain_randomization
"""

import jax
import jax.numpy as jnp
import numpy as np

import robosuite_tpu
from robosuite_tpu.wrappers import DomainRandomizationWrapper


def main():
    env = robosuite_tpu.make("Lift", robots="Panda", cube_size=[0.021, 0.021, 0.021], reward_shaping=True)
    dr = DomainRandomizationWrapper(env, seed=0)

    B = 8
    states, _ = dr.reset_batch(jax.random.split(jax.random.PRNGKey(0), B))
    print("per-scenario mass multipliers:", np.asarray(dr.batch_overrides["body_mass"]).round(3))
    actions = jnp.zeros((B, env.action_dim))
    states, rewards = dr.rollout_batch(states, actions)
    print("rewards under randomized dynamics:", np.asarray(rewards).round(4))


if __name__ == "__main__":
    main()
