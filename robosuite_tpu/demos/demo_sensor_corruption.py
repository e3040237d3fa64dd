"""Observable corruption/delay pipeline on live rollouts
(reference demos/demo_sensor_corruption.py): gaussian noise on eef position,
sampling-rate decimation + delay on joint positions.

Usage: python -m robosuite_tpu.demos.demo_sensor_corruption
"""

import jax
import jax.numpy as jnp
import numpy as np

import robosuite_tpu
from robosuite_tpu.observables import (
    Observable,
    compute_observables,
    create_gaussian_noise_corrupter,
    sensor,
)


def main():
    env = robosuite_tpu.make("Lift", robots="Panda", cube_size=[0.021, 0.021, 0.021])
    state, obs0 = env.reset(jax.random.PRNGKey(0))

    @sensor(modality="proprio")
    def eef_pos(ctx):
        return ctx["robot0_eef_pos"]

    @sensor(modality="proprio")
    def joint_pos(ctx):
        return ctx["robot0_joint_pos"]

    observables = [
        Observable("eef_pos_noisy", eef_pos,
                   corrupter=create_gaussian_noise_corrupter(0.0, 0.01)),
        Observable("joint_pos_slow", joint_pos, update_every=4, delay=2),
    ]

    # one jitted fn per cache structure (first step builds the cache)
    def step_and_observe(state, action, key, t, cache):
        state, obs, reward, done, info = env._step_impl(state, action)
        od, cache = compute_observables(observables, obs, key, t, cache)
        return state, obs["robot0_eef_pos"], od["eef_pos_noisy"], od["joint_pos_slow"], cache

    jitted = jax.jit(step_and_observe)
    rng = np.random.default_rng(0)
    cache = None
    key = jax.random.PRNGKey(1)
    for t in range(12):
        action = jnp.asarray(rng.uniform(-1, 1, env.action_dim), dtype=jnp.float32)
        key, sub = jax.random.split(key)
        fn = jitted if cache is not None else step_and_observe
        state, clean, noisy, slow, cache = fn(state, action, sub, jnp.asarray(t), cache)
        clean, noisy = np.asarray(clean), np.asarray(noisy)
        print(f"t={t:2d} eef clean={clean.round(3)} noisy={noisy.round(3)} "
              f"|err|={np.linalg.norm(noisy - clean):.4f} "
              f"joint_pos_slow[0]={float(slow[0]):+.3f}")


if __name__ == "__main__":
    main()
