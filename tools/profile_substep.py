"""Per-component timing of the batched physics substep on the live chip.

Times fk / crba / rnea / narrowphase / contact / full-step separately at
BATCH scenarios so optimization effort goes where the time is.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

import robosuite_tpu
from robosuite_tpu.ops import linalg as fastla
from robosuite_tpu.physics import contact as contact_mod
from robosuite_tpu.physics import dynamics, engine, kinematics

BATCH = 512
REPS = 30


def bench(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:28s} {dt*1e3:8.3f} ms/call  ({dt*1e6/BATCH:7.2f} us/scenario)")
    return out


def main():
    env = robosuite_tpu.make("Lift", robots="Panda")
    model = env.model
    rngs = jax.random.split(jax.random.PRNGKey(0), BATCH)
    states, _ = env.reset_batch(rngs)
    phys = states.physics if hasattr(states, "physics") else states

    qpos = phys.qpos
    qvel = phys.qvel
    print(f"batch={BATCH} nv={model.nv} nbody={model.nbody} ngeom={model.ngeom}")

    fk_b = jax.jit(jax.vmap(lambda q: kinematics.fk(model, q)))
    kin = bench("fk", fk_b, qpos)

    crba_b = jax.jit(jax.vmap(lambda k: dynamics.crba(model, k)))
    M = bench("crba", crba_b, kin)

    rnea_b = jax.jit(jax.vmap(lambda k, v: dynamics.rnea_bias(model, k, v)))
    bench("rnea_bias", rnea_b, kin, qvel)

    np_b = jax.jit(jax.vmap(lambda k: contact_mod.narrowphase(model, kin=k)))
    con = bench("narrowphase", np_b, kin)

    def contact_only(k, m, v):
        c = contact_mod.narrowphase(model, k)
        qfrc = jnp.zeros_like(v)
        return contact_mod.constrained_vel_update(model, k, c, m, v, qfrc, model.timestep)[0]

    cf_b = jax.jit(jax.vmap(contact_only))
    bench("narrow+contact(APGD)", cf_b, kin, M, qvel)

    ctrl = jnp.zeros((BATCH, model.nu), dtype=qpos.dtype)
    step_b = jax.jit(jax.vmap(lambda s, c: engine.step(model, s, c)))
    bench("engine.step (full)", step_b, phys, ctrl)

    def step25(s, c):
        return engine.step_n(model, s, c, 25)

    s25_b = jax.jit(jax.vmap(step25))
    bench("engine.step x25 (scan)", s25_b, phys, ctrl)

    roll_b = jax.jit(jax.vmap(env._rollout_impl))
    act = jnp.zeros((BATCH, env.action_dim), dtype=jnp.float32)
    bench("env policy step (OSC+25)", roll_b, states, act)


if __name__ == "__main__":
    main()
