"""A/B the fused-substep kernel's sublane packing factor (SUBS) on the chip.

For each SUBS in the sweep: build the Lift plan-model fused substep
(emit_aux, the MPC planning hot path), run it at the MPC bench width
(B*K = 4096), report us/substep-call, and check parity vs the SUBS=1
layout (the validated round-3 kernel).

Usage: python tools/bench_kernel_subs.py [subs...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WIDTH = int(os.environ.get("BK_WIDTH", "4096"))
REPS = 200


def build_and_run(subs):
    os.environ["ROBOSUITE_TPU_SUBS"] = str(subs)
    import jax
    import jax.numpy as jnp

    import robosuite_tpu
    from robosuite_tpu.ops import pallas_substep as PS

    env = robosuite_tpu.make(
        "Lift", robots="Panda", cube_size=[0.021, 0.021, 0.021], reward_shaping=True
    )
    model = env.model.replace(timestep=0.025, solver_iters=10,
                              pair_points_cap=int(os.environ.get("BK_CAP", "2")) or None)
    fused = PS.make_fused_substep(env, model, emit_aux=True)

    rng = jax.random.PRNGKey(0)
    states, _ = env.reset_batch(jax.random.split(rng, WIDTH))
    qpos = states.physics.qpos + 0.01 * jax.random.normal(rng, states.physics.qpos.shape)
    qvel = 0.1 * jax.random.normal(rng, states.physics.qvel.shape)
    goal = jnp.tile(
        jnp.concatenate([jnp.array([0.0, 0.0, 1.0]), jnp.eye(3).reshape(9)])[None],
        (WIDTH, 1),
    )
    gains = jnp.tile(
        jnp.concatenate([150.0 * jnp.ones(6), 2.0 * jnp.sqrt(150.0) * jnp.ones(6)])[None],
        (WIDTH, 1),
    )
    grip = jnp.zeros((WIDTH, 1))
    bt = lambda x: jnp.broadcast_to(x[None], (WIDTH,) + x.shape)
    args = (qpos, qvel, bt(model.body_mass), bt(model.body_inertia),
            bt(model.gravity), bt(model.dof_armature), goal, gains, grip)

    step = jax.jit(jax.vmap(fused))
    t0 = time.perf_counter()
    out = step(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0

    # timed: feed outputs back in so the loop isn't dead-code eliminated
    t0 = time.perf_counter()
    qp, qv = qpos, qvel
    for _ in range(REPS):
        o = step(qp, qv, *args[2:])
        qp, qv = o[0], o[1]
    jax.block_until_ready(qp)
    dt_us = (time.perf_counter() - t0) / REPS * 1e6
    return out, dt_us, compile_s


def main():
    sweep = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    ref = None
    import numpy as np

    for subs in sweep:
        # rebuild in a subprocess-free way: caches key on env id + model id,
        # and make() builds a fresh env each call, so this is safe in-process
        try:
            out, dt_us, compile_s = build_and_run(subs)
        except Exception as e:
            print(f"SUBS={subs}: FAILED {type(e).__name__}: {str(e)[:300]}")
            continue
        if ref is None:
            ref = out
            err = 0.0
        else:
            err = max(
                float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
                for a, b in zip(ref[:2], out[:2])
            )
        print(
            f"SUBS={subs}: {dt_us:8.1f} us/substep at W={WIDTH} "
            f"(compile {compile_s:.1f}s, max|dq| vs first = {err:.2e})",
            flush=True,
        )


if __name__ == "__main__":
    main()
