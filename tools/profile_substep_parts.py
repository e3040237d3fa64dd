"""Time the substep's internal stages at MPC width (4096) under scan.

Each stage is measured as a scan over N substeps of a function that runs
the pipeline UP TO that stage (carrying state through so nothing is DCE'd).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

import robosuite_tpu
from robosuite_tpu.physics import contact as contact_mod
from robosuite_tpu.physics import engine
from robosuite_tpu.physics.state import State

BATCH = 4096
NSUB = 16
REPS = 10


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS / NSUB
    print(f"{name:32s} {dt*1e3:8.3f} ms/substep  ({dt*1e6/BATCH:7.3f} us/scenario)")
    return dt


def main():
    env = robosuite_tpu.make("Lift", robots="Panda")
    model = env.model.replace(timestep=0.025, solver_iters=10)
    rngs = jax.random.split(jax.random.PRNGKey(0), BATCH)
    states, _ = env.reset_batch(rngs)
    phys = states.physics
    ctrl = jnp.zeros((BATCH, model.nu), dtype=jnp.float32)

    def scan_of(body):
        def run(qpos, qvel, ctrl):
            def f(carry, _):
                qp, qv = carry
                return body(qp, qv, ctrl), ()

            (qp, qv), _ = jax.lax.scan(f, (qpos, qvel), None, length=NSUB)
            return qp, qv

        return jax.jit(jax.vmap(run))

    def fold(qp, *arrays):
        z = qp
        for a in arrays:
            z = z + 1e-12 * jnp.sum(a) / (1.0 + jnp.sum(a * a))
        return z

    # stage 1: forward products only
    def fwd_only(qp, qv, c):
        kin, M, bias = engine.forward_products(model, State(qpos=qp, qvel=qv, time=0.0))
        return fold(qp, M, bias, kin.geom_xpos, kin.geom_xmat, kin.sdof_lin,
                    kin.sdof_ang, kin.xpos), qv

    timeit("forward_products", scan_of(fwd_only), phys.qpos, phys.qvel, ctrl)

    # stage 2: + smooth forces
    def fwd_smooth(qp, qv, c):
        st = State(qpos=qp, qvel=qv, time=0.0)
        kin, M, bias = engine.forward_products(model, st)
        qfrc, extra = engine._total_smooth_force(model, st, c, kin, bias, M)
        return fold(qp, M, qfrc, extra, kin.geom_xpos, kin.geom_xmat,
                    kin.sdof_lin, kin.sdof_ang), qv

    timeit("+ smooth forces", scan_of(fwd_smooth), phys.qpos, phys.qvel, ctrl)

    # stage 3: + narrowphase (all rows kept)
    def fwd_narrow(qp, qv, c):
        st = State(qpos=qp, qvel=qv, time=0.0)
        kin, M, bias = engine.forward_products(model, st)
        qfrc, extra = engine._total_smooth_force(model, st, c, kin, bias, M)
        con = contact_mod.narrowphase(model, kin)
        return fold(qp, M, qfrc, con["dist"], con["pos"], con["normal"],
                    con["t1"], con["t2"]), qv

    timeit("+ narrowphase", scan_of(fwd_narrow), phys.qpos, phys.qvel, ctrl)

    # stage 3.5: + compaction + J build + solver-input assembly (skip kernel)
    def fwd_rows(qp, qv, c):
        st = State(qpos=qp, qvel=qv, time=0.0)
        kin, M, bias = engine.forward_products(model, st)
        qfrc, extra = engine._total_smooth_force(model, st, c, kin, bias, M)
        con = contact_mod.narrowphase(model, kin)
        args, _counts = contact_mod.solver_inputs(
            model, kin, con, M, qv, qfrc, model.timestep, eq=None,
            damping=model.dof_damping + extra,
        )
        return fold(qp, *[a for a in args if hasattr(a, "shape")]), qv

    if hasattr(contact_mod, "solver_inputs"):
        timeit("+ rows/compaction/J", scan_of(fwd_rows), phys.qpos, phys.qvel, ctrl)

    # stage 4: full step
    def full(qp, qv, c):
        st = State(qpos=qp, qvel=qv, time=0.0)
        ns = engine.step(model, st, c)
        return ns.qpos, ns.qvel

    timeit("full substep", scan_of(full), phys.qpos, phys.qvel, ctrl)


if __name__ == "__main__":
    main()
