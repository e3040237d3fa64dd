"""Multi-host DCN launch harness for batched MPC solves.

The scaling story of this framework (SURVEY §2.9, BASELINE "Reporting
points": solves/s/chip at 1 chip / 1 host / N>=2 hosts): scenario-axis data
parallelism over one global `jax.sharding.Mesh` spanning every chip of every
host. The SAME shard_map code path (robosuite_tpu/parallel/mesh.py) runs at
all three scales — `jax.distributed.initialize` + a bigger mesh is the whole
multi-host story; cross-scenario reductions (mean return) ride ICI within a
host and DCN across hosts via the same psum.

Launch (one command per host, e.g. under mpirun / gcloud ssh fan-out):

    python -m robosuite_tpu.scripts.launch_multihost \
        --coordinator=<host0-ip>:9911 --num-processes=N --process-id=$RANK \
        --batch-per-device=2 --ticks=10

Degraded single-machine mode (CI / no TPU pod): run N local processes over
CPU devices — functionally identical collectives over the loopback DCN:

    for i in 0 1; do
        python -m robosuite_tpu.scripts.launch_multihost \
            --coordinator=127.0.0.1:9911 --num-processes=2 --process-id=$i \
            --local-cpu --ticks=2 &
    done; wait

Prints ONE JSON line per process; process 0's line carries the global
aggregate (solves/s, solves/s/chip).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--coordinator", default=None, help="host0 ip:port for jax.distributed")
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument("--local-cpu", action="store_true",
                   help="degraded mode: 1 CPU device per process on one machine")
    p.add_argument("--batch-per-device", type=int, default=1, help="MPC scenarios per chip")
    p.add_argument("--ticks", type=int, default=10, help="control ticks to time")
    p.add_argument("--horizon", type=int, default=8, help="MPPI horizon (policy steps)")
    p.add_argument("--n-samples", type=int, default=8, help="MPPI rollouts per solve")
    p.add_argument("--plan-dt", type=float, default=0.025, help="planning-model timestep")
    args = p.parse_args(argv)

    if args.local_cpu:
        # must happen before importing jax
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=1"
        )

    import jax

    if args.local_cpu:
        jax.config.update("jax_platforms", "cpu")

    if args.coordinator:
        # the one line that turns the single-host mesh into a DCN pod run
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    import jax.numpy as jnp
    import numpy as np

    import robosuite_tpu
    from robosuite_tpu.mpc import mppi as mppi_mod
    from robosuite_tpu.parallel import mesh as pmesh

    n_devices = len(jax.devices())           # global across all processes
    n_local = len(jax.local_devices())
    B = args.batch_per_device * n_devices

    env = robosuite_tpu.make(
        "Lift", robots="Panda", cube_size=[0.021, 0.021, 0.021], reward_shaping=True
    )
    mesh = pmesh.make_mesh()
    cfg = mppi_mod.MPPIConfig(
        horizon=args.horizon, n_samples=args.n_samples, noise_sigma=0.3,
        temperature=0.1, n_knots=min(8, args.horizon),
    )
    plan_model = env.model.replace(timestep=args.plan_dt)
    plan_substeps = max(1, int(round(1.0 / (env.control_freq * args.plan_dt))))

    solve = pmesh.sharded_mpc_tick(
        env, cfg, mesh, plan_model=plan_model, plan_substeps=plan_substeps,
        batcher="map" if args.local_cpu else None,
    )

    # per-process construction of the globally-sharded batch: each process
    # contributes its local devices' shards (multi-host jax arrays cannot be
    # device_put from one host)
    rngs = jax.random.split(jax.random.PRNGKey(0), B)
    states, _ = jax.jit(lambda r: jax.lax.map(env._reset_impl, r))(rngs)
    planners = mppi_mod.init_state(cfg, env.action_dim, jax.random.PRNGKey(1))
    planners = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), planners)
    states = pmesh.shard_batch(mesh, states)
    planners = pmesh.shard_batch(mesh, planners)

    # compile + warmup
    t0 = time.time()
    states, planners, mean_ret = solve(states, planners)
    jax.block_until_ready(mean_ret)
    t_compile = time.time() - t0

    t0 = time.time()
    for _ in range(args.ticks):
        states, planners, mean_ret = solve(states, planners)
    jax.block_until_ready(mean_ret)
    dt = time.time() - t0

    solves_per_s = B * args.ticks / dt
    out = dict(
        process=args.process_id,
        num_processes=args.num_processes,
        devices_global=n_devices,
        devices_local=n_local,
        batch=B,
        ticks=args.ticks,
        horizon=args.horizon,
        n_samples=args.n_samples,
        compile_s=round(t_compile, 1),
        solves_per_s=round(solves_per_s, 2),
        solves_per_s_per_chip=round(solves_per_s / n_devices, 2),
        mean_return=float(np.asarray(mean_ret)),
    )
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    main(sys.argv[1:])
