"""BASELINE.json MPC configs 2-5: planning residuals + RecedingMPC solves.

Each config gets a CPU smoke solve (small H/K for trace cost): the solve
must run through MPPI (+1 iLQR iteration where marked), produce finite
actions, and the residual must be finite at the reset state. The throughput
rows live in tools/bench_configs.py (TPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import robosuite_tpu
from robosuite_tpu.mpc import receding
from robosuite_tpu.mpc.residuals import residual_for


def _smoke_solve(env, n_ilqr=0, horizon=4, n_samples=4):
    cfg = receding.MPCConfig(
        horizon=horizon, n_samples=n_samples, noise_sigma=0.3, temperature=0.3,
        n_knots=0, n_ilqr_iters=n_ilqr, ilqr_line_search=2,
        plan_timestep=0.025,
    )
    mpc = receding.RecedingMPC(env, cfg)
    solve = jax.jit(mpc.make_solve())
    state, _ = env.reset(jax.random.PRNGKey(0))
    ms = receding.init_state(cfg, env.action_dim, jax.random.PRNGKey(1))
    action, ms2, metrics = solve(state, ms)
    assert np.all(np.isfinite(np.asarray(action))), "non-finite action"
    assert np.isfinite(float(metrics["best_return"]))
    return action, metrics


def _residual_finite(env, mpc_horizonless=None):
    r_fn = residual_for(env)
    assert r_fn is not None, f"no residual for {type(env).__name__}"
    state, _ = env.reset(jax.random.PRNGKey(0))
    plan_model = env.model.replace(timestep=0.025, solver_iters=10)
    r = jax.jit(lambda q, v: r_fn(env, plan_model, q, v, jnp.zeros(env.action_dim)))(
        state.physics.qpos, state.physics.qvel
    )
    assert np.all(np.isfinite(np.asarray(r)))
    return r


def test_stack_joint_position_solve():
    # config 2: Panda + Stack, JOINT_POSITION controller
    env = robosuite_tpu.make(
        "Stack", robots="Panda", controller_configs="JOINT_POSITION",
        reward_shaping=True,
    )
    _residual_finite(env)
    _smoke_solve(env)


@pytest.mark.slow
def test_pick_place_can_sawyer_solve():
    # config 2: Sawyer + PickPlaceCan, JOINT_POSITION controller
    env = robosuite_tpu.make(
        "PickPlaceCan", robots="Sawyer", controller_configs="JOINT_POSITION",
        reward_shaping=True,
    )
    _residual_finite(env)
    _smoke_solve(env)


def test_door_solve():
    # config 3: Panda + Door (articulated-object cost), MPPI
    env = robosuite_tpu.make("Door", robots="Panda", reward_shaping=True)
    _residual_finite(env)
    _smoke_solve(env)


@pytest.mark.slow
def test_door_solve_with_ilqr():
    # config 3 with the iLQR refinement in the loop (FD linearization
    # through the contact rollout; big XLA:CPU compile -> slow-marked)
    env = robosuite_tpu.make("Door", robots="Panda", reward_shaping=True)
    _smoke_solve(env, n_ilqr=1, horizon=3, n_samples=3)


@pytest.mark.slow
def test_nut_assembly_residual():
    env = robosuite_tpu.make("NutAssemblySingle", robots="Panda", reward_shaping=True)
    _residual_finite(env)


@pytest.mark.slow
def test_two_arm_lift_solve():
    # config 4: dual-arm coupled dynamics
    env = robosuite_tpu.make("TwoArmLift", robots=["Panda", "Panda"], reward_shaping=True)
    _residual_finite(env)
    _smoke_solve(env, horizon=3, n_samples=3)


def test_wipe_force_tracking_residual():
    # config 5: Wipe with variable-impedance OSC, force-tracking cost
    env = robosuite_tpu.make(
        "Wipe", robots="Panda", num_markers=3, seed=1,
        controller_configs={"right": {"type": "OSC_POSE", "impedance_mode": "variable_kp"}},
    )
    r = _residual_finite(env)
    # pressing term active: at reset the tool is off the table -> pen < 0
    # -> the press residual is strongly negative (pushing toward contact)
    assert float(r[2]) < 0.0
    _smoke_solve(env, horizon=3, n_samples=3)


@pytest.mark.slow
def test_wipe_eef_force_observable():
    """Push the wiping tool into the table: eef force must rise and the
    excess-force penalty must fire (reference wipe.py:483-493)."""
    env = robosuite_tpu.make("Wipe", robots="Panda", num_markers=3, seed=1)
    state, obs = env.reset(jax.random.PRNGKey(0))
    act = jnp.zeros(env.action_dim).at[2].set(-1.0)
    max_force = 0.0
    fired = False
    for _ in range(30):
        state, obs, r, done, info = env.step(state, act)
        max_force = max(max_force, float(info["total_force_ee"]))
        if float(info["total_force_ee"]) > env.task_config["pressure_threshold_max"]:
            fired = True
            assert float(r) < 0.0, "excess-force penalty must make reward negative"
        if bool(done):
            break
    assert max_force > 1.0, f"no contact force seen (max {max_force})"
    assert fired, "never exceeded pressure_threshold_max while pushing down"


def test_json_controller_config_loading(tmp_path):
    """Reference config search order (composite_controller_factory.py:73-140):
    explicit JSON path > named composite JSON > per-robot default JSON."""
    import json

    from robosuite_tpu.controllers.factory import load_composite_controller_config

    cfg = load_composite_controller_config("BASIC", robot="Panda")
    assert type(cfg["right"]).__name__ == "OSCConfig" and cfg["right"].kp == 150
    p = tmp_path / "custom.json"
    basic = json.load(open("robosuite_tpu/controllers/config/default/composite/basic.json"))
    basic["body_parts"]["arms"]["right"]["kp"] = 42
    json.dump(basic, open(p, "w"))
    cfg3 = load_composite_controller_config(str(p))
    assert cfg3["right"].kp == 42
