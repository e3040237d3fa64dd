"""The physics engine: forward dynamics + integration.

Replaces MuJoCo's mj_step / mj_step1 / mj_step2 as driven by the reference's
hot loop (environments/base.py:494-505; binding_utils.py:1097-1107). Pure
functional: `step(model, state, ctrl) -> state`, jitted once, vmapped over
scenarios, scanned over substeps.

Integration follows MuJoCo's default Euler scheme: semi-implicit with
implicit joint damping — velocities solved from
(M + dt * diag(damping)) dv = dt * qfrc_total, then positions updated with
the new velocities (quaternion exponential for free/ball joints).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from robosuite_tpu.models import spec as S
from robosuite_tpu.physics import contact as contact_mod
from robosuite_tpu.physics import dynamics, kinematics
from robosuite_tpu.physics.state import State
from robosuite_tpu.ops import linalg as fastla


def actuator_forces(model, qpos, qvel, ctrl):
    """Map actuator controls to generalized forces (MuJoCo transmission:
    joint, gear scaling; motor/position/velocity gain-bias models)."""
    qfrc = jnp.zeros_like(qvel)
    for a in range(model.nu):
        j = model.actuator_jntid[a]
        dadr = model.jnt_dofadr[j]
        qadr = model.jnt_qposadr[j]
        gear = model.actuator_gear[a]
        c = ctrl[a]
        c = jnp.where(
            model.actuator_ctrllimited[a] > 0,
            jnp.clip(c, model.actuator_ctrlrange[a, 0], model.actuator_ctrlrange[a, 1]),
            c,
        )
        kind = model.actuator_kind[a]
        if kind == "motor":
            force = c
        elif kind == "position":
            kp = model.actuator_gainprm[a]
            # MuJoCo position actuator: critically damped default kv=0 unless set
            force = kp * (c - qpos[qadr] * gear)  # length = gear * qpos
        else:  # velocity
            kv = model.actuator_gainprm[a]
            force = kv * (c - qvel[dadr] * gear)
        force = jnp.where(
            model.actuator_forcelimited[a] > 0,
            jnp.clip(force, model.actuator_forcerange[a, 0], model.actuator_forcerange[a, 1]),
            force,
        )
        qfrc = qfrc.at[dadr].add(gear * force)
    return qfrc


def _integrate_qpos(model, qpos, qvel_new, dt):
    """Position update with the new velocities (MuJoCo mj_integratePos)."""
    from robosuite_tpu.utils import transforms as T

    out = qpos
    for j in range(model.njnt):
        t = model.jnt_type[j]
        qadr = model.jnt_qposadr[j]
        dadr = model.jnt_dofadr[j]
        if t == S.FREE:
            out = out.at[qadr : qadr + 3].add(dt * qvel_new[dadr : dadr + 3])
            q = T.quat_integrate_wxyz(out[qadr + 3 : qadr + 7], qvel_new[dadr + 3 : dadr + 6], dt)
            out = out.at[qadr + 3 : qadr + 7].set(q)
        elif t == S.BALL:
            q = T.quat_integrate_wxyz(out[qadr : qadr + 4], qvel_new[dadr : dadr + 3], dt)
            out = out.at[qadr : qadr + 4].set(q)
        else:
            out = out.at[qadr].add(dt * qvel_new[dadr])
    return out


def forward(model, state: State, ctrl):
    """mj_forward analog: all derived quantities for the current state.

    Returns (kin, M, qfrc_bias, qacc) — used by controllers and observables.
    """
    kin = kinematics.fk(model, state.qpos)
    M = dynamics.crba(model, kin)
    bias = dynamics.rnea_bias(model, kin, state.qvel)
    qfrc = _total_smooth_force(model, state, ctrl, kin, bias)
    qacc = fastla.solve_spd(M, qfrc)
    return kin, M, bias, qacc


def _total_smooth_force(model, state, ctrl, kin, bias):
    qfrc_act = actuator_forces(model, state.qpos, state.qvel, ctrl)
    qfrc_spring = dynamics.passive_forces(model, state.qpos, state.qvel)
    qfrc_limit = dynamics.joint_limit_forces(model, state.qpos, state.qvel)
    # smooth approximation of dry friction loss (MuJoCo handles this in the
    # constraint solver; tanh regularization keeps it jit-friendly)
    qfrc_fric = -model.dof_frictionloss * jnp.tanh(state.qvel / 0.005)
    return qfrc_act + qfrc_spring + qfrc_limit + qfrc_fric - bias


def forward_products(model, state: State):
    """(kin, M, bias): the per-substep quantities shared between the
    controller layer (mj_step1 analog) and the integrator."""
    kin = kinematics.fk(model, state.qpos)
    M = dynamics.crba(model, kin)
    bias = dynamics.rnea_bias(model, kin, state.qvel)
    return kin, M, bias


def integrate(model, state: State, ctrl, kin, M, bias) -> State:
    """mj_step2 analog: forces + contacts + semi-implicit integration, given
    precomputed forward products."""
    dt = model.timestep
    qfrc_smooth = _total_smooth_force(model, state, ctrl, kin, bias)

    Mh = M + dt * jnp.diag(model.dof_damping)
    Lm = fastla.chol_factor(M)
    qacc_smooth = fastla.chol_solve(Lm, qfrc_smooth - model.dof_damping * state.qvel)
    con = contact_mod.narrowphase(model, kin)
    from robosuite_tpu.physics.equality import equality_rows

    eq = equality_rows(model, kin, state.qpos, state.qvel) if model.neq else None
    qfrc_con = contact_mod.contact_forces(model, kin, con, Lm, state.qvel, qacc_smooth, dt, eq=eq)

    rhs = qfrc_smooth + qfrc_con
    qvel_new = state.qvel + dt * fastla.solve_spd(Mh, rhs - model.dof_damping * state.qvel)
    qpos_new = _integrate_qpos(model, state.qpos, qvel_new, dt)
    return State(qpos=qpos_new, qvel=qvel_new, time=state.time + dt)


def step(model, state: State, ctrl) -> State:
    """One physics substep at model.timestep (mj_step analog)."""
    kin, M, bias = forward_products(model, state)
    return integrate(model, state, ctrl, kin, M, bias)


@partial(jax.jit, static_argnums=(3,))
def step_n(model, state: State, ctrl, n: int) -> State:
    """n substeps under one ctrl (the reference's 25-substep policy loop,
    environments/base.py:494, as a lax.scan)."""

    def body(s, _):
        return step(model, s, ctrl), ()

    out, _ = jax.lax.scan(body, state, None, length=n)
    return out
