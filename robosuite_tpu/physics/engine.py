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

import jax
import jax.numpy as jnp

from robosuite_tpu.models import spec as S
from robosuite_tpu.physics import contact as contact_mod
from robosuite_tpu.physics import dynamics, kinematics
from robosuite_tpu.physics.state import State
from robosuite_tpu.ops import linalg as fastla


def actuator_forces(model, qpos, qvel, ctrl):
    """Map actuator controls to generalized forces (MuJoCo transmission:
    joint or fixed-tendon, gear scaling; motor/position/velocity/general
    gain-bias models — general = fixed gain + affine bias, the xarm7
    gripper's tendon servo).

    Vectorized over all actuators in one gather/scatter pass (the per-
    actuator loop emitted ~5 sequential HLO ops per actuator per substep);
    tendon transmissions ride two tiny (nu_ten, n{q,v}) matmuls."""
    qfrc = jnp.zeros_like(qvel)
    if model.nu == 0:
        return qfrc
    import numpy as np

    gear = model.actuator_gear
    c = jnp.where(
        model.actuator_ctrllimited > 0,
        jnp.clip(ctrl, model.actuator_ctrlrange[:, 0], model.actuator_ctrlrange[:, 1]),
        ctrl,
    )
    g = model.actuator_gainprm
    kind = np.array(
        [
            {"motor": 0, "position": 1, "velocity": 2, "general": 3}[model.actuator_kind[a]]
            for a in range(model.nu)
        ],
        dtype=np.int32,
    )
    jids = np.array([model.actuator_jntid[a] for a in range(model.nu)], dtype=np.int32)
    tids = np.array([model.actuator_tenid[a] for a in range(model.nu)], dtype=np.int32)
    # transmission length / velocity per actuator (actuator units: gear *
    # joint coordinate, or gear * tendon length)
    dadr = np.array([model.jnt_dofadr[j] if j >= 0 else 0 for j in jids], dtype=np.int32)
    qadr = np.array([model.jnt_qposadr[j] if j >= 0 else 0 for j in jids], dtype=np.int32)
    if np.any(tids >= 0):
        ten_L = model.ten_Jq @ qpos  # (ntendon,)
        ten_V = model.ten_J @ qvel
        is_ten = jnp.asarray((tids >= 0).astype(np.float32))
        t_safe = np.where(tids >= 0, tids, 0)
        length = gear * jnp.where(is_ten > 0, ten_L[t_safe], qpos[qadr])
        velocity = gear * jnp.where(is_ten > 0, ten_V[t_safe], qvel[dadr])
    else:
        length = gear * qpos[qadr]
        velocity = gear * qvel[dadr]

    is_motor = jnp.asarray((kind == 0).astype(np.float32))
    is_pos = jnp.asarray((kind == 1).astype(np.float32))
    is_vel = jnp.asarray((kind == 2).astype(np.float32))
    is_gen = jnp.asarray((kind == 3).astype(np.float32))
    b = model.actuator_biasprm
    force = (
        is_motor * c
        + is_pos * g * (c - length)
        + is_vel * g * (c - velocity)
        + is_gen * (g * c + b[:, 0] + b[:, 1] * length + b[:, 2] * velocity)
    )
    force = jnp.where(
        model.actuator_forcelimited > 0,
        jnp.clip(force, model.actuator_forcerange[:, 0], model.actuator_forcerange[:, 1]),
        force,
    )
    # scatter into dofs: joint actuators direct, tendon actuators through
    # the constant moment rows (J^T f)
    if np.any(tids >= 0):
        jmask = jnp.asarray((jids >= 0).astype(np.float32))
        qfrc = qfrc.at[dadr].add(jmask * gear * force)
        moment = jnp.asarray((tids[:, None] >= 0).astype(np.float32)) * model.ten_J[t_safe]
        qfrc = qfrc + (gear * force) @ moment
        return qfrc
    return qfrc.at[dadr].add(gear * force)


def _integrate_qpos(model, qpos, qvel_new, dt):
    """Position update with the new velocities (MuJoCo mj_integratePos).

    All 1-dof joints integrate in one gather/scatter; free-joint translations
    batch into a second scatter; only quaternion joints (free rotation /
    ball) remain per-joint (typically 1-2 per world)."""
    import numpy as np

    from robosuite_tpu.physics.dynamics import _scalar_joint_index
    from robosuite_tpu.utils import transforms as T

    out = qpos
    qadr1, dadr1, _ = _scalar_joint_index(model)
    if len(qadr1):
        out = out.at[qadr1].add(dt * qvel_new[dadr1])

    free = [j for j in range(model.njnt) if model.jnt_type[j] == S.FREE]
    if free:
        tq = np.concatenate([np.arange(model.jnt_qposadr[j], model.jnt_qposadr[j] + 3) for j in free])
        td = np.concatenate([np.arange(model.jnt_dofadr[j], model.jnt_dofadr[j] + 3) for j in free])
        out = out.at[tq].add(dt * qvel_new[td])
    for j in range(model.njnt):
        t = model.jnt_type[j]
        qadr = model.jnt_qposadr[j]
        dadr = model.jnt_dofadr[j]
        if t == S.FREE:
            q = T.quat_integrate_wxyz(out[qadr + 3 : qadr + 7], qvel_new[dadr + 3 : dadr + 6], dt)
            out = out.at[qadr + 3 : qadr + 7].set(q)
        elif t == S.BALL:
            q = T.quat_integrate_wxyz(out[qadr : qadr + 4], qvel_new[dadr : dadr + 3], dt)
            out = out.at[qadr : qadr + 4].set(q)
    return out


def forward(model, state: State, ctrl):
    """mj_forward analog: all derived quantities for the current state.

    Returns (kin, M, qfrc_bias, qacc) — used by controllers and observables.
    """
    kin = kinematics.fk(model, state.qpos)
    M = dynamics.crba(model, kin)
    bias = dynamics.rnea_bias(model, kin, state.qvel)
    qfrc, extra_damp = _total_smooth_force(model, state, ctrl, kin, bias, M)
    qacc = fastla.solve_spd(M, qfrc - extra_damp * state.qvel)
    return kin, M, bias, qacc


def _total_smooth_force(model, state, ctrl, kin, bias, M):
    """-> (qfrc_smooth, extra_damping). extra_damping is the active joint-
    limit damping, to be folded into the implicit (M + dt*diag(D)) solve."""
    qfrc_act = actuator_forces(model, state.qpos, state.qvel, ctrl)
    qfrc_spring = dynamics.passive_forces(model, state.qpos, state.qvel)
    qfrc_limit, extra_damp = dynamics.joint_limit_forces(
        model, state.qpos, state.qvel, Mdiag=jnp.diagonal(M)
    )
    # smooth approximation of dry friction loss (MuJoCo handles this in the
    # constraint solver; tanh regularization keeps it jit-friendly)
    qfrc_fric = -model.dof_frictionloss * jnp.tanh(state.qvel / 0.005)
    total = qfrc_act + qfrc_spring + qfrc_limit + qfrc_fric - bias
    if model.ntendon:
        qfrc_ten, ten_damp = dynamics.tendon_forces(
            model, state.qpos, state.qvel, Mdiag=jnp.diagonal(M)
        )
        total = total + qfrc_ten
        extra_damp = extra_damp + ten_damp
    return total, extra_damp


def forward_products(model, state: State):
    """(kin, M, bias): the per-substep quantities shared between the
    controller layer (mj_step1 analog) and the integrator.

    On TPU under vmap this runs as ONE fused Pallas kernel (FK + CRBA + RNEA
    batch-minor, ops/pallas_forward.py); elsewhere the XLA reference path.

    mass/inertia/gravity/armature are runtime kernel inputs (domain
    randomization passes them traced per scenario); any OTHER traced model
    leaf (e.g. body_pos position perturbations) cannot ride the kernel's
    baked constants, so those models take the plain XLA path."""
    import dataclasses as _dc

    runtime_inputs = {"body_mass", "body_inertia", "gravity", "dof_armature"}
    for f in _dc.fields(type(model)):
        if f.name in runtime_inputs:
            continue
        if isinstance(getattr(model, f.name), jax.core.Tracer):
            kin = kinematics.fk(model, state.qpos)
            M = dynamics.crba(model, kin)
            bias = dynamics.rnea_bias(model, kin, state.qvel)
            return kin, M, bias

    from robosuite_tpu.ops.pallas_forward import make_forward_solver

    fp = make_forward_solver(model)
    return fp(state.qpos, state.qvel, model.body_mass, model.body_inertia,
              model.gravity, model.dof_armature)


def warmstart_zeros(model, dtype=jnp.float32):
    """Zero contact-solver warm start (shape is static per model)."""
    return jnp.zeros(contact_mod.contact_warmstart_dim(model), dtype=dtype)


def integrate(model, state: State, ctrl, kin, M, bias, warm=None):
    """mj_step2 analog: forces + contacts + semi-implicit integration, given
    precomputed forward products.

    `warm` (optional) selects the (state, solver_forces) return form for
    callers that track the contact solution."""
    dt = model.timestep
    qfrc_smooth, extra_damp = _total_smooth_force(model, state, ctrl, kin, bias, M)

    con = contact_mod.narrowphase(model, kin)
    from robosuite_tpu.physics.equality import equality_rows

    eq = equality_rows(model, kin, state.qpos, state.qvel) if model.neq else None
    qvel_new, f = contact_mod.constrained_vel_update(
        model, kin, con, M, state.qvel, qfrc_smooth, dt, eq=eq,
        damping=model.dof_damping + extra_damp,
    )

    qpos_new = _integrate_qpos(model, state.qpos, qvel_new, dt)
    new_state = State(qpos=qpos_new, qvel=qvel_new, time=state.time + dt)
    return (new_state, f) if warm is not None else new_state


def step(model, state: State, ctrl, warm=None):
    """One physics substep at model.timestep (mj_step analog)."""
    kin, M, bias = forward_products(model, state)
    return integrate(model, state, ctrl, kin, M, bias, warm=warm)


def step_n(model, state: State, ctrl, n: int) -> State:
    """n substeps under one ctrl (the reference's 25-substep policy loop,
    environments/base.py:494, as a lax.scan). Not self-jitted: an inner jit
    breaks custom_vmap tracing under an outer vmap (vmap->jit->scan->
    custom_vmap); wrap calls in jax.jit at the top level.

    Note: threading the contact-solver warm start through the scan carry was
    measured SLOWER on v5e (+17% per policy step) — the f-vector dependency
    serializes substep n+1's narrowphase behind substep n's APGD tail, and
    the solver iterations it saves were not on the critical path. Cold-start
    APGD each substep; `integrate(warm=...)` remains for host-side callers."""

    def body(s, _):
        return step(model, s, ctrl), ()

    out, _ = jax.lax.scan(body, state, None, length=n)
    return out
