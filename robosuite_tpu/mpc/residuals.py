"""Planning residuals for the BASELINE.json MPC configs.

Each residual r(env, plan_model, qpos, qvel, u) -> (m,) defines the stage
cost 0.5||r||^2 consumed by the iLQR refinement and usable as a smooth
planning objective. They are least-squares stand-ins for the env rewards —
same targets, differentiable-everywhere form (the reference rewards mix
tanh/step terms):

  config 1: Lift            (receding.lift_residual; reference lift.py:224-273)
  config 2: Stack           (reference stack.py:224-283 staged_rewards)
            PickPlaceCan    (reference pick_place.py:274-372)
  config 3: Door            (reference door.py:219-268)
            NutAssembly     (reference nut_assembly.py:249-334)
  config 4: TwoArmLift      (reference two_arm_lift.py:221-300)
            TwoArmPegInHole (reference two_arm_peg_in_hole.py:240-310)
  config 5: Wipe            (force-tracking; reference wipe.py:386-505)

`residual_for(env)` resolves by env class so RecedingMPC can default to
the right planning cost for any covered task.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from robosuite_tpu.physics import kinematics


def lift_residual(env, plan_model, qpos, qvel, u):
    from robosuite_tpu.mpc.receding import lift_residual as _lift

    return _lift(env, plan_model, qpos, qvel, u)


def stack_residual(env, plan_model, qpos, qvel, u):
    """Reach cubeA, lift it above cubeB, align horizontally over cubeB
    (smooth form of stack.py staged_rewards :268-283)."""
    kin = kinematics.fk(plan_model, qpos)
    eef = kin.site_xpos[env.eef_site]
    a = kin.xpos[env.cubeA_body_id]
    b = kin.xpos[env.cubeB_body_id]
    z_target = b[2] + 0.06
    r_reach = 2.0 * (eef - a)
    r_lift = 6.0 * jnp.minimum(a[2] - z_target, 0.0)[None]
    r_align = 3.0 * (a[:2] - b[:2])
    r_vel = 0.02 * qvel
    return jnp.concatenate([r_reach, r_lift, r_align, r_vel])


def pick_place_residual(env, plan_model, qpos, qvel, u, obj_idx=0):
    """Reach the object, lift it, carry it over its target bin quadrant
    (smooth form of pick_place.py:274-372 staged rewards)."""
    kin = kinematics.fk(plan_model, qpos)
    eef = kin.site_xpos[env.eef_site]
    obj = kin.xpos[env.obj_body_ids[obj_idx]]
    target = jnp.asarray(env.target_bin_placements[obj_idx], dtype=qpos.dtype)
    z_carry = target[2] + 0.15
    r_reach = 2.0 * (eef - obj)
    r_lift = 5.0 * jnp.minimum(obj[2] - z_carry, 0.0)[None]
    r_to_bin = 2.0 * (obj[:2] - target[:2])
    r_vel = 0.02 * qvel
    return jnp.concatenate([r_reach, r_lift, r_to_bin, r_vel])


def door_residual(env, plan_model, qpos, qvel, u):
    """Reach the handle, rotate the latch, open the hinge past the success
    angle (smooth form of door.py:219-268)."""
    kin = kinematics.fk(plan_model, qpos)
    eef = kin.site_xpos[env.eef_site]
    handle = kin.site_xpos[env.handle_site_id]
    hinge = qpos[env.hinge_qpos_addr]
    r_reach = 2.0 * (eef - handle)
    r_open = 4.0 * jnp.minimum(hinge - 0.35, 0.0)[None]
    parts = [r_reach, r_open]
    if getattr(env, "use_latch", False):
        latch = qpos[env.handle_qpos_addr]
        parts.append(1.5 * jnp.minimum(latch - 1.0, 0.0)[None])
    parts.append(0.02 * qvel)
    return jnp.concatenate(parts)


def nut_assembly_residual(env, plan_model, qpos, qvel, u, nut_idx=0):
    """Reach the nut handle, lift, hover over the matching peg
    (smooth form of nut_assembly.py:249-334)."""
    kin = kinematics.fk(plan_model, qpos)
    eef = kin.site_xpos[env.eef_site]
    nut = kin.xpos[env.nut_body_ids[nut_idx]]
    peg = kin.xpos[[env.peg1_body_id, env.peg2_body_id][nut_idx]]
    z_hover = peg[2] + 0.15
    r_reach = 2.0 * (eef - nut)
    r_lift = 5.0 * jnp.minimum(nut[2] - z_hover, 0.0)[None]
    r_hover = 2.0 * (nut[:2] - peg[:2])
    r_vel = 0.02 * qvel
    return jnp.concatenate([r_reach, r_lift, r_hover, r_vel])


def two_arm_lift_residual(env, plan_model, qpos, qvel, u):
    """Both eefs to the pot handles, pot above the success height, kept
    level (smooth form of two_arm_lift.py:221-300)."""
    kin = kinematics.fk(plan_model, qpos)
    h0 = kin.site_xpos[env.handle_site_ids[0]]
    h1 = kin.site_xpos[env.handle_site_ids[1]]
    e0 = kin.site_xpos[env.eef_sites[0]]
    e1 = kin.site_xpos[env.eef_sites[1]]
    pot = kin.xpos[env.pot_body_id]
    z_target = env.table_offset[2] + 0.15
    r_reach = jnp.concatenate([2.0 * (e0 - h0), 2.0 * (e1 - h1)])
    r_lift = 6.0 * jnp.minimum(pot[2] - z_target, 0.0)[None]
    # level: pot z-axis along world z (two_arm_lift.py:480-490 tilt check)
    r_level = 2.0 * (kin.xmat[env.pot_body_id][2, 2] - 1.0)[None]
    r_vel = 0.02 * qvel
    return jnp.concatenate([r_reach, r_lift, r_level, r_vel])


def two_arm_peg_in_hole_residual(env, plan_model, qpos, qvel, u):
    """Hole-frame alignment terms t/d/cos (two_arm_peg_in_hole.py:440-487)."""
    kin = kinematics.fk(plan_model, qpos)
    t, d, cos = env._peg_alignment(kin)
    r_vel = 0.02 * qvel
    return jnp.concatenate([
        2.0 * d[None], 1.0 * jnp.abs(t)[None], 2.0 * (cos - 1.0)[None], r_vel
    ])


def wipe_residual(env, plan_model, qpos, qvel, u, press_target=0.003):
    """Force-tracking wiping cost (config #5): reach the dirt centroid in
    the table plane while holding a target tool-table penetration depth —
    the smooth planning proxy for a target pressing force (F ~ k*pen under
    the compliant contact model), plus velocity regularization. Uses the
    tool-table pair distances from a subset narrowphase (cheap: 1-2 pairs).
    """
    from robosuite_tpu.physics import contact as cmod

    kin = kinematics.fk(plan_model, qpos)
    eef = kin.site_xpos[env.eef_site]
    markers = jnp.stack([kin.xpos[b] for b in env.marker_body_ids])
    centroid = jnp.mean(markers, axis=0)
    pairs = env._rows_to_pairs(env._tool_table_rows)
    con = cmod.narrowphase(plan_model, kin, pairs=pairs)
    pen = -jnp.min(con["dist"])  # > 0 when pressing
    r_reach = 3.0 * (eef[:2] - centroid[:2])
    r_press = 40.0 * (pen - press_target)[None]
    r_vel = 0.02 * qvel
    return jnp.concatenate([r_reach, r_press, r_vel])


_RESIDUALS = {
    "Lift": lift_residual,
    "Stack": stack_residual,
    "PickPlace": pick_place_residual,
    "PickPlaceCan": lambda env, m, q, v, u: pick_place_residual(env, m, q, v, u, obj_idx=0),
    "PickPlaceSingle": pick_place_residual,
    "PickPlaceMilk": pick_place_residual,
    "PickPlaceBread": pick_place_residual,
    "PickPlaceCereal": pick_place_residual,
    "Door": door_residual,
    "NutAssembly": nut_assembly_residual,
    "NutAssemblySingle": nut_assembly_residual,
    "NutAssemblySquare": nut_assembly_residual,
    "NutAssemblyRound": nut_assembly_residual,
    "TwoArmLift": two_arm_lift_residual,
    "TwoArmPegInHole": two_arm_peg_in_hole_residual,
    "Wipe": wipe_residual,
}


def residual_for(env):
    """Planning residual for env's class, or None when not covered."""
    return _RESIDUALS.get(type(env).__name__)
