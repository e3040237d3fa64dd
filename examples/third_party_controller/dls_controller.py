"""Third-party composite controller example: damped-least-squares WBC.

The analog of the reference's examples/third_party_controller/
mink_controller.py (WholeBodyMinkIK, 726 LoC): an EXTERNAL module plugs a
custom whole-body controller into the framework through the public
registration API — no framework edits required.

Registration surface (reference @register_composite_controller,
controllers/composite/composite_controller.py:15-27): decorate a policy-rate
goal transform; the framework's per-arm JOINT_POSITION part controllers
track the returned joint goals at substep rate, exactly how the built-in
WHOLE_BODY_IK composite integrates (robots/robot.py _set_goals_wbik).

Usage:
    import examples.third_party_controller.dls_controller  # registers
    env = robosuite_tpu.make(
        "Lift", robots="Panda",
        controller_configs={
            "type": "WHOLE_BODY_DLS",
            "composite_controller_specific_configs": {"damping": 0.1},
        },
    )

Run directly for a quick closed-loop demo:
    python examples/third_party_controller/dls_controller.py
"""

from __future__ import annotations

import jax.numpy as jnp

from robosuite_tpu.controllers.composite.composite_controller import (
    register_composite_controller,
)
from robosuite_tpu.ops import linalg as fastla


@register_composite_controller("WHOLE_BODY_DLS", arm_action_dim=6)
def dls_goal_fn(robot, kin, qpos, qvel, targets, cfg):
    """Per-arm damped-least-squares differential IK.

    targets[arm] = (6,) delta twist [dpos (3), axis-angle dori (3)] about
    the current eef pose. Returns {arm: goal_qpos} joint-position goals.
    dq = J^T (J J^T + lambda^2 I)^-1 e  — the classic DLS update (the same
    core as reference utils/ik_utils.py:226 solve, without the nullspace
    terms the built-in WHOLE_BODY_IK already provides).
    """
    from robosuite_tpu.physics import kinematics

    damping = float(cfg.get("damping", 0.05))
    gain = float(cfg.get("gain", 1.0))
    goals = {}
    for arm, a in targets.items():
        jacp, jacr = kinematics.site_jacobian(robot.model, kin, robot.eef_site_id[arm])
        qv = jnp.asarray(robot.arm_qvel_idx[arm])
        J = jnp.concatenate([jacp[:, qv], jacr[:, qv]])  # (6, na)
        e = gain * a  # delta twist straight from the action
        JJt = J @ J.T + (damping**2) * jnp.eye(6, dtype=qpos.dtype)
        dq = J.T @ fastla.solve_spd(JJt, e)
        goals[arm] = qpos[jnp.asarray(robot.arm_qpos_idx[arm])] + dq
    return goals


if __name__ == "__main__":
    import jax
    import numpy as np

    import robosuite_tpu

    env = robosuite_tpu.make(
        "Lift", robots="Panda",
        controller_configs={"type": "WHOLE_BODY_DLS"},
    )
    state, obs = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env._step_impl)
    act = np.zeros(env.action_dim, dtype=np.float32)
    act[0] = 0.05  # push the eef forward (+x)
    p0 = None
    for t in range(10):
        state, obs, reward, done, info = step(state, jnp.asarray(act))
        p = np.asarray(obs["robot0_eef_pos"])
        p0 = p if p0 is None else p0
        print(f"t={t} eef={p.round(4)} reward={float(reward):.4f}")
    print("eef +x displacement:", float(p[0] - p0[0]))
