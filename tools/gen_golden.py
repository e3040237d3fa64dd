"""Generate golden fixtures from the reference robosuite + MuJoCo.

Runs the REAL reference stack (robosuite 1.5.2 + MuJoCo C engine) on Lift/
Panda/OSC_POSE and records everything the TPU build needs for parity tests:

  * the merged world's compiled constants (body tree, qpos0, actuator meta)
  * a rollout: per-policy-step actions + per-substep states and the
    controller-internal quantities (M, J, bias, torques) at each policy step

Output: tests/fixtures/<name>.npz — committed, so tests don't need the
reference at runtime.

Environment notes: numba is absent (shimmed — robosuite only uses it as an
optional jit decorator) and a few visual-only .obj meshes are missing from
the reference checkout (stripped from the XML before MuJoCo compile; they
carry no physics).
"""

from __future__ import annotations

import io
import os
import sys
import types
import xml.etree.ElementTree as ET

import numpy as np

# --- numba shim (reference utils/numba.py only needs jit) -------------------
numba = types.ModuleType("numba")


def _jit(*a, **k):
    if len(a) == 1 and callable(a[0]):
        return a[0]

    def deco(f):
        return f

    return deco


numba.jit = _jit
sys.modules["numba"] = numba

sys.path.insert(0, "/root/reference")

import robosuite  # noqa: E402
from robosuite.models import base as rs_base  # noqa: E402

# --- strip missing mesh assets before compile --------------------------------
_orig_get_model = rs_base.MujocoXML.get_model


def _patched_get_model(self, mode="mujoco"):
    # missing visual-only mesh files -> substitute an existing placeholder
    # mesh so geom names survive (physics-neutral: visual geoms only)
    existing = None
    for asset in self.asset.findall("mesh"):
        f = asset.get("file")
        if f is not None and os.path.exists(f):
            existing = f
            break
    for asset in self.asset.findall("mesh"):
        f = asset.get("file")
        if f is not None and not os.path.exists(f):
            asset.set("file", existing)
            asset.attrib.pop("scale", None)
    return _orig_get_model(self, mode)


rs_base.MujocoXML.get_model = _patched_get_model

import mujoco  # noqa: E402

# --- mj_fullM signature shim (mujoco >= 3.10 takes (m, d, dst)) -------------
from robosuite.utils import binding_utils as _bu  # noqa: E402

_LAST_DATA = {}
_orig_mjdata_init = _bu.MjData.__init__


def _patched_mjdata_init(self, model):
    _orig_mjdata_init(self, model)
    _LAST_DATA["d"] = self._data


_bu.MjData.__init__ = _patched_mjdata_init

_real_fullM = mujoco.mj_fullM


def _fullM_shim(m, dst, qM=None):
    # reference controller.py:226-229 calls (model, dst, d.qM)
    _real_fullM(m, _LAST_DATA["d"], dst)


mujoco.mj_fullM = _fullM_shim


def record_env(env_name="Lift", robot="Panda", n_policy_steps=40, seed=17, out=None):
    np.random.seed(seed)
    env = robosuite.make(
        env_name,
        robots=robot,
        has_renderer=False,
        has_offscreen_renderer=False,
        use_camera_obs=False,
        reward_shaping=True,
        seed=seed,
    )
    env.reset()
    sim = env.sim
    m = sim.model._model

    # deterministic object placement for replay: record post-reset state
    state0 = sim.get_state().flatten()

    robot0 = env.robots[0]
    cc = robot0.composite_controller
    arm_ctrl = cc.part_controllers["right"]

    rng = np.random.default_rng(seed)
    actions = rng.uniform(-1, 1, size=(n_policy_steps, env.action_dim))

    nsub = int(env.control_timestep / env.model_timestep)
    nq, nv = m.nq, m.nv

    qpos_traj = np.zeros((n_policy_steps * nsub + 1, nq))
    qvel_traj = np.zeros((n_policy_steps * nsub + 1, nv))
    ctrl_traj = np.zeros((n_policy_steps * nsub, m.nu))
    qfrc_bias_traj = []
    M_traj = []
    J_traj = []
    eef_traj = []  # site pos + mat + velp + velr at policy steps
    torques_traj = []  # arm controller output at policy steps
    rewards = np.zeros(n_policy_steps)

    qpos_traj[0] = sim.data.qpos.copy()
    qvel_traj[0] = sim.data.qvel.copy()

    k = 0
    for t in range(n_policy_steps):
        # mirror MujocoEnv.step's substep loop (environments/base.py:494-505)
        obs, r, done, info = env.step(actions[t])
        rewards[t] = r
        # record controller internals after the step's last update
        qfrc_bias_traj.append(arm_ctrl.torque_compensation.copy())
        M_traj.append(arm_ctrl.mass_matrix.copy())
        J_traj.append(arm_ctrl.J_full.copy())
        torques_traj.append(np.array(arm_ctrl.torques))
        sid = sim.model.site_name2id(arm_ctrl.ref_name)
        eef_traj.append(
            np.concatenate(
                [
                    sim.data.site_xpos[sid],
                    sim.data.site_xmat[sid],
                    sim.data.get_site_xvelp(arm_ctrl.ref_name),
                    sim.data.get_site_xvelr(arm_ctrl.ref_name),
                ]
            )
        )
        qpos_traj[(t + 1) * nsub] = sim.data.qpos.copy()
        qvel_traj[(t + 1) * nsub] = sim.data.qvel.copy()

    # also roll a pure-substep trace with fixed ctrl for engine-level parity
    sim.set_state_from_flattened(state0)
    sim.forward()
    sub_qpos = [sim.data.qpos.copy()]
    sub_qvel = [sim.data.qvel.copy()]
    fixed_ctrl = np.zeros(m.nu)
    for i in range(50):
        sim.data.ctrl[:] = fixed_ctrl
        sim.step()
        sub_qpos.append(sim.data.qpos.copy())
        sub_qvel.append(sim.data.qvel.copy())

    names = dict(
        body_names=[m.body(i).name for i in range(m.nbody)],
        joint_names=[m.joint(i).name for i in range(m.njnt)],
        actuator_names=[m.actuator(i).name for i in range(m.nu)],
        site_names=[m.site(i).name for i in range(m.nsite)],
    )

    out = out or f"tests/fixtures/{env_name.lower()}_{robot.lower()}.npz"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(
        out,
        state0=state0,
        actions=actions,
        rewards=rewards,
        qpos_policy=qpos_traj[:: nsub],
        qvel_policy=qvel_traj[:: nsub],
        qfrc_bias=np.array(qfrc_bias_traj),
        M=np.array(M_traj),
        J=np.array(J_traj),
        torques=np.array(torques_traj),
        eef=np.array(eef_traj),
        sub_qpos=np.array(sub_qpos),
        sub_qvel=np.array(sub_qvel),
        qpos0=m.qpos0.copy(),
        body_parentid=m.body_parentid.copy(),
        body_pos=m.body_pos.copy(),
        body_quat=m.body_quat.copy(),
        body_mass=m.body_mass.copy(),
        body_ipos=m.body_ipos.copy(),
        body_inertia=m.body_inertia.copy(),
        jnt_qposadr=m.jnt_qposadr.copy(),
        jnt_dofadr=m.jnt_dofadr.copy(),
        dof_damping=m.dof_damping.copy(),
        dof_armature=m.dof_armature.copy(),
        dof_frictionloss=m.dof_frictionloss.copy(),
        nsub=nsub,
        init_qpos=np.array(robot0.init_qpos),
        **{f"names_{k2}": np.array(v) for k2, v in names.items()},
    )
    # dump merged xml beside it for inspection
    with open(out.replace(".npz", ".xml"), "w") as f:
        f.write(env.sim.model.get_xml())
    print("wrote", out, "nq", nq, "nv", nv, "nsub", nsub)
    print("bodies:", names["body_names"])


def record_controller_probe(env_name="Lift", robot="Panda", n_probes=64, seed=23, out=None, states="random"):
    """Isolated OSC probe: random states -> reference controller torques.

    For each probe: set (qpos, qvel), forward, robot.control(action,
    policy_step=True), record the controller's cached state and output
    torques. This is the direct oracle for the BASELINE torque-parity
    metric (OSC law given matching robot state).
    """
    env = robosuite.make(
        env_name, robots=robot, has_renderer=False, has_offscreen_renderer=False,
        use_camera_obs=False, seed=seed,
    )
    env.reset()
    sim = env.sim
    robot0 = env.robots[0]
    cc = robot0.composite_controller
    arm_ctrl = cc.part_controllers["right"]
    grip_ctrl = cc.part_controllers["right_gripper"]

    rng = np.random.default_rng(seed)
    jr = sim.model._model.jnt_range[:7].copy()
    recs = {k: [] for k in (
        "qpos", "qvel", "action", "torques", "goal_pos", "goal_ori", "origin_pos", "origin_ori",
        "M", "J", "bias", "ref_pos", "ref_ori", "ref_velp", "ref_velr", "initial_joint", "ctrl_out",
    )}
    for k in range(n_probes):
        if states == "rollout":
            # operational configs: advance the env with a random policy and
            # probe at the visited states (the BASELINE protocol regime)
            env.step(rng.uniform(-1, 1, env.action_dim))
            qpos = sim.data.qpos.copy()
            qvel = sim.data.qvel.copy()
        else:
            qpos = sim.data.qpos.copy()
            # arm joints uniform within 80% of limits; fingers random
            lo, hi = jr[:, 0], jr[:, 1]
            mid, half = 0.5 * (lo + hi), 0.4 * (hi - lo)
            qpos[:7] = mid + rng.uniform(-1, 1, 7) * half
            qpos[7] = rng.uniform(0.0, 0.04)
            qpos[8] = rng.uniform(-0.04, 0.0)
            qvel = rng.uniform(-0.5, 0.5, sim.model._model.nv)
        sim.data.qpos[:] = qpos
        sim.data.qvel[:] = qvel
        sim.forward()
        action = rng.uniform(-1, 1, env.action_dim)
        # reset goal state so each probe is independent
        arm_ctrl.goal_pos = None
        arm_ctrl.goal_ori = None
        arm_ctrl.new_update = True
        robot0.control(action, policy_step=True)
        recs["qpos"].append(qpos.copy())
        recs["qvel"].append(qvel.copy())
        recs["action"].append(action.copy())
        recs["torques"].append(np.array(arm_ctrl.torques))
        recs["goal_pos"].append(np.array(arm_ctrl.goal_pos))
        recs["goal_ori"].append(np.array(arm_ctrl.goal_ori))
        recs["origin_pos"].append(np.array(arm_ctrl.origin_pos))
        recs["origin_ori"].append(np.array(arm_ctrl.origin_ori))
        recs["M"].append(arm_ctrl.mass_matrix.copy())
        recs["J"].append(arm_ctrl.J_full.copy())
        recs["bias"].append(arm_ctrl.torque_compensation.copy())
        recs["ref_pos"].append(np.array(arm_ctrl.ref_pos))
        recs["ref_ori"].append(np.array(arm_ctrl.ref_ori_mat))
        recs["ref_velp"].append(np.array(arm_ctrl.ref_pos_vel))
        recs["ref_velr"].append(np.array(arm_ctrl.ref_ori_vel))
        recs["initial_joint"].append(np.array(arm_ctrl.initial_joint))
        recs["ctrl_out"].append(sim.data.ctrl.copy())

    out = out or f"tests/fixtures/osc_probe_{robot.lower()}.npz"
    np.savez_compressed(out, **{k: np.array(v) for k, v in recs.items()})
    print("wrote", out, "probes", n_probes)


if __name__ == "__main__":
    record_env()
    record_controller_probe()
    record_controller_probe(states="rollout", out="tests/fixtures/osc_probe_panda_rollout.npz")
