"""Generate golden IK_POSE fixtures from the reference robosuite + MuJoCo.

At a set of rollout states of the reference Lift env, calls the REAL
reference IK solve (controllers/parts/arm/ik.py:209-302
InverseKinematicsController.compute_joint_positions, single-site delta
branch) with deterministic sampled 6-dim deltas, recording everything the
TPU parity test needs: the site Jacobian over the arm dofs, the current /
initial joints, the raw action, the clipped (dpos, drot) inputs, and the
reference q_des output.

Output: tests/fixtures/ik_probe_<robot>.npz — committed, so
tests/test_ik_parity.py doesn't need the reference at runtime.

Run: python tools/gen_golden_ik.py   (requires /root/reference on disk)
"""

from __future__ import annotations

import os
import sys
import types

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

# --- strip missing mesh assets before compile (same shim as gen_golden) -----
_orig_get_model = rs_base.MujocoXML.get_model


def _patched_get_model(self, mode="mujoco"):
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

# --- mj_fullM signature shim (mujoco >= 3.10 takes (m, d, dst); the
# reference binding_utils calls the old (m, dst, qM) form) -------------------
from robosuite.utils import binding_utils as _bu  # noqa: E402

_LAST_DATA = {}
_orig_mjdata_init = _bu.MjData.__init__


def _patched_mjdata_init(self, model):
    _orig_mjdata_init(self, model)
    _LAST_DATA["d"] = self._data


_bu.MjData.__init__ = _patched_mjdata_init

_real_fullM = mujoco.mj_fullM


def _fullM_shim(m, dst, qM=None):
    _real_fullM(m, _LAST_DATA["d"], dst)


mujoco.mj_fullM = _fullM_shim

import robosuite.utils.transform_utils as T  # noqa: E402
from robosuite.controllers.parts.arm.ik import InverseKinematicsController  # noqa: E402


def record_ik(robot="Panda", n_states=12, deltas_per_state=4, seed=23, out=None):
    np.random.seed(seed)
    env = robosuite.make(
        "Lift", robots=robot,
        has_renderer=False, has_offscreen_renderer=False,
        use_camera_obs=False, reward_shaping=True, seed=seed,
    )
    env.reset()
    sim = env.sim
    m = sim.model._model
    d = sim.data._data

    robot0 = env.robots[0]
    arm_ctrl = robot0.composite_controller.part_controllers["right"]
    dof_ids = np.asarray(arm_ctrl.qvel_index)
    ref_name = arm_ctrl.ref_name
    sid = sim.model.site_name2id(ref_name)
    initial_joint = np.asarray(arm_ctrl.initial_joint, dtype=np.float64)

    ik_pos_limit, ik_ori_limit = 0.02, 0.05  # parts/ik_pose.json

    rng = np.random.default_rng(seed)
    rows = dict(J=[], q=[], actions=[], dpos=[], drot=[], q_des=[])

    for s in range(n_states):
        # advance to a fresh state with random OSC actions
        for _ in range(3):
            env.step(rng.uniform(-1, 1, size=env.action_dim))
        for _ in range(deltas_per_state):
            action = rng.uniform(-1, 1, size=6)
            # reference _clip_ik_input (ik.py:476-508)
            dpos, _ = T.clip_translation(action[:3].copy(), ik_pos_limit)
            quat = T.axisangle2quat(action[3:6])
            quat, _ = T.clip_rotation(quat, ik_ori_limit)
            drot = T.quat2mat(quat)

            jac = np.zeros((6, m.nv), dtype=np.float64)
            mujoco.mj_jacSite(m, d, jac[:3], jac[3:], sid)
            J = jac[:, dof_ids].copy()

            q_des = InverseKinematicsController.compute_joint_positions(
                sim, initial_joint, dof_ids, ref_name, env.robots[0].control_freq,
                [-1, 1], use_delta=True, dpos=dpos, drot=drot,
            )
            rows["J"].append(J)
            rows["q"].append(d.qpos[dof_ids].copy())
            rows["actions"].append(action)
            rows["dpos"].append(dpos)
            rows["drot"].append(drot)
            rows["q_des"].append(np.asarray(q_des))

    out = out or f"tests/fixtures/ik_probe_{robot.lower()}.npz"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(
        out,
        initial_joint=initial_joint,
        **{k: np.asarray(v) for k, v in rows.items()},
    )
    print(f"wrote {out}: {len(rows['J'])} probes, dof={len(dof_ids)}")


if __name__ == "__main__":
    for robot in ("Panda", "Sawyer"):
        record_ik(robot)
