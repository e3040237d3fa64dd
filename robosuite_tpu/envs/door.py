"""Door: open a door by its handle.

Re-derivation of reference environments/manipulation/door.py: model
(:270-325), reward (:219-266), success hinge_qpos > 0.3 (:426-433).

Note: the reference randomizes the door's *body pose* at reset by mutating
the compiled model (door.py:420-423). The frozen-model TPU build samples
the door pose once at construction (host-side, seedable); per-scenario
model-parameter batching arrives with the domain-randomization subsystem.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from robosuite_tpu.envs.base import RobotEnv, register_env
from robosuite_tpu.models.arenas import TableArena
from robosuite_tpu.models.objects.xml_objects import DoorObject
from robosuite_tpu.models.tasks import ManipulationTask
from robosuite_tpu.utils import transforms as T


@register_env
class Door(RobotEnv):
    def __init__(
        self,
        robots="Panda",
        use_latch=True,
        reward_scale=1.0,
        reward_shaping=False,
        seed=None,
        **kwargs,
    ):
        self.use_latch = use_latch
        self.table_full_size = (0.8, 0.3, 0.05)
        self.table_offset = np.array((-0.2, -0.35, 0.8))
        self._model_rng = np.random.default_rng(seed)
        super().__init__(robots=robots, reward_scale=reward_scale, reward_shaping=reward_shaping, **kwargs)

    def _load_model(self):
        rm = self.robot_models[0]
        rm.set_base_xpos(rm.base_xpos_offset["table"](self.table_full_size[0]))
        arena = TableArena(
            table_full_size=self.table_full_size,
            table_offset=self.table_offset,
        )
        self.door = DoorObject(name="Door", friction=0.0, damping=0.1, lock=self.use_latch)
        root = self.door.get_obj()
        # placement: x [0.07, 0.09], y [-0.01, 0.01], z-rot [-pi/2-0.25, -pi/2]
        # relative to the table (reference door.py:306-318), sampled host-side
        x = self._model_rng.uniform(0.07, 0.09) + self.table_offset[0]
        y = self._model_rng.uniform(-0.01, 0.01) + self.table_offset[1]
        rot = self._model_rng.uniform(-np.pi / 2.0 - 0.25, -np.pi / 2.0)
        root.pos = np.array([x, y, self.table_offset[2] + 0.3])
        root.quat = np.array([np.cos(rot / 2), 0.0, 0.0, np.sin(rot / 2)])
        self.task = ManipulationTask(arena, self.robot_models, self.door)

    def _setup_references(self):
        m = self.model
        self.door_body_id = m.body_name2id(self.door.door_body)
        self.handle_site_id = m.site_name2id(self.door.important_sites["handle"])
        self.hinge_qpos_addr = m.jnt_qpos_slice(self.door.hinge_joint).start
        if self.use_latch:
            self.handle_qpos_addr = m.jnt_qpos_slice(self.door.latch_joint).start
        self.eef_site = self.robots[0].eef_site_id["right"]

    def _check_success(self, physics, kin):
        return physics.qpos[self.hinge_qpos_addr] > 0.3

    def reward(self, obs, physics, kin):
        success = self._check_success(physics, kin)
        if self.reward_shaping:
            dist = jnp.linalg.norm(kin.site_xpos[self.handle_site_id] - kin.site_xpos[self.eef_site])
            r = 0.25 * (1.0 - jnp.tanh(10.0 * dist))
            if self.use_latch:
                handle_qpos = physics.qpos[self.handle_qpos_addr]
                r = r + jnp.clip(0.25 * jnp.abs(handle_qpos / (0.5 * jnp.pi)), -0.25, 0.25)
            r = jnp.where(success, 1.0, r)
        else:
            r = jnp.where(success, 1.0, 0.0)
        if self.reward_scale is not None:
            r = r * self.reward_scale / 1.0
        return r

    def _get_observations(self, physics, kin):
        robot = self.robots[0]
        qp = physics.qpos[jnp.asarray(robot.arm_qpos_idx["right"])]
        qv = physics.qvel[jnp.asarray(robot.arm_qvel_idx["right"])]
        eef_pos = kin.site_xpos[self.eef_site]
        handle_pos = kin.site_xpos[self.handle_site_id]
        obs = {
            "robot0_joint_pos": qp,
            "robot0_joint_pos_cos": jnp.cos(qp),
            "robot0_joint_pos_sin": jnp.sin(qp),
            "robot0_joint_vel": qv,
            "robot0_eef_pos": eef_pos,
            "robot0_eef_quat": T.convert_quat(T.mat2quat_wxyz(kin.site_xmat[self.eef_site]), to="xyzw"),
            "robot0_gripper_qpos": physics.qpos[jnp.asarray(robot.gripper_joint_qpos_idx["right"])],
            "robot0_gripper_qvel": physics.qvel[jnp.asarray(robot.gripper_joint_qvel_idx["right"])],
            "door_pos": kin.xpos[self.door_body_id],
            "handle_pos": handle_pos,
            "door_to_eef_pos": kin.xpos[self.door_body_id] - eef_pos,
            "handle_to_eef_pos": handle_pos - eef_pos,
            "hinge_qpos": physics.qpos[self.hinge_qpos_addr][None],
        }
        if self.use_latch:
            obs["handle_qpos"] = physics.qpos[self.handle_qpos_addr][None]
        return obs
