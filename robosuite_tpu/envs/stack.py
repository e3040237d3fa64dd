"""Stack: stack the red cube (A) on the green cube (B).

Re-derivation of reference environments/manipulation/stack.py: model
(:313-400), staged rewards (:224-312), success (:485-493).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from robosuite_tpu.envs.base import RobotEnv, register_env
from robosuite_tpu.models.arenas import TableArena
from robosuite_tpu.models.objects import BoxObject
from robosuite_tpu.models.tasks import ManipulationTask
from robosuite_tpu.utils.placement import PlacementSpec, sample_placements


@register_env
class Stack(RobotEnv):
    def __init__(
        self,
        robots="Panda",
        table_full_size=(0.8, 0.8, 0.05),
        table_friction=(1.0, 0.005, 0.0001),
        reward_scale=1.0,
        reward_shaping=False,
        **kwargs,
    ):
        self.table_full_size = np.array(table_full_size)
        self.table_friction = table_friction
        self.table_offset = np.array((0, 0, 0.8))
        super().__init__(robots=robots, reward_scale=reward_scale, reward_shaping=reward_shaping, **kwargs)

    def _load_model(self):
        rm = self.robot_models[0]
        rm.set_base_xpos(rm.base_xpos_offset["table"](self.table_full_size[0]))
        arena = TableArena(
            table_full_size=self.table_full_size,
            table_friction=self.table_friction,
            table_offset=self.table_offset,
        )
        # reference stack.py:355-370: fixed sizes
        self.cubeA = BoxObject(name="cubeA", size=[0.02, 0.02, 0.02], rgba=[1, 0, 0, 1])
        self.cubeB = BoxObject(name="cubeB", size=[0.025, 0.025, 0.025], rgba=[0, 1, 0, 1])
        self.task = ManipulationTask(arena, self.robot_models, [self.cubeA, self.cubeB])

    def _setup_references(self):
        m = self.model
        self.cubeA_body_id = m.body_name2id(self.cubeA.root_body)
        self.cubeB_body_id = m.body_name2id(self.cubeB.root_body)
        self.table_top_z = float(self.table_offset[2])
        self.eef_site = self.robots[0].eef_site_id["right"]
        self._graspA_rows = self.grasp_rows(0, "right", self.cubeA.contact_geoms)
        self._touchAB_rows = self._contact_rows(self.cubeA.contact_geoms, self.cubeB.contact_geoms)
        self._placements = [
            PlacementSpec(
                name=obj.name,
                qpos_start=m.jnt_qpos_slice(f"{obj.name}_joint0").start,
                x_range=(-0.08, 0.08),
                y_range=(-0.08, 0.08),
                rotation=None,
                reference_pos=tuple(self.table_offset),
                z_offset=0.01,
                bottom_offset=float(obj.bottom_offset[2]),
                horizontal_radius=obj.horizontal_radius,
            )
            for obj in (self.cubeA, self.cubeB)
        ]

    def _sample_placements(self, rng):
        return sample_placements(self._placements, rng)

    def _staged_rewards(self, kin):
        """reference stack.py:268-312."""
        cubeA_pos = kin.xpos[self.cubeA_body_id]
        cubeB_pos = kin.xpos[self.cubeB_body_id]
        dist = jnp.linalg.norm(kin.site_xpos[self.eef_site] - cubeA_pos)
        grasping = self.check_grasp(kin, *self._graspA_rows)
        r_reach = (1.0 - jnp.tanh(10.0 * dist)) * 0.25 + jnp.where(grasping, 0.25, 0.0)

        lifted = cubeA_pos[2] > self.table_top_z + 0.04
        horiz = jnp.linalg.norm(cubeA_pos[:2] - cubeB_pos[:2])
        r_lift = jnp.where(lifted, 1.0 + 0.5 * (1.0 - jnp.tanh(horiz)), 0.0)

        touching = self._any_contact(kin, self._touchAB_rows)
        r_stack = jnp.where((~grasping) & (r_lift > 0) & touching, 2.0, 0.0)
        return r_reach, r_lift, r_stack

    def _check_success(self, physics, kin):
        _, _, r_stack = self._staged_rewards(kin)
        return r_stack > 0

    def reward(self, obs, physics, kin):
        r_reach, r_lift, r_stack = self._staged_rewards(kin)
        if self.reward_shaping:
            r = jnp.maximum(jnp.maximum(r_reach, r_lift), r_stack)
        else:
            r = jnp.where(r_stack > 0, 2.0, 0.0)
        if self.reward_scale is not None:
            r = r * self.reward_scale / 2.0
        return r

    def _get_observations(self, physics, kin):
        robot = self.robots[0]
        qp = physics.qpos[jnp.asarray(robot.arm_qpos_idx["right"])]
        qv = physics.qvel[jnp.asarray(robot.arm_qvel_idx["right"])]
        from robosuite_tpu.utils import transforms as T

        eef_pos = kin.site_xpos[self.eef_site]
        cubeA_pos = kin.xpos[self.cubeA_body_id]
        cubeB_pos = kin.xpos[self.cubeB_body_id]
        return {
            "robot0_joint_pos": qp,
            "robot0_joint_pos_cos": jnp.cos(qp),
            "robot0_joint_pos_sin": jnp.sin(qp),
            "robot0_joint_vel": qv,
            "robot0_eef_pos": eef_pos,
            "robot0_eef_quat": T.convert_quat(T.mat2quat_wxyz(kin.site_xmat[self.eef_site]), to="xyzw"),
            "robot0_gripper_qpos": physics.qpos[jnp.asarray(robot.gripper_joint_qpos_idx["right"])],
            "robot0_gripper_qvel": physics.qvel[jnp.asarray(robot.gripper_joint_qvel_idx["right"])],
            "cubeA_pos": cubeA_pos,
            "cubeA_quat": T.convert_quat(kin.xquat[self.cubeA_body_id], to="xyzw"),
            "cubeB_pos": cubeB_pos,
            "cubeB_quat": T.convert_quat(kin.xquat[self.cubeB_body_id], to="xyzw"),
            "cubeA_to_cubeB": cubeB_pos - cubeA_pos,
            "gripper_to_cubeA": cubeA_pos - eef_pos,
            "gripper_to_cubeB": cubeB_pos - eef_pos,
        }
