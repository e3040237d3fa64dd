"""Lift: lift a cube above the table.

Re-derivation of reference environments/manipulation/lift.py: model
composition (:275-343), reward (:224-273), success (:433-443), placement
(:401-415 via UniformRandomSampler), observables (:356-431).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from robosuite_tpu.envs.base import RobotEnv, register_env
from robosuite_tpu.models.arenas import TableArena
from robosuite_tpu.models.objects import BoxObject
from robosuite_tpu.models.tasks import ManipulationTask
from robosuite_tpu.utils import transforms as T


@register_env
class Lift(RobotEnv):
    def __init__(
        self,
        robots="Panda",
        table_full_size=(0.8, 0.8, 0.05),
        table_friction=(1.0, 0.005, 0.0001),
        reward_scale=1.0,
        reward_shaping=False,
        placement_rng_x=(-0.03, 0.03),
        placement_rng_y=(-0.03, 0.03),
        cube_size=None,
        seed=None,
        **kwargs,
    ):
        self.table_full_size = np.array(table_full_size)
        self.table_friction = table_friction
        self.table_offset = np.array((0, 0, 0.8))
        self.placement_rng_x = placement_rng_x
        self.placement_rng_y = placement_rng_y
        self._cube_size = cube_size
        self._model_rng = np.random.default_rng(seed)
        super().__init__(robots=robots, reward_scale=reward_scale, reward_shaping=reward_shaping, **kwargs)

    def _load_model(self):
        # reference lift.py:275-343
        rm = self.robot_models[0]
        rm.set_base_xpos(rm.base_xpos_offset["table"](self.table_full_size[0]))

        arena = TableArena(
            table_full_size=self.table_full_size,
            table_friction=self.table_friction,
            table_offset=self.table_offset,
        )
        arena.set_origin([0, 0, 0])

        if self._cube_size is not None:
            self.cube = BoxObject(name="cube", size=self._cube_size, rgba=[1, 0, 0, 1])
        else:
            self.cube = BoxObject(
                name="cube",
                size_min=[0.020, 0.020, 0.020],
                size_max=[0.022, 0.022, 0.022],
                rgba=[1, 0, 0, 1],
                rng=self._model_rng,
            )
        self.task = ManipulationTask(arena, self.robot_models, self.cube)

    def _setup_references(self):
        m = self.model
        self.cube_body_id = m.body_name2id(self.cube.root_body)
        self.cube_geom_id = m.geom_name2id("cube_g0")
        self.cube_qpos_slice = m.jnt_qpos_slice("cube_joint0")
        self.table_top_z = float(self.table_offset[2])
        robot = self.robots[0]
        self.eef_site = robot.eef_site_id["right"]
        self._grasp_rows = self.grasp_rows(0, "right", self.cube.contact_geoms)

    # -- placement (reference UniformRandomSampler, vectorized) ---------------
    def _sample_placements(self, rng):
        k1, k2, k3, k_next = jax.random.split(rng, 4)
        x = jax.random.uniform(k1, (), minval=self.placement_rng_x[0], maxval=self.placement_rng_x[1])
        y = jax.random.uniform(k2, (), minval=self.placement_rng_y[0], maxval=self.placement_rng_y[1])
        # rotation=None -> uniform z rotation (reference placement_samplers.py:168-185)
        rot = jax.random.uniform(k3, (), minval=0.0, maxval=2 * jnp.pi)
        half = jnp.cos(rot / 2), jnp.sin(rot / 2)
        z = self.table_top_z + float(-self.cube.bottom_offset[2]) + 0.01  # z_offset=0.01 (lift.py:333)
        sl = self.cube_qpos_slice
        idx = jnp.arange(sl.start, sl.stop)
        vals = jnp.stack([
            x + self.table_offset[0], y + self.table_offset[1], jnp.asarray(z),
            half[0], jnp.asarray(0.0), jnp.asarray(0.0), half[1],
        ])
        return idx, vals, k_next

    # -- observables (reference lift.py:356-431 + robot proprio) --------------
    def _get_observations(self, physics, kin):
        robot = self.robots[0]
        qp = physics.qpos[jnp.asarray(robot.arm_qpos_idx["right"])]
        qv = physics.qvel[jnp.asarray(robot.arm_qvel_idx["right"])]
        eef_pos = kin.site_xpos[self.eef_site]
        eef_quat_wxyz = T.mat2quat_wxyz(kin.site_xmat[self.eef_site])
        cube_pos = kin.xpos[self.cube_body_id]
        cube_quat = kin.xquat[self.cube_body_id]
        gq = physics.qpos[jnp.asarray(robot.gripper_joint_qpos_idx["right"])]
        gv = physics.qvel[jnp.asarray(robot.gripper_joint_qvel_idx["right"])]
        obs = {
            "robot0_joint_pos": qp,
            "robot0_joint_pos_cos": jnp.cos(qp),
            "robot0_joint_pos_sin": jnp.sin(qp),
            "robot0_joint_vel": qv,
            "robot0_eef_pos": eef_pos,
            "robot0_eef_quat": T.convert_quat(eef_quat_wxyz, to="xyzw"),
            "robot0_gripper_qpos": gq,
            "robot0_gripper_qvel": gv,
            "cube_pos": cube_pos,
            "cube_quat": T.convert_quat(cube_quat, to="xyzw"),
            "gripper_to_cube_pos": eef_pos - cube_pos,
        }
        return obs

    # -- grasp check (reference manipulation_env.py:331-376) -------------------
    def _check_grasp(self, kin):
        return self.check_grasp(kin, *self._grasp_rows)

    # -- reward / success (reference lift.py:224-273, :433-443) ----------------
    def _check_success(self, physics, kin):
        cube_height = kin.xpos[self.cube_body_id][2]
        return cube_height > self.table_top_z + 0.04

    def reward(self, obs, physics, kin):
        success = self._check_success(physics, kin)
        r_sparse = jnp.where(success, 2.25, 0.0)
        if self.reward_shaping:
            dist = jnp.linalg.norm(kin.site_xpos[self.eef_site] - kin.xpos[self.cube_body_id])
            reaching = 1.0 - jnp.tanh(10.0 * dist)
            grasping = jnp.where(self._check_grasp(kin), 0.25, 0.0)
            r = jnp.where(success, 2.25, reaching + grasping)
        else:
            r = r_sparse
        if self.reward_scale is not None:
            r = r * self.reward_scale / 2.25
        return r
