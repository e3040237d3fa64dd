"""ToolHang: insert the hook frame into the stand, then hang the wrench.

Re-derivation of reference environments/manipulation/tool_hang.py (sparse
reward only, :217; success = frame assembled + tool on frame, :597-660).
Objects come from the shared composite library
(models/objects/composite_objects.py: StandWithMount, HookFrame,
RatchetingWrench) with the reference's functional geometry: an upright stand with a square mount cavity, an L-shaped hook
frame that inserts into it, and a wrench with a ring that hangs on the hook.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from robosuite_tpu.envs.base import RobotEnv, register_env
from robosuite_tpu.models import spec as S
from robosuite_tpu.models.arenas import TableArena
from robosuite_tpu.models.objects import MujocoObject
from robosuite_tpu.models.objects.composite_objects import (
    HookFrame,
    RatchetingWrench,
    StandWithMount,
)
from robosuite_tpu.models.tasks import ManipulationTask
from robosuite_tpu.utils import transforms as T
from robosuite_tpu.utils.placement import PlacementSpec, sample_placements


@register_env
class ToolHang(RobotEnv):
    def __init__(self, robots="Panda", reward_scale=1.0, reward_shaping=False, **kwargs):
        self.table_full_size = (0.8, 0.8, 0.05)
        self.table_offset = np.array((0, 0, 0.8))
        super().__init__(robots=robots, reward_scale=reward_scale, reward_shaping=reward_shaping, **kwargs)

    def _load_model(self):
        rm = self.robot_models[0]
        rm.set_base_xpos(rm.base_xpos_offset["table"](self.table_full_size[0]))
        arena = TableArena(table_full_size=self.table_full_size, table_offset=self.table_offset)
        self.stand = StandWithMount("stand")
        self.frame = HookFrame("frame")
        self.tool = RatchetingWrench("tool")
        self.task = ManipulationTask(arena, self.robot_models, [self.stand, self.frame, self.tool])

    def _setup_references(self):
        m = self.model
        self.stand_body_id = m.body_name2id(self.stand.root_body)
        self.frame_body_id = m.body_name2id(self.frame.root_body)
        self.tool_body_id = m.body_name2id(self.tool.root_body)
        self.frame_hang_site = m.site_name2id(self.frame.important_sites["hang"])
        self.frame_intersect_site = m.site_name2id(self.frame.important_sites["intersection"])
        self.tool_ring_site = m.site_name2id(self.tool.important_sites["ring"])
        self.eef_site = self.robots[0].eef_site_id["right"]
        specs = []
        for obj, xr, yr in (
            (self.stand, (-0.08, -0.08), (0.16, 0.16)),
            (self.frame, (-0.12, -0.08), (-0.22, -0.18)),
            (self.tool, (-0.12, -0.08), (-0.05, 0.05)),
        ):
            specs.append(
                PlacementSpec(
                    name=obj.name,
                    qpos_start=m.jnt_qpos_slice(f"{obj.name}_joint0").start,
                    x_range=xr, y_range=yr,
                    rotation=(0.0, 0.0) if obj is self.stand else None,
                    reference_pos=tuple(self.table_offset),
                    z_offset=0.001,
                    bottom_offset=float(obj.bottom_offset[2]),
                    horizontal_radius=obj.horizontal_radius,
                )
            )
        self._placements = specs

    def _sample_placements(self, rng):
        return sample_placements(self._placements, rng)

    def _check_frame_assembled(self, kin):
        """reference tool_hang.py:606-655: frame upright + inserted in the
        stand mount cavity."""
        stand_top = kin.xpos[self.stand_body_id] + jnp.asarray([0.0, 0.0, 0.21])
        insert = kin.site_xpos[self.frame_intersect_site]
        frame_up = kin.xmat[self.frame_body_id][:, 2]
        upright = frame_up[2] > 0.9
        horiz = jnp.linalg.norm(insert[:2] - stand_top[:2]) < 0.03
        vert = jnp.abs(insert[2] - stand_top[2]) < 0.15
        return upright & horiz & vert

    def _check_tool_on_frame(self, kin):
        """Tool ring around the hook tip + hanging (below the hang site)."""
        hang = kin.site_xpos[self.frame_hang_site]
        ring = kin.site_xpos[self.tool_ring_site]
        near = jnp.linalg.norm(ring[:2] - hang[:2]) < 0.03
        below = (hang[2] - ring[2] > 0.0) & (hang[2] - ring[2] < 0.15)
        return near & below

    def _check_success(self, physics, kin):
        return self._check_frame_assembled(kin) & self._check_tool_on_frame(kin)

    def reward(self, obs, physics, kin):
        """Sparse only (reference tool_hang.py:217)."""
        r = jnp.where(self._check_success(physics, kin), 1.0, 0.0)
        if self.reward_scale is not None:
            r = r * self.reward_scale
        return r

    def _get_observations(self, physics, kin):
        robot = self.robots[0]
        qp = physics.qpos[jnp.asarray(robot.arm_qpos_idx["right"])]
        eef = kin.site_xpos[self.eef_site]
        obs = {
            "robot0_joint_pos": qp,
            "robot0_joint_pos_cos": jnp.cos(qp),
            "robot0_joint_pos_sin": jnp.sin(qp),
            "robot0_joint_vel": physics.qvel[jnp.asarray(robot.arm_qvel_idx["right"])],
            "robot0_eef_pos": eef,
            "robot0_eef_quat": T.convert_quat(T.mat2quat_wxyz(kin.site_xmat[self.eef_site]), to="xyzw"),
            "robot0_gripper_qpos": physics.qpos[jnp.asarray(robot.gripper_joint_qpos_idx["right"])],
        }
        for name, bid in (("stand", self.stand_body_id), ("frame", self.frame_body_id), ("tool", self.tool_body_id)):
            obs[f"{name}_pos"] = kin.xpos[bid]
            obs[f"{name}_quat"] = T.convert_quat(kin.xquat[bid], to="xyzw")
            obs[f"{name}_to_eef"] = kin.xpos[bid] - eef
        return obs
