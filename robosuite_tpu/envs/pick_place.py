"""PickPlace: move objects from one bin to their target bins.

Re-derivation of reference environments/manipulation/pick_place.py: staged
rewards (:274-401), not_in_bin (:404-425), placement (:427-470), success
(:737+), variants Single/Milk/Bread/Cereal/Can (:799+).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from robosuite_tpu.envs.base import RobotEnv, register_env
from robosuite_tpu.models.arenas import BinsArena
from robosuite_tpu.models.objects.hull_objects import (
    BreadObject,
    CanObject,
    CerealObject,
    MilkObject,
)
from robosuite_tpu.models.tasks import ManipulationTask
from robosuite_tpu.utils import transforms as T
from robosuite_tpu.utils.placement import PlacementSpec, sample_placements


@register_env
class PickPlace(RobotEnv):
    def __init__(
        self,
        robots="Panda",
        single_object_mode=0,
        object_type=None,
        reward_scale=1.0,
        reward_shaping=False,
        z_rotation=None,
        **kwargs,
    ):
        self.single_object_mode = single_object_mode
        self.object_to_id = {"milk": 0, "bread": 1, "cereal": 2, "can": 3}
        if object_type is not None:
            assert object_type in self.object_to_id
            self.object_id = self.object_to_id[object_type]
        else:
            self.object_id = 0
        self.z_rotation = z_rotation
        self.bin1_pos = np.array((0.1, -0.25, 0.8))
        self.bin2_pos = np.array((0.1, 0.28, 0.8))
        super().__init__(robots=robots, reward_scale=reward_scale, reward_shaping=reward_shaping, **kwargs)

    def _load_model(self):
        rm = self.robot_models[0]
        rm.set_base_xpos(rm.base_xpos_offset["bins"])
        arena = BinsArena(bin1_pos=self.bin1_pos)
        self.bin_size = arena.table_full_size
        self.objects = [MilkObject("Milk"), BreadObject("Bread"), CerealObject("Cereal"), CanObject("Can")]
        self.task = ManipulationTask(arena, self.robot_models, self.objects)

    def _setup_references(self):
        m = self.model
        self.obj_body_ids = [m.body_name2id(o.root_body) for o in self.objects]
        self.eef_site = self.robots[0].eef_site_id["right"]
        self._grasp_rows_per_obj = [self.grasp_rows(0, "right", o.contact_geoms) for o in self.objects]
        # target bin quadrant centers (reference pick_place.py:456-482)
        self.target_bin_placements = np.zeros((len(self.objects), 3))
        for i in range(len(self.objects)):
            bin_x_low = self.bin2_pos[0]
            bin_y_low = self.bin2_pos[1]
            if i in (0, 2):
                bin_x_low -= self.bin_size[0] / 2
            if i < 2:
                bin_y_low -= self.bin_size[1] / 2
            self.target_bin_placements[i] = [
                bin_x_low + self.bin_size[0] / 4,
                bin_y_low + self.bin_size[1] / 4,
                self.bin2_pos[2],
            ]
        bin_x_half = self.bin_size[0] / 2 - 0.05
        bin_y_half = self.bin_size[1] / 2 - 0.05
        self._placements = [
            PlacementSpec(
                name=o.name,
                qpos_start=m.jnt_qpos_slice(f"{o.name}_joint0").start,
                x_range=(-bin_x_half, bin_x_half),
                y_range=(-bin_y_half, bin_y_half),
                rotation=self.z_rotation,
                reference_pos=tuple(self.bin1_pos),
                z_offset=0.0,
                bottom_offset=float(o.bottom_offset[2]),
                horizontal_radius=o.horizontal_radius,
                ensure_boundary=True,
            )
            for o in self.objects
        ]

    def _sample_placements(self, rng):
        return sample_placements(self._placements, rng)

    def _active_mask(self):
        if self.single_object_mode == 0:
            return np.ones(len(self.objects), dtype=bool)
        mask = np.zeros(len(self.objects), dtype=bool)
        mask[self.object_id] = True
        return mask

    def _in_bin(self, obj_pos, i):
        """negation of reference not_in_bin (pick_place.py:404-425)."""
        bin_x_low = self.bin2_pos[0]
        bin_y_low = self.bin2_pos[1]
        if i in (0, 2):
            bin_x_low -= self.bin_size[0] / 2
        if i < 2:
            bin_y_low -= self.bin_size[1] / 2
        bin_x_high = bin_x_low + self.bin_size[0] / 2
        bin_y_high = bin_y_low + self.bin_size[1] / 2
        return (
            (obj_pos[0] > bin_x_low)
            & (obj_pos[0] < bin_x_high)
            & (obj_pos[1] > bin_y_low)
            & (obj_pos[1] < bin_y_high)
            & (obj_pos[2] > self.bin2_pos[2])
            & (obj_pos[2] < self.bin2_pos[2] + 0.1)
        )

    def _objects_in_bins(self, kin):
        return jnp.stack([self._in_bin(kin.xpos[b], i) for i, b in enumerate(self.obj_body_ids)])

    def _staged_rewards(self, kin, in_bins):
        """reference pick_place.py:308-401."""
        reach_mult, grasp_mult, lift_mult, hover_mult = 0.1, 0.35, 0.5, 0.7
        active = jnp.asarray(self._active_mask()) & (~in_bins)
        big = jnp.asarray(1e3)

        obj_pos = jnp.stack([kin.xpos[b] for b in self.obj_body_ids])
        eef = kin.site_xpos[self.eef_site]
        dists = jnp.linalg.norm(obj_pos - eef[None, :], axis=-1)
        d_min = jnp.min(jnp.where(active, dists, big))
        r_reach = jnp.where(jnp.any(active), (1.0 - jnp.tanh(10.0 * d_min)) * reach_mult, 0.0)

        grasping = jnp.stack([self.check_grasp(kin, *rows) for rows in self._grasp_rows_per_obj])
        r_grasp = jnp.where(jnp.any(grasping & active), grasp_mult, 0.0)

        z_target = self.bin2_pos[2] + 0.25
        z_dists = jnp.maximum(z_target - obj_pos[:, 2], 0.0)
        z_min = jnp.min(jnp.where(active, z_dists, big))
        r_lift = jnp.where(
            r_grasp > 0, grasp_mult + (1.0 - jnp.tanh(15.0 * z_min)) * (lift_mult - grasp_mult), 0.0
        )

        targets = jnp.asarray(self.target_bin_placements, dtype=obj_pos.dtype)
        xy_d = jnp.linalg.norm(obj_pos[:, :2] - targets[:, :2], axis=-1)
        above = (
            (jnp.abs(obj_pos[:, 0] - targets[:, 0]) < self.bin_size[0] / 4.0)
            & (jnp.abs(obj_pos[:, 1] - targets[:, 1]) < self.bin_size[1] / 4.0)
        )
        # objects above their bins get hover from lift_mult; others from r_lift
        r_hover_above = lift_mult + (1.0 - jnp.tanh(10.0 * xy_d)) * (hover_mult - lift_mult)
        r_hover_away = r_lift + (1.0 - jnp.tanh(10.0 * xy_d)) * (hover_mult - lift_mult)
        r_hover_all = jnp.where(above, r_hover_above, r_hover_away)
        r_hover = jnp.max(jnp.where(active, r_hover_all, 0.0))
        return r_reach, r_grasp, r_lift, r_hover

    def _check_success(self, physics, kin):
        in_bins = self._objects_in_bins(kin)
        return jnp.all(in_bins | ~jnp.asarray(self._active_mask()))

    def reward(self, obs, physics, kin):
        in_bins = self._objects_in_bins(kin)
        active = jnp.asarray(self._active_mask())
        r = jnp.sum(jnp.where(active, in_bins.astype(jnp.float32), 0.0))
        if self.reward_shaping:
            staged = self._staged_rewards(kin, in_bins)
            r = r + jnp.max(jnp.stack(staged))
        if self.reward_scale is not None:
            r = r * self.reward_scale
            if self.single_object_mode == 0:
                r = r / 4.0
        return r

    def _get_observations(self, physics, kin):
        robot = self.robots[0]
        qp = physics.qpos[jnp.asarray(robot.arm_qpos_idx["right"])]
        eef_pos = kin.site_xpos[self.eef_site]
        obs = {
            "robot0_joint_pos": qp,
            "robot0_joint_pos_cos": jnp.cos(qp),
            "robot0_joint_pos_sin": jnp.sin(qp),
            "robot0_joint_vel": physics.qvel[jnp.asarray(robot.arm_qvel_idx["right"])],
            "robot0_eef_pos": eef_pos,
            "robot0_eef_quat": T.convert_quat(T.mat2quat_wxyz(kin.site_xmat[self.eef_site]), to="xyzw"),
            "robot0_gripper_qpos": physics.qpos[jnp.asarray(robot.gripper_joint_qpos_idx["right"])],
            "robot0_gripper_qvel": physics.qvel[jnp.asarray(robot.gripper_joint_qvel_idx["right"])],
        }
        for i, o in enumerate(self.objects):
            obs[f"{o.name}_pos"] = kin.xpos[self.obj_body_ids[i]]
            obs[f"{o.name}_quat"] = T.convert_quat(kin.xquat[self.obj_body_ids[i]], to="xyzw")
            obs[f"{o.name}_to_eef_pos"] = kin.xpos[self.obj_body_ids[i]] - eef_pos
        return obs


@register_env
class PickPlaceSingle(PickPlace):
    def __init__(self, **kwargs):
        assert "single_object_mode" not in kwargs
        super().__init__(single_object_mode=1, **kwargs)


@register_env
class PickPlaceMilk(PickPlace):
    def __init__(self, **kwargs):
        super().__init__(single_object_mode=2, object_type="milk", **kwargs)


@register_env
class PickPlaceBread(PickPlace):
    def __init__(self, **kwargs):
        super().__init__(single_object_mode=2, object_type="bread", **kwargs)


@register_env
class PickPlaceCereal(PickPlace):
    def __init__(self, **kwargs):
        super().__init__(single_object_mode=2, object_type="cereal", **kwargs)


@register_env
class PickPlaceCan(PickPlace):
    def __init__(self, **kwargs):
        super().__init__(single_object_mode=2, object_type="can", **kwargs)
