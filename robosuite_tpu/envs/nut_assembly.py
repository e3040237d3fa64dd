"""NutAssembly: fit nuts onto their pegs.

Re-derivation of reference environments/manipulation/nut_assembly.py:
staged rewards (:249-374), on_peg (:375-389), success (:622-640), variants
Single/Square/Round (:683+).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from robosuite_tpu.envs.base import RobotEnv, register_env
from robosuite_tpu.models.arenas import PegsArena
from robosuite_tpu.models.objects.xml_objects import RoundNutObject, SquareNutObject
from robosuite_tpu.models.tasks import ManipulationTask
from robosuite_tpu.utils import transforms as T
from robosuite_tpu.utils.placement import PlacementSpec, sample_placements


@register_env
class NutAssembly(RobotEnv):
    def __init__(
        self,
        robots="Panda",
        single_object_mode=0,
        nut_type=None,
        reward_scale=1.0,
        reward_shaping=False,
        **kwargs,
    ):
        self.single_object_mode = single_object_mode
        self.nut_to_id = {"SquareNut": 0, "RoundNut": 1}
        if nut_type is not None:
            assert nut_type in self.nut_to_id
            self.nut_id = self.nut_to_id[nut_type]
        else:
            self.nut_id = 0
        self.table_full_size = (0.45, 0.69, 0.05)
        self.table_offset = np.array((0, 0, 0.82))
        super().__init__(robots=robots, reward_scale=reward_scale, reward_shaping=reward_shaping, **kwargs)

    def _load_model(self):
        rm = self.robot_models[0]
        rm.set_base_xpos(rm.base_xpos_offset["table"](self.table_full_size[0]))
        arena = PegsArena(
            table_full_size=self.table_full_size,
            table_offset=self.table_offset,
        )
        self.nuts = [SquareNutObject(name="SquareNut"), RoundNutObject(name="RoundNut")]
        self.task = ManipulationTask(arena, self.robot_models, self.nuts)

    def _setup_references(self):
        m = self.model
        self.peg1_body_id = m.body_name2id("peg1")
        self.peg2_body_id = m.body_name2id("peg2")
        self.nut_body_ids = [m.body_name2id(n.root_body) for n in self.nuts]
        self.nut_handle_sites = [m.site_name2id(n.important_sites["handle"]) for n in self.nuts]
        self.eef_site = self.robots[0].eef_site_id["right"]
        self._grasp_rows_per_nut = [self.grasp_rows(0, "right", n.contact_geoms) for n in self.nuts]
        # placement (reference nut_assembly.py:407-436): square nut on +y
        # side, round nut on -y side of the table
        self._placements = []
        y_ranges = [(0.09, 0.12), (-0.12, -0.09)]
        rotations = [(jnp.pi * 0.5 - 0.8, jnp.pi * 0.5 + 0.8), None]
        for nut, yr, rot in zip(self.nuts, y_ranges, rotations):
            self._placements.append(
                PlacementSpec(
                    name=nut.name,
                    qpos_start=m.jnt_qpos_slice(f"{nut.name}_joint0").start,
                    x_range=(-0.115, -0.11),
                    y_range=yr,
                    rotation=None,
                    reference_pos=tuple(self.table_offset),
                    z_offset=0.02,
                    bottom_offset=float(nut.bottom_offset[2]),
                    horizontal_radius=nut.horizontal_radius,
                )
            )

    def _sample_placements(self, rng):
        return sample_placements(self._placements, rng)

    def _on_peg(self, kin, nut_i):
        """reference nut_assembly.py:375-389."""
        peg_pos = kin.xpos[[self.peg1_body_id, self.peg2_body_id][nut_i]]
        obj_pos = kin.xpos[self.nut_body_ids[nut_i]]
        return (
            (jnp.abs(obj_pos[0] - peg_pos[0]) < 0.03)
            & (jnp.abs(obj_pos[1] - peg_pos[1]) < 0.03)
            & (obj_pos[2] < self.table_offset[2] + 0.05)
        )

    def _objects_on_pegs(self, kin):
        out = []
        for i in range(len(self.nuts)):
            obj_pos = kin.xpos[self.nut_body_ids[i]]
            dist = jnp.linalg.norm(kin.site_xpos[self.eef_site] - obj_pos)
            r_reach = 1.0 - jnp.tanh(10.0 * dist)
            out.append(self._on_peg(kin, i) & (r_reach < 0.6))
        return jnp.stack(out)

    def _active_mask(self):
        if self.single_object_mode == 0:
            return np.ones(len(self.nuts), dtype=bool)
        mask = np.zeros(len(self.nuts), dtype=bool)
        mask[self.nut_id] = True
        return mask

    def _staged_rewards(self, kin, on_pegs):
        """reference nut_assembly.py:290-374 (vectorized over nuts; already-
        placed nuts masked out)."""
        reach_mult, grasp_mult, lift_mult, hover_mult = 0.1, 0.35, 0.5, 0.7
        active = jnp.asarray(self._active_mask()) & (~on_pegs)

        handle_d = jnp.stack(
            [jnp.linalg.norm(kin.site_xpos[self.eef_site] - kin.site_xpos[s]) for s in self.nut_handle_sites]
        )
        big = jnp.asarray(1e3)
        d_min = jnp.min(jnp.where(active, handle_d, big))
        r_reach = jnp.where(jnp.any(active), (1.0 - jnp.tanh(10.0 * d_min)) * reach_mult, 0.0)

        grasping = jnp.stack(
            [self.check_grasp(kin, *rows) for rows in self._grasp_rows_per_nut]
        )
        any_grasp = jnp.any(grasping & active)
        r_grasp = jnp.where(any_grasp, grasp_mult, 0.0)

        z_target = self.table_offset[2] + 0.2
        z_locs = jnp.stack([kin.xpos[b][2] for b in self.nut_body_ids])
        z_dists = jnp.maximum(z_target - z_locs, 0.0)
        z_min = jnp.min(jnp.where(active, z_dists, big))
        r_lift = jnp.where(
            jnp.any(active) & (r_grasp > 0),
            grasp_mult + (1.0 - jnp.tanh(15.0 * z_min)) * (lift_mult - grasp_mult),
            0.0,
        )

        peg_pos = jnp.stack([kin.xpos[self.peg1_body_id][:2], kin.xpos[self.peg2_body_id][:2]])
        xy = jnp.stack([kin.xpos[b][:2] for b in self.nut_body_ids])
        dists = jnp.linalg.norm(peg_pos - xy, axis=-1)
        r_hovers = r_lift + (1.0 - jnp.tanh(10.0 * dists)) * (hover_mult - lift_mult)
        r_hover = jnp.max(jnp.where(active, r_hovers, 0.0))
        return r_reach, r_grasp, r_lift, r_hover

    def _check_success(self, physics, kin):
        on_pegs = self._objects_on_pegs(kin)
        return jnp.all(on_pegs | ~jnp.asarray(self._active_mask()))

    def reward(self, obs, physics, kin):
        on_pegs = self._objects_on_pegs(kin)
        active = jnp.asarray(self._active_mask())
        r = jnp.sum(jnp.where(active, on_pegs.astype(jnp.float32), 0.0))
        if self.reward_shaping:
            staged = self._staged_rewards(kin, on_pegs)
            r = r + jnp.max(jnp.stack(staged))
        if self.reward_scale is not None:
            r = r * self.reward_scale
            if self.single_object_mode == 0:
                r = r / 2.0
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
        for i, nut in enumerate(self.nuts):
            obs[f"{nut.name}_pos"] = kin.xpos[self.nut_body_ids[i]]
            obs[f"{nut.name}_quat"] = T.convert_quat(kin.xquat[self.nut_body_ids[i]], to="xyzw")
            obs[f"{nut.name}_to_eef_pos"] = kin.xpos[self.nut_body_ids[i]] - eef_pos
        return obs


@register_env
class NutAssemblySingle(NutAssembly):
    """reference nut_assembly.py:683+: one nut at a time."""

    def __init__(self, **kwargs):
        assert "single_object_mode" not in kwargs
        super().__init__(single_object_mode=1, **kwargs)


@register_env
class NutAssemblySquare(NutAssembly):
    def __init__(self, **kwargs):
        assert "single_object_mode" not in kwargs and "nut_type" not in kwargs
        super().__init__(single_object_mode=2, nut_type="SquareNut", **kwargs)


@register_env
class NutAssemblyRound(NutAssembly):
    def __init__(self, **kwargs):
        assert "single_object_mode" not in kwargs and "nut_type" not in kwargs
        super().__init__(single_object_mode=2, nut_type="RoundNut", **kwargs)
