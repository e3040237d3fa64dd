"""Two-arm environments: TwoArmLift, TwoArmPegInHole, TwoArmHandover.

Re-derivations of reference environments/manipulation/two_arm_env.py (robot
placement configurations), two_arm_lift.py (pot reward :221-300, success
:490-501), two_arm_peg_in_hole.py (alignment reward :240+, peg/plate welded
to the eefs), two_arm_handover.py (staged handover :230+).

env_configuration: "opposed" (robots facing each other, +-pi/2) or
"parallel" (side by side, +-0.25 m) — reference two_arm_lift.py:308-326.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from robosuite_tpu.envs.base import RobotEnv, register_env
from robosuite_tpu.models import spec as S
from robosuite_tpu.models.arenas import EmptyArena, TableArena
from robosuite_tpu.models.objects.composite_objects import HammerObject, PotWithHandlesObject
from robosuite_tpu.models.tasks import ManipulationTask
from robosuite_tpu.utils import transforms as T
from robosuite_tpu.utils.placement import PlacementSpec, sample_placements


def _normalize_two_arm(robots, env_configuration):
    """reference two_arm_env.py:29-55: one (bimanual) robot auto-selects the
    "single-robot" configuration; two robots accept opposed/parallel."""
    robots = [robots] if isinstance(robots, str) else list(robots)
    if len(robots) == 1:
        return robots, "single-robot"
    if env_configuration in ("default", None):
        env_configuration = "opposed"
    assert env_configuration in ("opposed", "parallel"), env_configuration
    return robots, env_configuration


def _place_two_robots(robot_models, env_configuration, table_length):
    """reference two_arm_lift.py:302-326 (incl. the single-robot branch)."""
    import math

    if env_configuration == "single-robot":
        rm = robot_models[0]
        rm.set_base_xpos(np.array(rm.base_xpos_offset["table"](table_length)))
    elif env_configuration == "opposed":
        for rm, rotation in zip(robot_models, (np.pi / 2, -np.pi / 2)):
            xpos = np.array(rm.base_xpos_offset["table"](table_length))
            c, s = math.cos(rotation), math.sin(rotation)
            xpos = np.array([c * xpos[0] - s * xpos[1], s * xpos[0] + c * xpos[1], xpos[2]])
            rm.set_base_xpos(xpos)
            rm.set_base_ori((0, 0, rotation))
    else:  # parallel
        for rm, offset in zip(robot_models, (-0.25, 0.25)):
            xpos = np.array(rm.base_xpos_offset["table"](table_length)) + np.array((0, offset, 0))
            rm.set_base_xpos(xpos)


def _two_eef_sites(robots):
    """The two manipulation endpoints: (right, left) arms of one bimanual
    robot, or the right arm of each of two robots (two_arm_env.py:98-140
    _eef0/_eef1 semantics)."""
    return [r.eef_site_id[arm] for _, r, arm in _two_arm_pairs(robots)]


def _two_arm_pairs(items):
    """[(robot_index, item, arm)] for the two manipulation endpoints:
    single-robot -> [(0, r, "right"), (0, r, "left")]; two robots ->
    [(i, r_i, "right")] (reference two_arm_env.py gripper0/gripper1)."""
    items = list(items)
    if len(items) == 1:
        return [(0, items[0], "right"), (0, items[0], "left")]
    return [(i, r, "right") for i, r in enumerate(items)]


@register_env
class TwoArmLift(RobotEnv):
    def __init__(
        self,
        robots=("Panda", "Panda"),
        env_configuration="opposed",
        table_full_size=(0.8, 0.8, 0.05),
        table_friction=(1.0, 0.005, 0.0001),
        reward_scale=1.0,
        reward_shaping=False,
        **kwargs,
    ):
        robots, self.env_configuration = _normalize_two_arm(robots, env_configuration)
        self.table_full_size = np.array(table_full_size)
        self.table_friction = table_friction
        self.table_offset = np.array((0, 0, 0.8))
        super().__init__(robots=robots, reward_scale=reward_scale, reward_shaping=reward_shaping, **kwargs)

    def _load_model(self):
        _place_two_robots(self.robot_models, self.env_configuration, self.table_full_size[0])
        arena = TableArena(
            table_full_size=self.table_full_size,
            table_friction=self.table_friction,
            table_offset=self.table_offset,
        )
        self.pot = PotWithHandlesObject(name="pot")
        self.task = ManipulationTask(arena, self.robot_models, self.pot)

    def _setup_references(self):
        m = self.model
        self.pot_body_id = m.body_name2id(self.pot.root_body)
        self.pot_center_id = m.site_name2id(self.pot.important_sites["center"])
        self.handle_site_ids = [
            m.site_name2id(self.pot.important_sites["handle0"]),
            m.site_name2id(self.pot.important_sites["handle1"]),
        ]
        self.eef_sites = _two_eef_sites(self.robots)
        self._grasp_rows = [
            self.grasp_rows(i, arm, self.pot.handle_geoms[k])
            for k, (i, _, arm) in enumerate(_two_arm_pairs(self.robots))
        ]
        self._placements = [
            PlacementSpec(
                name="pot",
                qpos_start=m.jnt_qpos_slice("pot_joint0").start,
                x_range=(-0.03, 0.03),
                y_range=(-0.03, 0.03),
                rotation=(np.pi - np.pi / 3, np.pi + np.pi / 3),
                reference_pos=tuple(self.table_offset),
                z_offset=0.001,
                bottom_offset=float(self.pot.bottom_offset[2]),
                horizontal_radius=self.pot.horizontal_radius,
            )
        ]

    def _sample_placements(self, rng):
        return sample_placements(self._placements, rng)

    def _check_success(self, physics, kin):
        """pot bottom > table + 0.10 (two_arm_lift.py:490-501)."""
        pot_bottom = kin.site_xpos[self.pot_center_id][2] - float(self.pot.top_offset[2])
        return pot_bottom > self.table_offset[2] + 0.10

    def reward(self, obs, physics, kin):
        """reference two_arm_lift.py:221-300."""
        z_rot = kin.xmat[self.pot_body_id][:, 2]
        cos_z = z_rot[2]
        direction_coef = jnp.where(cos_z >= jnp.cos(jnp.pi / 6), 1.0, 0.0)
        success = self._check_success(physics, kin)

        r = jnp.where(success, 3.0 * direction_coef, 0.0)
        if self.reward_shaping:
            pot_bottom = kin.site_xpos[self.pot_center_id][2] - float(self.pot.top_offset[2])
            elevation = pot_bottom - self.table_offset[2]
            r_lift = jnp.minimum(jnp.maximum(elevation - 0.05, 0.0) * 15.0, 1.5) * direction_coef
            shaped = r_lift
            for i in range(2):
                d = jnp.linalg.norm(kin.site_xpos[self.eef_sites[i]] - kin.site_xpos[self.handle_site_ids[i]])
                reaching = 0.5 * (1.0 - jnp.tanh(10.0 * d))
                grasping = self.check_grasp(kin, *self._grasp_rows[i])
                shaped = shaped + jnp.where(grasping, 0.5 + 0.25, reaching)
            r = jnp.where(success, r, shaped)
        if self.reward_scale is not None:
            r = r * self.reward_scale / 3.0
        return r

    def _get_observations(self, physics, kin):
        obs = {}
        for k, (i, robot, arm) in enumerate(_two_arm_pairs(self.robots)):
            qp = physics.qpos[jnp.asarray(robot.arm_qpos_idx[arm])]
            obs[f"robot{k}_joint_pos"] = qp
            obs[f"robot{k}_joint_pos_cos"] = jnp.cos(qp)
            obs[f"robot{k}_joint_pos_sin"] = jnp.sin(qp)
            obs[f"robot{k}_joint_vel"] = physics.qvel[jnp.asarray(robot.arm_qvel_idx[arm])]
            obs[f"robot{k}_eef_pos"] = kin.site_xpos[self.eef_sites[k]]
            obs[f"robot{k}_eef_quat"] = T.convert_quat(T.mat2quat_wxyz(kin.site_xmat[self.eef_sites[k]]), to="xyzw")
            obs[f"robot{k}_gripper_qpos"] = physics.qpos[jnp.asarray(robot.gripper_joint_qpos_idx[arm])]
        obs["pot_pos"] = kin.xpos[self.pot_body_id]
        obs["pot_quat"] = T.convert_quat(kin.xquat[self.pot_body_id], to="xyzw")
        obs["handle0_xpos"] = kin.site_xpos[self.handle_site_ids[0]]
        obs["handle1_xpos"] = kin.site_xpos[self.handle_site_ids[1]]
        obs["gripper0_to_handle0"] = kin.site_xpos[self.handle_site_ids[0]] - kin.site_xpos[self.eef_sites[0]]
        obs["gripper1_to_handle1"] = kin.site_xpos[self.handle_site_ids[1]] - kin.site_xpos[self.eef_sites[1]]
        return obs


@register_env
class TwoArmPegInHole(RobotEnv):
    """Peg welded to robot0's eef, plate-with-hole welded to robot1's eef
    (reference two_arm_peg_in_hole.py; no table, no gripper)."""

    def __init__(
        self,
        robots=("Panda", "Panda"),
        env_configuration="opposed",
        peg_radius=(0.015, 0.03),
        peg_length=0.13,
        reward_scale=1.0,
        reward_shaping=False,
        **kwargs,
    ):
        robots, self.env_configuration = _normalize_two_arm(robots, env_configuration)
        self.peg_radius = peg_radius
        self.peg_length = peg_length
        super().__init__(robots=robots, reward_scale=reward_scale, reward_shaping=reward_shaping, **kwargs)

    def _load_model(self):
        # no grippers: replace defaults with NullGripper (reference :262-270)
        from robosuite_tpu.models.grippers import gripper_factory

        seen = set()
        for i, rm, arm in _two_arm_pairs(self.robot_models):
            eef_body = rm.root_subtree().find_body(rm.eef_name[arm])
            pref = f"gripper{i}_{arm}_"
            eef_body.children = [c for c in eef_body.children if not c.name.startswith(pref)]
            rm._actuators = [a for a in rm._actuators if not a.name.startswith(pref)]
            if id(rm) not in seen:
                rm.grippers.clear()
                seen.add(id(rm))
            rm.add_gripper(gripper_factory("NullGripper", idn=i, arm=arm), arm)

        _place_two_robots(self.robot_models, self.env_configuration, 0.8)
        arena = EmptyArena()

        # weld peg to robot0 eef, plate to robot1 eef (reference :278-299)
        peg = S.BodySpec("peg", pos=(0, 0, self.peg_length))
        peg.add_geom(
            S.GeomSpec("peg_g0", type="cylinder", size=(self.peg_radius[0], self.peg_length), density=500)
        )
        peg.add_site(S.SiteSpec("peg_center", pos=(0, 0, 0), size=(0.005,)))
        pairs = _two_arm_pairs(self.robot_models)
        rm0, arm0 = pairs[0][1], pairs[0][2]
        eef0 = rm0.root_subtree().find_body(rm0.eef_name[arm0])
        eef0.children.append(peg)

        from robosuite_tpu.models.objects.xml_objects import PlateWithHoleObject

        self.plate = PlateWithHoleObject(name="plate")
        plate_root = self.plate.get_obj()
        plate_root.pos = np.array([0, 0, 0.05])
        plate_root.quat = np.array([0.7071068, 0, 0.7071068, 0])
        rm1, arm1 = pairs[1][1], pairs[1][2]
        eef1 = rm1.root_subtree().find_body(rm1.eef_name[arm1])
        eef1.children.append(plate_root)

        self.task = ManipulationTask(arena, self.robot_models, None)

    def _setup_references(self):
        m = self.model
        self.peg_body_id = m.body_name2id("peg")
        self.plate_body_id = m.body_name2id(self.plate.root_body)
        self.eef_sites = _two_eef_sites(self.robots)

    def _peg_alignment(self, kin):
        """(t, d, cos) hole-frame alignment terms
        (reference two_arm_peg_in_hole.py:440-487)."""
        hole_pos = kin.xpos[self.plate_body_id]
        hole_mat = kin.xmat[self.plate_body_id]
        peg_pos = kin.xpos[self.peg_body_id]
        peg_mat = kin.xmat[self.peg_body_id]

        v = peg_mat[:, 2]  # peg axis in world
        center = hole_pos + hole_mat @ jnp.asarray([0.1, 0.0, 0.0], dtype=hole_pos.dtype)
        t = jnp.dot(center - peg_pos, v) / (jnp.linalg.norm(v) ** 2 + 1e-9)
        d = jnp.linalg.norm(jnp.cross(v, peg_pos - center)) / (jnp.linalg.norm(v) + 1e-9)
        hole_normal = hole_mat @ jnp.asarray([0.0, 0.0, 1.0], dtype=hole_pos.dtype)
        cos = jnp.dot(hole_normal, v) / (jnp.linalg.norm(hole_normal) * jnp.linalg.norm(v) + 1e-9)
        return t, d, cos

    def _check_success(self, physics, kin):
        t, d, cos = self._peg_alignment(kin)
        return (d < 0.06) & (-0.12 <= t) & (t <= 0.14) & (cos > 0.95)

    def reward(self, obs, physics, kin):
        t, d, cos = self._peg_alignment(kin)
        success = self._check_success(physics, kin)
        r = jnp.where(success, 1.0, 0.0)
        if self.reward_shaping:
            hole_pos = kin.xpos[self.plate_body_id]
            peg_pos = kin.xpos[self.peg_body_id]
            dist = jnp.linalg.norm(hole_pos - peg_pos)
            reaching = 1.0 - jnp.tanh(1.0 * dist)
            shaped = reaching + 1.0 - jnp.tanh(jnp.abs(t)) + 1.0 - jnp.tanh(d) + cos
            r = jnp.where(success, 5.0, shaped)
        if self.reward_scale is not None:
            r = r * self.reward_scale / (5.0 if self.reward_shaping else 1.0)
        return r

    def _get_observations(self, physics, kin):
        t, d, cos = self._peg_alignment(kin)
        obs = {}
        for i, robot in enumerate(self.robots):
            qp = physics.qpos[jnp.asarray(robot.arm_qpos_idx["right"])]
            obs[f"robot{i}_joint_pos"] = qp
            obs[f"robot{i}_joint_vel"] = physics.qvel[jnp.asarray(robot.arm_qvel_idx["right"])]
            obs[f"robot{i}_eef_pos"] = kin.site_xpos[self.eef_sites[i]]
        obs["peg_pos"] = kin.xpos[self.peg_body_id]
        obs["peg_quat"] = T.convert_quat(kin.xquat[self.peg_body_id], to="xyzw")
        obs["hole_pos"] = kin.xpos[self.plate_body_id]
        obs["t"] = t[None]
        obs["d"] = d[None]
        obs["angle"] = cos[None]
        return obs


@register_env
class TwoArmHandover(RobotEnv):
    """Hand a hammer from one arm to the other
    (reference two_arm_handover.py: staged reach/grasp/hover)."""

    def __init__(
        self,
        robots=("Panda", "Panda"),
        env_configuration="opposed",
        table_full_size=(0.8, 1.2, 0.05),
        reward_scale=1.0,
        reward_shaping=False,
        **kwargs,
    ):
        robots, self.env_configuration = _normalize_two_arm(robots, env_configuration)
        self.table_full_size = np.array(table_full_size)
        self.table_offset = np.array((0, 0, 0.8))
        self.height_threshold = 0.1
        super().__init__(robots=robots, reward_scale=reward_scale, reward_shaping=reward_shaping, **kwargs)

    def _load_model(self):
        _place_two_robots(self.robot_models, self.env_configuration, self.table_full_size[0])
        arena = TableArena(table_full_size=self.table_full_size, table_offset=self.table_offset)
        self.hammer = HammerObject(name="hammer")
        self.task = ManipulationTask(arena, self.robot_models, self.hammer)

    def _setup_references(self):
        m = self.model
        self.hammer_body_id = m.body_name2id(self.hammer.root_body)
        self.eef_sites = _two_eef_sites(self.robots)
        pairs = _two_arm_pairs(self.robots)
        self._grasp0 = self.grasp_rows(pairs[0][0], pairs[0][2], self.hammer.handle_geoms)
        self._grasp1 = self.grasp_rows(pairs[1][0], pairs[1][2], self.hammer.handle_geoms)
        self._placements = [
            PlacementSpec(
                name="hammer",
                qpos_start=m.jnt_qpos_slice("hammer_joint0").start,
                x_range=(-0.1, 0.1),
                y_range=(-0.05, 0.05),
                rotation=None,
                reference_pos=tuple(self.table_offset),
                z_offset=0.01,
                bottom_offset=float(self.hammer.bottom_offset[2]),
                horizontal_radius=self.hammer.horizontal_radius,
            )
        ]

    def _sample_placements(self, rng):
        return sample_placements(self._placements, rng)

    def _check_success(self, physics, kin):
        """Arm1 holds the hammer above the threshold while arm0 released
        (reference two_arm_handover.py:545+)."""
        grasp0 = self.check_grasp(kin, *self._grasp0)
        grasp1 = self.check_grasp(kin, *self._grasp1)
        height = kin.xpos[self.hammer_body_id][2] - self.table_offset[2]
        return grasp1 & (~grasp0) & (height > self.height_threshold)

    def reward(self, obs, physics, kin):
        grasp0 = self.check_grasp(kin, *self._grasp0)
        grasp1 = self.check_grasp(kin, *self._grasp1)
        success = self._check_success(physics, kin)
        r = jnp.where(success, 2.0, 0.0)
        if self.reward_shaping:
            hammer_pos = kin.xpos[self.hammer_body_id]
            d0 = jnp.linalg.norm(kin.site_xpos[self.eef_sites[0]] - hammer_pos)
            d1 = jnp.linalg.norm(kin.site_xpos[self.eef_sites[1]] - hammer_pos)
            height = hammer_pos[2] - self.table_offset[2]
            lifted = height > self.height_threshold
            r_reach = 0.1 * (1.0 - jnp.tanh(10.0 * d0))
            r_lift = jnp.where(grasp0 & lifted, 0.5, 0.0)
            r_hover = jnp.where(grasp0 & lifted, 0.5 + 0.5 * (1.0 - jnp.tanh(10.0 * d1)), 0.0)
            shaped = jnp.maximum(jnp.maximum(r_reach, r_lift), r_hover)
            r = jnp.where(success, 2.0, shaped)
        if self.reward_scale is not None:
            r = r * self.reward_scale / 2.0
        return r

    def _get_observations(self, physics, kin):
        obs = {}
        for k, (i, robot, arm) in enumerate(_two_arm_pairs(self.robots)):
            obs[f"robot{k}_joint_pos"] = physics.qpos[jnp.asarray(robot.arm_qpos_idx[arm])]
            obs[f"robot{k}_eef_pos"] = kin.site_xpos[self.eef_sites[k]]
        obs["hammer_pos"] = kin.xpos[self.hammer_body_id]
        obs["hammer_quat"] = T.convert_quat(kin.xquat[self.hammer_body_id], to="xyzw")
        return obs
