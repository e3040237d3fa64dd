"""Wipe: wipe dirt markers off the table with a wiping tool.

Re-derivation of reference environments/manipulation/wipe.py: task config
defaults (:14-35), reward structure (:386-470), termination-by-force and
completion (:698). Marker "wiped" state is per-scenario task state carried
in EnvState.task_state (the functional analog of the reference's
self.wiped_markers list).

Simplifications vs the reference (documented): markers are wiped when the
wiping surface center passes within the tool half-width of a marker while
the tool touches the table (the reference tests containment in the tool's
corner quadrilateral); collision/joint-limit penalties use the joint-range
check only (robot-link collision geometry is primitive-approximated).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from flax import struct

from robosuite_tpu.envs.base import EnvState, RobotEnv, register_env
from robosuite_tpu.models.arenas import WipeArena
from robosuite_tpu.models.tasks import ManipulationTask


@struct.dataclass
class WipeTaskState:
    """Per-scenario Wipe bookkeeping (the functional analog of the
    reference's self.wiped_markers / self.collisions / self.f_excess
    counters, wipe.py:268-269, 435, 485)."""

    wiped: Any = None      # (num_markers,) bool
    collisions: Any = 0    # int32 count of colliding/limit steps
    f_excess: Any = 0      # int32 count of excess-force steps

DEFAULT_WIPE_CONFIG = {
    "arm_limit_collision_penalty": -10.0,
    "wipe_contact_reward": 0.01,
    "unit_wiped_reward": 50.0,
    "ee_accel_penalty": 0.0,
    "excess_force_penalty_mul": 0.05,
    "distance_multiplier": 5.0,
    "distance_th_multiplier": 5.0,
    "task_complete_reward": 100.0,
    "contact_threshold": 1.0,
    "pressure_threshold": 0.5,
    "pressure_threshold_max": 60.0,
}


@register_env
class Wipe(RobotEnv):
    def __init__(
        self,
        robots="Panda",
        task_config=None,
        num_markers=10,
        reward_scale=1.0,
        reward_shaping=True,
        seed=None,
        early_terminations=True,
        **kwargs,
    ):
        self.early_terminations = early_terminations
        self.task_config = dict(DEFAULT_WIPE_CONFIG)
        if task_config:
            self.task_config.update(task_config)
        self.num_markers = num_markers
        self.table_full_size = (0.8, 0.8, 0.05)
        self.table_offset = np.array((0, 0, 0.8))
        self._model_rng_seed = seed
        super().__init__(robots=robots, reward_scale=reward_scale, reward_shaping=reward_shaping, **kwargs)

    def _load_model(self):
        rm = self.robot_models[0]
        # Wipe uses the WipingGripper regardless of default (wipe.py)
        from robosuite_tpu.models.grippers import gripper_factory

        rm.grippers.clear()
        # rebuild gripper attachment: remove previously attached default gripper
        eef_body = rm.root_subtree().find_body(rm.eef_name["right"])
        eef_body.children = [c for c in eef_body.children if not c.name.startswith("gripper0_")]
        rm._actuators = [a for a in rm._actuators if not a.name.startswith("gripper0_")]
        g = gripper_factory("WipingGripper", idn=0, arm="right")
        rm.add_gripper(g, "right")

        rm.set_base_xpos(rm.base_xpos_offset["table"](self.table_full_size[0]))
        arena = WipeArena(
            table_full_size=self.table_full_size,
            table_friction=(0.01, 0.005, 0.0001),
            table_offset=self.table_offset,
            num_markers=self.num_markers,
            seed=self._model_rng_seed,
        )
        self.arena = arena
        self.task = ManipulationTask(arena, self.robot_models, None)

    def _setup_references(self):
        m = self.model
        self.eef_site = self.robots[0].eef_site_id["right"]
        self.marker_body_ids = [m.body_name2id(n) for n in self.arena.marker_names]
        # contact rows: any wiping-tool geom vs the table top
        tool_geoms = [name for name in m.geom_names if name.startswith("gripper0_right_")]
        self._tool_table_rows = self._contact_rows(tool_geoms, ["table_collision"])
        self.wipe_radius = self.arena.line_width / 2 + 0.05  # tool half-width approx
        # arm-link collision rows (reference check_contact(robot_model),
        # wipe.py:431-435): any contact involving a robot0_* (non-gripper)
        # geom terminates/penalizes
        arm_geoms = [n for n in m.geom_names if n.startswith("robot0_")]
        other = [n for n in m.geom_names if not n.startswith("robot0_")]
        self._arm_collision_rows = self._contact_rows(arm_geoms, other)

    def _reset_impl(self, rng):
        state, obs = super()._reset_impl(rng)
        state = state.replace(task_state=WipeTaskState(
            wiped=jnp.zeros(self.num_markers, dtype=bool),
            collisions=jnp.asarray(0, dtype=jnp.int32),
            f_excess=jnp.asarray(0, dtype=jnp.int32),
        ))
        return state, obs

    def _marker_positions(self, kin):
        return jnp.stack([kin.xpos[b] for b in self.marker_body_ids])

    def _wipe_update(self, kin, wiped):
        eef = kin.site_xpos[self.eef_site]
        markers = self._marker_positions(kin)
        d_xy = jnp.linalg.norm(markers[:, :2] - eef[None, :2], axis=-1)
        close_z = jnp.abs(markers[:, 2] - eef[2]) < 0.03
        touching = self._any_contact(kin, self._tool_table_rows)
        newly = (d_xy < self.wipe_radius) & close_z & touching & (~wiped)
        return wiped | newly, newly

    def _step_impl(self, state, action):
        new_state, obs, reward_base, done, info = super()._step_impl(state, action)
        from robosuite_tpu.physics import engine

        kin, _, _ = engine.forward_products(self.model, new_state.physics)
        ts = state.task_state
        if ts is None or ts.wiped is None:
            ts = WipeTaskState(
                wiped=jnp.zeros(self.num_markers, dtype=bool),
                collisions=jnp.asarray(0, dtype=jnp.int32),
                f_excess=jnp.asarray(0, dtype=jnp.int32),
            )
        # unsafe situations: arm-link collision or joint limits (reference
        # wipe.py:431-439 — they zero the reward and count a collision)
        colliding = self._any_contact(kin, self._arm_collision_rows)
        q_limit = self.robots[0].check_q_limits(new_state.physics.qpos)
        unsafe = colliding | q_limit

        total_force = jnp.linalg.norm(obs["robot0_eef_force"])
        wiped, newly = self._wipe_update(kin, ts.wiped)
        # wiping progress only counts in safe states
        wiped = jnp.where(unsafe, ts.wiped, wiped)
        newly = newly & ~unsafe
        reward, f_over = self._wipe_reward(
            new_state.physics, kin, wiped, newly, unsafe, total_force
        )
        ts = WipeTaskState(
            wiped=wiped,
            collisions=ts.collisions + unsafe.astype(jnp.int32),
            f_excess=ts.f_excess + f_over.astype(jnp.int32),
        )
        new_state = new_state.replace(task_state=ts)
        obs["wiped_markers"] = wiped
        success = jnp.all(wiped)
        info = dict(info, nwipedmarkers=jnp.sum(wiped), colls=ts.collisions,
                    percent_viapoints_=jnp.mean(wiped.astype(jnp.float32)),
                    f_excess=ts.f_excess, total_force_ee=total_force)
        if self.early_terminations:
            # reference _check_terminated (wipe.py:707-737): collision,
            # success, or joint limit ends the episode early
            done = done | unsafe | success
        return new_state, obs, reward, done, info

    def _wipe_reward(self, physics, kin, wiped, newly, unsafe, total_force):
        """Reference wipe.py:386-505 reward structure incl. the force
        terms: excess-force penalty above pressure_threshold_max, pressing
        reward in (pressure_threshold, pressure_threshold_max] while
        touching, and the collision/limit branch that replaces ALL other
        terms with arm_limit_collision_penalty."""
        cfg = self.task_config
        r = jnp.sum(newly) * cfg["unit_wiped_reward"]
        all_wiped = jnp.all(wiped)
        f_over = total_force > cfg["pressure_threshold_max"]
        if self.reward_shaping:
            markers = self._marker_positions(kin)
            eef = kin.site_xpos[self.eef_site]
            active = ~wiped
            n_active = jnp.maximum(jnp.sum(active), 1)
            centroid = jnp.sum(jnp.where(active[:, None], markers, 0.0), axis=0) / n_active
            dist = jnp.linalg.norm(centroid - eef)
            reach = cfg["distance_multiplier"] * (
                1.0 - jnp.tanh(cfg["distance_th_multiplier"] * dist)
            )
            reach = jnp.where(all_wiped, 0.0, reach)
            touching = self._any_contact(kin, self._tool_table_rows)
            r = r + reach + jnp.where(touching, cfg["wipe_contact_reward"], 0.0)
            # force terms (reference wipe.py:483-493)
            press = (total_force > cfg["pressure_threshold"]) & touching & ~f_over
            r = r - jnp.where(f_over, cfg["excess_force_penalty_mul"] * total_force, 0.0)
            r = r + jnp.where(press, cfg["wipe_contact_reward"] + 0.01 * total_force, 0.0)
        r = r + jnp.where(all_wiped, cfg["task_complete_reward"], 0.0)
        if self.reward_shaping:
            # the collision/limit branch replaces everything
            r = jnp.where(unsafe, cfg["arm_limit_collision_penalty"], r)
        else:
            r = jnp.where(unsafe, 0.0, r)
        if self.reward_scale is not None:
            denom = (
                self.num_markers * cfg["unit_wiped_reward"]
                + self.horizon * (cfg["wipe_contact_reward"] + cfg["task_complete_reward"])
            )
            r = r * self.reward_scale * self.horizon / denom
        return r, f_over

    def _check_success(self, physics, kin, task_state=None):
        """All markers wiped. Success lives in task_state (the wiped
        flags); callers holding an EnvState pass state.task_state."""
        if task_state is not None and getattr(task_state, "wiped", None) is not None:
            return jnp.all(task_state.wiped)
        return jnp.asarray(False)

    def _get_observations(self, physics, kin):
        from robosuite_tpu.utils import transforms as T

        robot = self.robots[0]
        qp = physics.qpos[jnp.asarray(robot.arm_qpos_idx["right"])]
        eef_pos = kin.site_xpos[self.eef_site]
        markers = self._marker_positions(kin)
        return {
            "robot0_joint_pos": qp,
            "robot0_joint_pos_cos": jnp.cos(qp),
            "robot0_joint_pos_sin": jnp.sin(qp),
            "robot0_joint_vel": physics.qvel[jnp.asarray(robot.arm_qvel_idx["right"])],
            "robot0_eef_pos": eef_pos,
            "robot0_eef_quat": T.convert_quat(T.mat2quat_wxyz(kin.site_xmat[self.eef_site]), to="xyzw"),
            "marker_pos": markers,
            "marker_to_eef": markers - eef_pos[None, :],
        }
