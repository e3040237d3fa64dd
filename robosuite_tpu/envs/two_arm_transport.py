"""TwoArmTransport: move the payload to the target bin, trash to the trash bin.

Re-derivation of reference environments/manipulation/two_arm_transport.py:
staged multi-phase reward (:226+), success = payload in target bin AND trash
in trash bin (:596-603). The Transport group (start bin + lid, target bin,
trash bin, payload, trash — models/objects/group/transport.py) is re-derived
from open-box/lid primitives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from robosuite_tpu.envs.base import RobotEnv, register_env
from robosuite_tpu.models import spec as S
from robosuite_tpu.models.arenas import MultiTableArena
from robosuite_tpu.models.objects import BoxObject
from robosuite_tpu.models.objects.composite_objects import (
    BinObject,
    HammerObject,
    LidObject,
)

# shared-library aliases (the env predates the promoted classes)
OpenBin = BinObject
BinLid = LidObject
from robosuite_tpu.models.tasks import ManipulationTask
from robosuite_tpu.utils import transforms as T
from robosuite_tpu.envs.two_arm import _normalize_two_arm, _place_two_robots, _two_arm_pairs, _two_eef_sites


@register_env
class TwoArmTransport(RobotEnv):
    def __init__(
        self,
        robots=("Panda", "Panda"),
        env_configuration="opposed",
        tables_full_size=(0.35, 0.7, 0.05),
        reward_scale=1.0,
        reward_shaping=False,
        **kwargs,
    ):
        robots, self.env_configuration = _normalize_two_arm(robots, env_configuration)
        self.tables_full_size = np.array(tables_full_size)
        self.table_offsets = np.array([[-0.35, 0, 0.8], [0.35, 0, 0.8]])
        self.height_threshold = 0.1
        super().__init__(robots=robots, reward_scale=reward_scale, reward_shaping=reward_shaping, **kwargs)

    def _load_model(self):
        _place_two_robots(self.robot_models, self.env_configuration, 1.4)
        arena = MultiTableArena(
            table_offsets=self.table_offsets,
            table_full_sizes=self.tables_full_size,
        )
        self.payload = HammerObject("payload", handle_length=0.14)
        self.trash = BoxObject("trash", size=[0.02, 0.02, 0.02], rgba=[0.2, 0.6, 0.2, 1])
        self.start_bin = OpenBin("start_bin")
        self.target_bin = OpenBin("target_bin")
        self.trash_bin = OpenBin("trash_bin")
        self.lid = BinLid("lid")

        # fixed bin placements on the two tables (reference transport.py group
        # layout: start+trash near arm0's table, target near arm1's)
        t0, t1 = self.table_offsets[0], self.table_offsets[1]
        for bin_obj, pos in (
            (self.start_bin, t0 + np.array([0.0, -0.15, 0.06])),
            (self.trash_bin, t0 + np.array([0.0, 0.15, 0.06])),
            (self.target_bin, t1 + np.array([0.0, 0.15, 0.06])),
        ):
            root = bin_obj.get_obj()
            root.pos = pos
        self.task = ManipulationTask(
            arena, self.robot_models,
            [self.payload, self.trash, self.start_bin, self.target_bin, self.trash_bin, self.lid],
        )

    def _setup_references(self):
        m = self.model
        self.payload_body = m.body_name2id(self.payload.root_body)
        self.trash_body = m.body_name2id(self.trash.root_body)
        self.lid_body = m.body_name2id(self.lid.root_body)
        self.eef_sites = _two_eef_sites(self.robots)
        self._payload_grasp = [
            self.grasp_rows(i, arm, self.payload.handle_geoms)
            for i, _, arm in _two_arm_pairs(self.robots)
        ]
        t0, t1 = self.table_offsets[0], self.table_offsets[1]
        self.start_bin_pos = t0 + np.array([0.0, -0.15, 0.06])
        self.trash_bin_pos = t0 + np.array([0.0, 0.15, 0.06])
        self.target_bin_pos = t1 + np.array([0.0, 0.15, 0.06])
        # payload starts in start bin, trash on table 0, lid on start bin
        self._init_payload = np.concatenate([self.start_bin_pos + [0, 0, 0.05], [1, 0, 0, 0]])
        self._init_trash = np.concatenate([t0 + [0.0, 0.0, 0.05 + 0.02], [1, 0, 0, 0]])
        self._init_lid = np.concatenate([self.start_bin_pos + [0, 0, 0.12], [1, 0, 0, 0]])

    def _sample_placements(self, rng):
        m = self.model
        idx = []
        vals = []
        for obj, init in (
            (self.payload, self._init_payload),
            (self.trash, self._init_trash),
            (self.lid, self._init_lid),
        ):
            sl = m.jnt_qpos_slice(f"{obj.name}_joint0")
            idx.append(np.arange(sl.start, sl.stop))
            vals.append(jnp.asarray(init, dtype=jnp.float32))
        k1, rng = jax.random.split(rng)
        return jnp.asarray(np.concatenate(idx)), jnp.concatenate(vals), rng

    def _in_bin(self, pos, bin_pos, half=(0.09, 0.09)):
        bp = jnp.asarray(bin_pos, dtype=pos.dtype)
        return (
            (jnp.abs(pos[0] - bp[0]) < half[0])
            & (jnp.abs(pos[1] - bp[1]) < half[1])
            & (jnp.abs(pos[2] - bp[2]) < 0.12)
        )

    def _check_success(self, physics, kin):
        """reference two_arm_transport.py:596-603."""
        payload_in = self._in_bin(kin.xpos[self.payload_body], self.target_bin_pos)
        trash_in = self._in_bin(kin.xpos[self.trash_body], self.trash_bin_pos)
        return payload_in & trash_in

    def reward(self, obs, physics, kin):
        success = self._check_success(physics, kin)
        r = jnp.where(success, 1.0, 0.0)
        if self.reward_shaping:
            # staged: lid off start bin -> payload grasped -> payload near
            # target -> trash near trash bin (reference :226+ phases)
            lid_off = jnp.linalg.norm(
                kin.xpos[self.lid_body][:2] - jnp.asarray(self.start_bin_pos[:2], dtype=kin.xpos.dtype)
            ) > 0.12
            g0 = self.check_grasp(kin, *self._payload_grasp[0])
            g1 = self.check_grasp(kin, *self._payload_grasp[1])
            payload_d = jnp.linalg.norm(
                kin.xpos[self.payload_body] - jnp.asarray(self.target_bin_pos, dtype=kin.xpos.dtype)
            )
            trash_d = jnp.linalg.norm(
                kin.xpos[self.trash_body] - jnp.asarray(self.trash_bin_pos, dtype=kin.xpos.dtype)
            )
            shaped = (
                0.1 * lid_off
                + 0.2 * (g0 | g1)
                + 0.35 * (1.0 - jnp.tanh(3.0 * payload_d))
                + 0.35 * (1.0 - jnp.tanh(3.0 * trash_d))
            )
            r = jnp.where(success, 1.0, shaped)
        if self.reward_scale is not None:
            r = r * self.reward_scale
        return r

    def _get_observations(self, physics, kin):
        obs = {}
        for k, (i, robot, arm) in enumerate(_two_arm_pairs(self.robots)):
            obs[f"robot{k}_joint_pos"] = physics.qpos[jnp.asarray(robot.arm_qpos_idx[arm])]
            obs[f"robot{k}_eef_pos"] = kin.site_xpos[self.eef_sites[k]]
            obs[f"robot{k}_eef_quat"] = T.convert_quat(
                T.mat2quat_wxyz(kin.site_xmat[self.eef_sites[k]]), to="xyzw"
            )
        obs["payload_pos"] = kin.xpos[self.payload_body]
        obs["trash_pos"] = kin.xpos[self.trash_body]
        obs["lid_pos"] = kin.xpos[self.lid_body]
        return obs
