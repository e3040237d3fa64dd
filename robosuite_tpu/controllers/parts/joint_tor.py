"""Joint torque controller (JOINT_TORQUE).

Re-derivation of reference controllers/parts/generic/joint_tor.py:60-165:
scaled torque pass-through + gravity compensation.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
from flax import struct

from robosuite_tpu.controllers import control_utils as C
from robosuite_tpu.controllers.base import ArmView, nums2array


@dataclasses.dataclass(frozen=True)
class JointTorConfig:
    dim: int = 7
    input_max: Any = 1.0
    input_min: Any = -1.0
    output_max: Any = 0.05
    output_min: Any = -0.05
    use_torque_compensation: bool = True

    @property
    def control_dim(self) -> int:
        return self.dim

    def arrays(self):
        d = self.dim
        return dict(
            input_max=jnp.asarray(nums2array(self.input_max, d)),
            input_min=jnp.asarray(nums2array(self.input_min, d)),
            output_max=jnp.asarray(nums2array(self.output_max, d)),
            output_min=jnp.asarray(nums2array(self.output_min, d)),
        )


@struct.dataclass
class JointTorState:
    goal_torque: Any


def init_state(cfg: JointTorConfig) -> JointTorState:
    return JointTorState(goal_torque=jnp.zeros(cfg.dim))


def set_goal(cfg: JointTorConfig, state: JointTorState, action, torque_min, torque_max) -> JointTorState:
    arrs = cfg.arrays()
    goal = C.scale_action(action, arrs["input_min"], arrs["input_max"], arrs["output_min"], arrs["output_max"])
    return JointTorState(goal_torque=jnp.clip(goal, torque_min, torque_max))


def run(cfg: JointTorConfig, state: JointTorState, view: ArmView):
    if cfg.use_torque_compensation:
        return state.goal_torque + view.torque_compensation
    return state.goal_torque
