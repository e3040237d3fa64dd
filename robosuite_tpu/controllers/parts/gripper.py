"""Simple gripper controller (GRIP).

Re-derivation of reference controllers/parts/gripper/simple_grip.py:140-186:
the policy's [-1, 1] gripper command is rescaled into the gripper's actuator
ctrlrange (bias + weight * cmd) and written as actuator ctrl (the gripper's
position servos do the tracking — panda_gripper.xml kp=1000 actuators).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
from flax import struct

from robosuite_tpu.controllers import control_utils as C
from robosuite_tpu.controllers.base import nums2array


@dataclasses.dataclass(frozen=True)
class GripConfig:
    dim: int = 1             # gripper dof (actuator count)
    input_max: Any = 1.0
    input_min: Any = -1.0
    output_max: Any = 1.0
    output_min: Any = -1.0
    use_action_scaling: bool = True

    @property
    def control_dim(self) -> int:
        return self.dim


@struct.dataclass
class GripState:
    goal_qvel: Any


def init_state(cfg: GripConfig) -> GripState:
    return GripState(goal_qvel=jnp.zeros(cfg.dim))


def set_goal(cfg: GripConfig, state: GripState, action) -> GripState:
    if cfg.use_action_scaling:
        im = jnp.asarray(nums2array(cfg.input_min, cfg.dim))
        ix = jnp.asarray(nums2array(cfg.input_max, cfg.dim))
        om = jnp.asarray(nums2array(cfg.output_min, cfg.dim))
        ox = jnp.asarray(nums2array(cfg.output_max, cfg.dim))
        action = C.scale_action(action, im, ix, om, ox)
    return GripState(goal_qvel=action)


def run(cfg: GripConfig, state: GripState, actuator_min, actuator_max):
    """Returns actuator-space ctrl values (NOT torques)."""
    if cfg.use_action_scaling:
        bias = 0.5 * (actuator_max + actuator_min)
        weight = 0.5 * (actuator_max - actuator_min)
        return bias + weight * state.goal_qvel
    return state.goal_qvel
