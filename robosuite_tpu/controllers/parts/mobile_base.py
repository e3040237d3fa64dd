"""Mobile-base joint-velocity controller.

Re-derivation of the reference MobileBaseJointVelocityController
(controllers/parts/mobile_base/joint_vel.py:88-259): the policy commands a
base twist (vx, vy, wyaw) in the CURRENT base frame; the slide/slide/hinge
base joints are defined in the INITIAL base frame, so set_goal rotates the
planar components by -(yaw - yaw0) (joint_vel.py:203-216) before writing the
velocities straight into the base's velocity actuators, rescaled to their
ctrlrange (joint_vel.py:250-256).

Pure-functional: state is an explicit pytree; yaw angles are inputs, read by
the runtime robot from the base center site (mobile_base_controller.py:89-94).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax.numpy as jnp
from flax import struct

from robosuite_tpu.controllers.base import nums2array
from robosuite_tpu.controllers.control_utils import scale_action


@dataclasses.dataclass(frozen=True)
class MobileBaseJointVelConfig:
    dim: int = 3                      # forward, side, yaw
    input_max: Any = 1.0
    input_min: Any = -1.0
    output_max: Any = 1.0
    output_min: Any = -1.0

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
class MobileBaseState:
    goal_qvel: Any   # (dim,)
    init_yaw: Any    # () base yaw at episode start


def init_state(cfg: MobileBaseJointVelConfig, init_yaw) -> MobileBaseState:
    return MobileBaseState(goal_qvel=jnp.zeros(cfg.dim), init_yaw=jnp.asarray(init_yaw))


def set_goal(cfg: MobileBaseJointVelConfig, state: MobileBaseState, action, cur_yaw) -> MobileBaseState:
    """reference joint_vel.py:159-220 (fixed impedance path)."""
    arrs = cfg.arrays()
    scaled = scale_action(
        action, arrs["input_min"], arrs["input_max"], arrs["output_min"], arrs["output_max"]
    )
    theta = cur_yaw - state.init_yaw
    c, s = jnp.cos(theta), jnp.sin(theta)
    x, y = scaled[0], scaled[1]
    # rotate planar command from current base frame back into the initial
    # base frame where the slide joints live (joint_vel.py:209-216)
    goal = scaled.at[0].set(x * c + y * s).at[1].set(-x * s + y * c)
    return MobileBaseState(goal_qvel=goal, init_yaw=state.init_yaw)


def run(cfg: MobileBaseJointVelConfig, state: MobileBaseState, actuator_min, actuator_max):
    """-> ctrl values for the base velocity actuators (joint_vel.py:222-259)."""
    bias = 0.5 * (actuator_max + actuator_min)
    weight = 0.5 * (actuator_max - actuator_min)
    return bias + weight * state.goal_qvel
