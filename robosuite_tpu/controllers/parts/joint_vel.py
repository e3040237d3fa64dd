"""Joint velocity controller (JOINT_VELOCITY).

Re-derivation of reference controllers/parts/generic/joint_vel.py:140-210:
PID on joint velocity with anti-windup + gravity compensation. The PID
history (last error, summed error, derivative buffer, saturation flag) is
explicit state.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import struct

from robosuite_tpu.controllers import control_utils as C
from robosuite_tpu.controllers.base import ArmView, nums2array


@dataclasses.dataclass(frozen=True)
class JointVelConfig:
    dim: int = 7
    input_max: Any = 1.0
    input_min: Any = -1.0
    output_max: Any = 1.0
    output_min: Any = -1.0
    kp: Any = 0.25          # reference joint_vel.py default kp=0.25
    ki: Any = 0.0           # reference: ki = kp*0.005/kp ratio? default 0
    kd: Any = 0.0
    velocity_limits: Optional[Tuple[float, float]] = None
    derr_window: int = 5

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
class JointVelState:
    goal_vel: Any
    last_err: Any
    derr_buf: Any   # (window, dim) ring of d(err)
    summed_err: Any
    saturated: Any  # scalar bool


def init_state(cfg: JointVelConfig, view: ArmView) -> JointVelState:
    z = jnp.zeros(cfg.dim)
    return JointVelState(
        goal_vel=z,
        last_err=z,
        derr_buf=jnp.zeros((cfg.derr_window, cfg.dim)),
        summed_err=z,
        saturated=jnp.asarray(False),
    )


def set_goal(cfg: JointVelConfig, state: JointVelState, view: ArmView, action) -> JointVelState:
    arrs = cfg.arrays()
    goal = C.scale_action(action, arrs["input_min"], arrs["input_max"], arrs["output_min"], arrs["output_max"])
    if cfg.velocity_limits is not None:
        goal = jnp.clip(goal, cfg.velocity_limits[0], cfg.velocity_limits[1])
    return state.replace(goal_vel=goal)


def run(cfg: JointVelConfig, state: JointVelState, view: ArmView, actuator_min=None, actuator_max=None):
    """Returns (torques, new_state)."""
    err = state.goal_vel - view.joint_vel
    derr = err - state.last_err
    derr_buf = jnp.roll(state.derr_buf, 1, axis=0).at[0].set(derr)
    summed = jnp.where(state.saturated, state.summed_err, state.summed_err + err)

    kp = jnp.asarray(nums2array(cfg.kp, cfg.dim))
    ki = jnp.asarray(nums2array(cfg.ki, cfg.dim))
    kd = jnp.asarray(nums2array(cfg.kd, cfg.dim))
    torques = kp * err + ki * summed + kd * jnp.mean(derr_buf, axis=0) + view.torque_compensation

    if actuator_min is not None:
        clipped = jnp.clip(torques, actuator_min, actuator_max)
        saturated = jnp.sum(jnp.abs(clipped - torques)) != 0
    else:
        clipped = torques
        saturated = jnp.asarray(False)

    new_state = JointVelState(
        goal_vel=state.goal_vel, last_err=err, derr_buf=derr_buf, summed_err=summed, saturated=saturated
    )
    return clipped, new_state
