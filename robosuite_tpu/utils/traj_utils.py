"""Trajectory interpolation.

Re-derivation of reference utils/traj_utils.py:25-141 (LinearInterpolator)
in functional form: the interpolator's (start, goal, step) become explicit
state threaded through the controller's two clocks. Linear for positions,
slerp for orientations.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax.numpy as jnp
from flax import struct

from robosuite_tpu.utils import transforms as T


@dataclasses.dataclass(frozen=True)
class LinearInterpolatorConfig:
    ndim: int
    controller_freq: float = 500.0
    policy_freq: float = 20.0
    ramp_ratio: float = 0.2
    ori_interpolate: Optional[str] = None  # None | "euler" | "quat"

    @property
    def total_steps(self) -> int:
        """reference traj_utils.py:63-66."""
        import math

        return max(int(math.ceil(self.ramp_ratio * self.controller_freq / self.policy_freq)), 1)


@struct.dataclass
class LinearInterpolatorState:
    start: Any
    goal: Any
    step: Any  # int32


def init_state(cfg: LinearInterpolatorConfig) -> LinearInterpolatorState:
    if cfg.ori_interpolate == "quat":
        z = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    else:
        z = jnp.zeros(cfg.ndim)
    return LinearInterpolatorState(start=z, goal=z, step=jnp.asarray(0, dtype=jnp.int32))


def set_goal(cfg: LinearInterpolatorConfig, state: LinearInterpolatorState, goal) -> LinearInterpolatorState:
    """reference traj_utils.py:101-117: start <- previous goal, step <- 0."""
    return LinearInterpolatorState(start=state.goal, goal=goal, step=jnp.asarray(0, dtype=jnp.int32))


def get_interpolated_goal(cfg: LinearInterpolatorConfig, state: LinearInterpolatorState):
    """reference traj_utils.py:119-141. Returns (value, new_state)."""
    frac = jnp.minimum((state.step + 1) / cfg.total_steps, 1.0)
    if cfg.ori_interpolate is not None:
        if cfg.ori_interpolate == "euler":
            q0 = T.mat2quat(T.euler2mat(state.start))
            q1 = T.mat2quat(T.euler2mat(state.goal))
        else:
            q0, q1 = state.start, state.goal
        q = T.quat_slerp(q0, q1, frac)
        out = T.mat2euler(T.quat2mat(q)) if cfg.ori_interpolate == "euler" else q
    else:
        out = state.start + (state.goal - state.start) * frac
    return out, state.replace(step=state.step + 1)
