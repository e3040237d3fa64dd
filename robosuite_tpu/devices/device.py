"""Teleoperation device base: device state -> env action.

Re-derivation of reference devices/device.py:90-328 (input2action /
get_arm_action) against the functional env API. A device produces a
DeviceState (dpos, rotation delta, gripper, reset) and input2action maps it
to the env's action vector for delta-OSC arms + ramped grippers.
"""

from __future__ import annotations

import abc
import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass
class DeviceState:
    dpos: np.ndarray                # (3,) translation delta command
    raw_drotation: np.ndarray       # (3,) euler delta command
    grasp: float = 0.0              # -1 open .. 1 close
    reset: bool = False


class Device(metaclass=abc.ABCMeta):
    """reference devices/device.py."""

    def __init__(self, env, pos_sensitivity=1.0, rot_sensitivity=1.0, active_arm="right"):
        self.env = env
        self.pos_sensitivity = pos_sensitivity
        self.rot_sensitivity = rot_sensitivity
        self.active_arm = active_arm

    @abc.abstractmethod
    def start_control(self):
        ...

    @abc.abstractmethod
    def get_controller_state(self) -> DeviceState:
        ...

    def input2action(self) -> Optional[np.ndarray]:
        """Map current device state to a full env action
        (reference device.py:90-202; delta-OSC arms)."""
        st = self.get_controller_state()
        if st.reset:
            return None
        action = np.zeros(self.env.action_dim, dtype=np.float32)
        # arm slice: [dpos (3), drot (3)] scaled into [-1, 1]
        arm = np.concatenate(
            [
                np.clip(st.dpos * self.pos_sensitivity, -1, 1),
                np.clip(st.raw_drotation * self.rot_sensitivity, -1, 1),
            ]
        )
        action[:6] = arm
        if self.env.action_dim > 6:
            action[6] = st.grasp
        return action
