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
        (reference device.py:90-202 input2action + :204-328 get_arm_action:
        the command lands in the ACTIVE arm's slice of the composite action
        layout; other arms hold zero/no-op)."""
        st = self.get_controller_state()
        if st.reset:
            return None
        action = np.zeros(self.env.action_dim, dtype=np.float32)
        # arm slice: [dpos (3), drot (3)] scaled into [-1, 1]
        arm_cmd = np.concatenate(
            [
                np.clip(st.dpos * self.pos_sensitivity, -1, 1),
                np.clip(st.raw_drotation * self.rot_sensitivity, -1, 1),
            ]
        )
        robot = self.env.robots[0] if getattr(self.env, "robots", None) else None
        split = robot.action_split_indexes() if robot is not None else {}
        arm = self.active_arm if self.active_arm in split else (
            robot.arms[0] if robot is not None else "right"
        )
        if arm in split:
            s, e = split[arm]
            w = min(e - s, 6)
            action[s : s + w] = arm_cmd[:w]
            gkey = f"{arm}_gripper"
            if gkey in split and split[gkey][1] > split[gkey][0]:
                gs, ge = split[gkey]
                action[gs:ge] = st.grasp
        else:  # no robot handle: legacy head-of-vector layout
            action[:6] = arm_cmd
            if self.env.action_dim > 6:
                action[6] = st.grasp
        return action
