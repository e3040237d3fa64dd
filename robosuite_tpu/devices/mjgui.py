"""Programmatic drag-target teleop device.

The TPU-native analog of reference devices/mjgui.py, which reads drag
targets out of the MuJoCo viewer's perturbation state. There is no
interactive viewer on a headless TPU pod, so here the targets are set
programmatically (`set_target`) — e.g. from a script, a network bridge,
or the web renderer — and `get_controller_state` converts the world-frame
target into the delta command that steers the eef toward it, mirroring
the reference's absolute-pose mode (mjgui.py input2action with
goal_update_mode="target").
"""

from __future__ import annotations

import numpy as np

from robosuite_tpu.devices.device import Device, DeviceState


class MjGUI(Device):
    """Drag-to-target device: feed it a world target, it emits clipped
    deltas from the current eef pose each call."""

    def __init__(self, env, pos_sensitivity=1.0, rot_sensitivity=1.0, max_step=0.05, **kwargs):
        super().__init__(env, pos_sensitivity, rot_sensitivity, **kwargs)
        self.max_step = max_step
        self._target_pos = None
        self._target_euler = None
        self._grasp = -1.0
        self._reset = False
        self._eef_pos = None
        self._eef_euler = None

    def start_control(self):
        pass

    def set_target(self, pos, euler=None):
        """World-frame drag target (viewer perturbation analog)."""
        self._target_pos = np.asarray(pos, dtype=np.float64)
        self._target_euler = None if euler is None else np.asarray(euler, dtype=np.float64)

    def update_eef(self, pos, euler=None):
        """Feed the current eef pose (from env observations) so deltas can
        be computed; the viewer did this implicitly."""
        self._eef_pos = np.asarray(pos, dtype=np.float64)
        self._eef_euler = None if euler is None else np.asarray(euler, dtype=np.float64)

    def set_grasp(self, close: bool):
        self._grasp = 1.0 if close else -1.0

    def get_controller_state(self) -> DeviceState:
        if self._target_pos is None or self._eef_pos is None:
            return DeviceState(np.zeros(3), np.zeros(3), self._grasp, self._reset)
        dpos = np.clip(self._target_pos - self._eef_pos, -self.max_step, self.max_step)
        if self._target_euler is not None and self._eef_euler is not None:
            drot = np.clip(self._target_euler - self._eef_euler, -self.max_step, self.max_step)
        else:
            drot = np.zeros(3)
        return DeviceState(dpos=dpos, raw_drotation=drot, grasp=self._grasp, reset=self._reset)
