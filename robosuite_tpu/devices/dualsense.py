"""Sony DualSense (PS5) gamepad teleop device.

Re-derivation of reference devices/dualsense.py: left stick drives x/y,
L2 trigger (sign-flipped by L1) drives z, right stick drives roll/pitch,
R2 trigger (sign-flipped by R1) drives yaw; Circle toggles grasp, Square
resets. Stick/trigger decoding is a pure function (`sticks_to_control`)
so the mapping is unit-testable without hardware; the class gates on the
`pydualsense` module and degrades to a zero-action device when absent.
"""

from __future__ import annotations

import numpy as np

from robosuite_tpu.devices.device import Device, DeviceState


def axis_to_control(v: float, scale: float = 127.0) -> float:
    """Centered stick byte (already offset to [-128, 127]) -> [-1, 1]
    with a small deadzone (reference dualsense.py:378-386 scale usage)."""
    x = float(np.clip(v / scale, -1.0, 1.0))
    return 0.0 if abs(x) < 0.05 else x


def sticks_to_control(
    lx: float,
    ly: float,
    rx: float,
    ry: float,
    l2: float,
    r2: float,
    l1: bool = False,
    r1: bool = False,
    reverse_xy: bool = False,
) -> np.ndarray:
    """-> (dx, dy, dz, droll, dpitch, dyaw) in [-1, 1]
    (reference dualsense.py:372-396: L1/R1 flip the trigger-driven axis
    sign so one trigger covers both directions)."""
    x = axis_to_control(ly if reverse_xy else lx)
    y = axis_to_control(lx if reverse_xy else ly)
    roll = axis_to_control(ry if reverse_xy else rx)
    pitch = axis_to_control(rx if reverse_xy else ry)
    z = float(np.clip(l2 / 255.0, 0.0, 1.0))
    if l1:
        z = -z
    yaw = float(np.clip(r2 / 255.0, 0.0, 1.0))
    if r1:
        yaw = -yaw
    return np.array([x, y, z, roll, pitch, yaw])


class DualSense(Device):
    """PS5 pad -> delta-OSC actions (reference devices/dualsense.py:170+)."""

    def __init__(self, env, pos_sensitivity=1.0, rot_sensitivity=1.0, reverse_xy=False, **kwargs):
        super().__init__(env, pos_sensitivity, rot_sensitivity, **kwargs)
        self.reverse_xy = reverse_xy
        self._ds = None
        self._grasp = -1.0
        self._reset = False
        self._prev_circle = False
        self._prev_square = False

    def start_control(self):
        try:
            from pydualsense import pydualsense
        except ImportError:
            return
        try:
            self._ds = pydualsense()
            self._ds.init()
        except Exception:
            self._ds = None

    def stop(self):
        if self._ds is not None:
            self._ds.close()
            self._ds = None

    def _poll_buttons(self, circle: bool, square: bool):
        """Edge-triggered toggles (reference dualsense.py:398-414
        _check_btn_changed)."""
        if circle and not self._prev_circle:
            self._grasp = -self._grasp
        if square and not self._prev_square:
            self._reset = True
        self._prev_circle = circle
        self._prev_square = square

    def get_controller_state(self) -> DeviceState:
        if self._ds is None:
            return DeviceState(np.zeros(3), np.zeros(3), self._grasp, self._reset)
        st = self._ds.state
        self._poll_buttons(bool(st.circle), bool(st.square))
        c = sticks_to_control(
            st.LX, st.LY, st.RX, st.RY, st.L2, st.R2,
            l1=bool(st.L1), r1=bool(st.R1), reverse_xy=self.reverse_xy,
        )
        return DeviceState(
            dpos=c[:3].astype(np.float64),
            raw_drotation=c[3:].astype(np.float64),
            grasp=self._grasp,
            reset=self._reset,
        )
