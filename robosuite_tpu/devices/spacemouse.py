"""3Dconnexion SpaceMouse teleop device.

Re-derivation of reference devices/spacemouse.py: a HID listener thread
parses 6-dof puck reports into eef deltas; left button toggles the gripper,
right button requests a reset. The raw-report decoding is exposed as pure
functions (`to_int16`, `scale_to_control`, `parse_hid_report`) so the
mapping is unit-testable without hardware; the device class gates on the
`hid` module and degrades to a zero-action device when absent (headless
TPU pods).
"""

from __future__ import annotations

import threading
import time

import numpy as np

from robosuite_tpu.devices.device import Device, DeviceState

SPACEMOUSE_VENDOR_ID = 0x256F
SPACEMOUSE_PRODUCT_ID = 0xC62E


def to_int16(lo: int, hi: int) -> int:
    """Two little-endian bytes -> signed 16-bit int
    (reference spacemouse.py:55-69)."""
    x = (hi << 8) | lo
    if x >= 32768:
        x -= 65536
    return x


def scale_to_control(x: float, axis_scale: float = 350.0, min_v: float = -1.0, max_v: float = 1.0) -> float:
    """Raw axis value -> [-1, 1] control (reference spacemouse.py:72-87)."""
    return float(np.clip(x / axis_scale, min_v, max_v))


def parse_hid_report(data) -> tuple:
    """Decode one 6-dof HID report.

    Returns (kind, payload): kind "pos" -> (x, y, z), "rot" ->
    (roll, pitch, yaw), "button" -> (left, right), or (None, None) for
    unknown report ids. Newer devices pack all six axes in report id 1
    (13 bytes); older ones split translation (id 1) / rotation (id 2)
    (reference spacemouse.py:246-287 run()).
    """
    if not data:
        return None, None
    if data[0] == 1:
        if len(data) >= 13:
            x = scale_to_control(to_int16(data[1], data[2]))
            y = scale_to_control(to_int16(data[3], data[4]))
            z = scale_to_control(to_int16(data[5], data[6])) * -1.0
            roll = scale_to_control(to_int16(data[7], data[8]))
            pitch = scale_to_control(to_int16(data[9], data[10]))
            yaw = scale_to_control(to_int16(data[11], data[12]))
            return "all", (x, y, z, roll, pitch, yaw)
        x = scale_to_control(to_int16(data[1], data[2]))
        y = scale_to_control(to_int16(data[3], data[4]))
        z = scale_to_control(to_int16(data[5], data[6])) * -1.0
        return "pos", (x, y, z)
    if data[0] == 2:
        roll = scale_to_control(to_int16(data[1], data[2]))
        pitch = scale_to_control(to_int16(data[3], data[4]))
        yaw = scale_to_control(to_int16(data[5], data[6]))
        return "rot", (roll, pitch, yaw)
    if data[0] == 3:
        left = bool(data[1] & 1)
        right = bool(data[1] & 2)
        return "button", (left, right)
    return None, None


class SpaceMouse(Device):
    """6-dof puck -> delta-OSC actions (reference devices/spacemouse.py:104+).

    Left button toggles grasp; right button flags a reset. Without the
    `hid` module (or with no device plugged in) this is a zero-action
    device, so demo scripts import and run headless.
    """

    def __init__(
        self,
        env,
        pos_sensitivity=1.0,
        rot_sensitivity=1.0,
        vendor_id=SPACEMOUSE_VENDOR_ID,
        product_id=SPACEMOUSE_PRODUCT_ID,
        **kwargs,
    ):
        super().__init__(env, pos_sensitivity, rot_sensitivity, **kwargs)
        self.vendor_id = vendor_id
        self.product_id = product_id
        self._control = np.zeros(6)
        self._grasp = -1.0
        self._reset = False
        self._device = None
        self._thread = None
        self._running = False

    def start_control(self):
        try:
            import hid
        except ImportError:
            return
        try:
            self._device = hid.device()
            self._device.open(self.vendor_id, self.product_id)
        except Exception:
            self._device = None
            return
        self._running = True
        self._thread = threading.Thread(target=self._listen, daemon=True)
        self._thread.start()

    def _listen(self):
        while self._running and self._device is not None:
            data = self._device.read(13, timeout_ms=50)
            kind, payload = parse_hid_report(data)
            if kind == "all":
                self._control[:] = payload
            elif kind == "pos":
                self._control[:3] = payload
            elif kind == "rot":
                self._control[3:] = payload
            elif kind == "button":
                left, right = payload
                if left:
                    self._grasp = -self._grasp
                if right:
                    self._reset = True
            time.sleep(0.0)

    def stop(self):
        self._running = False
        if self._device is not None:
            self._device.close()
            self._device = None

    def get_controller_state(self) -> DeviceState:
        c = self._control
        return DeviceState(
            dpos=np.array(c[:3], dtype=np.float64),
            raw_drotation=np.array([c[3], c[4], c[5]], dtype=np.float64),
            grasp=self._grasp,
            reset=self._reset,
        )
