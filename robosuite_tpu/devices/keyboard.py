"""Keyboard teleop device.

Re-derivation of reference devices/keyboard.py (pynput listener mapping
WASD/arrow keys to eef deltas). Falls back to a no-op state when pynput is
unavailable (headless TPU pods) so demo scripts still import.
"""

from __future__ import annotations

import numpy as np

from robosuite_tpu.devices.device import Device, DeviceState


class Keyboard(Device):
    """Key bindings (reference keyboard.py):
    w/s: move x, a/d: move y, r/f: move z, q/e: rotate roll,
    z/x: yaw, t/g: pitch, space: toggle gripper, q(uit): reset.
    """

    def __init__(self, env, pos_sensitivity=1.0, rot_sensitivity=1.0, **kwargs):
        super().__init__(env, pos_sensitivity, rot_sensitivity, **kwargs)
        self._state = DeviceState(np.zeros(3), np.zeros(3))
        self._grasp = -1.0
        self._listener = None
        self._reset = False
        self._step = 0.05

    def start_control(self):
        try:
            from pynput import keyboard
        except ImportError:
            return  # headless: stays a zero-action device

        def on_press(key):
            try:
                ch = key.char
            except AttributeError:
                if key == keyboard.Key.space:
                    self._grasp = -self._grasp
                return
            d = self._step
            mapping = {
                "w": (0, d), "s": (0, -d), "a": (1, d), "d": (1, -d),
                "r": (2, d), "f": (2, -d),
            }
            rot = {"z": (2, 0.1), "x": (2, -0.1), "t": (1, 0.1), "g": (1, -0.1),
                   "c": (0, 0.1), "v": (0, -0.1)}
            if ch in mapping:
                i, dv = mapping[ch]
                self._state.dpos[i] += dv
            elif ch in rot:
                i, dv = rot[ch]
                self._state.raw_drotation[i] += dv
            elif ch == "q":
                self._reset = True

        self._listener = keyboard.Listener(on_press=on_press)
        self._listener.start()

    def get_controller_state(self) -> DeviceState:
        st = DeviceState(self._state.dpos.copy(), self._state.raw_drotation.copy(), self._grasp, self._reset)
        self._state.dpos[:] = 0
        self._state.raw_drotation[:] = 0
        return st
