"""Teleoperate a Lift env from a device (reference
demos/demo_device_control.py). Keyboard/SpaceMouse/DualSense need real
hardware; without it a scripted device drives the same input2action path.

Usage: python -m robosuite_tpu.demos.demo_device_control [keyboard|spacemouse|dualsense|scripted]
"""

import sys

import jax
import numpy as np

import robosuite_tpu
from robosuite_tpu.devices.device import Device, DeviceState


class ScriptedDevice(Device):
    """Deterministic stand-in: push the eef forward-down, then close."""

    def __init__(self, env):
        super().__init__(env)
        self.t = 0

    def start_control(self):
        self.t = 0

    def get_controller_state(self) -> DeviceState:
        self.t += 1
        dpos = np.array([0.3, 0.0, -0.5]) if self.t < 15 else np.zeros(3)
        grasp = -1.0 if self.t < 15 else 1.0
        return DeviceState(dpos, np.zeros(3), grasp=grasp)


def make_device(kind, env):
    if kind == "keyboard":
        from robosuite_tpu.devices import Keyboard
        return Keyboard(env)
    if kind == "spacemouse":
        from robosuite_tpu.devices import SpaceMouse
        return SpaceMouse(env)
    if kind == "dualsense":
        from robosuite_tpu.devices import DualSense
        return DualSense(env)
    return ScriptedDevice(env)


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else "scripted"
    env = robosuite_tpu.make("Lift", robots="Panda", cube_size=[0.021, 0.021, 0.021])
    try:
        device = make_device(kind, env)
        device.start_control()
    except Exception as e:  # hardware not present
        print(f"{kind} unavailable ({e}); falling back to scripted device")
        device = ScriptedDevice(env)
        device.start_control()

    state, obs = env.reset(jax.random.PRNGKey(0))
    for t in range(25):
        action = device.input2action()
        if action is None:  # device asked for reset
            state, obs = env.reset(jax.random.PRNGKey(t))
            continue
        state, obs, reward, done, info = env.step(state, action)
        eef = np.asarray(obs["robot0_eef_pos"])
        print(f"t={t:2d} eef={eef.round(3)} reward={float(reward):.3f}")


if __name__ == "__main__":
    main()
