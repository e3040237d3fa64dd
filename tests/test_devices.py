"""Teleop device mapping tests (hardware-free paths).

The reference exercises devices only interactively; here the pure decode/
mapping functions (HID report parsing, stick scaling, drag-target deltas)
are tested directly, plus input2action end-to-end against a live env.
"""

import numpy as np
import pytest

from robosuite_tpu.devices import DualSense, Keyboard, MjGUI, SpaceMouse
from robosuite_tpu.devices.dualsense import sticks_to_control
from robosuite_tpu.devices.spacemouse import parse_hid_report, scale_to_control, to_int16


def test_to_int16_roundtrip():
    assert to_int16(0, 0) == 0
    assert to_int16(0xFF, 0x7F) == 32767
    assert to_int16(0x00, 0x80) == -32768
    assert to_int16(0x2C, 0x01) == 300


def test_scale_to_control_clips():
    assert scale_to_control(350.0) == 1.0
    assert scale_to_control(-350.0) == -1.0
    assert scale_to_control(700.0) == 1.0
    assert abs(scale_to_control(175.0) - 0.5) < 1e-9


def test_parse_hid_report_13byte():
    # x=+350 raw -> 1.0; others zero; z sign-flipped
    data = [1, 0x5E, 0x01] + [0, 0] * 5
    kind, payload = parse_hid_report(data)
    assert kind == "all"
    assert payload[0] == 1.0 and all(v == 0.0 for v in payload[1:])


def test_parse_hid_report_split_and_buttons():
    kind, payload = parse_hid_report([2, 0x5E, 0x01, 0, 0, 0, 0])
    assert kind == "rot" and payload[0] == 1.0
    kind, payload = parse_hid_report([3, 0b11])
    assert kind == "button" and payload == (True, True)
    assert parse_hid_report([9, 1, 2]) == (None, None)
    assert parse_hid_report([]) == (None, None)


def test_dualsense_stick_mapping():
    c = sticks_to_control(127, 0, 0, 0, 0, 0)
    assert c[0] == 1.0 and c[1] == 0.0
    # deadzone
    c = sticks_to_control(3, 0, 0, 0, 0, 0)
    assert c[0] == 0.0
    # L1 flips the z trigger, R1 flips yaw
    c = sticks_to_control(0, 0, 0, 0, 255, 255, l1=True, r1=False)
    assert c[2] == -1.0 and c[5] == 1.0
    # reverse_xy swaps the stick axes
    c = sticks_to_control(127, 0, 0, 0, 0, 0, reverse_xy=True)
    assert c[0] == 0.0 and c[1] == 1.0


def test_mjgui_target_deltas():
    class _Env:
        action_dim = 7

    dev = MjGUI(_Env())
    dev.update_eef(np.zeros(3))
    dev.set_target(np.array([1.0, -0.01, 0.0]))
    st = dev.get_controller_state()
    # clipped at max_step on x, exact on small y
    np.testing.assert_allclose(st.dpos, [0.05, -0.01, 0.0])
    dev.set_grasp(True)
    assert dev.get_controller_state().grasp == 1.0


def test_headless_devices_are_zero_action(lift_env):
    for cls in (Keyboard, SpaceMouse, DualSense):
        dev = cls(lift_env)
        dev.start_control()  # no hardware: silently degrades
        a = dev.input2action()
        assert a is not None and a.shape == (lift_env.action_dim,)
        np.testing.assert_array_equal(a[:6], 0.0)


def test_input2action_routes_to_active_arm():
    """The device command lands in the ACTIVE arm's slice of the composite
    action layout (reference device.py:204-328 get_arm_action routing)."""
    import robosuite_tpu
    from robosuite_tpu.devices.device import Device, DeviceState

    env = robosuite_tpu.make("TwoArmLift", robots=("Panda", "Panda"))

    class Scripted(Device):
        def start_control(self):
            pass

        def get_controller_state(self):
            return DeviceState(
                dpos=np.array([0.5, 0.0, 0.0]),
                raw_drotation=np.zeros(3),
                grasp=1.0,
            )

    # two robots -> robots[0] owns the right arm only; route to it
    dev = Scripted(env, active_arm="right")
    act = dev.input2action()
    split = env.robots[0].action_split_indexes()
    s, e = split["right"]
    assert act[s] == 0.5
    gs, ge = split["right_gripper"]
    if ge > gs:
        assert act[gs] == 1.0
    # everything outside the commanded slices stays zero
    mask = np.ones(env.robots[0].action_dim, dtype=bool)
    mask[s:s + 6] = False
    mask[gs:ge] = False
    assert np.all(act[: env.robots[0].action_dim][mask] == 0)
