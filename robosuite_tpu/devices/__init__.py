from robosuite_tpu.devices.device import Device  # noqa: F401
from robosuite_tpu.devices.dualsense import DualSense  # noqa: F401
from robosuite_tpu.devices.keyboard import Keyboard  # noqa: F401
from robosuite_tpu.devices.mjgui import MjGUI  # noqa: F401
from robosuite_tpu.devices.spacemouse import SpaceMouse  # noqa: F401
