from robosuite_tpu.devices.device import Device  # noqa: F401
from robosuite_tpu.devices.keyboard import Keyboard  # noqa: F401
