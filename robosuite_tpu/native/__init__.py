"""Native (C++) runtime components.

Built on demand with g++ (no pybind11 dependency; plain C ABI via ctypes).
"""

from robosuite_tpu.native.trajlog import TrajectoryLog, read_log  # noqa: F401
