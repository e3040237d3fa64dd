"""Global configuration flags.

TPU-native analog of the reference's flag system (robosuite/macros.py:11-59).
Values here are *trace-time* constants: they are baked into compiled models and
jitted step functions, which is the TPU-idiomatic equivalent of the reference's
module-global mutable flags.
"""

import os

# Physics timestep stamped into every compiled world (reference: macros.py:11,
# models/world.py:14-15). 500 Hz.
SIMULATION_TIMESTEP = 0.002

# Default policy frequency (reference: environments/base.py:102).
DEFAULT_CONTROL_FREQ = 20

# Default episode horizon in policy steps (reference: environments/base.py:104).
DEFAULT_HORIZON = 1000

# Image convention for camera observations ("opengl" or "opencv").
IMAGE_CONVENTION = "opengl"

# Default dtype for physics state. float32 is the TPU-native choice; the
# engine accumulates sensitive reductions (CRBA/RNEA) in float32 which is
# sufficient for the <=1e-3 torque-parity budget.
DEFAULT_DTYPE = "float32"

# Root for optional on-disk MJCF assets (only needed by the MJCF importer,
# never by the built-in programmatic models). Overridable via env var.
ASSET_ROOT = os.environ.get("ROBOSUITE_TPU_ASSETS", None)

# Logging levels, mirroring reference macros.py:46-48.
CONSOLE_LOGGING_LEVEL = "WARN"
FILE_LOGGING_LEVEL = None

# Allow a user-local override module, mirroring the reference's
# macros_private.py mechanism (reference macros.py:51-59).
try:  # pragma: no cover
    from robosuite_tpu.macros_private import *  # noqa: F401,F403
except ImportError:
    pass
