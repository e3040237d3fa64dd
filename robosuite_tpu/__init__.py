"""robosuite_tpu: a TPU-native robot manipulation framework.

A from-scratch re-derivation of the capabilities of ARISE-Initiative/
robosuite v1.5.2 (reference mounted at /root/reference) as a pure-JAX
functional stack: batched rigid-body dynamics (FK/CRBA/RNEA/contacts)
compiled by XLA, torque-exact controller laws, vectorized environments, and
an MPC engine (MPPI + iLQR) sharded over TPU meshes.

Public surface mirrors the reference's: `robosuite_tpu.make(env, robots=...)`
(reference robosuite/__init__.py:4-14, environments/base.py:23-42).
"""

__version__ = "0.1.0"

from robosuite_tpu import macros  # noqa: F401
from robosuite_tpu.envs.base import ALL_ENVIRONMENTS, REGISTERED_ENVS, make  # noqa: F401

# import env modules for registration side effects
from robosuite_tpu.envs import door, lift, nut_assembly, pick_place, stack, tool_hang, two_arm, two_arm_transport, wipe  # noqa: F401

ALL_ROBOTS = None


def __getattr__(name):
    if name == "ALL_ROBOTS":
        from robosuite_tpu.models.robots import REGISTERED_ROBOTS

        return sorted(REGISTERED_ROBOTS)
    raise AttributeError(name)
