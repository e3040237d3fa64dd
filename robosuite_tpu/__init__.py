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

import os as _os

# Persistent XLA compilation cache: the 25-substep jitted policy step takes
# minutes to compile cold; caching makes every process after the first start
# in seconds. Opt out with RS_TPU_NO_COMPILE_CACHE=1.
if not _os.environ.get("RS_TPU_NO_COMPILE_CACHE"):
    import jax as _jax

    _cache_dir = _os.environ.get(
        "RS_TPU_COMPILE_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "robosuite_tpu_xla"),
    )
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # cache is an optimization, never a hard dependency
        pass

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
