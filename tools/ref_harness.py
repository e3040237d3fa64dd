"""Importable harness for running the reference robosuite on this machine.

Centralizes the environment shims (numba stub, missing visual meshes,
mujoco>=3.10 mj_fullM signature) that tools/gen_golden.py pioneered, so any
tool can do `from ref_harness import make_ref_env` to query ground truth.
"""

from __future__ import annotations

import os
import sys
import types

# numba is not installed; reference only uses jit as an optional decorator
_numba = types.ModuleType("numba")
_numba.jit = lambda *a, **k: (a[0] if (len(a) == 1 and callable(a[0])) else (lambda f: f))
sys.modules.setdefault("numba", _numba)

sys.path.insert(0, "/root/reference")

import robosuite  # noqa: E402
from robosuite.models import base as rs_base  # noqa: E402

_orig_get_model = rs_base.MujocoXML.get_model


def _patched_get_model(self, mode="mujoco"):
    # missing visual-only mesh files -> substitute an existing placeholder
    existing = None
    for asset in self.asset.findall("mesh"):
        f = asset.get("file")
        if f is not None and os.path.exists(f):
            existing = f
            break
    for asset in self.asset.findall("mesh"):
        f = asset.get("file")
        if f is not None and not os.path.exists(f):
            asset.set("file", existing)
            asset.attrib.pop("scale", None)
    return _orig_get_model(self, mode)


rs_base.MujocoXML.get_model = _patched_get_model

import mujoco  # noqa: E402
from robosuite.utils import binding_utils as _bu  # noqa: E402

_LAST_DATA = {}
_orig_mjdata_init = _bu.MjData.__init__


def _patched_mjdata_init(self, model):
    _orig_mjdata_init(self, model)
    _LAST_DATA["d"] = self._data


_bu.MjData.__init__ = _patched_mjdata_init

_real_fullM = mujoco.mj_fullM


def _fullM_shim(m, dst, qM=None):
    _real_fullM(m, _LAST_DATA["d"], dst)


mujoco.mj_fullM = _fullM_shim


def make_ref_env(env_name="Lift", robots="Panda", **kwargs):
    defaults = dict(
        has_renderer=False,
        has_offscreen_renderer=False,
        use_camera_obs=False,
    )
    defaults.update(kwargs)
    return robosuite.make(env_name, robots=robots, **defaults)
