"""Measure the reference robosuite Panda-Lift env.step rate on this CPU.

Protocol from BASELINE.md: lite_physics=True (default), no renderer,
OSC_POSE, control_freq=20, random actions. Result is pasted into bench.py
as REF_CPU_STEPS_PER_S.
"""

import sys
import time
import types

import numpy as np

numba = types.ModuleType("numba")
numba.jit = lambda *a, **k: (a[0] if (len(a) == 1 and callable(a[0])) else (lambda f: f))
sys.modules["numba"] = numba
sys.path.insert(0, "/root/reference")

import robosuite  # noqa: E402
from robosuite.models import base as rs_base  # noqa: E402
import os  # noqa: E402

_orig = rs_base.MujocoXML.get_model


def _patched(self, mode="mujoco"):
    existing = None
    for asset in self.asset.findall("mesh"):
        f = asset.get("file")
        if f and os.path.exists(f):
            existing = f
            break
    for asset in self.asset.findall("mesh"):
        f = asset.get("file")
        if f and not os.path.exists(f):
            asset.set("file", existing)
            asset.attrib.pop("scale", None)
    return _orig(self, mode)


rs_base.MujocoXML.get_model = _patched

import mujoco  # noqa: E402
from robosuite.utils import binding_utils as _bu  # noqa: E402

_LAST = {}
_oinit = _bu.MjData.__init__


def _pinit(self, model):
    _oinit(self, model)
    _LAST["d"] = self._data


_bu.MjData.__init__ = _pinit
_rf = mujoco.mj_fullM
mujoco.mj_fullM = lambda m, dst, qM=None: _rf(m, _LAST["d"], dst)


def main():
    env = robosuite.make(
        "Lift", robots="Panda", has_renderer=False, has_offscreen_renderer=False,
        use_camera_obs=False, reward_shaping=True,
    )
    env.reset()
    rng = np.random.default_rng(0)
    # warmup
    for _ in range(10):
        env.step(rng.uniform(-1, 1, env.action_dim))
    n = 200
    t0 = time.perf_counter()
    for _ in range(n):
        env.step(rng.uniform(-1, 1, env.action_dim))
    dt = time.perf_counter() - t0
    print(f"reference Panda-Lift env.step: {n/dt:.1f} steps/s ({dt/n*1000:.2f} ms/step)")


if __name__ == "__main__":
    main()
