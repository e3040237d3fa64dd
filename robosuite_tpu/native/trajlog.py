"""ctypes wrapper + on-demand build for the native trajectory logger.

High-throughput batched episode recording for the TPU rollout loop — the
native analog of the reference's DataCollectionWrapper persistence
(wrappers/data_collection_wrapper.py:162-209). The .so builds once per
machine with g++ and is cached next to the source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "trajlog.cpp")
_SO = os.path.join(_HERE, "libtrajlog.so")
_HEADER_BYTES = 4096

_lib = None


def _build():
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
        check=True,
        capture_output=True,
    )


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_SO)) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        _build()
    lib = ctypes.CDLL(_SO)
    lib.tl_create.restype = ctypes.c_void_p
    lib.tl_create.argtypes = [ctypes.c_char_p] + [ctypes.c_uint64] * 4
    lib.tl_open.restype = ctypes.c_void_p
    lib.tl_open.argtypes = [ctypes.c_char_p]
    lib.tl_append.restype = ctypes.c_int64
    lib.tl_append.argtypes = [ctypes.c_void_p] + [ctypes.POINTER(ctypes.c_float)] * 4
    lib.tl_flush.restype = ctypes.c_int
    lib.tl_flush.argtypes = [ctypes.c_void_p]
    lib.tl_n_steps.restype = ctypes.c_uint64
    lib.tl_n_steps.argtypes = [ctypes.c_void_p]
    lib.tl_meta.restype = None
    lib.tl_meta.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64)]
    lib.tl_close.restype = None
    lib.tl_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class TrajectoryLog:
    """Writer handle over the native mmap log."""

    def __init__(self, path: str, batch: int, state_dim: int, action_dim: int, capacity_steps: int):
        lib = _load()
        self._lib = lib
        self.batch, self.state_dim, self.action_dim = batch, state_dim, action_dim
        self._h = lib.tl_create(path.encode(), batch, state_dim, action_dim, capacity_steps)
        if not self._h:
            raise OSError(f"tl_create failed for {path}")

    def append(self, times, states, actions, rewards) -> int:
        t = np.ascontiguousarray(times, dtype=np.float32)
        s = np.ascontiguousarray(states, dtype=np.float32)
        a = np.ascontiguousarray(actions, dtype=np.float32)
        r = np.ascontiguousarray(rewards, dtype=np.float32)
        assert s.shape == (self.batch, self.state_dim), s.shape
        assert a.shape == (self.batch, self.action_dim), a.shape
        idx = self._lib.tl_append(self._h, _fptr(t), _fptr(s), _fptr(a), _fptr(r))
        if idx < 0:
            raise RuntimeError("trajectory log full")
        return int(idx)

    def flush(self):
        self._lib.tl_flush(self._h)

    @property
    def n_steps(self) -> int:
        return int(self._lib.tl_n_steps(self._h))

    def close(self):
        if self._h:
            self._lib.tl_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def read_log(path: str):
    """Read a log back as numpy arrays: dict with times/states/actions/rewards."""
    with open(path, "rb") as f:
        head = f.read(64)
    assert head[:8] == b"RTPULOG1", "not a trajlog file"
    meta = np.frombuffer(head[8:48], dtype=np.uint64)
    batch, state_dim, action_dim, capacity, n_steps = (int(x) for x in meta)
    rec = batch * (1 + state_dim + action_dim + 1)
    data = np.memmap(path, dtype=np.float32, mode="r", offset=_HEADER_BYTES, shape=(capacity, rec))
    data = np.asarray(data[:n_steps]).reshape(n_steps, rec)
    out = {}
    o = 0
    out["times"] = data[:, o : o + batch]; o += batch
    out["states"] = data[:, o : o + batch * state_dim].reshape(n_steps, batch, state_dim); o += batch * state_dim
    out["actions"] = data[:, o : o + batch * action_dim].reshape(n_steps, batch, action_dim); o += batch * action_dim
    out["rewards"] = data[:, o : o + batch]
    return out
