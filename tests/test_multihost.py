"""Multi-host DCN harness test (degraded mode): two OS processes, each one
CPU device, joined into one global mesh via jax.distributed — functionally
the N-host launch path (scripts/launch_multihost.py, BASELINE "Reporting
points" N>=2 hosts) with loopback standing in for the DCN fabric.
"""

import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_launch():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # launcher sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(2):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, "-m", "robosuite_tpu.scripts.launch_multihost",
                    f"--coordinator=127.0.0.1:{port}", "--num-processes=2",
                    f"--process-id={pid}", "--local-cpu", "--ticks=2",
                    "--horizon=2", "--n-samples=2", "--batch-per-device=1",
                ],
                cwd=repo, env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1700)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]

    # each process prints one JSON line; global numbers agree
    reports = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        reports.append(json.loads(line))
    assert {r["process"] for r in reports} == {0, 1}
    for r in reports:
        assert r["devices_global"] == 2, reports
        assert r["devices_local"] == 1, reports
        assert r["batch"] == 2, reports
        assert r["solves_per_s"] > 0, reports
