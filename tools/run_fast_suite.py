"""Run the fast test tier with module-level parallelism.

The fast tier (`pytest -m "not slow"`) is dominated by XLA:CPU compiles of
independent env/MPC graphs; a single pytest process serializes them. This
runner shards test MODULES across worker processes (pytest-xdist is not in
the image), so total wall-clock is bounded by the slowest module instead of
the sum — the <10 min budget pyproject.toml advertises.

Usage: python tools/run_fast_suite.py [-j N]  (default N = min(8, cpus))

Each worker runs `pytest <modules> -m "not slow" -q` with the same conftest
(8 virtual CPU devices). Exit code is nonzero if any shard fails; per-shard
tails and the total duration are printed.
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# measured single-module fast-tier costs (r5, cold cache, XLA:CPU); modules
# not listed default to 30 s. Used for longest-processing-time scheduling.
COST_S = {
    "test_mpc_residuals.py": 270,
    "test_parallel.py": 250,
    "test_renderer.py": 90,
    "test_usd_export.py": 40,
    "test_ik_parity.py": 120,
    "test_visual_mod.py": 95,
    "test_dr_and_gym.py": 50,
    "test_observables_wrappers.py": 40,
    "test_mpc.py": 60,
    "test_osc_closed_loop.py": 60,
    "test_determinism.py": 25,
    "test_engine_trajectory.py": 20,
}


def shard_modules(modules, n):
    """Greedy longest-processing-time bin packing by measured cost."""
    bins = [[] for _ in range(n)]
    loads = [0.0] * n
    for m in sorted(modules, key=lambda m: -COST_S.get(os.path.basename(m), 30)):
        i = loads.index(min(loads))
        bins[i].append(m)
        loads[i] += COST_S.get(os.path.basename(m), 30)
    return [b for b in bins if b]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-j", type=int, default=min(8, os.cpu_count() or 1))
    args = ap.parse_args()

    modules = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    shards = shard_modules(modules, args.j)

    t0 = time.time()
    procs = []
    for i, shard in enumerate(shards):
        logf = open(f"/tmp/fast_suite_shard{i}.log", "w")
        procs.append((i, shard, logf, subprocess.Popen(
            [sys.executable, "-m", "pytest", *shard, "-m", "not slow", "-q"],
            cwd=REPO, stdout=logf, stderr=subprocess.STDOUT,
        )))

    failed = False
    for i, shard, logf, p in procs:
        rc = p.wait()
        logf.close()
        tail = ""
        with open(f"/tmp/fast_suite_shard{i}.log") as f:
            lines = [ln.rstrip() for ln in f if ln.strip()]
            tail = lines[-1] if lines else "(empty)"
        names = ",".join(os.path.basename(m) for m in shard)
        status = "ok" if rc == 0 else f"FAIL rc={rc}"
        print(f"shard {i} [{status}] {tail}   ({names})")
        if rc != 0:
            failed = True

    dt = time.time() - t0
    print(f"fast suite total: {dt:.0f} s across {len(shards)} shards "
          f"({'FAILED' if failed else 'all green'})")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
