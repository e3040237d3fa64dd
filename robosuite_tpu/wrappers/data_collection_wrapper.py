"""Trajectory recording wrapper.

Re-derivation of reference wrappers/data_collection_wrapper.py:16-215:
logs flattened states (time, qpos, qvel — MjSimState layout) and actions to
per-episode .npz directories at collect_freq, flushing every flush_freq.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np

from robosuite_tpu.wrappers.wrapper import Wrapper


class DataCollectionWrapper(Wrapper):
    def __init__(self, env, directory: str, collect_freq: int = 1, flush_freq: int = 100, backend: str = "npz"):
        """backend: "npz" (reference-compatible per-episode .npz dirs) or
        "native" (robosuite_tpu.native.TrajectoryLog mmap files — orders of
        magnitude faster for batched collection)."""
        super().__init__(env)
        self.directory = directory
        self.collect_freq = collect_freq
        self.flush_freq = flush_freq
        self.backend = backend
        self._native_log = None
        os.makedirs(directory, exist_ok=True)

        self.ep_directory: Optional[str] = None
        self.states = []
        self.action_infos = []
        self.successful = False
        self.t = 0
        self.has_interaction = False

    def _start_new_episode(self):
        if self.has_interaction:
            self._flush()
        self.t = 0
        self.has_interaction = False
        self.successful = False
        t1, t2 = str(time.time()).split(".")
        self.ep_directory = os.path.join(self.directory, f"ep_{t1}_{t2}")
        os.makedirs(self.ep_directory, exist_ok=True)
        if self.backend == "native":
            from robosuite_tpu.native import TrajectoryLog

            if self._native_log is not None:
                self._native_log.close()
            m = self.env.model
            self._native_log = TrajectoryLog(
                os.path.join(self.ep_directory, "traj.rtl"),
                batch=1, state_dim=m.nq + m.nv, action_dim=self.env.action_dim,
                capacity_steps=getattr(self.env, "horizon", 1000),
            )

    def _flush(self):
        """reference data_collection_wrapper.py:162-209."""
        if self.ep_directory is None or not self.states:
            return
        t1, t2 = str(time.time()).split(".")
        path = os.path.join(self.ep_directory, f"state_{t1}_{t2}.npz")
        np.savez(
            path,
            states=np.array(self.states),
            action_infos=np.array([a["actions"] for a in self.action_infos]),
            successful=self.successful,
        )
        self.states = []
        self.action_infos = []

    def reset(self, rng=None):
        out = super().reset(rng)
        self._start_new_episode()
        # stash the pre-action initial state; appended to states on first
        # interaction (reference data_collection_wrapper.py:95-127), so
        # states = [initial, post-a0, ...] and len(states) = len(actions)+1.
        # The episode is re-seeded through state_from_flattened so playback
        # (which starts from the same call on states[0]) replays the exact
        # same compiled path -> bit-identical final states (the reference's
        # open-loop playback contract, test_action_playback.py:39-68).
        st = out[0] if isinstance(out, tuple) else out
        self._initial_state = np.asarray(st.physics.flatten())
        if hasattr(self.env, "state_from_flattened"):
            st = self.env.state_from_flattened(self._initial_state)
            out = (st,) + tuple(out[1:]) if isinstance(out, tuple) else st
        return out

    def step(self, state, action):
        result = super().step(state, action)
        new_state = result[0]
        self.t += 1
        if not self.has_interaction and self.backend != "native" and getattr(self, "_initial_state", None) is not None:
            self.states.append(self._initial_state)
        self.has_interaction = True
        if self.t % self.collect_freq == 0:
            flat = np.asarray(new_state.physics.flatten())
            if self.backend == "native" and self._native_log is not None:
                self._native_log.append(
                    flat[:1][None], flat[None, 1:], np.asarray(action, dtype=np.float32)[None],
                    np.asarray([float(result[2])], dtype=np.float32)[None],
                )
            else:
                self.states.append(flat)
                self.action_infos.append({"actions": np.asarray(action)})
        if hasattr(self.env, "_check_success"):
            pass  # success tracked by env reward; optional
        if self.t % self.flush_freq == 0:
            self._flush()
        return result

    def close(self):
        if self.has_interaction:
            self._flush()
