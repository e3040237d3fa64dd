"""DemoSamplerWrapper: reset the env from recorded demonstration states.

Re-derivation of reference wrappers/demo_sampler_wrapper.py:18-316: with
probability mixes fresh resets with resets from demonstration states, using
random / uniform / forward / reverse curriculum schemes over the recorded
trajectory. Demonstrations come from native trajectory logs or arrays of
flattened (time, qpos, qvel) states.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from robosuite_tpu.physics.state import State
from robosuite_tpu.wrappers.wrapper import Wrapper


class DemoSamplerWrapper(Wrapper):
    def __init__(
        self,
        env,
        demo_states: Sequence[np.ndarray],
        need_xml: bool = False,
        sampling_schemes=("uniform", "random"),
        scheme_ratios=(0.9, 0.1),
        open_loop_increment_freq: int = 100,
        open_loop_initial_window_width: int = 25,
        open_loop_window_increment: int = 25,
        seed: int = 0,
    ):
        """demo_states: list of (T_i, 1+nq+nv) flattened state arrays, one
        per demonstration episode."""
        super().__init__(env)
        self.demo_states = [np.asarray(d) for d in demo_states]
        assert len(self.demo_states) > 0
        self.sampling_schemes = sampling_schemes
        self.scheme_ratios = np.asarray(scheme_ratios) / np.sum(scheme_ratios)
        self.rng = np.random.default_rng(seed)

        # open-loop curriculum bookkeeping (reference :213-298)
        self.open_loop_window_size = open_loop_initial_window_width
        self.open_loop_increment_freq = open_loop_increment_freq
        self.open_loop_window_increment = open_loop_window_increment
        self.demo_sampled = 0

    def _sample_state(self):
        scheme = self.rng.choice(len(self.sampling_schemes), p=self.scheme_ratios)
        scheme = self.sampling_schemes[scheme]
        ep = self.demo_states[self.rng.integers(len(self.demo_states))]
        T = len(ep)
        if scheme == "random":
            return None
        if scheme == "uniform":
            return ep[self.rng.integers(T)]
        if scheme == "forward":
            t = self.rng.integers(min(self.open_loop_window_size, T))
            self._advance_curriculum()
            return ep[t]
        if scheme == "reverse":
            t = T - 1 - self.rng.integers(min(self.open_loop_window_size, T))
            self._advance_curriculum()
            return ep[max(t, 0)]
        raise ValueError(scheme)

    def _advance_curriculum(self):
        self.demo_sampled += 1
        if self.demo_sampled % self.open_loop_increment_freq == 0:
            self.open_loop_window_size += self.open_loop_window_increment

    def reset(self, rng=None):
        import jax.numpy as jnp

        state, obs = self.env.reset(rng)
        flat = self._sample_state()
        if flat is not None:
            phys = State.from_flattened(jnp.asarray(flat, dtype=jnp.float32), self.env.model)
            state = state.replace(physics=phys)
            from robosuite_tpu.physics import engine

            kin, _, _ = engine.forward_products(self.env.model, phys)
            obs = self.env._get_observations(phys, kin)
        return state, obs
