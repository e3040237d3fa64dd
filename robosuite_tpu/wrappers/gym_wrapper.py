"""Gymnasium-compatible adapter.

Re-derivation of reference wrappers/gym_wrapper.py:26-180: flattens the
observation dict into a Box space and returns the 5-tuple step API. The
wrapped TPU env is functional; this wrapper holds the env state internally
to present the classic stateful gym interface (single env). For batched /
jit-composable use, call the env's functional API directly.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from robosuite_tpu.wrappers.wrapper import Wrapper


class GymWrapper(Wrapper):
    metadata = None
    render_mode = None

    def __init__(self, env, keys: Optional[List[str]] = None, flatten_obs: bool = True):
        super().__init__(env)
        self.name = type(env).__name__
        if keys is None:
            # reference gym_wrapper.py:54-66 defaults: object-state +
            # per-robot proprio-state (+ camera images when enabled)
            _, obs = env.reset()
            keys = [k for k in sorted(obs.keys()) if k.endswith("-state")]
            keys += [k for k in obs.keys() if k.endswith("_image")]
            if not keys:  # envs without the aggregation keys: raw non-image
                keys = [k for k in obs.keys()
                        if not k.endswith("image") and k != "placement_valid"]
        self.keys = keys
        self.flatten_obs = flatten_obs

        self._state = None
        _, obs = env.reset()
        flat = self._flatten_obs(obs)
        self.obs_dim = flat.size

        try:
            from gymnasium import spaces

            high = np.inf * np.ones(self.obs_dim, dtype=np.float32)
            self.observation_space = spaces.Box(-high, high)
            low, hi = env.action_spec
            self.action_space = spaces.Box(np.asarray(low, dtype=np.float32), np.asarray(hi, dtype=np.float32))
        except ImportError:  # gymnasium optional
            self.observation_space = None
            self.action_space = None

    def _flatten_obs(self, obs_dict):
        """reference gym_wrapper.py:102-120."""
        ob_lst = []
        for key in self.keys:
            if key in obs_dict:
                ob_lst.append(np.asarray(obs_dict[key]).reshape(-1))
        return np.concatenate(ob_lst).astype(np.float32)

    def reset(self, seed=None, options=None):
        import jax

        rng = jax.random.PRNGKey(seed if seed is not None else np.random.randint(0, 2**31 - 1))
        self._state, obs = self.env.reset(rng)
        out = self._flatten_obs(obs) if self.flatten_obs else {k: np.asarray(v) for k, v in obs.items()}
        return out, {}

    def step(self, action):
        """5-tuple (obs, reward, terminated, truncated, info)
        (reference gym_wrapper.py:145-163)."""
        assert self._state is not None, "call reset() first"
        self._state, obs, reward, done, info = self.env.step(self._state, action)
        out = self._flatten_obs(obs) if self.flatten_obs else {k: np.asarray(v) for k, v in obs.items()}
        truncated = bool(done)  # horizon cut
        return out, float(reward), False, truncated, info

    def seed(self, seed=None):
        np.random.seed(seed)

    def compute_reward(self, achieved_goal, desired_goal, info):
        raise NotImplementedError
