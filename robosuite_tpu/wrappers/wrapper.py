"""Base wrapper: transparent attribute forwarding.

Re-derivation of reference wrappers/wrapper.py:7-130 adapted to the
functional env API (reset/step take and return explicit state).
"""

from __future__ import annotations


class Wrapper:
    def __init__(self, env):
        self.env = env
        # double-wrap guard (reference wrapper.py:33-40)
        e = env
        while isinstance(e, Wrapper):
            if e.class_name() == self.class_name():
                raise Exception(f"Attempted to double wrap with Wrapper: {self.__class__.__name__}")
            e = e.env

    @classmethod
    def class_name(cls):
        return cls.__name__

    def reset(self, rng=None):
        return self.env.reset(rng)

    def step(self, state, action):
        return self.env.step(state, action)

    @property
    def action_dim(self):
        return self.env.action_dim

    @property
    def action_spec(self):
        return self.env.action_spec

    @property
    def unwrapped(self):
        if hasattr(self.env, "unwrapped"):
            return self.env.unwrapped
        return self.env

    def __getattr__(self, name):
        # transparent forwarding (reference wrapper.py:101-130)
        return getattr(self.env, name)
