"""Domain randomization: per-scenario dynamics randomization.

Re-derivation of the reference's DynamicsModder + DomainRandomizationWrapper
(utils/mjmod.py:1405+, wrappers/domain_randomization_wrapper.py:84-275) in
TPU-native form: instead of mutating a global MjModel between episodes, each
batched scenario carries its OWN sampled model-parameter multipliers (mass,
joint damping, contact friction, gravity), applied as model-leaf overrides
inside the jitted step. This upgrades the reference's capability: the
C-engine version cannot randomize per-parallel-instance at all.

Visual randomization (textures/lighting/cameras — reference TextureModder /
LightingModder / CameraModder, mjmod.py:62,518,782) samples per-episode
render overrides from utils/mjmod.py and feeds them to the raycast renderer,
again per-scenario where the reference is global-only.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from robosuite_tpu.wrappers.wrapper import Wrapper


@dataclasses.dataclass(frozen=True)
class DynamicsRandomizationConfig:
    """Log-uniform multiplier ranges (reference DynamicsModder defaults
    scale-perturb the same fields, mjmod.py:1405+)."""

    mass_range: tuple = (0.8, 1.2)
    damping_range: tuple = (0.7, 1.3)
    friction_range: tuple = (0.7, 1.3)
    gravity_range: tuple = (1.0, 1.0)


class DomainRandomizationWrapper(Wrapper):
    def __init__(self, env, config: Optional[DynamicsRandomizationConfig] = None, seed: int = 0,
                 randomize_color: bool = False, randomize_lighting: bool = False,
                 randomize_camera: bool = False):
        super().__init__(env)
        self.config = config or DynamicsRandomizationConfig()
        self._key = jax.random.PRNGKey(seed)
        self._visual_flags = (randomize_color, randomize_lighting, randomize_camera)
        self.visual_overrides = None

        base = env.model

        def sample_overrides(rng):
            k1, k2, k3, k4 = jax.random.split(rng, 4)
            c = self.config

            def u(k, rng_range, shape=()):
                lo, hi = rng_range
                return jax.random.uniform(k, shape, minval=lo, maxval=hi)

            return {
                "body_mass": u(k1, c.mass_range),
                "dof_damping": u(k2, c.damping_range),
                "pair_friction": u(k3, c.friction_range),
                "gravity": u(k4, c.gravity_range),
            }

        def apply_overrides(model, ov):
            return model.replace(
                body_mass=model.body_mass * ov["body_mass"],
                body_inertia=model.body_inertia * ov["body_mass"],
                dof_damping=model.dof_damping * ov["dof_damping"],
                pair_friction=model.pair_friction * ov["pair_friction"],
                gravity=model.gravity * ov["gravity"],
            )

        self._sample_overrides = sample_overrides
        self._apply = apply_overrides

        def step_randomized(state, action, overrides):
            model = apply_overrides(base, overrides)
            return env._step_impl(state, action, model=model)

        def rollout_randomized(state, action, overrides):
            model = apply_overrides(base, overrides)
            return env._rollout_impl(state, action, model=model)

        self._step_jit = jax.jit(step_randomized)
        self._step_batch_jit = jax.jit(jax.vmap(step_randomized))
        self._rollout_batch_jit = jax.jit(jax.vmap(rollout_randomized))

    # -- single scenario -------------------------------------------------------
    def reset(self, rng=None):
        state, obs = self.env.reset(rng)
        self._key, k = jax.random.split(self._key)
        self.overrides = self._sample_overrides(k)
        if any(self._visual_flags):
            from robosuite_tpu.utils.mjmod import sample_visual_overrides

            color, lighting, camera = self._visual_flags
            self._key, kv = jax.random.split(self._key)
            self.visual_overrides = sample_visual_overrides(
                self.env.model, kv,
                texture=None if color else False,
                lighting=None if lighting else False,
                camera=None if camera else False,
            )
        return state, obs

    def render(self, state, camera_name="agentview", height=84, width=84):
        """Render with this episode's sampled visual overrides."""
        from robosuite_tpu.physics import kinematics
        from robosuite_tpu.renderers.raycast import render_camera

        if not hasattr(self, "_render_jit"):
            def _r(qpos, visual):
                kin = kinematics.fk(self.env.model, qpos)
                return render_camera(self.env.model, kin, camera_name, height, width,
                                     visual=visual)

            self._render_jit = jax.jit(_r)
        return self._render_jit(state.physics.qpos, self.visual_overrides or {})

    def step(self, state, action):
        return self._step_jit(state, jnp.asarray(action), self.overrides)

    # -- batched ---------------------------------------------------------------
    def reset_batch(self, rngs):
        states, obs = self.env.reset_batch(rngs)
        self._key, k = jax.random.split(self._key)
        keys = jax.random.split(k, rngs.shape[0])
        self.batch_overrides = jax.vmap(self._sample_overrides)(keys)
        return states, obs

    def step_batch(self, states, actions):
        return self._step_batch_jit(states, actions, self.batch_overrides)

    def rollout_batch(self, states, actions):
        return self._rollout_batch_jit(states, actions, self.batch_overrides)
