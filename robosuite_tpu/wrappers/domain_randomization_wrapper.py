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
    """Multiplier ranges (reference DynamicsModder scale-perturbs the same
    fields, mjmod.py:1405-1900).

    Granularity mirrors the reference's per-body/per-geom/per-joint fields:
    with the per_* flags on (default), every body mass, every dof damping,
    and every contact pair's 3 friction coefficients get INDEPENDENT
    multipliers per scenario; off = one shared scalar per field (the old
    behavior). body_pos_noise adds per-body uniform position offsets
    (reference DynamicsModder position_perturbation)."""

    mass_range: tuple = (0.8, 1.2)
    damping_range: tuple = (0.7, 1.3)
    friction_range: tuple = (0.7, 1.3)
    gravity_range: tuple = (1.0, 1.0)
    stiffness_range: tuple = (1.0, 1.0)   # joint stiffness multipliers
    body_pos_noise: float = 0.0           # additive uniform +- metres
    per_body_mass: bool = True
    per_dof_damping: bool = True
    per_pair_friction: bool = True
    per_joint_stiffness: bool = True


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
            k1, k2, k3, k4, k5, k6 = jax.random.split(rng, 6)
            c = self.config

            def u(k, rng_range, shape=()):
                lo, hi = rng_range
                return jax.random.uniform(k, shape, minval=lo, maxval=hi)

            nb, nv = base.nbody, base.nv
            npair, njnt = base.npair, base.njnt
            ov = {
                "body_mass": u(k1, c.mass_range, (nb,) if c.per_body_mass else ()),
                "dof_damping": u(k2, c.damping_range, (nv,) if c.per_dof_damping else ()),
                "pair_friction": u(k3, c.friction_range,
                                   (npair, 3) if c.per_pair_friction else ()),
                "gravity": u(k4, c.gravity_range),
                "jnt_stiffness": u(k5, c.stiffness_range,
                                   (njnt,) if c.per_joint_stiffness else ()),
            }
            if c.body_pos_noise > 0.0:
                ov["body_pos"] = jax.random.uniform(
                    k6, (nb, 3), minval=-c.body_pos_noise, maxval=c.body_pos_noise
                )
            return ov

        def apply_overrides(model, ov):
            mass = ov["body_mass"]
            mass_b = mass if jnp.ndim(mass) else mass  # (nb,) or scalar
            out = model.replace(
                body_mass=model.body_mass * mass_b,
                body_inertia=model.body_inertia
                * (mass_b[:, None] if jnp.ndim(mass) else mass_b),
                dof_damping=model.dof_damping * ov["dof_damping"],
                pair_friction=model.pair_friction * ov["pair_friction"],
                gravity=model.gravity * ov["gravity"],
                jnt_stiffness=model.jnt_stiffness * ov["jnt_stiffness"],
            )
            if "body_pos" in ov:
                out = out.replace(body_pos=model.body_pos + ov["body_pos"])
            return out

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
