"""Visual & dynamics modders: TPU-native domain-randomization samplers.

Re-derivation of the reference's modder suite (utils/mjmod.py — TextureModder
:62, LightingModder :518, CameraModder :782, DynamicsModder :1405). The
reference mutates a single global MjModel in place between episodes, so every
parallel worker sees the same world. Here each modder is a pure function
`sample(rng, model) -> override pytree`; overrides are traced values, so a
vmapped batch carries a DIFFERENT visual/dynamic world per scenario inside
one jitted computation.

Visual overrides feed `renderers.raycast.render_camera(..., visual=...)`;
dynamics overrides feed `Model.replace` (see
wrappers/domain_randomization_wrapper.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class TextureRandomizationConfig:
    """Per-geom texture randomization (reference TextureModder
    mjmod.py:213-330): base-color jitter plus per-geom procedural pattern
    (flat / checker / gradient / noise) evaluated analytically by the
    raycast renderer at the hit point (bitmap-free equivalents of
    rand_checker / rand_gradient / rand_noise)."""

    rgb_jitter: float = 0.3          # uniform +- jitter per channel
    patterns: bool = True            # sample checker/gradient/noise modes
    scale_range: Tuple[float, float] = (0.04, 0.15)  # pattern cell size (m)
    randomize_skybox: bool = True    # kept for config parity (sky handled in renderer)


@dataclasses.dataclass(frozen=True)
class LightingRandomizationConfig:
    """Reference LightingModder (mjmod.py:518+): position/direction/
    ambient/diffuse/specular perturbation."""

    direction_jitter: float = 0.4    # radians-scale tilt of the light vector
    ambient_range: Tuple[float, float] = (0.2, 0.5)
    diffuse_range: Tuple[float, float] = (0.4, 0.8)


@dataclasses.dataclass(frozen=True)
class CameraRandomizationConfig:
    """Reference CameraModder (mjmod.py:782+): pos/quat/fovy perturbation."""

    position_jitter: float = 0.01    # meters, world frame
    fovy_jitter: float = 0.05        # relative fov scale jitter


class TextureModder:
    def __init__(self, model, config: Optional[TextureRandomizationConfig] = None):
        self.model = model
        self.config = config or TextureRandomizationConfig()

    def sample(self, rng):
        base = jnp.asarray(self.model.geom_rgba)[:, :3]
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        noise = jax.random.uniform(
            k1, base.shape, minval=-self.config.rgb_jitter, maxval=self.config.rgb_jitter
        )
        out = {"geom_rgb": jnp.clip(base + noise, 0.0, 1.0)}
        if self.config.patterns:
            n = base.shape[0]
            out["tex_mode"] = jax.random.randint(k2, (n,), 0, 4)  # flat/checker/gradient/noise
            out["tex_rgb2"] = jax.random.uniform(k3, (n, 3))
            lo, hi = self.config.scale_range
            out["tex_scale"] = jax.random.uniform(k4, (n,), minval=lo, maxval=hi)
        return out


class LightingModder:
    def __init__(self, model, config: Optional[LightingRandomizationConfig] = None):
        self.model = model
        self.config = config or LightingRandomizationConfig()

    def sample(self, rng):
        c = self.config
        k1, k2, k3 = jax.random.split(rng, 3)
        tilt = c.direction_jitter * jax.random.normal(k1, (3,))
        d = jnp.asarray([0.3, 0.3, -0.9]) + tilt
        return {
            "light_dir": d / jnp.maximum(jnp.linalg.norm(d), 1e-9),
            "ambient": jax.random.uniform(k2, (), minval=c.ambient_range[0], maxval=c.ambient_range[1]),
            "diffuse": jax.random.uniform(k3, (), minval=c.diffuse_range[0], maxval=c.diffuse_range[1]),
        }


class CameraModder:
    def __init__(self, model, config: Optional[CameraRandomizationConfig] = None):
        self.model = model
        self.config = config or CameraRandomizationConfig()

    def sample(self, rng):
        c = self.config
        k1, k2 = jax.random.split(rng)
        return {
            "cam_dpos": c.position_jitter * jax.random.normal(k1, (3,)),
            "fovy_scale": 1.0 + c.fovy_jitter * jax.random.normal(k2, ()),
        }


def sample_visual_overrides(model, rng, texture=None, lighting=None, camera=None):
    """One combined visual-override pytree from the three modders.

    texture/lighting/camera: config dataclasses or None to use defaults;
    pass False to disable that modder (mirrors the reference wrapper's
    randomize_color/lighting/camera flags,
    wrappers/domain_randomization_wrapper.py:84-130).
    """
    out = {}
    mods = [
        (texture, TextureModder, TextureRandomizationConfig),
        (lighting, LightingModder, LightingRandomizationConfig),
        (camera, CameraModder, CameraRandomizationConfig),
    ]
    keys = jax.random.split(rng, 3)
    for (cfg, cls, default_cls), k in zip(mods, keys):
        if cfg is False:
            continue
        modder = cls(model, cfg if isinstance(cfg, default_cls) else None)
        out.update(modder.sample(k))
    return out
