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
    mjmod.py:782-1030): per-geom procedural pattern — rgb / checker /
    gradient / noise, the reference texture_variations list — with two
    random colors per geom, evaluated analytically by the raycast renderer
    at the hit point (bitmap-free equivalents of rand_rgb / rand_checker /
    rand_gradient / rand_noise), plus material (reflectance, shininess,
    specular) and skybox randomization."""

    texture_variations: Tuple[str, ...] = ("rgb", "checker", "noise", "gradient")
    randomize_local: bool = False    # interpolate toward the defaults
    local_rgb_interpolation: float = 0.1
    randomize_material: bool = False  # (reflectance, shininess, specular)
    local_material_interpolation: float = 0.2
    scale_range: Tuple[float, float] = (0.04, 0.15)  # pattern cell size (m)
    randomize_skybox: bool = True    # gradient sky colors (reference
                                     # randomizes the skybox bitmap)

    # legacy knob (pre-r5 sampler): uniform +- jitter around the base color
    # instead of the reference's fully random rgb1. None = reference mode.
    rgb_jitter: Optional[float] = None

_VARIATION_IDS = {"rgb": 0, "checker": 1, "gradient": 2, "noise": 3}


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
    """Reference TextureModder (mjmod.py:782-1030) as a pure sampler.

    Each sample() mirrors one reference randomize() sweep:
      * every geom draws a variation from texture_variations
        (rand_rgb / rand_checker / rand_gradient / rand_noise) with two
        fully random colors (get_rand_rgb),
      * gradient orientation is a coin flip (rand_gradient vertical=...),
      * noise draws its rgb2 fraction in [0.1, 0.9] (rand_noise),
      * randomize_local interpolates toward the model's default colors
        (set_texture/set_rgb perturb=True),
      * randomize_material draws (reflectance, shininess, specular)
        (set_material),
      * randomize_skybox draws two sky-gradient colors (the reference
        re-synthesizes the skybox bitmap).
    """

    def __init__(self, model, config: Optional[TextureRandomizationConfig] = None):
        self.model = model
        self.config = config or TextureRandomizationConfig()
        bad = set(self.config.texture_variations) - set(_VARIATION_IDS)
        if bad:
            raise ValueError(f"unknown texture variations {sorted(bad)}; "
                             f"known: {sorted(_VARIATION_IDS)}")

    def sample(self, rng):
        c = self.config
        base = jnp.asarray(self.model.geom_rgba)[:, :3]
        n = base.shape[0]
        (k_rgb1, k_rgb2, k_mode, k_scale, k_frac, k_vert, k_mat,
         k_sky1, k_sky2) = jax.random.split(rng, 9)

        if c.rgb_jitter is not None:  # legacy jitter-around-base mode
            noise = jax.random.uniform(k_rgb1, base.shape,
                                       minval=-c.rgb_jitter, maxval=c.rgb_jitter)
            rgb1 = jnp.clip(base + noise, 0.0, 1.0)
        else:
            rgb1 = jax.random.uniform(k_rgb1, (n, 3))
        rgb2 = jax.random.uniform(k_rgb2, (n, 3))
        if c.randomize_local:
            a = c.local_rgb_interpolation
            rgb1 = (1.0 - a) * base + a * rgb1
            rgb2 = (1.0 - a) * base + a * rgb2

        # per-geom variation drawn uniformly from the configured list
        var_ids = jnp.asarray([_VARIATION_IDS[v] for v in c.texture_variations])
        mode = var_ids[jax.random.randint(k_mode, (n,), 0, len(var_ids))]

        lo, hi = c.scale_range
        out = {
            "geom_rgb": rgb1,
            "tex_mode": mode,
            "tex_rgb2": rgb2,
            "tex_scale": jax.random.uniform(k_scale, (n,), minval=lo, maxval=hi),
            # rand_noise: fraction = 0.1 + U * 0.8
            "tex_fraction": 0.1 + 0.8 * jax.random.uniform(k_frac, (n,)),
            # rand_gradient: vertical = U > 0.5
            "tex_grad_vert": jax.random.bernoulli(k_vert, 0.5, (n,)),
        }
        if c.randomize_material:
            mat = jax.random.uniform(k_mat, (n, 3))  # reflect/shine/spec
            if c.randomize_local:
                # interpolate toward neutral defaults (set_material perturb)
                a = c.local_material_interpolation
                mat = (1.0 - a) * jnp.asarray([0.0, 0.5, 0.5]) + a * mat
            out["mat_rss"] = mat
        if c.randomize_skybox:
            out["sky_rgb1"] = jax.random.uniform(k_sky1, (3,))
            out["sky_rgb2"] = jax.random.uniform(k_sky2, (3,))
        return out

    def whiten_materials(self):
        """Reference whiten_materials: overrides that set every geom color
        to white so patterns take full effect."""
        return {"geom_rgb": jnp.ones((int(self.model.ngeom), 3))}


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
