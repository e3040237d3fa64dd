"""Observables: declarative sensor pipeline.

Re-derivation of the reference observation subsystem
(utils/observables.py:4-259): @sensor-tagged functions with modality
grouping, and per-observable corrupter -> filter -> delayer stages. In the
functional stack an Observable is a spec; its stages are pure functions of
(value, rng, t); sampling-rate masking uses step indices instead of wall
time. Aggregation into "<modality>-state" vectors mirrors
environments/base.py:429-465.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp


def sensor(modality: str):
    """Decorator tagging a function with a modality
    (reference observables.py:4-41)."""

    def deco(fn):
        fn.__modality__ = modality
        return fn

    return deco


# ---------------------------------------------------------------------------
# corrupter / delayer factories (reference observables.py:43-155)
# ---------------------------------------------------------------------------


def create_deterministic_corrupter(corruption):
    def corrupter(value, rng):
        return value + corruption

    return corrupter


def create_uniform_noise_corrupter(min_noise, max_noise):
    def corrupter(value, rng):
        return value + jax.random.uniform(rng, jnp.shape(value), minval=min_noise, maxval=max_noise)

    return corrupter


def create_gaussian_noise_corrupter(mean, std):
    def corrupter(value, rng):
        return value + mean + std * jax.random.normal(rng, jnp.shape(value))

    return corrupter


@dataclasses.dataclass(frozen=True)
class Observable:
    """One observable: name + sensor + optional pipeline stages.

    sampling_rate semantics follow the reference (observables.py:157-259):
    an observable only refreshes every `1/sampling_rate` seconds; here that
    is every `update_every` policy steps (static), with stale values carried
    in the cache between refreshes.
    """

    name: str
    sensor: Callable  # (obs_ctx) -> array
    corrupter: Optional[Callable] = None  # (value, rng) -> value
    filter: Optional[Callable] = None     # (value) -> value
    delay: int = 0                        # steps of delay (DelayBuffer analog)
    update_every: int = 1
    enabled: bool = True
    active: bool = True

    @property
    def modality(self):
        return getattr(self.sensor, "__modality__", "state")


def compute_observables(
    observables: Sequence[Observable],
    obs_ctx: Any,
    rng,
    t,
    cache: Optional[Dict[str, Any]] = None,
):
    """Evaluate the pipeline for every enabled observable.

    Returns (obs_dict, new_cache). obs_dict includes per-observable entries
    (active only) plus concatenated '<modality>-state' vectors
    (reference base.py:429-465 _get_observations).
    """
    obs = {}
    new_cache = {}
    keys = jax.random.split(rng, max(len(observables), 1))
    by_modality: Dict[str, List[Any]] = {}
    for ob, key in zip(observables, keys):
        if not ob.enabled:
            continue
        val = ob.sensor(obs_ctx)
        if ob.corrupter is not None:
            val = ob.corrupter(val, key)
        if ob.filter is not None:
            val = ob.filter(val)
        if ob.update_every > 1 and cache is not None and ob.name in cache:
            refresh = (t % ob.update_every) == 0
            val = jnp.where(refresh, val, cache[ob.name])
        if ob.delay > 0 and cache is not None:
            hist = cache.get(ob.name + "__hist")
            if hist is None:
                hist = jnp.tile(val[None], (ob.delay + 1,) + (1,) * jnp.ndim(val))
            hist = jnp.roll(hist, 1, axis=0).at[0].set(val)
            new_cache[ob.name + "__hist"] = hist
            val = hist[-1]
        new_cache[ob.name] = val
        if ob.active:
            obs[ob.name] = val
            by_modality.setdefault(ob.modality, []).append(jnp.atleast_1d(val))
    for modality, vals in by_modality.items():
        obs[f"{modality}-state"] = jnp.concatenate([v.reshape(-1) for v in vals])
    return obs, new_cache
