"""Object placement samplers, vectorized.

Re-derivation of reference utils/placement_samplers.py:221-440. The
reference rejection-samples up to 5000 times in a Python loop; the TPU
version draws a fixed number of candidates per object and picks the first
valid one with a masked argmax — fixed shapes, jit/vmap friendly. With the
reference's default ranges the acceptance rate is high, so K=16 candidates
reproduces the distribution to numerical noise.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class PlacementSpec:
    """Placement parameters for one object (UniformRandomSampler args,
    reference placement_samplers.py:150-220)."""

    name: str
    qpos_start: int                     # free-joint qpos address
    x_range: Tuple[float, float] = (0.0, 0.0)
    y_range: Tuple[float, float] = (0.0, 0.0)
    rotation: Optional[Tuple[float, float]] = None  # None -> uniform z [0, 2pi)
    rotation_axis: str = "z"
    reference_pos: Sequence[float] = (0.0, 0.0, 0.0)
    z_offset: float = 0.0
    bottom_offset: float = 0.0          # object bottom offset (negative)
    horizontal_radius: float = 0.0
    ensure_boundary: bool = False
    ensure_valid_placement: bool = True


def _axis_quat(axis: str, angle):
    half = angle / 2.0
    c, s = jnp.cos(half), jnp.sin(half)
    z = jnp.zeros_like(angle)
    if axis == "x":
        return jnp.stack([c, s, z, z], axis=-1)
    if axis == "y":
        return jnp.stack([c, z, s, z], axis=-1)
    return jnp.stack([c, z, z, s], axis=-1)


def sample_placements(specs: List[PlacementSpec], rng, n_candidates: int = 64):
    """Sample non-overlapping placements for all objects sequentially
    (SequentialCompositeSampler semantics, reference :312-440).

    Returns (qpos_indices (sum 7*n,), qpos_values, rng', valid) for
    free-joint objects: [x, y, z, qw, qx, qy, qz] each. `valid` is False
    when some object had NO non-overlapping candidate (the reference raises
    RandomizationError there, placement_samplers.py:274-309; a batched jit
    reset surfaces the flag as obs['placement_valid'] instead).
    """
    placed_xy: List[jnp.ndarray] = []
    placed_r: List[float] = []
    idx_out, val_out = [], []
    all_valid = jnp.asarray(True)
    for spec in specs:
        rng, kx, ky, kr = jax.random.split(rng, 4)
        lo_x, hi_x = spec.x_range
        lo_y, hi_y = spec.y_range
        if spec.ensure_boundary:
            lo_x, hi_x = lo_x + spec.horizontal_radius, hi_x - spec.horizontal_radius
            lo_y, hi_y = lo_y + spec.horizontal_radius, hi_y - spec.horizontal_radius
        xs = jax.random.uniform(kx, (n_candidates,), minval=lo_x, maxval=hi_x)
        ys = jax.random.uniform(ky, (n_candidates,), minval=lo_y, maxval=hi_y)

        if spec.ensure_valid_placement and placed_xy:
            # candidate valid iff outside every placed object's combined radius
            ok = jnp.ones(n_candidates, dtype=bool)
            for oxy, orad in zip(placed_xy, placed_r):
                d = jnp.sqrt((xs - oxy[0]) ** 2 + (ys - oxy[1]) ** 2)
                ok = ok & (d > (orad + spec.horizontal_radius))
            pick = jnp.argmax(ok)  # first valid
            # the reference raises RandomizationError after 5000 rejected
            # tries (placement_samplers.py:274-309); under jit we surface
            # an all-candidates-invalid draw as a validity flag instead of
            # silently accepting an overlapping candidate
            all_valid = all_valid & jnp.any(ok)
        else:
            pick = 0
        x, y = xs[pick], ys[pick]

        if spec.rotation is None:
            rot = jax.random.uniform(kr, (), minval=0.0, maxval=2 * jnp.pi)
        elif isinstance(spec.rotation, (tuple, list)):
            rot = jax.random.uniform(kr, (), minval=spec.rotation[0], maxval=spec.rotation[1])
        else:
            rot = jnp.asarray(float(spec.rotation))
        quat = _axis_quat(spec.rotation_axis, rot)

        ref = jnp.asarray(spec.reference_pos)
        z = ref[2] + spec.z_offset - spec.bottom_offset
        pos = jnp.stack([x + ref[0], y + ref[1], z])

        placed_xy.append(pos[:2])
        placed_r.append(spec.horizontal_radius)
        idx_out.append(np.arange(spec.qpos_start, spec.qpos_start + 7))
        val_out.append(jnp.concatenate([pos, quat]))

    idx = jnp.asarray(np.concatenate(idx_out)) if idx_out else jnp.zeros(0, dtype=jnp.int32)
    vals = jnp.concatenate(val_out) if val_out else jnp.zeros(0)
    return idx, vals, rng, all_valid
