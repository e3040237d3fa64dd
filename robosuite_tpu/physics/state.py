"""Physics state pytrees.

The TPU-native analog of MjData + MjSimState (reference
utils/binding_utils.py:221-250, :562-1056): a pure functional state that the
jitted step function maps to a new state. Flattened import/export keeps the
reference's (time, qpos, qvel) layout for cross-engine validation
(reference binding_utils.py:232-250 MjSimState.from_flattened/flatten).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class State:
    """Minimal integrator state: everything else is derived per-step."""

    qpos: Any
    qvel: Any
    time: Any

    @classmethod
    def make(cls, model, batch_shape=()):
        return cls(
            qpos=jnp.broadcast_to(model.qpos0, batch_shape + (model.nq,)),
            qvel=jnp.zeros(batch_shape + (model.nv,), dtype=model.qpos0.dtype),
            time=jnp.zeros(batch_shape, dtype=model.qpos0.dtype),
        )

    def flatten(self):
        """-> (..., 1 + nq + nv), matching MjSimState.flatten
        (reference binding_utils.py:248-250)."""
        return jnp.concatenate([self.time[..., None], self.qpos, self.qvel], axis=-1)

    @classmethod
    def from_flattened(cls, arr, model):
        nq, nv = model.nq, model.nv
        return cls(time=arr[..., 0], qpos=arr[..., 1 : 1 + nq], qvel=arr[..., 1 + nq : 1 + nq + nv])


@struct.dataclass
class KinData:
    """Forward-kinematics products for one configuration (world frame).

    Spatial vectors use (angular, linear) ordering referenced at the world
    origin; `sdof` is the per-dof motion subspace (the analog of MuJoCo's
    cdof, but origin-referenced instead of COM-referenced).
    """

    xpos: Any       # (nbody, 3) body frame origins
    xquat: Any      # (nbody, 4) wxyz
    xmat: Any       # (nbody, 3, 3)
    xipos: Any      # (nbody, 3) body COM in world
    ximat: Any      # (nbody, 3, 3) inertial frame orientation
    sdof_ang: Any   # (nv, 3)
    sdof_lin: Any   # (nv, 3)
    geom_xpos: Any  # (ngeom, 3)
    geom_xmat: Any  # (ngeom, 3, 3)
    site_xpos: Any  # (nsite, 3)
    site_xmat: Any  # (nsite, 3, 3)
    # optional precomputed per-pair min narrowphase distance (npair,) —
    # carried by the fused planning rollout's kin-lite so contact queries
    # (grasp checks) skip re-running narrowphase (envs/base.py _any_contact)
    pair_dist: Any = None
