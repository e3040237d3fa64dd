"""Controller framework: functional part controllers.

The reference's Controller base class (controllers/parts/controller.py) is a
stateful cache around sim queries. The TPU-native design splits that into:

  * ArmView — a pure struct of the per-substep quantities `update()` caches
    (joint pos/vel, ref site pose/vel, Jacobians, mass matrix, bias): built
    once per substep by the robot layer from the engine's forward products.
  * a static config dataclass per controller type (the JSON config analog),
  * a small goal-state pytree updated at policy rate (set_goal) and read at
    substep rate (run) — the two-clock structure of the reference
    (fixed_base_robot.py:145-148) expressed as explicit state instead of
    object mutation.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class ArmView:
    """State the reference Controller.update() caches per substep
    (controllers/parts/controller.py:199-232)."""

    joint_pos: Any      # (n,)
    joint_vel: Any      # (n,)
    ref_pos: Any        # (3,) eef site position (world)
    ref_ori_mat: Any    # (3,3)
    ref_pos_vel: Any    # (3,) linear site velocity
    ref_ori_vel: Any    # (3,) angular site velocity
    J_pos: Any          # (3, n)
    J_ori: Any          # (3, n)
    mass_matrix: Any    # (n, n)
    torque_compensation: Any  # (n,) qfrc_bias slice (controller.py:303-311)
    initial_joint: Any  # (n,) nullspace posture target
    origin_pos: Any     # (3,) base frame origin (for input_ref_frame="base")
    origin_ori: Any     # (3,3)
    origin_pos_vel: Any # (3,) base site linear velocity (osc.py:457-459)
    origin_ori_vel: Any # (3,) base site angular velocity

    @property
    def J_full(self):
        return jnp.concatenate([self.J_pos, self.J_ori], axis=-2)


def nums2array(nums, dim):
    """reference controller.py nums2array."""
    a = np.asarray(nums, dtype=np.float32)
    if a.ndim == 0:
        a = np.full(dim, float(a), dtype=np.float32)
    assert a.shape == (dim,), (a.shape, dim)
    return a
