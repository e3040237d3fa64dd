"""Pallas fused FK kernel vs the reference JAX FK (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robosuite_tpu.physics import kinematics
from tests import helpers


def test_pallas_fk_matches_reference_fk():
    from robosuite_tpu.ops.pallas_fk import make_fk_kernel

    ms = helpers.make_test_world()
    model = ms.compile()
    fk_pallas = make_fk_kernel(model, interpret=True)

    B = 128
    rng = np.random.default_rng(0)
    qpos = np.tile(np.asarray(model.qpos0), (B, 1)).astype(np.float32)
    qpos[:, :4] += rng.uniform(-0.5, 0.5, (B, 4)).astype(np.float32)
    q = rng.normal(size=(B, 4)).astype(np.float32)
    qpos[:, 7:11] = q / np.linalg.norm(q, axis=1, keepdims=True)

    xpos, xquat = fk_pallas(jnp.asarray(qpos))

    ref = jax.jit(jax.vmap(lambda qp: kinematics.fk(model, qp)))(jnp.asarray(qpos))
    np.testing.assert_allclose(np.asarray(xpos), np.asarray(ref.xpos), atol=2e-5)
    xq = np.asarray(xquat)
    rq = np.asarray(ref.xquat)
    flip = np.sign(np.sum(xq * rq, axis=-1, keepdims=True))
    np.testing.assert_allclose(xq * flip, rq, atol=2e-5)
