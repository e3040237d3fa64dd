"""Transform math parity vs the reference's numpy implementations.

Imports the real reference transform_utils (numba shimmed) as the oracle and
checks every hot-path function on random inputs.
"""

import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from robosuite_tpu.utils import transforms as T


@pytest.fixture(scope="module")
def ref():
    numba = types.ModuleType("numba")
    numba.jit = lambda *a, **k: (a[0] if (len(a) == 1 and callable(a[0])) else (lambda f: f))
    sys.modules.setdefault("numba", numba)
    sys.path.insert(0, "/root/reference")
    import robosuite.utils.transform_utils as rt

    return rt


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def rand_quat(rng, n=1):
    q = rng.normal(size=(n, 4))
    return (q / np.linalg.norm(q, axis=-1, keepdims=True)).astype(np.float32)


def test_quat_mat_roundtrip(ref, rng):
    for q in rand_quat(rng, 20):
        m_mine = np.asarray(T.quat2mat(jnp.asarray(q)))
        m_ref = ref.quat2mat(q.astype(np.float64))
        np.testing.assert_allclose(m_mine, m_ref, atol=1e-5)
        q_back = np.asarray(T.mat2quat(jnp.asarray(m_mine)))
        q_ref = ref.mat2quat(m_ref)
        assert min(np.abs(q_back - q_ref).max(), np.abs(q_back + q_ref).max()) < 1e-4


def test_quat_multiply_inverse(ref, rng):
    q1 = rand_quat(rng, 10)
    q0 = rand_quat(rng, 10)
    for a, b in zip(q1, q0):
        np.testing.assert_allclose(
            np.asarray(T.quat_multiply(jnp.asarray(a), jnp.asarray(b))),
            ref.quat_multiply(a.astype(np.float64), b.astype(np.float64)),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(T.quat_inverse(jnp.asarray(a))),
            ref.quat_inverse(a.astype(np.float64)),
            atol=1e-5,
        )


def test_euler_mat(ref, rng):
    es = rng.uniform(-np.pi, np.pi, size=(20, 3)).astype(np.float32)
    for e in es:
        np.testing.assert_allclose(
            np.asarray(T.euler2mat(jnp.asarray(e))), ref.euler2mat(e.astype(np.float64)), atol=1e-5
        )
        m = ref.euler2mat(e.astype(np.float64))
        e_back = np.asarray(T.mat2euler(jnp.asarray(m, dtype=jnp.float32)))
        e_ref = np.asarray(ref.mat2euler(m))
        np.testing.assert_allclose(e_back, e_ref, atol=1e-4)


def test_axisangle_quat(ref, rng):
    vs = rng.uniform(-2, 2, size=(20, 3)).astype(np.float32)
    for v in vs:
        np.testing.assert_allclose(
            np.asarray(T.axisangle2quat(jnp.asarray(v))),
            ref.axisangle2quat(v.astype(np.float64)),
            atol=1e-5,
        )
        q = ref.axisangle2quat(v.astype(np.float64))
        np.testing.assert_allclose(
            np.asarray(T.quat2axisangle(jnp.asarray(q, dtype=jnp.float32))),
            ref.quat2axisangle(q),
            atol=1e-4,
        )


def test_pose_composition(ref, rng):
    for _ in range(10):
        pa = rng.uniform(-1, 1, 3).astype(np.float32)
        qa = rand_quat(rng)[0]
        pb = rng.uniform(-1, 1, 3).astype(np.float32)
        qb = rand_quat(rng)[0]
        A = ref.pose2mat((pa.astype(np.float64), qa.astype(np.float64)))
        B = ref.pose2mat((pb.astype(np.float64), qb.astype(np.float64)))
        mine = np.asarray(
            T.pose_in_A_to_pose_in_B(
                T.pose2mat((jnp.asarray(pa), jnp.asarray(qa))),
                T.pose2mat((jnp.asarray(pb), jnp.asarray(qb))),
            )
        )
        np.testing.assert_allclose(mine, ref.pose_in_A_to_pose_in_B(A, B), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(T.pose_inv(jnp.asarray(A, dtype=jnp.float32))), ref.pose_inv(A), atol=1e-5
        )


def test_quat_slerp(ref, rng):
    for _ in range(10):
        q0, q1 = rand_quat(rng, 2)
        for frac in (0.0, 0.3, 0.7, 1.0):
            mine = np.asarray(T.quat_slerp(jnp.asarray(q0), jnp.asarray(q1), frac))
            r = ref.quat_slerp(q0.astype(np.float64), q1.astype(np.float64), frac)
            assert min(np.abs(mine - r).max(), np.abs(mine + r).max()) < 1e-4


def test_orientation_error(ref, rng):
    import robosuite.utils.control_utils as rcu

    for _ in range(10):
        qd, qc = rand_quat(rng, 2)
        Rd = ref.quat2mat(qd.astype(np.float64))
        Rc = ref.quat2mat(qc.astype(np.float64))
        mine = np.asarray(T.orientation_error(jnp.asarray(Rd, dtype=jnp.float32), jnp.asarray(Rc, dtype=jnp.float32)))
        np.testing.assert_allclose(mine, rcu.orientation_error(Rd, Rc), atol=1e-5)
