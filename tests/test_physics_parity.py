"""Cross-engine parity: compiled model + FK + Jacobians + CRBA + RNEA vs MuJoCo.

This is the TPU build's analog of the reference's determinism/playback tests
(tests/test_environments/test_env_determinism.py, test_action_playback.py) —
but cross-engine: the same ModelSpec is compiled by both engines and physics
quantities must agree to float32 tolerance.
"""

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from robosuite_tpu.physics import dynamics, kinematics  # noqa: E402
from tests import helpers  # noqa: E402

_fk = jax.jit(kinematics.fk)
_crba = jax.jit(dynamics.crba)
_bias = jax.jit(dynamics.rnea_bias)


@jax.jit
def _site_jac_vel(model, qpos, qvel):
    kin = kinematics.fk(model, qpos)
    out = {}
    for name in ("s1", "ee_site"):
        sid = model.site_name2id(name)
        jacp, jacr = kinematics.site_jacobian(model, kin, sid)
        lin, ang = kinematics.site_velocity(model, kin, qvel, sid)
        out[name] = (jacp, jacr, lin, ang)
    return out

TOL = 2e-5


@pytest.fixture(scope="module")
def world():
    ms = helpers.make_test_world()
    model = ms.compile()
    mjm = helpers.mj_from_spec(ms)
    return ms, model, mjm


def random_state(mjm, seed=0):
    rng = np.random.default_rng(seed)
    qpos = mjm.qpos0.copy()
    # perturb joints; keep quaternions valid
    qpos[:4] += rng.uniform(-0.8, 0.8, 4)  # hinge/slide block (j1..js)
    qpos[3] = np.clip(qpos[3], -0.03, 0.03)
    q = rng.normal(size=4)
    qpos[7:11] = q / np.linalg.norm(q)  # free joint quat
    qpos[4:7] += rng.uniform(-0.3, 0.3, 3)  # free joint pos
    qvel = rng.uniform(-1.0, 1.0, mjm.nv)
    return qpos, qvel


def test_compiled_model_matches_mujoco(world):
    _, model, mjm = world
    assert model.nq == mjm.nq and model.nv == mjm.nv
    assert model.nbody == mjm.nbody
    np.testing.assert_allclose(np.asarray(model.qpos0), mjm.qpos0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(model.body_mass), mjm.body_mass, atol=1e-6)
    np.testing.assert_allclose(np.asarray(model.body_ipos), mjm.body_ipos, atol=1e-6)
    np.testing.assert_allclose(np.asarray(model.body_inertia), np.sort(mjm.body_inertia, axis=-1)[:, ::-1], atol=1e-6)
    # our compiler floors hinge/slide armature at 1e-5 for f32 CRBA
    # conditioning (models/model.py); parity modulo that floor
    np.testing.assert_allclose(
        np.asarray(model.dof_armature), np.maximum(mjm.dof_armature, 1e-5 * (mjm.dof_armature >= 0) * (np.asarray(model.dof_armature) > 0)), atol=1.1e-5
    )
    assert tuple(model.body_parentid) == tuple(mjm.body_parentid)
    assert tuple(model.jnt_dofadr) == tuple(mjm.jnt_dofadr)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fk_matches(world, seed):
    ms, model, mjm = world
    qpos, _ = random_state(mjm, seed)
    d = mujoco.MjData(mjm)
    d.qpos[:] = qpos
    mujoco.mj_forward(mjm, d)

    kin = _fk(model, jnp.asarray(qpos, dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(kin.xpos), d.xpos, atol=TOL)
    np.testing.assert_allclose(np.asarray(kin.xipos), d.xipos, atol=TOL)
    for b in range(model.nbody):
        qm = np.asarray(kin.xquat[b])
        qr = d.xquat[b]
        assert min(np.abs(qm - qr).max(), np.abs(qm + qr).max()) < TOL
    np.testing.assert_allclose(np.asarray(kin.site_xpos), d.site_xpos, atol=TOL)
    np.testing.assert_allclose(
        np.asarray(kin.site_xmat).reshape(model.nsite, 9), d.site_xmat, atol=TOL
    )


@pytest.mark.parametrize("seed", [0, 3])
def test_site_jacobian_matches(world, seed):
    ms, model, mjm = world
    qpos, qvel = random_state(mjm, seed)
    d = mujoco.MjData(mjm)
    d.qpos[:] = qpos
    d.qvel[:] = qvel
    mujoco.mj_forward(mjm, d)

    out = _site_jac_vel(model, jnp.asarray(qpos, dtype=jnp.float32), jnp.asarray(qvel, dtype=jnp.float32))
    for site in ["s1", "ee_site"]:
        jacp, jacr, lin, ang = out[site]
        jacp_m = np.zeros((3, mjm.nv))
        jacr_m = np.zeros((3, mjm.nv))
        mujoco.mj_jacSite(mjm, d, jacp_m, jacr_m, mjm.site(site).id)
        np.testing.assert_allclose(np.asarray(jacp), jacp_m, atol=TOL)
        np.testing.assert_allclose(np.asarray(jacr), jacr_m, atol=TOL)
        np.testing.assert_allclose(np.asarray(lin), jacp_m @ qvel, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ang), jacr_m @ qvel, atol=1e-4)


@pytest.mark.parametrize("seed", [0, 1, 4])
def test_mass_matrix_matches(world, seed):
    ms, model, mjm = world
    qpos, _ = random_state(mjm, seed)
    d = mujoco.MjData(mjm)
    d.qpos[:] = qpos
    mujoco.mj_forward(mjm, d)
    M_ref = helpers.mj_fullM(mjm, d)

    kin = _fk(model, jnp.asarray(qpos, dtype=jnp.float32))
    M = np.asarray(_crba(model, kin))
    np.testing.assert_allclose(M, M_ref, atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("seed", [0, 2, 5])
def test_qfrc_bias_matches(world, seed):
    ms, model, mjm = world
    qpos, qvel = random_state(mjm, seed)
    d = mujoco.MjData(mjm)
    d.qpos[:] = qpos
    d.qvel[:] = qvel
    mujoco.mj_forward(mjm, d)

    kin = _fk(model, jnp.asarray(qpos, dtype=jnp.float32))
    bias = np.asarray(_bias(model, kin, jnp.asarray(qvel, dtype=jnp.float32)))
    np.testing.assert_allclose(bias, d.qfrc_bias, atol=1e-4, rtol=1e-4)
