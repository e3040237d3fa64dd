"""Observable pipeline + wrapper behavior tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robosuite_tpu import observables as O


def test_sensor_decorator_and_modality_state():
    @O.sensor("proprio")
    def joint_pos(ctx):
        return ctx["qpos"]

    @O.sensor("object")
    def cube_pos(ctx):
        return ctx["cube"]

    obs_list = [O.Observable("joint_pos", joint_pos), O.Observable("cube_pos", cube_pos)]
    ctx = {"qpos": jnp.arange(3.0), "cube": jnp.asarray([1.0, 2.0, 3.0])}
    obs, cache = O.compute_observables(obs_list, ctx, jax.random.PRNGKey(0), 0)
    np.testing.assert_array_equal(np.asarray(obs["joint_pos"]), [0, 1, 2])
    assert "proprio-state" in obs and "object-state" in obs
    np.testing.assert_array_equal(np.asarray(obs["object-state"]), [1, 2, 3])


def test_gaussian_corrupter_changes_value_deterministically():
    @O.sensor("proprio")
    def val(ctx):
        return jnp.zeros(4)

    ob = O.Observable("v", val, corrupter=O.create_gaussian_noise_corrupter(0.0, 0.1))
    o1, _ = O.compute_observables([ob], None, jax.random.PRNGKey(1), 0)
    o2, _ = O.compute_observables([ob], None, jax.random.PRNGKey(1), 0)
    o3, _ = O.compute_observables([ob], None, jax.random.PRNGKey(2), 0)
    np.testing.assert_array_equal(np.asarray(o1["v"]), np.asarray(o2["v"]))
    assert np.abs(np.asarray(o1["v"]) - np.asarray(o3["v"])).max() > 0
    assert np.abs(np.asarray(o1["v"])).max() > 0


def test_sampling_rate_holds_stale_values():
    calls = {"n": 0}

    @O.sensor("proprio")
    def val(ctx):
        return ctx

    ob = O.Observable("v", val, update_every=4)
    cache = None
    vals = []
    for t in range(8):
        obs, cache = O.compute_observables([ob], jnp.asarray(float(t)), jax.random.PRNGKey(0), t, cache)
        vals.append(float(obs["v"]))
    # refreshes at t=0 and t=4 only
    assert vals == [0.0, 0.0, 0.0, 0.0, 4.0, 4.0, 4.0, 4.0]


def test_wrapper_double_wrap_guard():
    import robosuite_tpu
    from robosuite_tpu.wrappers import Wrapper

    env = robosuite_tpu.make("Lift", robots="Panda", cube_size=[0.021, 0.021, 0.021])
    w = Wrapper(env)
    with pytest.raises(Exception):
        Wrapper(w)


def test_buffers():
    from robosuite_tpu.utils.buffers import DelayBuffer, DeltaBuffer, RingBuffer

    rb = RingBuffer.make(3, 2)
    for i in range(5):
        rb = rb.push(jnp.full(2, float(i)))
    np.testing.assert_allclose(np.asarray(rb.current), [4, 4])
    np.testing.assert_allclose(np.asarray(rb.average), [3, 3])  # mean of 2,3,4

    db = DeltaBuffer.make(2)
    db = db.push(jnp.asarray([1.0, 1.0])).push(jnp.asarray([3.0, 0.0]))
    np.testing.assert_allclose(np.asarray(db.delta), [2.0, -1.0])

    dl = DelayBuffer.make(2, 1)
    outs = []
    for i in range(4):
        dl = dl.push(jnp.asarray([float(i)]))
        outs.append(float(dl.delayed[0]))
    assert outs == [0.0, 0.0, 0.0, 1.0]


@pytest.mark.slow
def test_visualization_wrapper_indicators():
    """Indicator sites are injected into the world and movable
    (reference visualization_wrapper.py:23-186)."""
    import jax
    import numpy as np

    import robosuite_tpu
    from robosuite_tpu.wrappers import VisualizationWrapper

    env = robosuite_tpu.make("Lift", robots="Panda", cube_size=[0.021, 0.021, 0.021])
    w = VisualizationWrapper(env, indicator_configs="default")
    assert w.get_indicator_names() == ["indicator0"]
    sid = env.model.site_name2id("indicator0")
    w.set_indicator_pos("indicator0", (0.1, 0.2, 0.3))
    np.testing.assert_allclose(np.asarray(env.model.site_pos[sid]), [0.1, 0.2, 0.3], atol=1e-6)
    # env still resets + steps with the rebuilt model
    out = env.reset(jax.random.PRNGKey(0))
    st = out[0] if isinstance(out, tuple) else out
    st, obs, rew, done, info = env.step(st, np.zeros(env.action_dim, dtype=np.float32))
    assert np.isfinite(np.asarray(st.physics.qpos)).all()
    # vis settings API
    s = w.get_visualization_settings()
    k = next(iter(s))
    w.set_visualization_setting(k, False)
    assert w.get_visualization_settings()[k] is False
