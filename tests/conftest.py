"""Test configuration: force CPU backend with 8 virtual devices so sharding
tests exercise a real multi-device mesh without TPU hardware."""

import os

# Hard override: the interactive environment pins JAX_PLATFORMS=axon (TPU
# tunnel, registered by a sitecustomize hook before conftest runs); tests
# must run on the local CPU backend with 8 virtual devices. Setting the env
# var alone is not enough — jax.config must be updated after import too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# NOTE: do NOT enable the persistent compilation cache here: in this
# environment an axon remote-compile service produces XLA:CPU AOT results
# targeting a different microarchitecture (AVX512/AMX); loading them locally
# can SIGILL. Tests keep worlds/graphs small instead.

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def lift_env():
    """Shared Lift env: its jitted step compiles once for the whole suite."""
    import robosuite_tpu

    return robosuite_tpu.make(
        "Lift", robots="Panda", cube_size=[0.021, 0.021, 0.021], reward_shaping=True
    )
