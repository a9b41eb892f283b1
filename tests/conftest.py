"""Test configuration: force JAX onto a virtual 8-device CPU platform so
multi-chip sharding logic (data-parallel pjit over a Mesh) runs without TPUs.

Must set the env vars before the first ``import jax`` anywhere in the test
process.
"""

import os

# The sandbox preloads a TPU plugin and pins JAX_PLATFORMS=axon via
# sitecustomize; plain env overrides are not enough, so force the platform
# through jax.config before any backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mano_models():
    from ev2hands_tpu.mano import synthetic_mano_models

    return synthetic_mano_models(seed=0)


@pytest.fixture(scope="session")
def mano_hands(mano_models):
    from ev2hands_tpu.mano import create_mano_hands

    return create_mano_hands(mano_models, n_pose_comps=6)


@pytest.fixture()
def rng():
    return np.random.RandomState(1234)
