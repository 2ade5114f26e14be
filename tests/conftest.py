"""Test configuration: run everything on a fake 8-device CPU backend.

SURVEY §4.3: distributed behavior is tested without a cluster by forcing
the host platform to expose 8 virtual devices
(``--xla_force_host_platform_device_count=8``), the standard JAX
fake-backend pattern. Must run before jax is imported anywhere.
"""

import os

# Hard override: the environment may pre-set JAX_PLATFORMS (e.g. to a
# tunneled TPU) and a sitecustomize hook may re-register it after env
# parsing, so both the env var AND the live jax config are forced.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def reference_available():
    from distropointclouds_tpu.io import fixtures

    if not fixtures.has_fixtures():
        pytest.skip("reference fixtures not available")
    return True


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1337)
