"""Test config: run on a virtual 8-device CPU mesh (SURVEY.md §4).

This sandbox's sitecustomize registers the axon TPU backend and *explicitly*
sets the jax_platforms config to "axon,cpu" (overriding the JAX_PLATFORMS
env var), so we must force the config back to cpu AFTER importing jax.
XLA_FLAGS still must be set before the first backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# RT2022_TEST_TPU=1 keeps the real TPU backend so the @tpu-gated tests
# (Mosaic kernel parity) run against actual hardware:
#   RT2022_TEST_TPU=1 python -m pytest tests/test_bvh8.py -k mosaic
if not os.environ.get("RT2022_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
