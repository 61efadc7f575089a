"""Test config: run JAX on a virtual 8-device CPU mesh.

Set before any jax import so the sharding/collective tests exercise real
multi-device paths without TPU hardware (SURVEY.md §4.6).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
# CPU AOT cache entries are machine-feature-specific; keep tests hermetic
os.environ["AAT_COMPILATION_CACHE"] = "0"

import jax

# The axon TPU plugin overrides JAX_PLATFORMS; the config knob wins.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(42)
