"""Test configuration: run on a virtual 8-device CPU mesh with x64 enabled.

Multi-chip sharding paths run against the CPU backend per SURVEY.md §4 —
``xla_force_host_platform_device_count`` gives 8 virtual devices without a
pod.  x64 lets numerical tests validate against float64 ground truth.

NOTE: this environment preloads a TPU PJRT plugin via sitecustomize and forces
``JAX_PLATFORMS=axon``; env vars set here would be too late, but
``jax.config.update`` before first backend use still wins.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
