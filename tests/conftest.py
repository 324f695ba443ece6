"""Test config: run everything on a virtual 8-device CPU mesh.

The reference could only test multi-GPU paths on real 8-GPU boxes (SURVEY.md §4);
here we force 8 fake TPU-like host devices so sharding/pjit paths are exercised
in CI on any machine.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.pop("JAX_PLATFORMS", None)

import jax

# force CPU even when the session env preselects the TPU platform
# (JAX_PLATFORMS=axon survives a plain env override, so set the config directly)
jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rlobjectdetection_tpu.utils.cache import enable_persistent_cache

# host-fingerprinted persistent compile cache: repeat suite runs skip XLA:CPU
# compiles without risking stale-host-generation (SIGILL-warning) entries
enable_persistent_cache()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(3)  # RNG_SEED=3, utils/config.py:260
