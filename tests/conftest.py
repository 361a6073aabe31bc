"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference has no fake-backend capability (SURVEY.md §4); here every test
runs on CPU with 8 virtual devices so sharding/collective paths are exercised
without TPU hardware. Pallas kernels run in interpret mode on CPU.
"""

import os

# Must run before any backend is initialised. Force CPU: the ambient
# environment registers a (slow, experimental) remote-TPU plugin via
# sitecustomize and pins jax_platforms to it, so both the env var and the
# config must be overridden here.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite is compile-bound (40-55 min
# cold, VERDICT r04 item 7); warm repeat runs skip the GSPMD CPU compiles.
# JAX's cache writes atomically, so xdist workers share it safely.
from vm_asr_tpu.core.compile_cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
