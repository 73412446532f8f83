"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding paths are exercised on a virtual CPU mesh via
``--xla_force_host_platform_device_count`` — the TPU-world equivalent of a
multi-node test harness without a real cluster.
"""

import os

# Force CPU regardless of the ambient platform (the dev box exports
# JAX_PLATFORMS=axon for the tunneled TPU chip and something on the import
# path re-asserts it, so the env var alone is not reliable — use the config
# API as well).  Tests must be fast, deterministic, and able to fake an
# 8-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Share the persistent compilation cache with bench/CLI/dryrun processes:
# the heavy fusion-model compiles (minutes cold on CPU) are paid once.
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mgnns_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
