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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU collectives default to a HARD 40 s rendezvous termination timeout;
# on a 1-core box the 8 virtual devices run serially, so production-shape
# sharded tests (448px fusion forward) legitimately arrive late — raise it.
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    flags += (" --xla_cpu_collective_call_terminate_timeout_seconds=900"
              " --xla_cpu_collective_timeout_seconds=900")
os.environ["XLA_FLAGS"] = flags

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
