"""Runtime utilities: compilation cache, seeding, profiling."""

from __future__ import annotations

import contextlib
import os
import time


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache across processes.

    The fusion model's first jit costs tens of seconds; the cache makes every
    later process (bench, CLI runs, driver checks) hit warm.
    """
    import jax

    cache_dir = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/mgnns_jax_cache")
    )
    # Key by platform: XLA:CPU AOT entries record host CPU features and
    # reloading them across processes with differing feature detection warns
    # about potential SIGILL.
    try:
        cache_dir = os.path.join(cache_dir, jax.default_backend())
    except Exception:
        pass
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def set_seed(seed: int) -> None:
    """Seed host RNGs (reference ``utils/util.py:12-19``); device randomness
    is already explicit through jax.random keys."""
    import random

    import numpy as np

    random.seed(seed)
    np.random.seed(seed)


@contextlib.contextmanager
def step_timer(name: str, sink: dict | None = None):
    """Wall-clock timer; the TPU-side replacement for the reference's
    batch_time/data_time meters (``engine/...:102-105``)."""
    t0 = time.time()
    yield
    dt = time.time() - t0
    if sink is not None:
        sink.setdefault(name, []).append(dt)


@contextlib.contextmanager
def jax_profile(log_dir: str | None):
    """``jax.profiler`` trace wrapper (reference had no profiling at all)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
