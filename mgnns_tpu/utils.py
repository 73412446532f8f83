"""Runtime utilities: compilation cache, seeding, profiling."""

from __future__ import annotations

import contextlib
import os
import time


def _host_cpu_fingerprint() -> str:
    """Short stable hash of this host's CPU identity.

    Covers the ``/proc/cpuinfo`` feature flags AND the family/model/stepping/
    microcode lines: XLA:CPU's codegen tunes on the detected microarchitecture
    and microcode-dependent mitigations (e.g. ``prefer-no-gather`` /
    ``prefer-no-scatter`` for gather-slow steppings), so two hosts with
    identical flag sets can still produce mutually incompatible AOT entries
    (observed: a flags-only fingerprint collided across rig machines and the
    loader warned of SIGILL-able target-feature mismatches)."""
    import hashlib
    import platform

    keys = ("flags", "Features", "model name", "cpu family", "model",
            "stepping", "microcode", "CPU implementer", "CPU part")
    try:
        with open("/proc/cpuinfo") as f:
            feats = sorted({l.strip() for l in f
                            if l.split(":")[0].strip() in keys
                            or l.startswith(("flags", "Features"))})
        blob = "\n".join(feats) or platform.machine()
    except OSError:
        blob = f"{platform.machine()}-{platform.processor()}"
    return hashlib.sha256(blob.encode()).hexdigest()[:12]


def _ambient_flags_salt(backend: str | None) -> str | None:
    """Cache salt derived from an ambient ``LIBTPU_INIT_ARGS`` export.

    Only accelerator backends are salted: libtpu flags cannot change a
    compiled CPU program, and a stray exported LIBTPU_INIT_ARGS would force a
    needless cold CPU recompile (minutes for the sharded fusion suite).  The
    *stripped* value is hashed so the salt matches the CLI's
    ``_apply_tpu_compile_flags`` hash for whitespace-differing but
    semantically equal flag sets (shared warm cache)."""
    ambient = os.environ.get("LIBTPU_INIT_ARGS", "").strip()
    if not ambient or backend in (None, "cpu"):
        return None
    import hashlib

    return hashlib.sha256(ambient.encode()).hexdigest()[:10]


def enable_compilation_cache(path: str | None = None,
                             salt: str | None = None) -> None:
    """Persistent XLA compilation cache across processes.

    The fusion model's first jit costs tens of seconds; the cache makes every
    later process (bench, CLI runs, driver checks) hit warm.

    ``salt`` isolates runs whose compiled programs the cache key cannot
    distinguish — e.g. non-default ``LIBTPU_INIT_ARGS`` (the key ignores
    libtpu flags, so a warm cache would silently serve programs compiled
    under different flags).  When no explicit salt is given but
    ``LIBTPU_INIT_ARGS`` is already exported (the documented hand-run channel,
    tools/xla_flag_sweep.py), the salt is derived from the env var directly —
    otherwise a user-exported flag set would reuse the stock-flags cache.
    The hash matches ``cli.main._apply_tpu_compile_flags``'s, so a CLI run
    and a hand-exported run with the same flags share one warm cache.
    """
    import jax

    cache_dir = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/mgnns_jax_cache")
    )
    try:
        backend = jax.default_backend()
    except Exception:
        backend = None
    if salt is None:
        salt = _ambient_flags_salt(backend)
    if salt:
        cache_dir = os.path.join(cache_dir, f"flags-{salt}")
    # Key by platform AND a host-CPU fingerprint: XLA:CPU AOT entries bake in
    # the compile machine's CPU features, and the loader does NOT reject a
    # mismatch — it logs "could lead to execution errors such as SIGILL" and
    # then actually SIGILLs (observed: a cache populated on a wider-AVX512
    # host crashed this one).  A per-host cache directory makes a moved
    # checkout recompile cold instead of crashing.
    if backend is not None:
        # TPU/GPU programs execute on the accelerator — host CPU features
        # don't matter, and re-keying would throw away their warm caches.
        sub = f"cpu-{_host_cpu_fingerprint()}" if backend == "cpu" else backend
        cache_dir = os.path.join(cache_dir, sub)
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
