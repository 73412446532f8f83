"""Utils: persistent-compilation-cache keying.

The cache must be keyed per host CPU for the CPU backend: XLA:CPU AOT
entries bake in the compile machine's CPU features and the loader SIGILLs
(not rejects) on a feature mismatch — observed when a cache populated on a
wider-AVX512 host was reused after the checkout moved.
"""

import os

import jax

from mgnns_tpu.utils import _host_cpu_fingerprint, enable_compilation_cache


def test_fingerprint_stable_and_short():
    a = _host_cpu_fingerprint()
    assert a == _host_cpu_fingerprint()
    assert len(a) == 12
    int(a, 16)  # hex


def test_cpu_cache_dir_is_host_keyed(tmp_path):
    prev = jax.config.jax_compilation_cache_dir
    try:
        enable_compilation_cache(str(tmp_path))
        d = jax.config.jax_compilation_cache_dir
        # tests force the cpu backend (conftest), so the dir must carry the
        # host fingerprint; accelerator backends would keep the bare name
        assert os.path.basename(d) == f"cpu-{_host_cpu_fingerprint()}"
        assert os.path.isdir(d)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_ambient_libtpu_flags_salt_the_cache(tmp_path, monkeypatch):
    """A hand-exported LIBTPU_INIT_ARGS (the tools/xla_flag_sweep.py channel)
    must not reuse the stock-flags cache on an accelerator backend: the JAX
    cache key ignores libtpu flags, so without a salt a warm cache silently
    serves programs compiled under different flags.  The auto-salt must also
    match the CLI's, so both channels share one warm cache for the same flag
    set — including flag sets that differ only in surrounding whitespace.
    On the CPU backend the salt must NOT apply: libtpu flags cannot change a
    compiled CPU program, and a stray export would force a needless cold
    recompile."""
    import hashlib

    from mgnns_tpu.utils import _ambient_flags_salt

    monkeypatch.setenv("LIBTPU_INIT_ARGS", "--xla_tpu_whatever=true")
    cli_salt = hashlib.sha256(b"--xla_tpu_whatever=true").hexdigest()[:10]
    assert _ambient_flags_salt("tpu") == cli_salt
    # whitespace-differing but semantically equal flags -> same warm cache
    monkeypatch.setenv("LIBTPU_INIT_ARGS", "  --xla_tpu_whatever=true \n")
    assert _ambient_flags_salt("tpu") == cli_salt
    # CPU backend: no salt regardless of the export
    assert _ambient_flags_salt("cpu") is None
    # whitespace-only env var is not a flag set
    monkeypatch.setenv("LIBTPU_INIT_ARGS", "  ")
    assert _ambient_flags_salt("tpu") is None
    monkeypatch.delenv("LIBTPU_INIT_ARGS")
    assert _ambient_flags_salt("tpu") is None

    # end-to-end under the (CPU-forced) test backend: an ambient export must
    # leave the cache directory unsalted, but an explicit salt still applies
    prev = jax.config.jax_compilation_cache_dir
    try:
        monkeypatch.delenv("LIBTPU_INIT_ARGS", raising=False)
        enable_compilation_cache(str(tmp_path))
        stock = jax.config.jax_compilation_cache_dir
        monkeypatch.setenv("LIBTPU_INIT_ARGS", "--xla_tpu_whatever=true")
        enable_compilation_cache(str(tmp_path))
        assert jax.config.jax_compilation_cache_dir == stock
        enable_compilation_cache(str(tmp_path), salt="abc")
        assert "flags-abc" in jax.config.jax_compilation_cache_dir
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
