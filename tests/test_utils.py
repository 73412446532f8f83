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
